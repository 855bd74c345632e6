package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scratch: stage-by-stage wall of q302 containmentDiscover on the
  * Heaps corpus (mirrors Dedup.containmentDiscover's plan shape).
  */
object ProfileQ302 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "profile-q302", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.MinHashFunctions.{shingle_hashes, sorted_intersect_count}
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q302] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val n = 5; val tau = 0.9
    val documents = graft.operators.Dedup.heapsContainmentCorpus(
      sources.Tables.documents(spark, sfDir))
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val parts = spark.sparkContext.defaultParallelism * 2
      val sh = time("sh checkpoint (shingle_hashes pass)") {
        documents
          .repartition(parts, $"doc_id")
          .select($"doc_id", shingle_hashes($"text", n).as("hs"))
          .localCheckpoint()
      }
      val postings = sh.select($"doc_id".as("container_id"), explode($"hs").as("h"))
      val dfRank = postings.groupBy($"h").agg(count(lit(1)).as("df"))
      val probes = sh
        .select($"doc_id".as("contained_id"), size($"hs").as("sz"),
          explode($"hs").as("h"))
        .join(dfRank, Seq("h"))
        .groupBy($"contained_id")
        .agg(array_sort(collect_list(struct($"df", $"h"))).as("ranked"),
          first($"sz").as("sz"))
        .select($"contained_id",
          explode(slice($"ranked", lit(1),
            (floor($"sz" * lit(1.0 - tau + 1e-6)) + 1).cast("int"))).as("p"))
        .select($"contained_id", $"p.h".as("h"))
      time("probes pass (noop)") { noop(probes) }
      val cands = time("cands checkpoint") {
        probes.join(postings, Seq("h"))
          .filter($"contained_id" =!= $"container_id")
          .select(least($"contained_id", $"container_id").as("id1"),
            greatest($"contained_id", $"container_id").as("id2"))
          .distinct()
          .localCheckpoint()
      }
      println(s"cands rows: ${cands.count()}")
      def dir(a: Column, b: Column, sza: Column, szb: Column) =
        struct(a.as("contained_id"), b.as("container_id"),
          round($"i" / sza, 6).as("containment"),
          round($"i" / (sza + szb - $"i"), 6).as("jaccard"))
      val verified = cands
        .join(sh.select($"doc_id".as("id1"), $"hs".as("h1")).hint("shuffle_hash"), Seq("id1"))
        .join(sh.select($"doc_id".as("id2"), $"hs".as("h2")).hint("shuffle_hash"), Seq("id2"))
        .select($"id1", $"id2", sorted_intersect_count($"h1", $"h2").as("i"),
          size($"h1").as("sz1"), size($"h2").as("sz2"))
        .select(explode(array(
          dir($"id1", $"id2", $"sz1", $"sz2"),
          dir($"id2", $"id1", $"sz2", $"sz1"))).as("r"))
        .select($"r.contained_id", $"r.container_id", $"r.containment", $"r.jaccard")
        .filter($"containment" >= tau)
      time("verify + sort (noop)") { noop(verified.orderBy($"contained_id", $"container_id")) }
    }
    spark.stop()
  }
}
