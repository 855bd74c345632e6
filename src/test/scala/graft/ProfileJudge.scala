package graft

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Judge-only profiler (not committed): times the round-2 regressed queries. */
object ProfileJudge {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "graft-judge", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[judge] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)

    time("q48 embeddingNearDup cold") {
      Similarity.embeddingNearDup(embs, 0.45).write.format("noop").mode("overwrite").save()
    }
    time("q48 embeddingNearDup warm") {
      Similarity.embeddingNearDup(embs, 0.45).write.format("noop").mode("overwrite").save()
    }
    time("q27 minhashLshPairs") {
      Dedup.minhashLshPairs(docs).write.format("noop").mode("overwrite").save()
    }
    val pairs = time("q53 stage: minhashLshPairs construct+exec") {
      val p = Dedup.minhashLshPairs(docs).select($"id1", $"id2")
      p.localCheckpoint()
    }
    time("q53 stage: propagation loop") {
      import org.apache.spark.sql.functions._
      val edges = pairs.union(pairs.select($"id2", $"id1")).toDF("src", "dst").localCheckpoint()
      var labels = edges.select($"src".as("node")).distinct().withColumn("label", $"node")
      var changed = 1L
      var rounds = 0
      while (changed > 0) {
        rounds += 1
        val next = edges
          .join(labels.withColumnRenamed("node", "dst2"), $"dst" === $"dst2")
          .groupBy($"src".as("node"))
          .agg(min($"label").as("nbr_label"))
          .join(labels, Seq("node"))
          .select($"node", least($"label", $"nbr_label").as("next_label"), $"label")
        changed = next.filter($"next_label" =!= $"label").count()
        labels = next.select($"node", $"next_label".as("label")).localCheckpoint()
      }
      println(s"[judge] propagation rounds=$rounds")
    }
    time("q53 full nearDupSurvivors") {
      Dedup.nearDupSurvivors(docs).write.format("noop").mode("overwrite").save()
    }
    time("q54 kmvDistinct") {
      graft.operators.Typed.kmvDistinct(spark, Tables.lineitem(spark, sfDir))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
