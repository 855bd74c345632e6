package graft

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only stage profiler for the MinHash pipeline (Test/runMain). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "graft-profile", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    println(s"[profile] docs=${docs.count()}")

    val parts = spark.sparkContext.defaultParallelism * 2
    val sigs = docs.repartition(parts, $"doc_id")
      .select($"doc_id",
        graft.functions.MinHashFunctions.minhash_signature($"text", 5, Dedup.NumHashes).as("sig"))
    time("signatures (noop)") { sigs.write.format("noop").mode("overwrite").save() }
    time("minhashLshPairs cold") {
      Dedup.minhashLshPairs(docs).write.format("noop").mode("overwrite").save()
    }
    time("minhashLshPairs warm") {
      Dedup.minhashLshPairs(docs).write.format("noop").mode("overwrite").save()
    }
    time("simhashPairs") {
      Dedup.simhashPairs(docs).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
