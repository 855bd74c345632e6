package graft

import org.apache.spark.sql.DataFrame

/** Scratch profiling main (dev harness, like Profile/ProfileQ48): isolate
  * the round-4 bench outliers q102/q48/q108 from cross-query noise.
  */
object ProfileOutliers {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "graft-profile-outliers", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (name <- Seq("q102_source_drift", "q48_embedding_neardup", "q108_quality_canonical",
        "q102_source_drift", "q48_embedding_neardup")) {
      System.gc()
      time(name)(noop(SparkEntry.queries(name)(spark, sfDir)))
    }
    spark.stop()
  }
}
