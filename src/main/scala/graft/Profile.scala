package graft

import org.apache.spark.sql.DataFrame

/** Scratch profiling harness (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "graft-profile", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    spark.range(1000000L).selectExpr("sum(id)").collect()

    // cold, in bench order — mirrors what BENCH_r{N} measures
    for (name <- Seq("q79_bm25", "q80_value_anomalies", "q81_latest_event",
        "q82_k_anonymity", "q83_dup_sources", "q84_curation_pipeline")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
      println(s"[plan] $name bad=${bad.mkString(",")}")
      System.gc()
      time(name)(noop(df))
    }
    spark.stop()
  }
}
