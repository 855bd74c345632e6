package graft

import org.apache.spark.sql.DataFrame

/** Scratch profiling/plan-audit harness (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession
      .builder(appName = "graft-profile", master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val targets = Seq("q65_token_topk", "q66_doc_chunks", "q67_tfidf_topterms",
      "q68_length_histogram", "q69_temperature_mixture", "q70_kmeans_clusters",
      "q71_quality_filter", "q72_bloom_prefilter", "q73_countmin_tokens",
      "q74_incremental_neardup", "q75_retention", "q76_signup_funnel",
      "q77_kmv_intersect")
    for (name <- targets) {
      val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      val bcasts = "BroadcastExchange".r.findAllIn(plan).length
      println(s"[plan] $name bad=${bad.mkString(",")} hashExchanges=$exchanges broadcasts=$bcasts")
      if (bad.nonEmpty) println(plan.take(4000))
    }
    spark.stop()
  }
}
