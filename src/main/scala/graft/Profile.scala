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

    // cold, in bench order — mirrors what BENCH_r{N} measures; override
    // the list via SPARK_GRAFT_PROFILE_QUERIES=qA,qB to isolate a family
    val names = sys.env.get("SPARK_GRAFT_PROFILE_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("q27_dedup_minhash_lsh", "q48_embedding_neardup",
        "q53_dedup_survivors", "q83_dup_sources", "q84_curation_pipeline"))
    for (name <- names) {
      System.gc()
      // construction is INSIDE the timed region: the dedup pipelines run
      // eager localCheckpoints (and the components loop runs driver-side
      // count actions) while the DataFrame is being BUILT — timing only
      // the final action would miss most of the query, and the driver's
      // Bench times both.
      time(name)(noop(SparkEntry.queries(name)(spark, sfDir)))
    }
    spark.stop()
  }
}
