package graft

/** Dev-only per-query wall record for the round-12 sf1 sweep
  * (Test/runMain graft.ProfileSf1Walls): one cold sitting over the
  * 20 sweep heads at target/sf1eq, Bench semantics (noop sink,
  * System.gc() between queries, warm-up outside the measured region),
  * single-run (the wall column of SURVEY §6.21's table; correctness is
  * the Verify+check.py gate, not this). The REPEATABLE correctness
  * sweep at this scale is `tools/sf1gate.py` (round 13, SURVEY §7.5) —
  * this main remains for engine-wall profiling only.
  */
object ProfileSf1Walls {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1eq")
    val spark = GraftSession
      .builder(appName = "graft-sf1walls", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // SPARK_GRAFT_WALL_HEADS overrides the default sweep-head list —
    // comma-separated full names (used for new-block decade profiling)
    val heads = sys.env.get("SPARK_GRAFT_WALL_HEADS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // empty/blank override falls back to the default list
      .getOrElse(Seq(
      "q27_dedup_minhash_lsh", "q48_embedding_neardup", "q84_curation_pipeline",
      "q122_tfidf_pairs", "q139_containment_search", "q143_classifier_weights",
      "q147_capstone_v2", "q148_pq_ann", "q177_set_cover",
      "q190_textrank_keywords", "q194_label_propagation", "q207_mutual_knn",
      "q210_cluster_stability", "q228_sketch_rollup", "q231_margin_pairs",
      "q233_fs_linkage", "q243_knn_autodial", "q272_persisted_quantiles",
      "q290_lof_outliers", "q302_containment_heaps"))
    for (name <- heads) {
      System.gc()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        println(f"[sf1walls] $name FAILED: ${e.getMessage}")
      }
      println(f"[sf1walls] $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
