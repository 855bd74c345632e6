package graft

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only q178 number-of-record experiment (Test/runMain).
  *
  * The r7 review's question: is the 1.5–3.2× swing between the
  * driver's 66.6 s and the committed 21–44 s cold band explained by
  * SHARED-JVM HEAP HISTORY (177 queries' garbage before q178 in bench
  * order)? Protocol: run q178 cold-first, then replay the bench's
  * heavy allocators (the index carriers + the q148 PQ build), then run
  * q178 again — the delta is heap history, same plan, same data.
  *
  * Round-9 findings (SURVEY §6.11): heap history adds ~20–40%, inside
  * the box's own ±40% run-to-run band; the 66 s outlier is host-load
  * class, not plan class. A verify-wave dial (hash-partitioned
  * sequential verify) was A/B'd here and at ×10 scale in ProfileScale,
  * measured not to pay (×10: waves=4 was 1.6× SLOWER), and removed
  * from `containmentDiscover`.
  */
object ProfileQ178 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = GraftSession
      .builder(appName = "graft-q178", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Double = {
      System.gc() // the bench's own inter-query discipline
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[q178] $label: $s%.2f s (heap used ${usedGb()}%.1f GiB)")
      s
    }
    def usedGb(): Double = {
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / (1024.0 * 1024 * 1024)
    }
    def q178(): Unit =
      Dedup.containmentDiscover(Tables.documents(spark, sfDir))
        .write.format("noop").mode("overwrite").save()
    def q178Explode(): Unit =
      Dedup.containmentDiscover(Tables.documents(spark, sfDir),
        explodeVerify = true)
        .write.format("noop").mode("overwrite").save()
    def heavyHistory(): Unit =
      Seq("q27_dedup_minhash_lsh", "q48_embedding_neardup",
        "q143_classifier_weights", "q148_pq_ann", "q152_pc1_power")
        .foreach { name =>
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }

    // JVM/codegen warm-up outside the measured region (the bench's move)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // Contention scenario (SPARK_GRAFT_Q178_ONLY=1): just q178, twice —
    // run it while the BOX is loaded externally to test the host-load
    // hypothesis for the driver's 66 s number of record.
    if (sys.env.get("SPARK_GRAFT_Q178_ONLY").contains("1")) {
      time("contended (a)") { q178() }
      time("contended (b)") { q178() }
      spark.stop()
      return
    }

    // Round-12 A/B (SPARK_GRAFT_Q178_AB=1): array-shipping verify vs the
    // posting-explosion intersection, interleaved back-to-back so both
    // arms see the same box state — the judge's hypothesis is that
    // removing the ~20 GB of resident pair-arrays kills the spill noise.
    if (sys.env.get("SPARK_GRAFT_Q178_AB").contains("1")) {
      for (rep <- 1 to reps) {
        time(s"rep$rep arrays (a)") { q178() }
        time(s"rep$rep explode (a)") { q178Explode() }
        time(s"rep$rep arrays (b)") { q178() }
        time(s"rep$rep explode (b)") { q178Explode() }
      }
      spark.stop()
      return
    }

    for (rep <- 1 to reps) {
      println(s"[q178] ---- rep $rep ----")
      time(s"rep$rep cold-first") { q178() }
      time(s"rep$rep heavy-history (5 carriers)") { heavyHistory() }
      time(s"rep$rep after-history (a)") { q178() }
      time(s"rep$rep after-history (b)") { q178() }
    }
    spark.stop()
  }
}
