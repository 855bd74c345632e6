package graft

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only q178 number-of-record experiment (Test/runMain).
  *
  * Two questions from the r7 review (VERDICT "what's wrong" #1):
  * (1) Is the 1.5–3.2× swing between the driver's 66.6 s and the
  *     committed 21–44 s cold band explained by SHARED-JVM HEAP
  *     HISTORY (178 queries' garbage before q178 in bench order)?
  *     Protocol: run q178 cold-first, then replay the bench's heavy
  *     allocators (the index carriers + the q148 PQ build), then run
  *     q178 again — the delta is heap history, same plan, same data.
  * (2) Does the verify-wave dial (hash-partitioned sequential verify,
  *     `containmentDiscover(verifyWaves = w)`) flatten that exposure?
  *     Interleaved A/B under the same heap history.
  *
  * Every variant is the SAME logical result (spec'd); only peak live
  * array volume differs.
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
    def q178(waves: Int): Unit =
      Dedup.containmentDiscover(Tables.documents(spark, sfDir), verifyWaves = waves)
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
      time("contended waves=1 (a)") { q178(1) }
      time("contended waves=1 (b)") { q178(1) }
      spark.stop()
      return
    }

    for (rep <- 1 to reps) {
      println(s"[q178] ---- rep $rep ----")
      time(s"rep$rep cold-first waves=1") { q178(1) }
      time(s"rep$rep heavy-history (5 carriers)") { heavyHistory() }
      time(s"rep$rep after-history waves=1") { q178(1) }
      time(s"rep$rep after-history waves=4") { q178(4) }
      time(s"rep$rep after-history waves=1 again") { q178(1) }
      time(s"rep$rep after-history waves=8") { q178(8) }
    }
    spark.stop()
  }
}
