package graft

/** Benchmark main (driver contract): runs the query set on
  * SPARK_GRAFT_SF_DIR at local[N], prints ONE JSON line.
  *
  * Each query is forced through full evaluation with the noop sink
  * (`.count()` would let Spark skip computing projected columns).
  * Queries whose first run exceeds 5 s (except index carriers) re-run
  * twice and report the median of 3 — the `median_of_3` JSON key lists
  * them (see the trial-loop comment).
  * q26_ngram_jaccard is excluded: it is the deliberately-quadratic
  * exact-baseline for the LSH dedup path (q27 measures the scalable
  * algorithm on the same task); running an O(n^2-pairs) shingle join at
  * bench scale benchmarks the oracle, not the engine.
  * q178_containment_discover is excluded from the MEASURED vector as of
  * round 13 (it stays on the correctness board — Verify still gates it):
  * its corpus is the documented worst case for the prefix filter
  * (SURVEY 6.18/6.20 — near-identical machine-generated docs, Sdf^2
  * density that spills), so its wall measures box state (2.2x-5x
  * cross-sitting swings), not the plan. q302_containment_heaps runs the
  * IDENTICAL containmentDiscover plan on a Heaps-law corpus and holds a
  * 1.05x cross-sitting band — it is the containment bench head that
  * grades the plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(appName = "graft-bench", master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val skipped = Seq("q26_ngram_jaccard", "q178_containment")

    // Index-carrier annotation: the session-scoped materialized indexes
    // (Dedup.pairIndex; Similarity.hyperplaneIndex/embeddingPairIndex/
    // pqModel; Curation's trained classifier weights + feature frame)
    // are charged to their FIRST consumer in bench order — q27 carries
    // the document pair-index build that q53/q83/q84/q93/q108/q115/
    // q118/q120/q133/q137/q151 then ride, q48 carries the embedding
    // bucket+pair index for q95/q110, q143 carries the 4-round
    // classifier training that q144/q145/q147 score with, q148
    // carries the PQ codebook training + encoding that q149 rides,
    // q152 carries the ABTT mean/PC1 fit that q153 rides, q194
    // carries the cell-restricted kNN graph (Lloyd train + in-cell
    // top-k, session-cached since round 13) that q207/q208/q231/q290
    // ride at the shared (k=5, kCells=16) dial, and q243 carries the
    // (k=5, AutoCells) graph — it is that dial's ONLY consumer, and
    // without carrier status its >5 s first run (the build) triggers
    // median-of-3 whose warm re-runs hit the session cache at ~0.3 s,
    // hiding the build from the vector entirely. q35 carries the
    // round-14 parquet BINARY asset-store WRITE for the `bmp` kind
    // (the whole-corpus BMP encode — the one store big enough to
    // matter; q244/q306/q308 and the q310-family then scan it), the
    // WAV-kind store writes are sub-second and stay charged to their
    // first consumers (q301/q303/q305/q314) without carrier status.
    // A bench diff showing these queries above the fixed-cost floor is
    // the shared build, not a per-query regression.
    val carriers = Seq("q27_dedup_minhash_lsh", "q35_media_profile",
      "q48_embedding_neardup",
      "q143_classifier_weights", "q148_pq_ann", "q152_pc1_power",
      "q194_label_propagation", "q243_knn_autodial")

    // warm the JVM + file-index + codegen paths outside the measured region
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries("q02_total_by_nation")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    // registration (numeric qNN) order, not alphabetical: diffs line up
    // with the query numbering, and each shared index lands on its
    // lowest-numbered consumer (the `carriers` above)
    // Dev-only subset (the driver never sets it) — same contract as
    // Verify's SPARK_GRAFT_VERIFY_QUERIES: comma-separated FULL query
    // names, for delta-benching a touched family without the ~4-minute
    // full sweep. Subset runs skip the TRACKED bench/bench_last_full.json
    // below so a partial vector can never masquerade as the round's
    // record; the gitignored target/bench_last.json is written always —
    // it exists precisely to persist delta-bench vectors.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_QUERIES").map(_.split(",").map(_.trim).toSet)
    // Session-ISOLATED graded heads (round 14 — the r13 verdict's top
    // ask: q302's median spanned 4.8-13.0 s on IDENTICAL code depending
    // on what ran before it; the plan was right, the measurement
    // protocol wasn't). Every trial of a head listed here is preceded
    // by a full session-state reset: all operator session caches are
    // dropped, every persistent RDD block (the caches' localCheckpoint
    // blocks and any straggler) is unpersisted BLOCKING, and a full GC
    // runs — releasing the block-manager/heap occupancy a 300-query
    // prefix accretes, so the head measures its plan, not its
    // predecessors' leftovers. Eligibility: the head must ride NO
    // shared session artifact (q302 consumes nothing), and no LATER
    // query in bench order may ride a PRE-reset artifact (true today:
    // every cache consumer precedes q302; adding one after it requires
    // re-checking this list). Carrier-riding medianed heads (q147 on
    // q143's classifier) must stay non-isolated or they re-pay the
    // carrier's build. Measured (SURVEY 6.24): isolation collapses
    // q302's solo/subset/full-sitting spread into a single band.
    val isolated = Seq("q302_containment_heaps")
    def resetSessionState(): Unit = {
      graft.operators.Similarity.clearEmbeddingIndexCaches()
      graft.operators.Similarity.clearPqModelCache()
      graft.operators.Similarity.clearAbttModelCache()
      graft.operators.Dedup.clearPairIndexCache()
      graft.operators.Curation.clearWeightsCache()
      graft.operators.TextAnalysis.clearBpeMergeCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      // Broadcast/accumulator teardown rides the async ContextCleaner's
      // reference queue: one GC enqueues the references, a short drain
      // window lets the cleaner actually remove the blocks, and the
      // second GC collects what the removals freed. Without the drain,
      // a trial starts while the cleaner is still tearing down the
      // prefix's broadcasts on the same executors that should be
      // running the measured query.
      System.gc()
      Thread.sleep(1000)
      System.gc()
    }
    // Isolate each query from its predecessors' GC debt. Round 1 showed
    // trivial ~150k-row aggregations (q39/q40) absorbing ~19 s that
    // vanished once the heavy allocators around them (non-vectorized
    // events scans, corpus-broadcast dedup verification) were fixed —
    // cross-query heap pressure, not plan cost. A forced collection
    // between queries keeps one query's garbage out of the next
    // query's wall-clock.
    def trial(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Boolean) = {
      if (isolated.contains(name)) resetSessionState()
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Noise control on the expensive heads (round-11 measured a 2.2x
    // same-commit swing on the spill-heavy q178 — box state, not code):
    // a query whose first run exceeds 5 s re-runs twice and reports the
    // MEDIAN of 3, so round-over-round deltas on the heads mean code,
    // not page-cache luck. The fast tail stays single-run (its noise is
    // absolute-small), and index CARRIERS stay single-run too — their
    // first run charges the shared session-index build by design, and a
    // median over warm re-runs would hide exactly that cost.
    // `medianed` is only stamped when ALL THREE trials succeed (round-13
    // advice fix: two surviving samples used to pick the upper value and
    // still claim median-of-3); any failed trial lands the query in
    // `failed` so the JSON line carries the failure marker.
    val medianed = scala.collection.mutable.ListBuffer.empty[String]
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => name.drop(1).takeWhile(_.isDigit).toInt }
      .filterNot { case (name, _) => skipped.contains(name) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val (t1, ok) = trial(name, fn)
        if (!ok) failed += name
        val t =
          if (ok && t1 > 5.0 && !carriers.contains(name)) {
            val more = Seq(trial(name, fn), trial(name, fn))
            if (more.forall(_._2)) {
              medianed += name
              (t1 +: more.map(_._1)).sorted.apply(1)
            } else {
              failed += name // a re-run died: report the first run, flagged
              t1
            }
          } else t1
        name -> t
      }

    // Short per-query keys (the qNN prefix): round 3's full-name JSON line
    // (~3.5 kB) overflowed the driver's output tail buffer and the line was
    // recorded truncated ("parsed": null in BENCH_r03.json). The prefix is
    // unique per query and keeps the whole line ~1.2 kB.
    val qs = results
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val skippedJson = skipped.map(s => "\"" + s.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    val carriersJson = carriers.map(s => "\"" + s.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    val medianedJson = medianed.map(s => "\"" + s.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    val failedJson = failed.distinct.map(s => "\"" + s.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"skipped":$skippedJson,"index_carriers":$carriersJson,"median_of_3":$medianedJson,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // The artifact of record clips long stdout lines (BENCH_r07.json
    // recorded "parsed": null and lost q01–q67 from the tail window), so
    // the SAME JSON also lands in files: target/ for dev, and bench/
    // (TRACKED — target/ is gitignored, which is why the r8 full vector
    // never reached the committed record) so every round's end-of-round
    // snapshot commit carries the full per-query vector.
    try {
      for (d <- Seq("target", "bench") if d == "target" || only.isEmpty) {
        val dir = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(dir)
        val f = if (d == "bench") "bench_last_full.json" else "bench_last.json"
        java.nio.file.Files.write(dir.resolve(f), (line + "\n").getBytes("UTF-8"))
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write bench_last json: ${e.getMessage}")
    }
    spark.stop()
  }
}
