package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Dev-only one-decade scale experiment (Test/runMain) — the r7/r8
  * verdicts' oldest open ask: every committed number is sf0.1; this
  * runs the five headline index carriers (q27 LSH near-dup, q48
  * bucketed embedding near-dup, q143 classifier training, q148 PQ ANN,
  * q152 spectral fit) plus q178 containment discovery COLD on a
  * deterministic ×REPL (default 10) inflation of the sf0.1 fixtures,
  * so the committed record gains one measured decade instead of
  * replica extrapolation.
  *
  * Inflation is designed so per-replica work is an EXACT isomorphic
  * copy of the original and cross-replica work is nil — the honest
  * linear yardstick (ideal = ×REPL wall): sublinear means fixed costs
  * amortize; superlinear means a stage scales with a cross-record
  * structure, which is either a plan flaw or a documented dial.
  *
  * - documents ×REPL: replica r>0 shifts doc_id by r·10M and applies a
  *   per-replica CAESAR ROTATION of the a–z alphabet (the fixture text
  *   is exactly [a–z ]). A character bijection is the text analog of an
  *   isometry: word lengths, token boundaries, df STRUCTURE, and every
  *   character-n-gram equality within a replica are preserved exactly,
  *   while every letter-bearing shingle differs across replicas — so
  *   shingle/minhash/containment candidate volume scales exactly
  *   ×REPL. (A first version suffixed each WORD with `~r`; that leaves
  *   character-5-gram shingles inside words identical across replicas,
  *   and the measured q27/q178 "superlinearity" was those cross-replica
  *   candidates — an artifact of the yardstick, kept in §6.11 as a
  *   negative result.)
  * - embeddings ×REPL: replica r>0 shifts vec_id by r·10M and applies a
  *   per-replica deterministic ±1 diagonal (sign = parity of
  *   hash(dim_index, r)). A shared diagonal is an isometry — dot(S·x,
  *   S·y) = dot(x, y) — so every replica's pairwise geometry (cosines,
  *   distances, near-dup pairs) is bit-identical to the original, while
  *   cross-replica signs decorrelate (no new near-dup pairs).
  *
  * The inflated tables land as plain parquet under a scratch dir laid
  * out like a fixture dir, so each carrier runs through the REGISTERED
  * SparkEntry.queries path unchanged. q48 is additionally measured at
  * the production dial (threshold 0.9, 24 tables × 12 bits): the
  * registered 8×6 default admits ~12.5% of UNRELATED pairs as
  * candidates (documented in embeddingNearDup's scaladoc), a
  * quadratically-scaling term this run exists to expose; 24×12 is the
  * documented scale path, and ×10 is where the difference shows.
  */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "10").toInt
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale10")
    val spark = GraftSession
      .builder(appName = "graft-scale", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $label%-42s $s%8.2f s")
      s
    }

    // ---- build the inflated fixture dir (not part of the measurement) --
    // Per-replica character bijection = the text analog of an isometry
    // (see the header scaladoc). AFFINE cipher, not plain rotation: a
    // rotation has only 26 distinct bijections, so at ×30 replicas
    // 26–29 DUPLICATED replicas 0–3's whole term space and every
    // shared-term/shingle structure exploded across the colliding
    // replica pairs (q122's pair join filled the disk at ×30; q27's r9
    // ×30 point carried 4 duplicate replicas — conservative, the
    // artifact only adds candidates). σ_r(i) = a_r·i + b_r mod 26 with
    // a_r a unit mod 26 gives 12×26 = 312 distinct bijections; the
    // (a, b) pair below is injective in r for r < 156.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rotated(r: Int): String = {
      val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
      val a = units(r % units.length)
      val b = (r * 7) % 26
      (0 until 26).map(i => alpha((a * i + b) % 26)).mkString
    }
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)
    val docsN: DataFrame = (0 until repl).map { r =>
      if (r == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
        .withColumn("text", translate(col("text"), alpha, rotated(r)))
    }.reduce(_ unionAll _)
    val embsN: DataFrame = (0 until repl).map { r =>
      if (r == 0) embs
      else embs
        .withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, i) -> CASE WHEN pmod(hash(i, $r), 2) = 0 THEN x ELSE -x END)"))
    }.reduce(_ unionAll _)
    // events ×REPL: replica r>0 shifts event_id by r·10M and user_id by
    // r·17M — a MULTIPLE OF 17, so q220's derived delayed-client class
    // (user_id % 17 == 3) keeps exactly the same members per replica (a
    // 10M shift rotates the congruence class and the late set drifts ~2%
    // per decade — measured before this fix). ts stays UNCHANGED:
    // per-user structure (windows, gaps, medians) is an exact copy, and
    // since every replica carries the SAME event-time multiset, the
    // global lateness frontier each row sees equals the original's, so
    // q220's per-row flags replicate exactly (checked: ×10 late rows ==
    // 10 × the ×1 late rows)
    val evs = Tables.events(spark, sfDir)
    val evsN: DataFrame = (0 until repl).map { r =>
      if (r == 0) evs
      else evs
        .withColumn("event_id", col("event_id") + lit(r * 10000000L))
        .withColumn("user_id", col("user_id") + lit(r * 17000000L))
    }.reduce(_ unionAll _)
    // part/customer ×REPL (round-11, the linkage/l-diversity decade):
    // replica r>0 shifts keys by r·10M and TAGS the blocking attribute
    // (p_brand || "~r"), so (brand, size) blocks stay replica-disjoint
    // and within-block candidate pairs scale exactly ×REPL — the
    // isometric yardstick; per-replica γ profiles are identical, so the
    // EM scalars converge to the ×1 values while candidate volume grows
    // linearly. WITHOUT the tag every block grows ×REPL in population
    // and pairs go ×REPL² — that untagged point is measured separately
    // as the block-dial law (SURVEY §6.16); a REAL corpus sits between
    // the two depending on how brand×size cardinality grows with it.
    val prt = Tables.part(spark, sfDir)
    val prtN: DataFrame = (0 until repl).map { r =>
      if (r == 0) prt
      else prt
        .withColumn("p_partkey", col("p_partkey") + lit(r * 10000000L))
        .withColumn("p_brand", concat(col("p_brand"), lit(s"~$r")))
    }.reduce(_ unionAll _)
    val cst = Tables.customer(spark, sfDir)
    val cstN: DataFrame = (0 until repl).map { r =>
      if (r == 0) cst
      else cst.withColumn("c_custkey", col("c_custkey") + lit(r * 10000000L))
    }.reduce(_ unionAll _)
    docsN.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embsN.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    evsN.write.mode("overwrite").parquet(s"$outDir/events.parquet")
    prtN.write.mode("overwrite").parquet(s"$outDir/part.parquet")
    cstN.write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    val nd = spark.read.parquet(s"$outDir/documents.parquet").count()
    val ne = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    val nv = spark.read.parquet(s"$outDir/events.parquet").count()
    println(s"[scale] inflated fixtures at $outDir: documents=$nd embeddings=$ne events=$nv (x$repl of $sfDir)")

    // JVM/codegen warm-up outside the measured region (the bench's move)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // ---- the measured region: registered carriers, cold, bench order --
    // SPARK_GRAFT_SCALE_SKIP: comma-separated query names to leave out —
    // the ×30 run skips q178 (its verify join at 180M candidate pairs is
    // a multi-hour single-JVM stall; the ×10 point already tells its
    // scaling story) while the amortizing carriers go one step further.
    val skip = sys.env.getOrElse("SPARK_GRAFT_SCALE_SKIP", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // SPARK_GRAFT_SCALE_ONLY: dev-only allowlist (comma-separated carrier
    // names / block labels) — lets a new-query decade be measured without
    // re-running the full ~50-carrier sweep. Empty = everything.
    val only: Set[String] = sys.env.getOrElse("SPARK_GRAFT_SCALE_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    def selected(name: String): Boolean =
      (only.isEmpty || only.contains(name)) && !skip.contains(name)
    val carriers = Seq("q27_dedup_minhash_lsh", "q48_embedding_neardup",
      "q143_classifier_weights", "q148_pq_ann", "q152_pc1_power",
      "q178_containment",
      // round-9-continuation shapes: pattern scan, double histogram
      // panel, per-user medians + population cut, two-phase prefix max,
      // winsorize panel, brute-force dims-panel eval, SRM rollup,
      // frontier-chained funnel + latency panel
      "q214_filter_attrition", "q215_source_calibration",
      "q218_rate_outliers", "q220_late_arrivals",
      "q217_winsorized_stats", "q219_prefix_dim_recall",
      "q221_srm_check", "q222_conversion_latency",
      "q224_ordered_funnel",
      // round-10: the remaining top-10 bench heads that until now had
      // only round-4-era replica extrapolation — vocabulary-bounded
      // greedy rounds (set cover), the 4-stage verified capstone, the
      // per-doc bounded word graphs (TextRank), df-pruned tf-idf pair
      // scoring, and the bigram LM (vocab² driver state risk)
      "q177_set_cover", "q147_capstone_v2", "q190_textrank_keywords",
      "q106_bigram_surprisal",
      // round-10-continuation shapes: persisted KMV shards (write+read),
      // the pair-index token-map refinement, the CUPED 1-row moment
      // panel, the bucketized-CDF sampler, and the KM day-frame windows.
      // NOT here: q230/q233 read customer/part (tables this harness does
      // not inflate; both are single-agg / block-bounded shapes), q231
      // rides the fixed-kCells kNN graph (the q194/q207 IVF caveat — a
      // production run grows kCells with the corpus)
      "q228_sketch_rollup", "q229_weighted_jaccard", "q232_cuped",
      "q234_negative_sampling", "q235_survival_km",
      // round-11 inference panel representatives: the rank machinery
      // (distinct-value frame must stay BOUNDED as the corpus grows —
      // n_chars is copied unchanged per replica, so the doubled-rank
      // frame is constant-size while per-value counts grow ×REPL) and
      // the per-user change-score moment frame (users grow ×REPL)
      "q248_kruskal_wallis", "q250_did",
      // round-11-continuation shapes: the calendar-bounded prefix-fold
      // chart (daily agg grows ×REPL, the fold frame does NOT — day
      // count is fixed), the per-(type,user) dispersion moments (users
      // grow ×REPL), the QI×band EMD grid on the inflated customer, the
      // two-histogram HBOS join, and the MI micro-quant grid. NOT here:
      // q257 reads lineitem/orders (not inflated; its shape is the
      // q221-class one-scan conditional aggregate + broadcast anti-join)
      "q255_ewma_control", "q260_overdispersion", "q256_t_closeness",
      "q258_hbos_outliers", "q262_mutual_info",
      // the isotonic grid is bucket-bounded on top of q143's scoring
      // pass; the CMH rollup is strata-bounded on per-user counts; the
      // Chao sketch is a frequency-of-frequencies rollup of the token
      // count frame (grows ×REPL, all map-side combined)
      "q263_isotonic_calibration", "q264_cmh", "q265_unseen_mass",
      // the DeLong moments ride q189's distinct-score prefix machinery;
      // the permutation explode is users×64 map-side-combined (the one
      // deliberately super-linear-constant carrier — cost = 64×linear);
      // the Brier rollup rides the q263 bucket frame
      "q266_auc_delong", "q267_permutation_test",
      "q268_brier_decomposition",
      // KN rides q198's vocabulary-bounded bigram frames (+1 shuffle
      // join for continuation counts); the retention fit and median CI
      // are offset-frame / distinct-value-frame rollups
      "q269_kneser_ney", "q270_retention_fit", "q271_median_ci",
      // the persisted quantile shards (write twice + merge-serve), the
      // cell-bounded ESS rollup, and the per-(type, arm) QTE frames
      "q272_persisted_quantiles", "q273_raking_ess", "q274_qte",
      // the type-partitioned changepoint panel, the phase-frame KW, and
      // the HAC lag joins on the zero-filled day frame
      "q275_changepoint_panel", "q276_weekday_effect", "q277_newey_west",
      // the EB panel rollup (m-row ensemble moments), the MDE 1-row
      // arm-moment readout, and the support-bounded lexical JSD
      "q278_eb_shrinkage", "q279_mde", "q280_lexical_jsd",
      // the round-11 continuation block: survival day-frame (q281),
      // per-user ratio moments (q282), arm-moment TOST (q283), the
      // confusion-cell agreement scan (q284), the distinct-value Hill
      // frame (q285), the driver-bounded stationary iteration (q286),
      // and the bucket-frame WOE/IV screen (q287)
      "q281_logrank", "q282_ratio_metric", "q283_tost_equivalence",
      "q284_labeler_agreement", "q285_hill_tail", "q286_markov_stationary",
      "q287_woe_iv",
      // the stratified-ATE bucket frame and the 512-row dial grid
      // (whose only corpus input is one count)
      "q288_stratified_ate", "q289_lsh_planner",
      // LOF rides the shared cell-restricted kNN graph (fifth consumer)
      "q290_lof_outliers",
      // the RD gate audit: one range-filtered scan into 12 moments
      "q291_rd_gate_audit",
      // blocking quality: block-size frame counts, no pair materialization
      "q292_blocking_quality",
      // entropy rate: the q286 driver state + a |T|^2 projection
      "q293_markov_entropy",
      // periodogram: day-frame x 29-period grid, trig quantized
      "q294_periodogram",
      // lead-lag ccf: day-frame lag joins, exact numerators
      "q295_lead_lag",
      // seasonal decomposition: day-frame MA windows + phase frame
      "q296_seasonal_decomp",
      // burstiness: one explode into the vocabulary-bounded frame
      "q297_token_burstiness",
      // trend test, capture-recapture, NB fit: per-user scans into
      // bounded bucket / 1-row / types frames
      "q298_cochran_armitage", "q299_capture_recapture", "q300_negbin_fit")
      .filter(selected)
    carriers.foreach { name =>
      time(s"x$repl ${name}") {
        SparkEntry.queries(name)(spark, outDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // q122 at the yardstick-corrected ABSOLUTE df cap (64‰ of the BASE
    // corpus): the registered per-mille cap is corpus-relative, and the
    // replica-disjoint inflation freezes df while n_docs grows — at ×30
    // the relative cap re-admitted whole-replica-common terms (df≈5000
    // ≤ cap 9600) as "rare", and the shared-term candidate join went
    // quadratic (C(5000,2)-class pairs per replica; filled 79 GB of
    // spill). A REAL ×30 corpus grows df with n_docs, so the relative
    // cap's semantics hold there; the absolute pin is how the yardstick
    // keeps per-replica admission identical to ×1 — the same commute-
    // with-relative-thresholds lesson as the events user_id×17 shift.
    if (selected("q122_tfidf_pairs")) {
      val nBase = Tables.documents(spark, sfDir).count()
      time(s"x$repl q122 tfidf pairs (abs df cap)") {
        graft.operators.Matching.tfidfCosinePairs(
            Tables.documents(spark, outDir),
            dfCapAbsolute = Some(nBase * 64L / 1000L))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // the production near-dup dial at the decade: same recall class at
    // 0.9, ~21x lower unrelated-candidate rate, 6x the signature planes
    if (selected("q48_dial")) {
      time(s"x$repl q48 dial 24x12 @0.9") {
        Similarity.embeddingNearDup(
            Tables.embeddings(spark, outDir), threshold = 0.9, tables = 24, bits = 12)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // the linkage/l-diversity decade (round-11): blocked-pair EM fit +
    // apply on the brand-tagged part inflation (pairs scale ×REPL), the
    // customer QI rollup, and ONE untagged q233 point per run — same
    // key shift, brands NOT tagged, so every (brand, size) block grows
    // ×REPL in population and candidate pairs go ×REPL²: the measured
    // half of the block-dial law (what happens when corpus growth lands
    // in existing blocks instead of new ones)
    if (selected("linkage_scale")) {
      Seq("q233_fs_linkage", "q239_fs_matches", "q230_l_diversity").foreach { name =>
        time(s"x$repl $name") {
          SparkEntry.queries(name)(spark, outDir)
            .write.format("noop").mode("overwrite").save()
        }
      }
      // quadratic by design: untagged ×R multiplies within-block pairs
      // by R². Measured at ×3 and ×5 (pairs ×9 / ×25 — the growth law
      // shows in the ratio of the two points); at ×10 the EM M-step's
      // exact micro-unit sums exceed the multiplyExact ceiling
      // (~16M pairs × 10⁶ micro-units × 10⁶ > 2⁶³) and the round-10
      // loud-overflow guard fires — measured below as the DESIGNED
      // failure: a blocking key whose blocks grow with the corpus must
      // be re-cut (or the state widened), never silently wrapped
      if (repl == 10) {
        def untagged(r0: Int): DataFrame = (0 until r0).map { r =>
          if (r == 0) prt
          else prt.withColumn("p_partkey", col("p_partkey") + lit(r * 10000000L))
        }.reduce(_ unionAll _).localCheckpoint()
        Seq(3, 5).foreach { r0 =>
          time(s"x$r0 q233 UNTAGGED blocks (pairs x ${r0 * r0})") {
            graft.operators.Matching.fsLinkageWeights(untagged(r0))
              .write.format("noop").mode("overwrite").save()
          }
        }
        val loud = try {
          graft.operators.Matching.fsLinkageWeights(untagged(10))
            .write.format("noop").mode("overwrite").save()
          "NO OVERFLOW (unexpected)"
        } catch {
          case e: ArithmeticException => s"loud ArithmeticException: ${e.getMessage} (by design)"
        }
        println(s"[scale] x10 q233 UNTAGGED blocks -> $loud")
      }
    }
    // the kNN-graph PRODUCTION dial (round-11): the q194/q207/q231
    // family at the auto-derived kCells = max(16, ceil(sqrt(N))) — the
    // IVF contract MEASURED instead of asserted. At a fixed kCells=16
    // within-cell candidates grow (N/16)² — quadratic; at ~sqrt(N)
    // cells the total candidate volume is N·(N/kCells) ≈ N^1.5, so the
    // honest yardstick for these rows is ×REPL^1.5 (×10 → 31.6×,
    // ×30 → 164×), NOT the linear ×REPL of the isomorphic carriers:
    // kmeans cells MIX replicas (the ±1-diagonal decorrelates replicas
    // but does not separate them), so per-cell populations genuinely
    // grow with N — which is exactly the regime the dial exists for.
    if (selected("knn_autodial")) {
      val nEmb = spark.read.parquet(s"$outDir/embeddings.parquet").count()
      val kc = Similarity.kCellsFor(nEmb)
      time(s"x$repl q243 mutual kNN auto dial (kCells=$kc)") {
        SparkEntry.queries("q243_knn_autodial")(spark, outDir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"x$repl q194 label prop @auto kCells=$kc") {
        Similarity.labelPropagation(Tables.embeddings(spark, outDir))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"x$repl q231 margin pairs @auto kCells=$kc") {
        Similarity.marginScoredPairs(Tables.embeddings(spark, outDir))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"x$repl q290 LOF @auto kCells=$kc") {
        Similarity.lofOutliers(Tables.embeddings(spark, outDir))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
