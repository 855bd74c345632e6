package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Events, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables

class PipelineSpec extends GraftSuite {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val embs = Tables.embeddings(spark, sf)

  test("minhash LSH near-dup pairs == exact all-pairs jaccard (full recall at the data's gap)") {
    val exact = Dedup.ngramJaccardPairs(docs).collect().toSeq
    val lsh   = Dedup.minhashLshPairs(docs).collect().toSeq
    assert(lsh === exact)
    assert(exact.nonEmpty, "fixture should contain planted near-duplicates")
  }

  test("near-dup survivors: exactly one survivor per cluster, reps are survivors") {
    val rows = Dedup.nearDupSurvivors(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (rep, members) =>
      assert(members.count(_._3) === 1, s"cluster $rep must have one survivor")
      assert(members.find(_._3).get._1 === rep, s"survivor must be the rep $rep")
      assert(members.map(_._1).min === rep, s"rep must be the min doc_id of cluster $rep")
    }
  }

  test("pair restriction identity: pairs(subset) == restrict(pairs(corpus), subset)") {
    // the identity q84's capstone leans on: every pair-pipeline stage is
    // per-pair-local, so recomputing LSH over a sub-corpus must equal
    // filtering the full-corpus index to pairs with both endpoints kept
    val kept = docs.filter($"doc_id" % 3 =!= 1).select($"doc_id")
    val recomputed = Dedup.minhashLshPairs(docs.join(kept, Seq("doc_id")))
      .select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val restricted = Dedup.restrictPairs(Dedup.pairIndex(docs), kept)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(restricted === recomputed)
    assert(restricted.nonEmpty, "the subset should retain at least one planted pair")
  }

  test("pair index cache: same canonical plan hits, different params miss") {
    Dedup.clearPairIndexCache()
    // two distinct DataFrame objects over the same source must share the
    // materialized index (the q27/q53/q83/q84 reuse path)...
    val a = Dedup.pairIndex(Tables.documents(spark, sf))
    val b = Dedup.pairIndex(Tables.documents(spark, sf))
    assert(a eq b, "identical corpus plan + params must return the cached frame")
    // ...while different parameters or a semantically different input miss
    val c = Dedup.pairIndex(Tables.documents(spark, sf), threshold = 0.7)
    assert(!(a eq c))
    val d = Dedup.pairIndex(Tables.documents(spark, sf).filter($"doc_id" > 10))
    assert(!(a eq d))
    // and the cached set is the verified pair set
    assert(a.select($"id1", $"id2").collect().toSet ===
      Dedup.minhashLshPairs(docs).select($"id1", $"id2").collect().toSet)
  }

  test("exact dedup collapses a self-unioned corpus: unique == n, copies == 2n") {
    // the fixture is dup-free, so duplicate collapse is proven here on a
    // synthetic doubling — the operator itself dedups whatever it is given
    val n = docs.count()
    val doubled = docs.select($"doc_id", $"text")
      .union(docs.select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val row = Dedup.exactDedup(doubled).collect()(0)
    assert(row.getLong(0) === n)      // n_unique
    assert(row.getLong(1) === 2 * n)  // n_total
    assert(row.getLong(2) === n)      // every group is a dup group
    // and on the real (dup-free) input: nothing collapses
    val clean = Dedup.exactDedup(docs).collect()(0)
    assert(clean.getLong(0) === n && clean.getLong(1) === n && clean.getLong(2) === 0L)
  }

  test("simhash signatures are deterministic and near-dups have hamming <= 1") {
    val sig1 = Dedup.simhashSignatures(docs).collect().toSet
    val sig2 = Dedup.simhashSignatures(docs).collect().toSet
    assert(sig1 === sig2)
    val pairs = Dedup.simhashPairs(docs).collect()
    assert(pairs.forall(_.getInt(2) <= 1))
    // expansion must be the native keyed expression, not interpreted HOFs
    val plan = Dedup.simhashPairs(docs).queryExecution.executedPlan.toString
    assert(plan.contains("pair_combinations_keyed"), s"native expansion missing in:\n$plan")
    assert(!plan.contains("transform("), s"interpreted HOF expansion in:\n$plan")
  }

  test("LSH ANN cos values agree with brute force on shared (query, neighbor) pairs") {
    val brute = Similarity.cosineTopK(embs, nQueries = 5, k = 500)
      .select($"query_id", $"neighbor_id", $"cos".as("cos_bf"))
    val lsh = Similarity.lshCosineTopK(embs)
    val joined = lsh.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter($"cos_bf".isNull || $"cos" =!= $"cos_bf").count() === 0)
  }

  test("IVF ANN: cos values exact on shared pairs; more probes never lower recall") {
    val brute = Similarity.cosineTopK(embs, nQueries = 5, k = 500)
      .select($"query_id", $"neighbor_id", $"cos".as("cos_bf"))
    val ivf = Similarity.ivfCosineTopK(embs)
    // every reported cosine is the exact brute-force value (IVF prunes
    // candidates, never perturbs scores)
    val joined = ivf.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter($"cos_bf".isNull || $"cos" =!= $"cos_bf").count() === 0)
    def found(nProbe: Int) =
      Similarity.ivfCosineTopK(embs, nProbe = nProbe).select($"query_id", $"neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = found(16) // probing every cell == exact top-k
    val p1 = found(1); val p2 = found(2)
    assert((exact intersect p2).size >= (exact intersect p1).size,
      "probing more cells must not lower recall")
    assert(exact === Similarity.cosineTopK(embs, nQueries = 5, k = 3)
      .select($"query_id", $"neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "all-cells IVF must equal brute force")
  }

  test("filtered IVF: all-cells == brute-force filtered top-k; predicate always holds") {
    val labels = embs.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels.values.exists(_ == 3), "fixture must contain label 3")
    // probing every cell removes the approximation: must equal the exact
    // label-constrained cosine top-3 — derived from the COMPLETE brute
    // ranking (k = corpus size), filtered to the label, re-cut at 3 per
    // query (post-filtering a short brute list would run out of matches)
    val exact = Similarity.cosineTopK(embs, nQueries = 5, k = 500)
      .join(embs.select($"vec_id".as("neighbor_id"), $"label"), Seq("neighbor_id"))
      .filter($"label" === 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos"), r.getAs[Int]("rnk")))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(_._4).take(3).map(t => (t._1, t._2, t._3)).toSeq
      }.toSet
    val allCells = Similarity.ivfFilteredTopK(embs, nProbe = 16)
      .select($"query_id", $"neighbor_id", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(allCells === exact, "all-cells filtered IVF must equal filtered brute force")
    // at the served nProbe: every hit satisfies the predicate, per-query
    // result counts never exceed k, and scores are exact cosines
    val served = Similarity.ivfFilteredTopK(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(served.nonEmpty)
    assert(served.forall { case (_, n, _) => labels(n) == 3 })
    served.groupBy(_._1).foreach { case (_, rows) => assert(rows.length <= 3) }
    assert(served.toSet.subsetOf(
      Similarity.ivfFilteredTopK(embs, nProbe = 16, k = 500).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet),
      "served hits are a subset of the exhaustive filtered ranking")
  }

  test("multi-probe LSH ANN: recall never below single-probe; planted neighbor at rank 1") {
    def found(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact  = found(Similarity.cosineTopK(embs, nQueries = 5, k = 3))
    val single = found(Similarity.lshCosineTopK(embs, maxHamming = 0))
    val multi  = found(Similarity.lshCosineTopK(embs, maxHamming = 1))
    assert(multi.size >= single.size, "probing more buckets cannot shrink the result")
    assert((exact intersect multi).size >= (exact intersect single).size,
      "multi-probe recall must not fall below single-probe")
    // a planted exact duplicate of query 0 shares its bucket in every probe
    // and must surface as the rank-1 neighbor with cos 1
    val dup = embs.filter($"vec_id" === 0).select(lit(9999L).as("vec_id"), $"embedding", $"label")
    val top = Similarity.lshCosineTopK(embs.unionByName(dup), maxHamming = 1)
      .filter($"query_id" === 0 && $"rnk" === 1).collect()
    assert(top.length === 1 && top(0).getLong(1) === 9999L &&
      math.abs(top(0).getDouble(2) - 1.0) < 1e-6)
  }

  test("embedding near-dup: LSH candidates subset of exact; planted duplicate found at 0.9") {
    // fixture embeddings are random (max cos ~0.55) => both paths empty at 0.9
    assert(Similarity.embeddingNearDupExact(embs).count() === 0)
    assert(Similarity.embeddingNearDup(embs).count() === 0)
    // at a loose threshold the LSH path must be a non-vacuous subset of the
    // exact all-pairs ground truth (recall < 1 allowed; precision exact)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = asSet(Similarity.embeddingNearDupExact(embs, threshold = 0.45))
    val lsh   = asSet(Similarity.embeddingNearDup(embs, threshold = 0.45))
    assert(lsh.subsetOf(exact))
    assert(lsh.nonEmpty, "multi-table LSH must find a non-vacuous share of loose near-dups")
    // plant an exact duplicate: identical vectors share every table's bucket,
    // so the production threshold finds it with certainty
    val dup = embs.limit(1).select(lit(9999L).as("vec_id"), $"embedding", $"label")
    val withDup = embs.unionByName(dup)
    val found = Similarity.embeddingNearDup(withDup).collect()
    assert(found.exists(r => r.getLong(1) === 9999L && math.abs(r.getDouble(2) - 1.0) < 1e-6))
    // the production operating point (24 tables x 12 bits: same 0.9-recall,
    // ~20x fewer background candidates) still finds the planted duplicate —
    // identical vectors share every table's bucket at any parameterization —
    // and stays a subset of the exact ground truth
    val tight = Similarity.embeddingNearDup(withDup, tables = 24, bits = 12).collect()
    assert(tight.exists(r => r.getLong(1) === 9999L && math.abs(r.getDouble(2) - 1.0) < 1e-6))
    val tightLoose = asSet(Similarity.embeddingNearDup(embs, threshold = 0.45, tables = 24, bits = 12))
    assert(tightLoose.subsetOf(exact))
  }

  test("productionNearDup (q226): planted twins are the whole tight-threshold truth and 24x12 recovers them all") {
    // exact all-pairs ground truth over the planted union: at tau=0.9 the
    // ONLY qualifying pairs are the nPlanted (i, i+9e7) twins — the random
    // fixture corpus contributes none (max cos ~0.55) — so the tight-dial
    // gate is non-vacuous and each truth pair sits at cos ~0.92
    val base = embs.select($"vec_id", transform($"embedding", _.cast("double")).as("embedding"))
    val union = base.unionByName(Similarity.plantedNearDupTwins(embs))
    val truth = Similarity.embeddingNearDupExact(union, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size === 100, s"planted truth must be exactly the 100 twins, got ${truth.size}")
    assert(truth.forall { case (a, b) => b === a + 90000000L },
      "no non-planted pair may reach tau=0.9 on the random fixture")
    // the production dial (24x12, tau=0.9) recovers the full truth — the
    // analytic per-pair recall at cos 0.92 is 1-(1-p^12)^24 ~ 0.99 and the
    // fixed-plane banding is deterministic, so this is a stable equality,
    // not a flaky sample: a banding regression at high table counts (the
    // correlated-plane failure mode coef's scaladoc measures) breaks it
    val got = Similarity.productionNearDup(embs).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet === truth,
      "24x12 must recover every planted pair and surface nothing else")
    assert(got.forall(_.getDouble(2) >= 0.9))
  }

  test("registered embedding near-dup and IVF plans stay equi-join — no cartesian, no nested loop") {
    // the exact ground-truth path is the only one allowed to cross the
    // corpus; every registered approximate path must stay equi-join only
    for (df <- Seq(
        Similarity.embeddingNearDup(embs, threshold = 0.45),
        Similarity.ivfCosineTopK(embs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    }
  }

  test("cosine top-k excludes self and is correctly ranked") {
    val rows = Similarity.cosineTopK(embs).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.sameElements(byRank.sorted(Ordering[Double].reverse)))
    }
  }

  test("language id emits only known codes; fingerprints are unique per distinct text") {
    val codes = TextAnalysis.langId(docs).select($"lang_guess").distinct()
      .collect().map(_.getString(0)).toSet
    assert(codes.subsetOf(Set("en", "de", "fr", "es", "und")))
    assert(TextAnalysis.fingerprints(docs).select($"fingerprint").distinct().count() === docs.count())
  }

  test("hourly agg partitions all events; sessionize covers every user") {
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val hourly = Events.hourlyAgg(ev)
    assert(hourly.agg(sum($"n")).collect()(0).getLong(0) === total)
    val sess = Events.sessionize(ev)
    assert(sess.count() === ev.select($"user_id").distinct().count())
    assert(sess.filter($"n_sessions" < 1).count() === 0)
  }

  test("BmpCodec: hand-written golden file decodes to known pixels; round-trip matches closed forms") {
    import Multimodal.BmpCodec
    // golden 2x1 24bpp BMP, byte-by-byte from the format spec (NOT from
    // the encoder): pixels (x=0)=RGB(10,20,30), (x=1)=RGB(40,50,60);
    // row stride pads 6 data bytes to 8. Pins the format against a
    // self-consistent encode/decode bug that sums alone cannot see.
    val golden: Array[Byte] = (Seq(
      'B'.toInt, 'M'.toInt, 62, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 1, 0, 0, 0, 1, 0, 24, 0, // info header (w=2, h=1)
      0, 0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      30, 20, 10, 60, 50, 40, 0, 0) map (_.toByte)).toArray // BGR + 2 pad
    assert(BmpCodec.decode(golden) === ((2, 1, 50L, 70L, 90L,
      1L * 1 * 10 + 2L * 1 * 40)))
    // encode -> decode round-trip equals the generation closed forms for
    // a sweep of asset ids (exercises every width mod-class incl. odd
    // strides, where the 4-byte row padding actually bites)
    for (d <- 0L to 47L) {
      val (w, h) = (BmpCodec.width(d), BmpCodec.height(d))
      val bytes = BmpCodec.encode(d)
      assert(bytes.length === BmpCodec.fileBytes(w, h))
      val expected = {
        var (rs, gs, bs, rw) = (0L, 0L, 0L, 0L)
        for (y <- 0 until h; x <- 0 until w) {
          rs += BmpCodec.r(d, x, y); gs += BmpCodec.g(d, x, y)
          bs += BmpCodec.b(d, x, y)
          rw += (x + 1).toLong * (y + 1) * BmpCodec.r(d, x, y)
        }
        (w, h, rs, gs, bs, rw)
      }
      assert(BmpCodec.decode(bytes) === expected, s"asset $d")
    }
    // a non-BMP payload must fail loudly, not decode garbage
    intercept[IllegalArgumentException] {
      BmpCodec.decode("not a bitmap at all".getBytes("UTF-8"))
    }
  }

  test("bmpThumbnails: decodePixels round-trips the pattern; resize equals an independent replica; thumbnail stride classes covered (q306)") {
    import Multimodal.BmpCodec
    // pixel-level decode must reproduce the generation pattern exactly
    for (d <- Seq(0L, 3L, 17L, 40L)) {
      val (w, h, px) = BmpCodec.decodePixels(BmpCodec.encode(d))
      assert((w, h) === ((BmpCodec.width(d), BmpCodec.height(d))))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y)(x) === ((BmpCodec.r(d, x, y), BmpCodec.g(d, x, y), BmpCodec.b(d, x, y))),
          s"pixel ($x,$y) of asset $d")
    }
    // the operator vs an independent closed-form replica (never through
    // the codec): thumbnail pixel (x, y) is the pattern at (2x, 2y)
    val imageIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 3 == 0).sorted
    val expected = imageIds.map { d =>
      val (w, h) = (BmpCodec.width(d), BmpCodec.height(d))
      val (wo, ho) = ((w + 1) / 2, (h + 1) / 2)
      var (rs, gs, bs, rw) = (0L, 0L, 0L, 0L)
      for (y <- 0 until ho; x <- 0 until wo) {
        rs += BmpCodec.r(d, 2 * x, 2 * y); gs += BmpCodec.g(d, 2 * x, 2 * y)
        bs += BmpCodec.b(d, 2 * x, 2 * y)
        rw += (x + 1).toLong * (y + 1) * BmpCodec.r(d, 2 * x, 2 * y)
      }
      (d, w, h, wo, ho, BmpCodec.fileBytes(wo, ho).toLong, rs, gs, bs, rw)
    }.toSeq
    val got = Multimodal.bmpThumbnails(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))).toSeq
    assert(got === expected)
    // the thumbnail widths must cover all four stride mod-4 padding
    // classes — the corner the double codec pass exists to exercise
    assert(expected.map(_._4 % 4).toSet === Set(0, 1, 2, 3))
  }

  test("bmpGrayscale equals an independent closed-form replica; histogram covers every bucket; luma coefficients are observable (q308)") {
    import Multimodal.BmpCodec
    val imageIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 3 == 0).sorted
    // independent replica straight from the generation closed forms
    // (never through the codec): integer BT.601 luma with floor division
    def lumaOf(d: Long, x: Int, y: Int): Int =
      (299 * BmpCodec.r(d, x, y) + 587 * BmpCodec.g(d, x, y) +
        114 * BmpCodec.b(d, x, y)) / 1000
    val expected = imageIds.map { d =>
      val (w, h) = (BmpCodec.width(d), BmpCodec.height(d))
      var (ls, lw) = (0L, 0L)
      val hist = new Array[Long](4)
      for (y <- 0 until h; x <- 0 until w) {
        val l = lumaOf(d, x, y)
        ls += l; lw += (x + 1).toLong * (y + 1) * l; hist(l / 64) += 1
      }
      (d, w, h, BmpCodec.fileBytes(w, h).toLong, ls, lw,
        hist(0), hist(1), hist(2), hist(3))
    }.toSeq
    val got = Multimodal.bmpGrayscale(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))).toSeq
    assert(got === expected)
    // fixture richness: the histogram must populate all four luma
    // buckets somewhere, or the distribution half of the gate is inert
    assert((0 until 4).forall(b => expected.exists { e =>
      Seq(e._7, e._8, e._9, e._10)(b) > 0L }),
      "every luma bucket must be hit by some asset")
    // the WEIGHTED luma must be observable: an equal-weight gray
    // ((r+g+b)/3) produces different sums for some asset, so a
    // coefficient bug cannot hide behind the fixture
    val equalWeight = imageIds.map { d =>
      val (w, h) = (BmpCodec.width(d), BmpCodec.height(d))
      var ls = 0L
      for (y <- 0 until h; x <- 0 until w)
        ls += (BmpCodec.r(d, x, y) + BmpCodec.g(d, x, y) + BmpCodec.b(d, x, y)) / 3
      ls
    }.toSeq
    assert(expected.map(_._5) !== equalWeight,
      "BT.601 luma sums must differ from equal-weight gray sums")
  }

  test("wavAutocorr equals an independent closed-form replica; consecutive products see permutations the moment sums cannot (q309)") {
    import Multimodal.WavCodec
    val audioIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 3 == 1).sorted
    def series(d: Long, c: Int): Array[Long] =
      Array.tabulate(WavCodec.frames(d))(i => WavCodec.sample(d, c, i).toLong)
    def acOf(s: Array[Long], lag: Int): Long =
      (lag until s.length).map(i => s(i) * s(i - lag)).sum
    val expected = audioIds.flatMap { d =>
      (0 until WavCodec.channels(d)).map { c =>
        val s = series(d, c)
        val (a0, a1, a2, a4) = (acOf(s, 0), acOf(s, 1), acOf(s, 2), acOf(s, 4))
        val best = if (a1 >= a2 && a1 >= a4) 1L else if (a2 >= a4) 2L else 4L
        (d, c, s.length, a0, a1, a2, a4, best)
      }
    }.toSeq
    val got = Multimodal.wavAutocorr(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got === expected)
    // sensitivity: the adjacent-pair-swap permutation preserves the
    // sample MULTISET (so every q301 moment sum survives it) but must
    // change ac1 somewhere — consecutive products are a strictly
    // stronger order gate (note reversal and sorting do NOT distinguish
    // these fixtures: the in-asset pattern never wraps, so the series is
    // already monotone and autocorrelation is reversal-invariant)
    val swapped = audioIds.flatMap { d =>
      (0 until WavCodec.channels(d)).map { c =>
        val s = series(d, c)
        val p = s.clone()
        var i = 0
        while (i + 1 < p.length) { val t = p(i); p(i) = p(i + 1); p(i + 1) = t; i += 2 }
        acOf(p, 1)
      }
    }.toSeq
    assert(expected.map(_._5) !== swapped,
      "pair-swap permutation must change ac1 for some channel")
  }

  test("WavCodec: hand-written golden file decodes to known samples; chunk walk skips unknown chunks; round-trip matches closed forms (q301)") {
    import Multimodal.WavCodec
    // golden mono/8kHz/2-frame s16le WAV, byte-by-byte from the RIFF
    // spec (NOT from the encoder): samples [1000, -2]. Pins tag order,
    // little-endian fields, and two's-complement sample bytes against a
    // self-consistent encode/decode bug that sums alone cannot see.
    val golden: Array[Byte] = (Seq(
      'R'.toInt, 'I'.toInt, 'F'.toInt, 'F'.toInt, 40, 0, 0, 0,
      'W'.toInt, 'A'.toInt, 'V'.toInt, 'E'.toInt,
      'f'.toInt, 'm'.toInt, 't'.toInt, ' '.toInt, 16, 0, 0, 0,
      1, 0, 1, 0, // PCM, mono
      64, 31, 0, 0, // 8000 Hz = 0x1F40 little-endian
      128, 62, 0, 0, // byte rate 16000 = 0x3E80
      2, 0, 16, 0, // block align 2, 16 bps
      'd'.toInt, 'a'.toInt, 't'.toInt, 'a'.toInt, 4, 0, 0, 0,
      232, 3, // 1000 = 0x03E8
      254, 255 // -2 = 0xFFFE
    ) map (_.toByte)).toArray
    val (gc, gsr, gn, gacc) = WavCodec.decode(golden)
    assert((gc, gsr, gn) === ((1, 8000, 2)))
    assert(gacc.toSeq === Seq((998L, 1000004L, 996L))) // Σs, Σs², Σ(i+1)s
    // encode -> decode round-trip equals the generation closed forms for
    // a sweep of asset ids (mono+stereo, every sample-rate class, every
    // frame-count residue the fixture rotation produces)
    for (d <- 0L to 63L) {
      val (ch, sr, n) = (WavCodec.channels(d), WavCodec.sampleRate(d), WavCodec.frames(d))
      val bytes = WavCodec.encode(d)
      assert(bytes.length === WavCodec.fileBytes(d))
      val expected = Array.tabulate(ch) { c =>
        var (ss, sq, ws) = (0L, 0L, 0L)
        for (i <- 0 until n) {
          val s = WavCodec.sample(d, c, i).toLong
          ss += s; sq += s * s; ws += (i + 1) * s
        }
        (ss, sq, ws)
      }
      val (dc, dsr, dn, dacc) = WavCodec.decode(bytes)
      assert((dc, dsr, dn) === ((ch, sr, n)), s"asset $d header")
      assert(dacc.toSeq === expected.toSeq, s"asset $d samples")
    }
    // the chunk walk: an unknown LIST chunk with an ODD size (the RIFF
    // pad-to-even rule) spliced before fmt must be skipped transparently
    val base = WavCodec.encode(7L)
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'h', 'e', 'l', 'l', 'o', 0) // 5 payload bytes + 1 pad
    val spliced = java.nio.ByteBuffer.allocate(base.length + list.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(base, 0, 12).put(list).put(base, 12, base.length - 12).array()
    // keep the RIFF size field honest after the splice
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, base.length - 8 + list.length)
    val viaList = WavCodec.decode(spliced)
    val direct = WavCodec.decode(base)
    assert(viaList._1 === direct._1 && viaList._2 === direct._2 &&
      viaList._3 === direct._3 && viaList._4.toSeq === direct._4.toSeq)
    // loud failures: not RIFF/WAVE, non-PCM format, unsupported depth
    intercept[IllegalArgumentException] {
      WavCodec.decode("definitely not audio".getBytes("UTF-8"))
    }
    val float32 = golden.clone(); float32(20) = 3 // format 3 = IEEE float
    intercept[IllegalArgumentException] { WavCodec.decode(float32) }
    val s24 = golden.clone(); s24(34) = 24 // 24 bps unsupported (8/16 only)
    intercept[IllegalArgumentException] { WavCodec.decode(s24) }
    // corrupt chunk sizes fail LOUDLY (round-13 advice fix): a negative
    // size used to make the walk non-advancing (infinite loop); an
    // oversized data size used to surface as a raw IndexOutOfBounds
    val negSize = golden.clone(); negSize(19) = -128 // fmt size < 0
    val e1 = intercept[IllegalArgumentException] { WavCodec.decode(negSize) }
    assert(e1.getMessage.contains("corrupt RIFF"))
    val overrun = golden.clone(); overrun(40) = 99 // data size > buffer
    val e2 = intercept[IllegalArgumentException] { WavCodec.decode(overrun) }
    assert(e2.getMessage.contains("corrupt RIFF"))
    // near-Int.MaxValue size: an Int bound check would overflow negative
    // and sneak past; the Long-arithmetic guard must still fail loudly
    val huge = golden.clone()
    huge(40) = -10; huge(41) = -1; huge(42) = -1; huge(43) = 127 // 0x7FFFFFF6
    val e3 = intercept[IllegalArgumentException] { WavCodec.decode(huge) }
    assert(e3.getMessage.contains("corrupt RIFF"))
  }

  test("WavCodec 8-bit PCM: hand-written golden file pins the UNSIGNED convention; encode8 round-trips the closed forms (q303)") {
    import Multimodal.WavCodec
    // golden mono/8kHz/3-frame 8-bit WAV, byte-by-byte from the spec:
    // stored UNSIGNED bytes [128, 255, 0] = centered samples [0, 127,
    // -128]. A signed-byte misread decodes [0, -1, 0] — caught here.
    val golden8: Array[Byte] = (Seq(
      'R'.toInt, 'I'.toInt, 'F'.toInt, 'F'.toInt, 40, 0, 0, 0,
      'W'.toInt, 'A'.toInt, 'V'.toInt, 'E'.toInt,
      'f'.toInt, 'm'.toInt, 't'.toInt, ' '.toInt, 16, 0, 0, 0,
      1, 0, 1, 0, // PCM, mono
      64, 31, 0, 0, // 8000 Hz
      64, 31, 0, 0, // byte rate = sr * 1 * 1
      1, 0, 8, 0, // block align 1, 8 bps
      'd'.toInt, 'a'.toInt, 't'.toInt, 'a'.toInt, 3, 0, 0, 0,
      128, 255, 0, 0 // three samples + RIFF pad byte (odd data size)
    ) map (_.toByte)).toArray
    val (gc, gsr, gn, gacc) = WavCodec.decode(golden8)
    assert((gc, gsr, gn) === ((1, 8000, 3)))
    // Σs = 0+127-128, Σs² = 127²+128², Σ(i+1)s = 2·127 − 3·128
    assert(gacc.toSeq === Seq((-1L, 32513L, -130L)))
    val (_, _, gbits, gsm) = WavCodec.decodeSamples(golden8)
    assert(gbits === 8)
    assert(gsm.map(_.toSeq).toSeq === Seq(Seq(0, 127, -128)))
    // encode8 -> decode round-trip equals the 8-bit generation closed
    // forms across mono/stereo and every frame-count residue class
    for (d <- 0L to 63L) {
      val (ch, n) = (WavCodec.channels(d), WavCodec.frames8(d))
      val bytes = WavCodec.encode8(d)
      assert(bytes.length === WavCodec.fileBytes8(d))
      val expected = Array.tabulate(ch) { c =>
        var (ss, sq, ws) = (0L, 0L, 0L)
        for (i <- 0 until n) {
          val s = (WavCodec.sample8u(d, c, i) - 128).toLong
          ss += s; sq += s * s; ws += (i + 1) * s
        }
        (ss, sq, ws)
      }
      val (dc, dsr, dn, dacc) = WavCodec.decode(bytes)
      assert((dc, dsr, dn) === ((ch, WavCodec.sampleRate8(d), n)), s"asset $d header")
      assert(dacc.toSeq === expected.toSeq, s"asset $d samples")
    }
  }

  test("WavCodec quad-channel: hand-written 4-channel golden file pins the interleave; encode4 round-trips the closed forms (q314)") {
    import Multimodal.WavCodec
    // golden 4-channel/8kHz/2-frame s16le WAV, byte-by-byte from the
    // spec: frames [[1,-1,2,-2],[3,-3,4,-4]] — block-align 8, byte rate
    // 64000. A stereo-striding reader decodes ch0 = [1,2] instead of
    // [1,3]; a channel-order bug permutes the per-channel sums.
    val golden4: Array[Byte] = (Seq(
      'R'.toInt, 'I'.toInt, 'F'.toInt, 'F'.toInt, 52, 0, 0, 0,
      'W'.toInt, 'A'.toInt, 'V'.toInt, 'E'.toInt,
      'f'.toInt, 'm'.toInt, 't'.toInt, ' '.toInt, 16, 0, 0, 0,
      1, 0, 4, 0, // PCM, 4 channels
      64, 31, 0, 0, // 8000 Hz
      0, 250, 0, 0, // byte rate 64000 = 0xFA00
      8, 0, 16, 0, // block align 8, 16 bps
      'd'.toInt, 'a'.toInt, 't'.toInt, 'a'.toInt, 16, 0, 0, 0,
      1, 0, 255, 255, 2, 0, 254, 255, // frame 0: [1, -1, 2, -2]
      3, 0, 253, 255, 4, 0, 252, 255 // frame 1: [3, -3, 4, -4]
    ) map (_.toByte)).toArray
    val (gc, gsr, gn, gacc) = WavCodec.decode(golden4)
    assert((gc, gsr, gn) === ((4, 8000, 2)))
    assert(gacc.toSeq === Seq((4L, 10L, 7L), (-4L, 10L, -7L),
      (6L, 20L, 10L), (-6L, 20L, -10L)))
    // encode4 -> decode round-trip equals the closed forms for a sweep
    // of asset ids (every sample-rate class and frame-count residue)
    for (d <- 0L to 63L) {
      val n = WavCodec.frames4(d)
      val bytes = WavCodec.encode4(d)
      assert(bytes.length === WavCodec.fileBytes4(d))
      val expected = Array.tabulate(4) { c =>
        var (ss, sq, ws) = (0L, 0L, 0L)
        for (i <- 0 until n) {
          val s = WavCodec.sample(d, c, i).toLong
          ss += s; sq += s * s; ws += (i + 1) * s
        }
        (ss, sq, ws)
      }
      val (dc, dsr, dn, dacc) = WavCodec.decode(bytes)
      assert((dc, dsr, dn) === ((4, WavCodec.sampleRate(d), n)), s"asset $d header")
      assert(dacc.toSeq === expected.toSeq, s"asset $d samples")
    }
  }

  test("wavResample equals an independent decimation replica; a truncate bug is distinguishable (q307)") {
    import Multimodal.WavCodec
    val audioIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 3 == 1).sorted
    // independent replica straight from the generation closed forms at
    // i = 2j (never through the codec)
    val expected = audioIds.flatMap { d =>
      val ch = WavCodec.channels(d); val sr = WavCodec.sampleRate(d)
      val n = WavCodec.frames(d); val no = (n + 1) / 2
      (0 until ch).map { c =>
        var (ss, sq, ws) = (0L, 0L, 0L)
        for (j <- 0 until no) {
          val s = WavCodec.sample(d, c, 2 * j).toLong
          ss += s; sq += s * s; ws += (j + 1) * s
        }
        (d, sr, sr / 2, n, no, (44 + ch * 2 * no).toLong, c, ss, sq, ws)
      }
    }.toSeq
    val got = Multimodal.wavResample(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getLong(5), r.getInt(6), r.getLong(7), r.getLong(8), r.getLong(9))).toSeq
    assert(got === expected)
    // sensitivity: taking the FIRST ceil(n/2) frames (the truncate bug)
    // preserves frame count and byte length but must break the sums for
    // some channel — decimation SELECTION is observable, not just shape
    val truncated = audioIds.flatMap { d =>
      val ch = WavCodec.channels(d); val n = WavCodec.frames(d); val no = (n + 1) / 2
      (0 until ch).map { c =>
        var (ss, sq, ws) = (0L, 0L, 0L)
        for (j <- 0 until no) {
          val s = WavCodec.sample(d, c, j).toLong
          ss += s; sq += s * s; ws += (j + 1) * s
        }
        (ss, sq, ws)
      }
    }.toSeq
    assert(expected.map(e => (e._8, e._9, e._10)) !== truncated,
      "decimated sums must differ from truncated-prefix sums")
  }

  test("wavSilenceRuns equals an independent closed-form replay; burst fixture is segmentation-rich (q305)") {
    import Multimodal.WavCodec
    val audioIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 3 == 1).sorted
    // independent replay: runs computed from the GENERATION closed forms
    // (never through encode/decode), run-splitting by scanning the series
    val expected = audioIds.flatMap { d =>
      val ch = WavCodec.channels(d); val n = WavCodec.framesBurst(d)
      (0 until ch).map { c =>
        val s = (0 until n).map(i => WavCodec.sampleBurst(d, c, i))
        val quiet = s.map(v => math.abs(v) <= 128)
        val runs = scala.collection.mutable.ArrayBuffer.empty[Int]
        var cur = 0
        quiet.foreach { q => if (q) cur += 1 else { if (cur > 0) runs += cur; cur = 0 } }
        if (cur > 0) runs += cur
        (d, c, n, quiet.count(identity).toLong, runs.length.toLong,
          if (runs.isEmpty) 0L else runs.max.toLong,
          quiet.indexOf(true).toLong) // -1 when none, like the operator
      }
    }.toSeq
    val got = Multimodal.wavSilenceRuns(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // fixture richness: segmentation must be non-trivial — multiple runs
    // per channel somewhere, AND at least one channel where the run count
    // differs from the naive quiet-block count (a zero sample inside a
    // loud block merges or splits runs; an envelope-assuming segmenter
    // would get these wrong)
    assert(expected.exists(_._5 >= 3L), "some channel must have >= 3 runs")
    val naiveBlocks = expected.map { case (d, c, n, _, _, _, _) =>
      (0 until n).count(i => (i / 16 + c + d) % 2 == 0 && i % 16 == 0).toLong }
    assert(expected.map(_._5) !== naiveBlocks,
      "run counts must not equal the quiet-block count everywhere")
  }

  test("q48 oracle forms: any-table OR-join candidates == unnest (table,bucket) equi-join candidates") {
    // The round-13 oracle rewrite replaced the all-pairs
    // `vec_id < AND (bk0=bk0 OR ... OR bk7=bk7)` join with an unnested
    // (table, bucket) equi-join + DISTINCT (SimilarityQueries q48/q226)
    // because DuckDB nested-loops the OR shape at sf1eq scale. The two
    // RELATIONAL forms are equivalent for any bucket assignment; this
    // pins that over the engine's own buckets on the fixture corpus, so
    // the oracle swap is covered by an in-repo gate (the DuckDB-side
    // old==new run at sf0.01/sf0.1 is recorded in SURVEY 6.22).
    val e = embs.select($"vec_id", col("embedding").cast("array<double>").as("v"))
    val withBks = e.select(($"vec_id" +:
      (0 until Similarity.NeardupTables).map(t =>
        Similarity.neardupBucket($"v", t).as(s"bk$t"))): _*)
    val orJoin = withBks.as("a").join(withBks.as("b"),
        col("a.vec_id") < col("b.vec_id") &&
          (0 until Similarity.NeardupTables)
            .map(t => col(s"a.bk$t") === col(s"b.bk$t")).reduce(_ || _))
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kb = Similarity.hyperplaneBucketRows(embs)
    val equiJoin = kb.as("a").join(kb.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(orJoin === equiJoin)
    assert(orJoin.nonEmpty)
  }

  test("wavPcm8Features + wavDynamics equal their in-JVM replicas over the audio rotation (q303/q304)") {
    import Multimodal.WavCodec
    val audioIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 3 == 1).sorted
    // q303: decode(encode8) features vs the closed forms
    val got8 = Multimodal.wavPcm8Features(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4),
        r.getInt(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getDouble(9)))
    val exp8 = audioIds.flatMap { d =>
      val (ch, sr, n, acc) = WavCodec.decode(WavCodec.encode8(d))
      acc.zipWithIndex.map { case ((ss, sq, ws), c) =>
        val rms = java.math.BigDecimal.valueOf(math.sqrt(sq.toDouble / n))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        (d, ch, sr, n, WavCodec.fileBytes8(d).toLong, c, ss, sq, ws, rms)
      }
    }
    assert(got8.toSeq === exp8.toSeq)
    // q304: series-derived dynamics vs a direct per-sample replay
    val gotDyn = Multimodal.wavDynamics(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7)))
    val expDyn = audioIds.flatMap { d =>
      val ch = WavCodec.channels(d); val n = WavCodec.frames(d)
      (0 until ch).map { c =>
        val s = (0 until n).map(i => WavCodec.sample(d, c, i))
        val zcr = (1 until n).count(i => (s(i) >= 0) != (s(i - 1) >= 0)).toLong
        val sq = s.map(v => v.toLong * v.toLong).sum
        val peak = math.max(math.abs(s.min.toLong), math.abs(s.max.toLong))
        val crest = java.math.BigDecimal.valueOf(
            peak.toDouble / math.sqrt(sq.toDouble / n))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        (d, c, n, zcr, s.min.toLong, s.max.toLong,
          s.map(v => math.abs(v.toLong)).sum, crest)
      }
    }
    assert(gotDyn.toSeq === expDyn.toSeq)
  }

  test("wavChannelFeatures equals the in-JVM replica over the audio rotation (q301)") {
    import Multimodal.WavCodec
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 3 == 1).sorted
    val expected = ids.flatMap { d =>
      val (ch, sr, n, acc) = WavCodec.decode(WavCodec.encode(d))
      acc.zipWithIndex.map { case ((ss, sq, ws), c) =>
        val rms = java.math.BigDecimal.valueOf(math.sqrt(sq.toDouble / n))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        (d, ch, sr, n, WavCodec.fileBytes(d).toLong, c, ss, sq, ws, rms)
      }
    }.toSeq
    val got = Multimodal.wavChannelFeatures(docs).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4),
        r.getInt(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getDouble(9))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // stereo assets contribute exactly two channel rows, mono one
    val byAsset = got.groupBy(_._1)
    byAsset.foreach { case (d, rows) =>
      assert(rows.length === WavCodec.channels(d), s"asset $d channel rows")
    }
  }

  test("multimodal: batched decode serves real header fields for every asset") {
    import Multimodal.BmpCodec
    val decoded = Multimodal.decodeBatched(Multimodal.bmpAssets(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(decoded.length === docs.count())
    decoded.foreach { case (id, nb, w, h) =>
      assert((w, h) === ((BmpCodec.width(id), BmpCodec.height(id))), s"asset $id")
      assert(nb === BmpCodec.fileBytes(w, h).toLong)
    }
  }

  test("neymanAllocation equals the in-JVM survey computation; budget is exactly spent") {
    import graft.operators.{Sampling, TextAnalysis}
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def round0(x: Double): Long =
      java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val nTotal = 200
    val perDoc = docs.select(col("lang"), col("doc_id"),
        round(TextAnalysis.qualityCol(col("text")) * 1e4, 0).cast("long").as("qm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byStr = perDoc.groupBy(_._1)
    val stats = byStr.map { case (s, rows) =>
      val n = rows.length.toLong
      val s1 = rows.map(_._3).sum; val s2 = rows.map(x => x._3 * x._3).sum
      val sd = if (n > 1) math.sqrt((n * s2 - s1 * s1).toDouble / (n * (n - 1))) else 0.0
      (s, n, sd, round0(n * sd))
    }.toSeq.sortBy(_._1)
    val wTot = stats.map(_._4).sum
    val qs = stats.map { case (s, n, sd, wm) =>
      val q = (nTotal.toLong * wm).toDouble / wTot
      (s, n, sd, q, math.floor(q).toLong)
    }
    val rem = nTotal - qs.map(_._5).sum
    val extras = qs.sortBy { case (s, _, _, q, b) => (-(q - b), s) }
      .take(rem.toInt).map(_._1).toSet
    val expected = qs.map { case (s, n, sd, _, b) =>
      val alloc = math.min(n, b + (if (extras(s)) 1L else 0L))
      val drawnQm = byStr(s).map(t => (t._2, t._3))
        .sortBy { case (id, _) => (md5hex(id.toString), id) }.take(alloc.toInt)
      (s, n, round6(sd), alloc, alloc,
        round6(drawnQm.map(_._2).sum.toDouble / drawnQm.length / 10000.0))
    }
    val got = Sampling.neymanAllocation(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    assert(got.map(_._4).sum === nTotal.toLong,
      "with no stratum capped the budget must be spent exactly")
    got.foreach { case (s, n, sd, alloc, drawn, _) =>
      assert(alloc <= n && drawn === alloc, s)
      assert(sd > 0.0, s"$s: the fixture strata all carry quality variance")
    }
  }

  test("sampling: fixed-size strata, growth-stable split, packing conserves tokens") {
    import graft.operators.Sampling
    // stratified: at most 20 per stratum, deterministic across runs
    val s1 = Sampling.stratifiedSample(docs).collect().map(r => (r.getString(0), r.getLong(1)))
    val s2 = Sampling.stratifiedSample(docs).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(s1.sameElements(s2))
    assert(s1.groupBy(_._1).forall(_._2.length <= 20))
    // split: a doc's assignment is unchanged when the corpus shrinks (hash
    // range, not rate) — totals over a half-corpus agree with recomputing
    val half = docs.filter($"doc_id" % 2 === 0)
    val full = Sampling.trainTestSplit(docs)
    val sub  = Sampling.trainTestSplit(half)
    // both must show both splits and the sub-corpus counts can't exceed full
    val fullMap = full.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val subMap  = sub.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fullMap.keySet === Set("train", "test"))
    subMap.foreach { case (k, v) => assert(v <= fullMap(k)) }
    // packing: token totals conserved; two-phase prefix sum == naive window
    val packed = Sampling.packByTokenOffset(docs)
    val corpusTokens = docs.select(sum(size(split($"text", " ")).cast("bigint")))
      .collect()(0).getLong(0)
    assert(packed.agg(sum($"total_tokens")).collect()(0).getLong(0) === corpusTokens)
    import org.apache.spark.sql.expressions.Window
    val naive = docs
      .select($"doc_id", size(split($"text", " ")).cast("bigint").as("tok"))
      .withColumn("off", sum($"tok").over(
        Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"tok")
      .select(expr("off div 2048").as("bin"), $"tok")
      .groupBy($"bin").agg(count(lit(1)).as("n_docs"), sum($"tok").as("total_tokens"))
      .orderBy($"bin")
    assert(packed.collect().map(_.toSeq).toSeq === naive.collect().map(_.toSeq).toSeq)
  }

  test("frameDedup equals a brute-force frame-checksum count with min keeper") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val frames = texts.flatMap { case (id, t) =>
      val n = math.max(t.length / 64, 1)
      (0 until n).map(i =>
        (id, i.toLong, md5hex(t.substring(i * 64, math.min(i * 64 + 64, t.length)))))
    }
    val expected = frames.groupBy(_._3).filter(_._2.length > 1).map { case (fc, g) =>
      val keeper = g.map(f => (f._1, f._2)).min
      fc -> ((g.length.toLong, g.map(_._1).distinct.length.toLong, keeper._1, keeper._2))
    }
    val got = Multimodal.frameDedup(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    assert(got.nonEmpty, "the repetitive fixture text should duplicate some frames")
  }

  test("multimodal: every doc becomes an asset; frame sampling is deterministic") {
    val profile = Multimodal.mediaProfile(docs)
    assert(profile.agg(sum($"n_assets")).collect()(0).getLong(0) === docs.count())
    val f1 = Multimodal.frameSample(docs).collect().toSeq
    val f2 = Multimodal.frameSample(docs).collect().toSeq
    assert(f1 === f2 && f1.nonEmpty)
  }

  test("incremental embedding near-dup == full near-dup restricted to the ingest boundary") {
    import graft.operators.Similarity
    val cut = 200L
    val full = Similarity.embeddingNearDup(embs, threshold = 0.45).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val restricted = full.filter { case ((a, b), _) => (a < cut) != (b < cut) }
      .map { case ((a, b), c) => ((math.min(a, b), math.max(a, b)), c) }
    val inc = Similarity.incrementalEmbeddingNearDup(embs, newIdCut = cut, threshold = 0.45)
      .collect()
      .map(r => ((math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))), r.getDouble(2))).toMap
    assert(inc === restricted)
  }

  test("embedding index caches: same canonical plan hits, params miss; probe == from-scratch") {
    import graft.operators.Similarity
    Similarity.clearEmbeddingIndexCaches()
    // two distinct DataFrame objects over the same source share the
    // materialized bucket index and pair index (the q48/q95/q110 reuse path)
    val a = Similarity.hyperplaneIndex(Tables.embeddings(spark, sf))
    val b = Similarity.hyperplaneIndex(Tables.embeddings(spark, sf))
    assert(a eq b, "identical corpus plan + params must return the cached frame")
    val c = Similarity.hyperplaneIndex(Tables.embeddings(spark, sf), tables = 24, bits = 12)
    assert(!(a eq c))
    val p1 = Similarity.embeddingPairIndex(Tables.embeddings(spark, sf), 0.45)
    val p2 = Similarity.embeddingPairIndex(Tables.embeddings(spark, sf), 0.45)
    assert(p1 eq p2)
    assert(!(p1 eq Similarity.embeddingPairIndex(Tables.embeddings(spark, sf), 0.5)))
    // restriction identity behind q95's index probe: bucketing is per-row
    // local, so bucket rows of a filtered corpus == filtered index rows
    val cut = 200L
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(
      asSet(Similarity.hyperplaneBucketRows(embs.filter($"vec_id" >= cut))
        .select($"vec_id", $"t".cast("int"), $"bk")) ===
      asSet(a.filter($"vec_id" >= cut).select($"vec_id", $"t".cast("int"), $"bk")))
    // and the cached pair set IS the verified pair set the listing reports
    assert(p1.select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Similarity.embeddingNearDup(embs, threshold = 0.45)
        .select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // the round-13 kNN-graph cache: same (corpus plan, k, dial) hits —
    // q194/q207/q208/q231/q290 share ONE Lloyd train + in-cell top-k;
    // a different k or resolved cell count builds fresh. AutoCells and
    // its explicit resolution share a key (both resolve to kCellsFor(n)).
    val g1 = Similarity.cellKnnGraph(Tables.embeddings(spark, sf), 5, 16)
    val g2 = Similarity.cellKnnGraph(Tables.embeddings(spark, sf), 5, 16)
    assert(g1 eq g2, "identical corpus plan + (k, kCells) must return the cached graph")
    assert(!(g1 eq Similarity.cellKnnGraph(Tables.embeddings(spark, sf), 4, 16)))
    val n = Tables.embeddings(spark, sf).count()
    val auto = Similarity.cellKnnGraph(Tables.embeddings(spark, sf), 5, Similarity.AutoCells)
    assert(auto eq Similarity.cellKnnGraph(Tables.embeddings(spark, sf), 5, Similarity.kCellsFor(n)))
  }

  test("persisted hyperplane index: probing the parquet read-back == session-index path") {
    import graft.operators.Similarity
    val cut = 200L
    // q95's registered shape against the session cache
    val viaSession = Similarity
      .incrementalEmbeddingNearDup(embs, newIdCut = cut, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // production incremental ingest for vectors: the index is WRITTEN
    // once as a parquet table and every ingest job probes the read-back
    // — the vector twin of the q128 sketch-store round-trip. Bucketing
    // is deterministic per row, so the round-trip must be bit-for-bit.
    val dir = java.nio.file.Files.createTempDirectory("graft_emb_index").toString + "/index"
    Similarity.hyperplaneBucketRows(embs).write.mode("overwrite").parquet(dir)
    val viaStore = Similarity
      .incrementalEmbeddingNearDupFromIndex(embs, spark.read.parquet(dir),
        newIdCut = cut, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaStore === viaSession)
    assert(viaStore.nonEmpty, "the fixture should have pairs straddling the boundary")
  }

  test("event-type reconciliation exercises all three full-outer branches") {
    val rows = graft.operators.Extended.eventTypeReconciliation(Tables.events(spark, sf))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byStatus = rows.groupBy(_._2)
    assert(byStatus("catalog_only").map(_._1).toSet === Set("refund"))
    assert(byStatus("catalog_only").forall(_._3 === 0L))
    assert(byStatus("stream_only").map(_._1).toSet === Set("error"))
    assert(byStatus("stream_only").forall(_._3 > 0L))
    assert(byStatus("matched").map(_._1).toSet ===
      Set("click", "purchase", "signup", "view"))
    // every stream event is accounted for exactly once
    assert(rows.map(_._3).sum === Tables.events(spark, sf).count())
  }

  test("quantized ANN: int8 grid is well-formed and recall survives quantization") {
    import graft.operators.Similarity
    val rows = Similarity.quantizedAnnRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 5)
    // int8 quantization at these dims barely perturbs cosine order — the
    // report should show at most one lost neighbor per query
    rows.foreach { case (q, _, recall) => assert(recall >= 2.0 / 3.0 - 1e-9, s"query $q") }
    // the quantized vectors really live on the int8 grid: whole numbers
    // in [-127, 127] with the max-magnitude slot hitting ±127
    val grid = embs.select($"vec_id",
      transform($"embedding", _.cast("double")).as("v"))
      .withColumn("m", aggregate($"v", lit(0.0), (a, x) => greatest(a, abs(x))))
      .withColumn("qv", transform($"v", x => (x * 127.0 / $"m").cast("long")))
      .select(array_max(transform($"qv", q => abs(q))).as("peak"))
      .collect().map(_.getLong(0))
    assert(grid.forall(_ === 127L))
  }

  test("PQ ANN: deterministic, well-formed recall report, codes compress the corpus") {
    import graft.operators.Similarity
    Similarity.clearPqModelCache()
    val r1 = Similarity.pqAnnRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // cache cleared between runs: the SECOND run retrains from scratch,
    // so this asserts training determinism, not cache identity
    Similarity.clearPqModelCache()
    val r2 = Similarity.pqAnnRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1 === r2, "training + ADC ranking must be exactly reproducible")
    assert(r1.map(_._1).toSeq === (0L until 5L))
    r1.foreach { case (q, hit, recall) =>
      assert(hit >= 0L && hit <= 3L, s"query $q")
      assert(math.abs(recall - hit / 3.0) < 1e-6 + 1e-9)
    }
    // the ADC-shortlist + exact-re-rank ranking carries real signal on
    // the fixture: PQ at m=8 x 16 codes with a 50-candidate shortlist
    // must beat an uninformed ranking overall (an uninformed top-3 draw
    // from ~500 candidates has expected recall ~ 0.006, i.e. ~0/15 hits)
    assert(r1.map(_._2).sum >= 5L,
      s"PQ shortlist ranking lost nearly all signal: ${r1.mkString(", ")}")
  }

  test("IVF-PQ: probing all cells equals the full PQ scan bit-for-bit") {
    import graft.operators.Similarity
    val all = Similarity.ivfPqAnnRecall(embs, nCentroids = 16, nProbe = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val full = Similarity.pqAnnRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(all === full,
      "with every cell probed, IVF pruning must vanish and leave the PQ ranking")
  }

  test("IVF-PQ: pruned probe is deterministic and keeps most of the PQ recall") {
    import graft.operators.Similarity
    val r1 = Similarity.ivfPqAnnRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val r2 = Similarity.ivfPqAnnRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1 === r2)
    assert(r1.map(_._1).toSeq === (0L until 5L))
    r1.foreach { case (q, hit, recall) =>
      assert(hit >= 0L && hit <= 3L, s"query $q")
      assert(math.abs(recall - hit / 3.0) < 1e-6 + 1e-9)
    }
    // 4/16 cells scanned: recall can only lose truth neighbors whose
    // cell went unprobed; on the fixture the probed quarter of the
    // corpus must retain clear signal vs an uninformed draw (~0/15)
    assert(r1.map(_._2).sum >= 4L,
      s"cell pruning destroyed the ranking: ${r1.mkString(", ")}")
  }

  test("persisted PQ/IVF-PQ index: parquet serving == session cache, bit-for-bit") {
    import graft.operators.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("pq_idx").toString
    Similarity.writePqIndex(embs, tmp)
    val pqSession = Similarity.pqAnnRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pqServed = Similarity.pqAnnRecallFromIndex(embs, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pqServed === pqSession,
      "ADC ranking from parquet codebooks+codes must equal the session path")
    val ivfSession = Similarity.ivfPqAnnRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ivfServed = Similarity.ivfPqAnnRecallFromIndex(embs, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivfServed === ivfSession,
      "cell-pruned serving from parquet centroids+lists must equal the session path")
    // the bundle really is the compressed form: the stored code table is
    // m single-byte codes per vector, not d floats
    val nVec = embs.count()
    val nCodes = spark.read.parquet(s"$tmp/codes").count()
    assert(nCodes === nVec * 8)
  }

  test("annRecall agrees with a manual truth-vs-approx set comparison") {
    val truth = Similarity.cosineTopK(embs, nQueries = 5, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshCosineTopK(embs, nQueries = 5, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = truth.groupBy(_._1).map { case (q, ts) =>
      q -> ts.count(approx.contains).toLong
    }
    val got = Similarity.annRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === (0L until 5L))
    got.foreach { case (q, hit, recall) =>
      assert(hit === expected(q), s"query $q")
      assert(hit >= 0L && hit <= 3L)
      assert(math.abs(recall - hit / 3.0) < 1e-6 + 1e-9)
    }
  }

  test("incremental near-dup equals the full LSH pairs restricted to the boundary") {
    import org.apache.spark.sql.functions.col
    val full = graft.operators.Dedup.minhashLshPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = full.filter { case (id1, id2, _) => id1 < 100 && id2 >= 100 }
      .sortBy(r => (r._1, r._2))
    val got = graft.operators.Dedup.incrementalNearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected.toSeq)
    assert(got.nonEmpty, "fixture must contain cross-boundary near-dups")
    assert(got.forall { case (n, o, _) => n < 100 && o >= 100 })
  }

  test("retention cohorts: offset-0 cells partition the user base; cells never grow") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val events = Tables.events(spark, sf)
    val rows = graft.operators.Events.retentionCohorts(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nUsers = events.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(rows.filter(_._2 == 0L).map(_._3).sum === nUsers,
      "every user appears in exactly one cohort at offset 0")
    val day0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (c, _, n) =>
      assert(n <= day0(c), "no retention cell can exceed its cohort size")
    }
  }

  test("VectorSum UDAF: equals per-dimension sums and is partition-invariant") {
    import org.apache.spark.sql.functions._
    val vecSum = udaf(new graft.functions.Aggregators.VectorSum)
    val base = embs.select(col("label"), transform(col("embedding"), _.cast("double")).as("v"))
    def sums(parts: Int): Map[Int, Seq[Double]] = base.repartition(parts)
      .groupBy(col("label")).agg(vecSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).map(x => math.round(x * 1e6) / 1e6))
      .toMap
    val expected = base
      .select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos")).agg(sum(col("col")).as("s"))
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(r => math.round(r.getDouble(2) * 1e6) / 1e6).toSeq
      }
    assert(sums(1) === expected)
    assert(sums(13) === expected)
  }

  test("kmeans: deterministic, partitions the corpus, at most k clusters") {
    val r1 = graft.operators.Similarity.kmeansClusters(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val r2 = graft.operators.Similarity.kmeansClusters(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1 === r2, "two runs must agree exactly")
    assert(r1.map(_._2).sum === embs.count(), "every vector assigned once")
    assert(r1.length <= 16 && r1.nonEmpty)
    assert(r1.forall { case (_, _, c) => c >= -1.0001 && c <= 1.0001 })
  }

  test("hardNegatives: brute-force band ranking; no near-dup ever mined as a negative") {
    import graft.operators.Similarity
    def round6d(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val vecs = embs.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.filter(_._1 < 5).flatMap { case (aid, av) =>
      vecs.filter(_._1 != aid)
        .map { case (nid, v) => (nid, round6d(cos(av, v))) }
        .filter { case (_, c) => c >= 0.2 && c < 0.45 }
        .sortBy { case (nid, c) => (-c, nid) }.take(5).zipWithIndex
        .map { case ((nid, c), i) => (aid, nid, c, i + 1) }
    }.toSeq.sortBy(t => (t._1, t._4))
    val got = Similarity.hardNegatives(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "the band must be populated on the fixture")
    assert(got.forall(_._3 < 0.45), "a mined negative at/above tau would be a latent positive")
  }

  test("semanticDedup: droppee rule on constructed cells; report laws + truth bound on fixture") {
    import spark.implicits._
    import graft.operators.Similarity
    // constructed cells: cluster 0 holds an identical pair (1,2) and an
    // orthogonal vector 3; cluster 1 holds vectors identical to cluster
    // 0's — cross-CLUSTER dups must NOT drop (the SemDeDup trade)
    val a = Seq(
      (1L, Array(1.0, 0.0), 0L), (2L, Array(1.0, 0.0), 0L), (3L, Array(0.0, 1.0), 0L),
      (4L, Array(1.0, 0.0), 1L), (5L, Array(0.0, 1.0), 1L)
    ).toDF("vec_id", "v", "cid")
    val dropped = Similarity.semanticDroppees(a, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped === Set((0L, 2L)),
      "only the higher-id member of the same-cell duplicate pair drops")
    // fixture report: members partition the corpus, droppees are bounded by
    // the exact all-pairs truth at the same tau (cluster blocking can only
    // MISS pairs, never invent them)
    val rep = Similarity.semanticDedup(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rep.map(_._2).sum === embs.count())
    val truthDroppees = Similarity.embeddingNearDupExact(embs, 0.45).collect()
      .map(_.getLong(1)).toSet
    assert(rep.map(_._3).sum <= truthDroppees.size)
    assert(rep.map(_._3).sum > 0, "the fixture's planted near-dups must surface")
    rep.foreach { case (_, m, d, f) =>
      assert(d <= m)
      assert(f === BigDecimal(d.toDouble / m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // never a cartesian: the self-join is an equi-join on the cluster key
    val plan = Similarity.semanticDedup(embs).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"cluster self-join must stay keyed:\n$plan")
  }

  test("kmeans parallel init: same clustering laws as coreset, cohesion not worse") {
    import graft.operators.Similarity
    val p1 = Similarity.kmeansClusters(embs, init = "parallel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val p2 = Similarity.kmeansClusters(embs, init = "parallel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(p1 === p2, "k-means|| seeding must be deterministic end to end")
    assert(p1.map(_._2).sum === embs.count(), "every vector assigned once")
    assert(p1.length <= 16 && p1.nonEmpty)
    assert(p1.forall { case (_, _, c) => c >= -1.0001 && c <= 1.0001 })
    // the cost-weighted draw should seed at least as well as the uniform
    // coreset on the size-weighted mean member cosine
    def meanCohesion(rows: Array[(Long, Long, Double)]): Double =
      rows.map { case (_, n, c) => n * c }.sum / rows.map(_._2).sum
    val coreset = Similarity.kmeansClusters(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(meanCohesion(p1) >= meanCohesion(coreset) - 0.02,
      s"parallel-init cohesion ${meanCohesion(p1)} far below coreset ${meanCohesion(coreset)}")
  }

  test("facilityLocationSelect equals the full in-JVM greedy replication; gains diminish") {
    import graft.operators.Similarity
    def round6d(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = embs.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    // md5 coreset init, then 2 Lloyd rounds of (round6(-cos), cid)-argmin
    // assignment + rounded per-dimension mean updates — the engine's
    // training replicated from scratch
    var cents = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(16).sortBy(_._1).map { case (id, v) => (id, v.clone()) }
    def assignAll(): Map[Long, Seq[Array[Double]]] =
      vecs.toSeq.groupBy { case (_, v) =>
        cents.minBy { case (cid, cv) => (round6d(-cos(v, cv)), cid) }._1
      }.map { case (cid, rows) => cid -> rows.map(_._2) }
    for (_ <- 1 to 2) {
      val byCell = assignAll()
      cents = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(members) =>
            (cid, old.indices.map(i =>
              round6d(members.map(_(i)).sum / members.size)).toArray)
          case None => (cid, old)
        }
      }
    }
    val w: Map[Long, Long] = assignAll().map { case (c, m) => c -> m.size.toLong }
    def simM(a: Array[Double], b: Array[Double]): Long =
      java.math.BigDecimal.valueOf(cos(a, b) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue() + 1000000L
    val sm = (for { (ca, va) <- cents; (cb, vb) <- cents }
      yield (ca, cb) -> simM(va, vb)).toMap
    val cids = cents.map(_._1)
    var bestLvl = cids.map(_ -> 0L).toMap
    var coverage = 0L
    var remaining = cids.toVector
    val expected = (1 to 5).map { r =>
      val (cand, gain) = remaining.map { s =>
        (s, cids.map(c => w.getOrElse(c, 0L) * math.max(sm((c, s)) - bestLvl(c), 0L)).sum)
      }.maxBy { case (s, g) => (g, -s) }
      coverage += gain
      bestLvl = cids.map(c => c -> math.max(bestLvl(c), sm((c, cand)))).toMap
      remaining = remaining.filterNot(_ == cand)
      (r, cand, gain, coverage)
    }
    val got = Similarity.facilityLocationSelect(embs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // structural laws: submodularity (gains never increase down the
    // rounds), coverage is the exact gain prefix sum, selections distinct
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "greedy facility-location gains must be non-increasing")
    assert(got.map(_._2).distinct.size === got.size)
    got.foldLeft(0L) { case (acc, (_, _, g, cov)) =>
      assert(cov === acc + g); cov
    }
    assert(got.head._3 > 0L, "the first selection must cover something")
  }

  test("qualityFilter matches a brute-force percentile computation") {
    import org.apache.spark.sql.functions._
    val quality = docs
      .select(col("lang"), graft.operators.TextAnalysis.qualityCol(col("text")).as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val expected = quality.map { case (lang, rows) =>
      val vs = rows.map(_._2).sorted
      val pos = 0.1 * (vs.length - 1)
      val l = pos.toInt
      val cut = if (l + 1 < vs.length) vs(l) + (pos - l) * (vs(l + 1) - vs(l)) else vs(l)
      (lang, (round4(cut), vs.length.toLong, vs.count(_ >= cut).toLong))
    }
    val got = graft.operators.TextAnalysis.qualityFilter(docs).collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    got.values.foreach { case (_, total, kept) =>
      assert(kept >= (total * 0.85).toLong, "p10 cut should keep ~90%")
    }
  }

  test("tokenBins two-level prefix sum == naive global running sum at any bucket width") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Sampling
    val naive = docs
      .select($"doc_id", size(split($"text", " ")).cast("bigint").as("tok"))
      .withColumn("off", sum($"tok").over(Window.orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"tok")
      .select($"doc_id", $"tok", expr("off div 2048").as("bin"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // small widths force many ranges AND many super-ranges (the fixture
    // fits inside one default-width bucket, which would leave the
    // second level untested)
    for (bw <- Seq(4L, 57L, 1024L)) {
      val got = Sampling.tokenBins(docs, 2048L, bw)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got === naive, s"bucketWidth=$bw")
    }
  }

  test("exactQuantileByGroup == sort-based percentile bit-for-bit; no percentile planned") {
    import graft.operators.Scale
    val scored = docs.select($"lang", TextAnalysis.qualityCol($"text").as("quality"))
    val viaSort = scored.groupBy($"lang")
      .agg(expr("percentile(quality, 0.1)").as("cut"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val viaHist = Scale.exactQuantileByGroup(scored, "lang", "quality", 0.1)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(viaHist === viaSort) // identical doubles, not merely close
    // interpolation corners: duplicates, exact-hit positions, q at 0 and 1
    val vals = Seq(5.0, 1.0, 3.0, 3.0, 3.0, 2.0, 8.0, 1.0, 13.0)
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val syn = vals.map(("g", _)).toDF("g", "v")
    for (q <- Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val expected = syn.groupBy($"g").agg(expr(s"percentile(v, $q)"))
        .collect()(0).getDouble(1)
      val got = Scale.exactQuantileByGroup(syn, "g", "v", q).collect()(0).getDouble(1)
      assert(got === expected, s"q=$q")
    }
    // null values are skipped exactly like percentile's
    val withNulls = Seq[(String, java.lang.Double)](
      ("g", 5.0), ("g", null), ("g", 1.0), ("g", null), ("g", 3.0), ("g", 2.0))
      .toDF("g", "v")
    val nullExpected = withNulls.groupBy($"g").agg(expr("percentile(v, 0.25)"))
      .collect()(0).getDouble(1)
    val nullGot = graft.operators.Scale.exactQuantileByGroup(withNulls, "g", "v", 0.25)
      .collect()(0).getDouble(1)
    assert(nullGot === nullExpected)
    // the registered quality-cut paths must not plan the sort-based aggregate
    for (df <- Seq(TextAnalysis.qualityFilter(docs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("percentile"), s"sort-based percentile in:\n$plan")
    }
  }

  test("exactQuantilesByGroup: a whole quantile panel from one histogram == per-q percentile") {
    import graft.operators.Scale
    val qs = Seq(0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95)
    val scored = docs.select($"lang", TextAnalysis.qualityCol($"text").as("quality"))
    val got = Scale.exactQuantilesByGroup(scored, "lang", "quality", qs)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    val expected = qs.flatMap { q =>
      scored.groupBy($"lang").agg(expr(s"percentile(quality, $q)"))
        .collect().map(r => ((r.getString(0), q), r.getDouble(1)))
    }.toMap
    assert(got === expected) // identical doubles across the whole panel
    // the pivoted panel carries the same cuts under the caller's names
    val wide = Scale.quantilePanel(scored, "lang", "quality",
        qs.map(q => q -> s"p$q"))
      .collect().flatMap { r =>
        qs.zipWithIndex.map { case (q, i) => ((r.getString(0), q), r.getDouble(i + 1)) }
      }.toMap
    assert(wide === expected)
    // one (group, value) histogram aggregate feeds every quantile: the
    // optimized plan must scan the corpus exactly once, however many
    // quantiles the panel asks for
    val plan = Scale.exactQuantilesByGroup(scored, "lang", "quality", qs)
      .queryExecution.optimizedPlan.toString
    val scans = "(?i)parquet".r.findAllIn(plan).size
    assert(scans <= 1, s"quantile panel must not rescan the corpus per quantile:\n$plan")
  }

  test("prefixDimRecall: full-width truncation is the identity; distortion shrinks with width") {
    import graft.operators.Similarity
    val rows = Similarity.prefixDimRecall(embs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length === 15, "3 widths x 5 queries")
    // distortion orders the widths even when recall is chance-level
    val errByDim = rows.map(r => (r._1, r._5)).distinct.sortBy(_._1)
    assert(errByDim.map(_._2).sliding(2).forall(p => p.head >= p.last),
      s"avg distortion must shrink as the prefix widens: $errByDim")
    rows.foreach { case (_, _, nHit, recall, avgE, maxE) =>
      assert(nHit >= 0L && nHit <= 3L && recall >= 0.0 && recall <= 1.0)
      assert(avgE <= maxE)
    }
    // truncating at the full width reproduces the truth ranking exactly
    val full = Similarity.prefixDimRecall(embs, dims = Seq(64)).collect()
      .map(r => (r.getLong(2), r.getDouble(4), r.getDouble(5)))
    assert(full.forall { case (nHit, avgE, maxE) =>
      nHit === 3L && avgE === 0.0 && maxE === 0.0
    }, s"dims=64 must be the identity: ${full.toSeq}")
  }

  test("decimalTotals: exact total invariant under partitioning; health covers corpus") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf)
    def totals(parts: Int): Seq[(String, Double)] =
      graft.operators.Relational.decimalTotals(li.repartition(parts)).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    // decimal summation is order-invariant EXACT — identical under any layout
    assert(totals(1) === totals(17))
    val health = graft.operators.Similarity.embeddingHealth(Tables.embeddings(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(health.map(_._2).sum === Tables.embeddings(spark, sf).count())
    health.foreach { case (dim, _, zero, nan) =>
      assert(dim > 0 && zero === 0L && nan === 0L, "fixture vectors must be healthy")
    }
  }

  test("embeddingHealth: null slots are skipped in the norm, not poisoning it") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(0L, Seq[java.lang.Float](3.0f, 4.0f)),
      Row(1L, Seq[java.lang.Float](null, 3.0f, 4.0f)),
      Row(2L, Seq[java.lang.Float](null, null, null)))
    val df = spark.createDataFrame(rows, schema)
    val got = graft.operators.Similarity.embeddingHealth(df).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5), r.getDouble(7))))
      .toMap
    // dim 2: the clean vector, norm 5. dim 3: one vector whose null slot is
    // SKIPPED (norm over the non-null elements = 5 — DuckDB's list_sum
    // semantics) and one all-null vector with no defined norm (excluded
    // from the min/avg/max like the oracle's NULL, but still counted).
    assert(got(2L) === ((1L, 0L, 0L, 5.0, 5.0)))
    assert(got(3L) === ((2L, 0L, 2L, 5.0, 5.0)))
  }

  test("cluster-aware split: no near-dup pair straddles train/test; totals partition") {
    import graft.operators.Sampling
    // the law q57's per-doc rule cannot satisfy: both ends of every
    // near-dup pair must land in the same split
    def splitOf(rep: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(rep.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      if (md.substring(0, 2) < "0d") "test" else "train"
    }
    val comps = Dedup.nearDupSurvivors(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = Dedup.minhashLshPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(splitOf(comps(a)) === splitOf(comps(b)), s"pair ($a,$b) straddles splits")
    }
    // and the report partitions the corpus
    val rows = Sampling.clusterAwareSplit(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.values.sum === docs.count())
  }

  test("quantile sketch: bottom-k sample merges associatively; estimates are ordered") {
    val events = Tables.events(spark, sf)
    // merge law, driver-replicated: per type, bottom-k by md5 of the whole
    // stream == bottom-k of (bottom-k of evens ++ bottom-k of odds) — the
    // property that lets partial sketches combine across shards/days
    val hashed = events
      .select($"event_type", $"event_id", md5($"event_id".cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val k = 256
    def bottomK(rows: Seq[(Long, String)]): Seq[(Long, String)] =
      rows.sortBy { case (id, h) => (h, id) }.take(k)
    hashed.groupBy(_._1).foreach { case (_, rows) =>
      val all = rows.map(r => (r._2, r._3)).toSeq
      val (evens, odds) = all.partition(_._1 % 2 == 0)
      assert(bottomK(all) === bottomK(bottomK(evens) ++ bottomK(odds)))
    }
    // and the reported estimates are sane: sample quantiles are ordered
    // and bracketed by the type's exact value range
    val bounds = events.groupBy($"event_type")
      .agg(min(round($"value", 2)).as("lo"), max(round($"value", 2)).as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val sk = Events.quantileSketch(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(sk.nonEmpty)
    sk.foreach { case (t, n, p50, p90) =>
      val (lo, hi) = bounds(t)
      assert(n > 0 && p50 <= p90 && p50 >= lo - 1e-9 && p90 <= hi + 1e-9, s"type $t")
    }
  }

  test("latestByUser: equals the window formulation without planning a window") {
    import org.apache.spark.sql.functions.{col, desc, row_number}
    import org.apache.spark.sql.expressions.Window
    val events = Tables.events(spark, sf)
    val got = graft.operators.Events.latestByUser(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val w = Window.partitionBy(col("user_id")).orderBy(desc("ts"), desc("event_id"))
    val expected = events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.expr("ts div 1000000000").as("e"))
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the compaction claim: a single partial+final aggregate, no window sort
    val plan = graft.operators.Events.latestByUser(events).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"latest-wins must not plan a window:\n$plan")
    assert(plan.contains("partial_max"), s"expected map-side combine in:\n$plan")
  }

  test("valueAnomalies matches a brute-force exact-integer trailing-window check") {
    import org.apache.spark.sql.functions.col
    val events = Tables.events(spark, sf)
    val rows = events.select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v * 100).setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val horizon = 24L * 3600L * 1000000000L
    val expected = rows.groupBy(_._2).values.flatMap { g =>
      g.map { case (id, _, t, v) =>
        val prior = g.filter(e => e._3 >= t - horizon && e._3 <= t - 1).map(e => cents(e._4))
        (id, prior)
      }.collect { case (id, prior) if prior.length >= 5 =>
        val x = BigInt(cents(rows.find(_._1 == id).get._4))
        val n = BigInt(prior.length)
        val s = BigInt(prior.map(BigInt(_)).sum.toString)
        val q = prior.map(c => BigInt(c) * BigInt(c)).sum
        val d = x * n - s
        (id, d * d * (n - 1) > 4 * n * (n * q - s * s))
      }.collect { case (id, true) => id }
    }.toSet
    val got = graft.operators.Events.valueAnomalies(events).collect()
      .map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("valueZscore: per-type z has mean ~0, sd ~1, and row count is preserved") {
    val ev = Tables.events(spark, sf)
    val z = Events.valueZscore(ev)
    assert(z.count() === ev.count())
    val stats = z.groupBy($"event_type")
      .agg(avg($"z").as("m"), stddev_samp($"z").as("s")).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-3, s"${r.getString(0)} mean ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-3, s"${r.getString(0)} sd ${r.getDouble(2)}")
    }
  }

  test("bigramSurprisal equals a brute-force add-one bigram LM scorer") {
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val fixture = docs.select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq)).toSeq
    val allBigrams = fixture.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
    val cb = allBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cu = allBigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = fixture.flatMap(_._2).distinct.size.toLong
    val expected = fixture
      .filter(_._2.length >= 2)
      .map { case (id, ts) =>
        val bs = ts.zip(ts.drop(1))
        val units = bs.map { b =>
          val p = (cb(b) + 1.0) / (cu(b._1) + v)
          math.round(-math.log(p) / math.log(2.0) * 1e6)
        }.sum
        (id, bs.size.toLong, round4(units.toDouble / bs.size / 1e6))
      }
      .sortBy { case (id, _, bits) => (-bits, id) }
      .take(30)
    val got = TextAnalysis.bigramSurprisal(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    assert(got.size === 30)
  }

  test("qualityCanonical: one keeper per cluster, argmax quality with min-id tiebreak") {
    val quality = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = Dedup.nearDupSurvivors(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rows = Dedup.qualityCanonical(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getDouble(4)))
    assert(rows.map(r => (r._1, r._2)).sorted === members.sorted,
      "canonicalization covers exactly the q53 membership")
    rows.groupBy(_._2).foreach { case (rep, ms) =>
      val bestId = ms.map(_._1).minBy(id => (-quality(id), id))
      assert(ms.forall(_._3 == bestId), s"cluster $rep canonical must be $bestId")
      assert(ms.count(_._4) === 1, s"cluster $rep must keep exactly one member")
      assert(ms.find(_._4).get._1 === bestId)
      ms.foreach(m => assert(m._5 === quality(bestId)))
    }
    // the policy must actually differ from min-id somewhere on the fixture,
    // otherwise the test is vacuous
    assert(rows.exists(r => r._4 && r._1 != r._2),
      "fixture should contain a cluster whose best member is not the min id")
  }

  test("contrastivePairs: positives are the near-dup pairs, negatives banded top-k per anchor") {
    val rows = graft.operators.Similarity.contrastivePairs(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val pos = rows.filter(_._3 == 1)
    val neg = rows.filter(_._3 == 0)
    assert(pos.nonEmpty, "fixture must contain near-dup positives")
    assert(neg.nonEmpty)
    // positives == the registered near-dup pair set, both directions
    val lshPairs = graft.operators.Similarity.embeddingNearDup(embs, threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expectedPos = lshPairs.flatMap { case (a, b, c) => Seq((a, b, 1, c), (b, a, 1, c)) }
    assert(pos.toSet === expectedPos.toSet)
    // no false positives vs the exact all-pairs truth
    val exact = graft.operators.Similarity.embeddingNearDupExact(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pos.foreach { case (a, b, _, _) =>
      assert(exact.contains((math.min(a, b), math.max(a, b))), s"($a,$b) not a true near-dup")
    }
    // negatives: band, k-cap, anchors drawn from the positive set
    val posAnchors = pos.map(_._1).toSet
    neg.groupBy(_._1).foreach { case (anchor, ns) =>
      assert(posAnchors.contains(anchor))
      assert(ns.length <= 5)
      ns.foreach { case (_, _, _, c) => assert(c >= 0.2 && c < 0.45) }
    }
    // brute-force check of one anchor's negative ranking
    val vecs = embs.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      java.math.BigDecimal.valueOf(r).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val anchor = posAnchors.min
    val expectedNeg = vecs.keys.filter(_ != anchor).toSeq
      .map(id => (id, cos(vecs(anchor), vecs(id))))
      .filter { case (_, c) => c >= 0.2 && c < 0.45 }
      .sortBy { case (id, c) => (-c, id) }.take(5)
      .map { case (id, c) => (anchor, id, 0, c) }
    assert(neg.filter(_._1 == anchor).sortBy(r => (-r._4, r._2)).toSeq === expectedNeg)
  }

  test("knnLabelEval equals a brute-force kNN majority vote over the anchor sample") {
    def round(x: Double, s: Int): Double =
      java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val vecs = embs.select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray)).toSeq
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      round(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)), 6)
    }
    val anchors = vecs.groupBy(_._2).toSeq.flatMap { case (_, vs) =>
      vs.sortBy(v => (md5hex(v._1.toString), v._1)).take(8)
    }
    val expected = anchors.map { case (aid, albl, av) =>
      val nn = vecs.filter(_._1 != aid)
        .map { case (id, lbl, v) => (id, lbl, cos(av, v)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(5)
      val pred = nn.groupBy(_._2).toSeq
        .map { case (lbl, g) => (lbl, g.size) }
        .minBy { case (lbl, c) => (-c, lbl) }._1
      (albl, pred == albl)
    }.groupBy(_._1).map { case (lbl, rs) =>
      lbl.toLong -> ((rs.size.toLong, rs.count(_._2).toLong,
        round(rs.count(_._2).toDouble / rs.size, 4)))
    }
    val got = graft.operators.Similarity.knnLabelEval(embs).collect()
      .map(r => r.getInt(0).toLong -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === anchors.size.toLong)
  }

  test("projectionDistortion equals a brute-force JL check; distortion is sane") {
    def round(x: Double, s: Int): Double =
      java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def coef(j: Int, i: Int): Double =
      (((j + 1).toLong * (i + 17) * 104729L + j * 7919L) % 2001L - 1000L) / 1000.0
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      round(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)), 6)
    }
    val vecs = embs.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val sample = vecs.sortBy(v => (md5hex(v._1.toString), v._1)).take(32)
    def proj(v: Array[Double]): Array[Double] =
      (0 until 32).map(j => v.zipWithIndex.map { case (x, i) => x * coef(j, i + 1) }.sum)
        .toArray
    val d6s = for {
      (ida, va) <- sample; (idb, vb) <- sample if ida < idb
    } yield math.round(math.abs(cos(va, vb) - cos(proj(va), proj(vb))) * 1e6)
    val expected = (d6s.size.toLong,
      round(d6s.sum.toDouble / d6s.size / 1e6, 4), round(d6s.max.toDouble / 1e6, 4))
    val got = graft.operators.Similarity.projectionDistortion(embs).collect()(0)
    assert((got.getLong(0), got.getDouble(1), got.getDouble(2)) === expected)
    assert(got.getLong(0) === 32L * 31 / 2)
    // JL sanity: a 64->32 projection with decorrelated planes sits at the
    // ~1/sqrt(k) rate (~0.13 measured; 0.2 is the generous ceiling)
    assert(got.getDouble(1) < 0.2, s"avg distortion ${got.getDouble(1)} implausibly high")
  }

  test("projectedAnnRecall equals brute-force project-overfetch-rerank; recall is useful") {
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def coef(j: Int, i: Int): Double =
      (((j + 1).toLong * (i + 17) * 104729L + j * 7919L) % 2001L - 1000L) / 1000.0
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      round6(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val vecs = embs.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    def proj(v: Array[Double]): Array[Double] =
      (0 until 32).map(j => v.zipWithIndex.map { case (x, i) => x * coef(j, i + 1) }.sum)
        .toArray
    val projected = vecs.map { case (id, v) => (id, v, proj(v)) }
    val expected = (0L until 5L).map { q =>
      val (_, qv, qpv) = projected.find(_._1 == q).get
      val others = projected.filter(_._1 != q)
      val truth = others.map { case (id, v, _) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
      val cands = others.map { case (id, v, pv) => (id, v, cos(qpv, pv)) }
        .sortBy { case (id, _, pc) => (-pc, id) }.take(9)
      val approx = cands.map { case (id, v, _) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
      val hit = truth.intersect(approx).size.toLong
      (q, hit, round6(hit / 3.0))
    }
    val got = graft.operators.Similarity.projectedAnnRecall(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    // the over-fetch dial must buy recall (isotropic fixture vectors are
    // JL's adversarial case — margins ~0.01 cosine — so absolute recall
    // at 3x is low by design; the CONTRACT is that widening the dial
    // monotonically recovers the exact top-k)
    val wide = graft.operators.Similarity.projectedAnnRecall(embs, overfetch = 25)
      .collect().map(_.getLong(1)).sum
    assert(wide > got.map(_._2).sum, s"overfetch 25x ($wide) must beat 3x")
    assert(wide >= 10L, s"recall at 25x too low: $wide/15")
  }

  test("thresholdSweep: counts are monotone and equal per-threshold filters of the pair set") {
    val pairs = Dedup.minhashLshPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = graft.operators.Dedup.thresholdSweep(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1) === Seq(0.6, 0.7, 0.8, 0.9))
    got.foreach { case (t, np, ndocs) =>
      val f = pairs.filter(_._3 >= t)
      assert(np === f.size.toLong, s"pairs at $t")
      assert(ndocs === f.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong, s"docs at $t")
    }
    // monotone nonincreasing in the threshold
    got.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 >= b._2 && a._3 >= b._3)
      case _ =>
    }
    assert(got.head._2 > 0, "sweep must be non-vacuous at the design point")
  }

  test("clusterSizeDistribution equals the survivors rollup and conserves members") {
    val members = Dedup.nearDupSurvivors(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = members.groupBy(_._2).values.map(_.size).toSeq
      .groupBy(identity).map { case (sz, cs) =>
        sz.toLong -> ((cs.size.toLong, (sz * cs.size).toLong)) }
    val got = Dedup.clusterSizeDistribution(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(got.values.map(_._2).sum === members.size.toLong, "docs must be conserved")
    assert(got.keys.min >= 2L, "a near-dup cluster has at least 2 members")
  }

  test("containmentRefine: exact set arithmetic per pair; containment bounds jaccard") {
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def shingles(text: String): Set[String] =
      (if (text.length < 5) Seq(text) else text.sliding(5).toSeq).toSet
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.minhashLshPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = Dedup.containmentRefine(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq === pairs,
      "refinement covers exactly the verified pair set")
    got.foreach { case (id1, id2, j, c, sr) =>
      val (a, b) = (shingles(texts(id1)), shingles(texts(id2)))
      val i = a.intersect(b).size
      assert(c === round6(i.toDouble / math.min(a.size, b.size)), s"containment ($id1,$id2)")
      assert(sr === round6(math.min(a.size, b.size).toDouble / math.max(a.size, b.size)))
      assert(c >= j, "containment always dominates jaccard")
      assert(c <= 1.0 && sr <= 1.0)
    }
    assert(got.nonEmpty)
  }

  test("weightedJaccardRefine: exact multiset arithmetic per pair; bounded by 1") {
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def tf(id: Long): Map[String, Long] =
      texts(id).split(" ", -1).groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
    val pairs = Dedup.minhashLshPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = Dedup.weightedJaccardRefine(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) === pairs,
      "refinement covers exactly the verified pair set")
    got.foreach { case (id1, id2, _, wj) =>
      val (a, b) = (tf(id1), tf(id2))
      val smin = a.keysIterator.map(t => math.min(a(t), b.getOrElse(t, 0L))).sum
      val smax = a.values.sum + b.values.sum - smin
      assert(wj === round6(smin.toDouble / smax), s"w_jaccard ($id1,$id2)")
      assert(wj >= 0.0 && wj <= 1.0)
    }
    assert(got.nonEmpty)
    // the multiset score must differ from the set score somewhere — the
    // refinement carries information, not a copy of the jaccard column
    assert(got.exists { case (_, _, j, wj) => wj != j })
  }

  test("lengthProfile equals brute-force interpolated quantiles per source") {
    def round2(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
    val lens = docs.select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toDouble)).toSeq
    def qc(sorted: Seq[Double], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      if (lo == hi) sorted(lo) else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
    }
    val expected = lens.groupBy(_._1).map { case (src, rs) =>
      val s = rs.map(_._2).sorted
      src -> ((rs.size.toLong, round2(qc(s, 0.25)), round2(qc(s, 0.5)),
        round2(qc(s, 0.75)), round2(qc(s, 0.95))))
    }
    val got = TextAnalysis.lengthProfile(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got === expected)
    got.values.foreach { case (_, p25, p50, p75, p95) =>
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
    }
  }

  test("langIdConfusion: cells partition the corpus; shares sum to 1 per truth lang") {
    val preds = TextAnalysis.langId(docs).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val expected = preds.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TextAnalysis.langIdConfusion(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(got.map { case (k, (n, _)) => k -> n }.toMap === expected)
    assert(got.map(_._2._1).sum === preds.size)
    got.groupBy(_._1._1).foreach { case (lang, cells) =>
      val tot = cells.map(_._2._1).sum
      cells.foreach { case ((_, guess), (n, share)) =>
        val exp = java.math.BigDecimal.valueOf(n.toDouble / tot)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        assert(share === exp, s"($lang,$guess) share")
      }
    }
  }

  // ---- q152/q153 spectral family: independent in-memory reference ------

  /** Exact-integer reference of the ABTT model + projections, computed
    * from collected rows with plain Scala loops — guards the Spark
    * moment pass, the driver iteration, and the projection pass.
    */
  private lazy val abttRef: (Array[Long], Long, Long, Array[(Long, Int, Long, Long)]) = {
    def hu(x: Double, s: Int) = graft.functions.Rounding.halfUp(x, s)
    val rows = embs.select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val dim = rows.head._2.length
    val xm = rows.map { case (_, v, _) => v.map(x => hu(x.toDouble * 1000000.0, 0).toLong) }
    val n = xm.length.toLong
    val s = Array.tabulate(dim)(i => xm.map(_(i)).sum)
    val mu = s.map(si => hu(si.toDouble / n, 0).toLong)
    val cx = xm.map(v => Array.tabulate(dim)(i => v(i) - mu(i)))
    val g = Array.tabulate(dim, dim)((i, j) => cx.map(v => v(i) * v(j)).sum)
    val gm = math.max(
      (for { i <- 0 until dim; j <- 0 until dim } yield math.abs(g(i)(j))).max, 1L).toDouble
    val gn = Array.tabulate(dim, dim)((i, j) => hu(g(i)(j).toDouble * 1000000.0 / gm, 0).toLong)
    var v = Array.fill(dim)(hu(1000000.0 / math.sqrt(dim.toDouble), 0).toLong)
    for (_ <- 1 to 8) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => gn(i)(j) * v(j)).sum)
      val mx = math.max(w.map(math.abs).max, 1L).toDouble
      v = w.map(x => hu(x.toDouble * 1000000.0 / mx, 0).toLong)
    }
    val lead = (0 until dim).minBy(i => (-math.abs(v(i)), i))
    val vs = v.map(_ * (if (v(lead) < 0) -1L else 1L))
    val vn2 = vs.map(x => x * x).sum
    val trace = (0 until dim).map(i => g(i)(i)).sum
    val projs = rows.zip(cx).map { case ((id, _, label), c) =>
      val t = (0 until dim).map(i => c(i) * vs(i)).sum
      val tm = hu(t.toDouble / 1000000.0, 0).toLong
      val cd2 = c.map(x => x * x).sum
      (id, label, tm, cd2)
    }
    (vs, vn2, trace, projs)
  }

  test("pc1 power: loadings and explained ratio equal the in-memory exact-integer reference") {
    def hu(x: Double, s: Int) = graft.functions.Rounding.halfUp(x, s)
    val (vs, vn2, trace, projs) = abttRef
    val s2 = projs.map { case (_, _, tm, _) => tm * tm }.sum
    val expRatio = hu(s2.toDouble * 1e12 / vn2 / trace, 6)
    val got = Similarity.pc1Power(embs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length === vs.length)
    got.foreach { case (dim, loading, ratio) =>
      assert(loading === hu(vs(dim.toInt).toDouble / 1000000.0, 6), s"loading dim $dim")
      assert(ratio === expRatio)
    }
    // inf-norm normalization + sign law: some loading is exactly +1.0
    assert(got.map(_._2).max === 1.0)
    assert(expRatio > 0.0 && expRatio <= 1.0)
    // ScatterMoments partition invariance: a different layout (different
    // canonical plan → fresh fit, no cache hit) must produce the exact
    // same integer moments and hence bit-identical loadings
    val got7 = Similarity.pc1Power(embs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got7.toSeq === got.toSeq)
  }

  test("abtt outliers: top-N by exact |projection|, brute-force values, cache-riding repeat") {
    def hu(x: Double, s: Int) = graft.functions.Rounding.halfUp(x, s)
    val (_, vn2, _, projs) = abttRef
    val top = projs.sortBy { case (id, _, tm, _) => (-math.abs(tm), id) }.take(10)
    val expected = top.zipWithIndex.map { case ((id, label, tm, cd2), i) =>
      val proj = hu(tm.toDouble / math.sqrt(vn2.toDouble), 6)
      val resid = hu(math.max(0.0, 1.0 - (tm * tm).toDouble * 1e12 / vn2 / cd2), 6)
      (id, label, proj, resid, i + 1)
    }.toSeq
    val got = Similarity.abttOutliers(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toSeq
    assert(got === expected)
    assert(Similarity.abttOutliers(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toSeq === expected)
  }

  test("heavy hitters: MG two-pass == exact brute force; superset guarantee; partition-invariant") {
    val k = 49
    val toks = docs.select(explode(split($"text", " ")).as("token"))
    val n = toks.count()
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("n_tok"))
      .filter($"n_tok" * (k + 1) > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

    val got = TextAnalysis.heavyHitters(docs, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._2)).toMap === exact)
    assert(got.forall(_._3 === n))
    // ranked by count desc then token
    assert(got.sortBy(t => (-t._2, t._1)).toSeq === got.toSeq)
    assert(got.nonEmpty, "fixture corpus should have >2% tokens")

    // superset guarantee: every true heavy hitter survives the MG summary
    // under a different merge tree (7-way repartition vs the scan layout)
    val mgAgg = udaf(new graft.functions.Aggregators.MisraGries(k))
    val cand = toks.repartition(7).agg(mgAgg($"token").as("mg"))
      .select(explode($"mg.toks").as("t")).collect().map(_.getString(0)).toSet
    assert(cand.size <= k)
    exact.keys.foreach(t => assert(cand.contains(t), s"heavy token '$t' missing from MG summary"))

    // final output is merge-order independent even though counter values aren't
    val got1 = TextAnalysis.heavyHitters(
      docs.repartition(1), k).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got1 === got.map(t => (t._1, t._2)).toSeq)
  }

  test("normalizedDedup: merges exactly the planted variants on the fixture; brute-force equal") {
    val base = docs.select($"doc_id", $"text", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def norm(s: String) =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
    val all = base ++ base.filter(_._1 % 10 == 0)
      .map { case (id, t, s) => (id + 10000000L, "  " + t.toUpperCase + " !!", s) }
    val expected = all.groupBy(_._3).toSeq.sortBy(_._1).map { case (src, rows) =>
      (src, rows.length.toLong,
        rows.map(_._2).distinct.length.toLong,
        rows.map(r => norm(r._2)).distinct.length.toLong)
    }
    val got = Dedup.normalizedDedup(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4)) === expected)
    got.foreach(t => assert(t._5 === t._3 - t._4))
    // the planted variants actually exercised the normalizer: every source
    // with a planted doc must report at least one merge
    val plantedBySource = base.filter(_._1 % 10 == 0).groupBy(_._3).view.mapValues(_.length)
    plantedBySource.foreach { case (src, _) =>
      assert(got.find(_._1 === src).get._5 > 0L, s"source $src should merge planted variants")
    }
  }

  test("vocabGrowth: deciles partition docs and tokens; brute-force equal; Heaps tail declines") {
    val rows = docs.select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = rows.map(_._1).max + 1
    def dec(id: Long) = math.min(9L, id * 10 / n)
    val toks = rows.flatMap { case (id, t) => t.split(" ", -1).map(w => (id, w)) }
    val firstSeen = toks.groupBy(_._2).map { case (_, occ) => occ.map(_._1).min }
    val expected = (0L to 9L).map { d =>
      (d, rows.count(r => dec(r._1) == d).toLong,
        toks.count(t => dec(t._1) == d).toLong,
        firstSeen.count(dec(_) == d).toLong)
    }.filter(_._2 > 0)
    val withCum = expected.scanLeft((0L, 0L, 0L, 0L, 0L)) { case (acc, (d, nd, nt, nn)) =>
      (d, nd, nt, nn, acc._5 + nn)
    }.drop(1)
    val got = TextAnalysis.vocabGrowth(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === withCum)
    assert(got.map(_._2).sum === rows.length.toLong)
    assert(got.map(_._3).sum === toks.length.toLong)
    assert(got.last._5 === firstSeen.size.toLong, "cumulative vocab must equal total types")
  }

  test("zipfFit: brute-force integer-moment regression equality; head slope is negative") {
    def half(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val counts = docs.select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val top = counts.sortBy(t => (-t._2, t._1)).take(100)
    val n = top.length.toLong
    def q6(x: Double) = BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val terms = top.zipWithIndex.map { case ((_, c), i) =>
      (q6(math.log(i + 1.0)), q6(math.log(c.toDouble)), c)
    }
    val (sx, sy) = (terms.map(_._1).sum, terms.map(_._2).sum)
    val sxy = terms.map(t => t._1 * t._2).sum
    val sxx = terms.map(t => t._1 * t._1).sum
    val slope = half((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx), 4)
    val got = TextAnalysis.zipfFit(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((n, slope, top.map(_._2).max, top.map(_._2).sum)))
    assert(slope < 0.0, "frequency must decay over the ranked head")
  }

  test("embeddingDrift: brute-force micro-unit means, shifts, and mean-vector cosine") {
    def r0(x: Double) = BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = embs.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val half = (rows.map(_._1).max + 1) / 2
    val byGrp = rows.groupBy(r => if (r._1 < half) 0 else 1)
    val means = Array(0, 1).map { g =>
      val vs = byGrp(g)
      (0 until 64).map { d =>
        val s6 = vs.map(v => r0(v._2(d).toDouble * 1e6)).sum
        r0(s6.toDouble / vs.length)
      }.toArray
    }
    val ab = (0 until 64).map(d => means(0)(d) * means(1)(d)).sum
    val aa = (0 until 64).map(d => means(0)(d) * means(0)(d)).sum
    val bb = (0 until 64).map(d => means(1)(d) * means(1)(d)).sum
    val cos = BigDecimal(ab / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (0 until 64)
      .map(d => (d.toLong, means(0)(d), means(1)(d), means(0)(d) - means(1)(d), cos))
      .sortBy(t => (-math.abs(t._4), t._1)).take(8)
    val got = Similarity.embeddingDrift(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expected)
  }

  test("persisted BM25 index: parquet serving == corpus recompute; sharded union == monolith") {
    val tmp = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    TextAnalysis.writeBm25Index(docs, s"$tmp/full")
    val fromCorpus = TextAnalysis.bm25TopDocs(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromIndex = TextAnalysis.bm25FromIndex(spark, Seq(s"$tmp/full")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex === fromCorpus)
    assert(fromIndex.nonEmpty)
    // sharded-union law: two doc-disjoint ingest batches, two shard dirs,
    // no compaction — serving from both dirs equals the monolithic index
    TextAnalysis.writeBm25Index(docs.filter($"doc_id" % 2 === 0), s"$tmp/a")
    TextAnalysis.writeBm25Index(docs.filter($"doc_id" % 2 =!= 0), s"$tmp/b")
    val sharded = TextAnalysis.bm25FromIndex(spark, Seq(s"$tmp/a", s"$tmp/b")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sharded === fromIndex)
  }

  test("heavyHittersBySource: brute-force per-group equality; per-source superset holds") {
    val k = 49
    val rows = docs.select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = rows.flatMap { case (s, t) => t.split(" ", -1).map(w => (s, w)) }
    val expected = toks.groupBy(_._1).toSeq.flatMap { case (src, st) =>
      val n = st.length.toLong
      st.groupBy(_._2).collect {
        case (tok, occ) if occ.length.toLong * (k + 1) > n =>
          (src, tok, occ.length.toLong, n)
      }
    }.sortBy(t => (t._1, -t._3, t._2))
    val got = TextAnalysis.heavyHittersBySource(docs, k).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "each source should have >2% tokens at fixture scale")
    assert(got.map(_._1).distinct.length > 1, "multiple sources must report")
  }

  test("heavyHittersBySource: a null-source group survives the exact second pass") {
    import spark.implicits._
    val rows = Seq(
      (null.asInstanceOf[String], "a a a a b"),
      ("web", "x x x x y")
    ).toDF("source", "text")
    val got = TextAnalysis.heavyHittersBySource(rows, k = 2).collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2), r.getLong(3)))
    // each group: 5 tokens, threshold n/(k+1) = 5/3 -> only the 4-count token
    assert(got.toSet === Set((None, "a", 4L, 5L), (Some("web"), "x", 4L, 5L)))
  }

  test("bm25FromIndex assertDisjoint: overlapping shards rejected, disjoint pass") {
    val tmp = java.nio.file.Files.createTempDirectory("bm25_overlap").toString
    TextAnalysis.writeBm25Index(docs.filter($"doc_id" % 2 === 0), s"$tmp/a")
    TextAnalysis.writeBm25Index(docs.filter($"doc_id" % 2 =!= 0), s"$tmp/b")
    TextAnalysis.writeBm25Index(docs, s"$tmp/full") // overlaps both shards
    val ok = TextAnalysis.bm25FromIndex(spark, Seq(s"$tmp/a", s"$tmp/b"),
      assertDisjoint = true).collect()
    assert(ok.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bm25FromIndex(spark, Seq(s"$tmp/a", s"$tmp/full"),
        assertDisjoint = true).collect()
    }
    assert(e.getMessage.contains("shard dirs overlap"))
  }

  test("persisted spectral model: outlier report from parquet == session, bit-for-bit") {
    val tmp = java.nio.file.Files.createTempDirectory("abtt_model").toString
    Similarity.writeSpectralModel(embs, tmp)
    val session = Similarity.abttOutliers(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    val served = Similarity.abttOutliersFromModel(embs, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(served === session,
      "outliers from the parquet mean/PC1 artifact must equal the session path")
    // artifact shape: mu + vs vectors and the three scalars, nothing else
    val kinds = spark.read.parquet(s"$tmp/model").groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds === Map("mu" -> 64L, "vs" -> 64L,
      "vn2" -> 1L, "trace" -> 1L, "dim" -> 1L))
  }

  test("spectral fit: empty corpus fails with the diagnostic, not an index error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pc1Power(empty).collect()
    }
    assert(e.getMessage.contains("empty embedding corpus"))
  }

  test("classifierAuc equals brute-force pairwise Mann-Whitney; partition invariant") {
    import graft.operators.Curation
    val (fx, w) = Curation.trainQualityWeights(docs, "en", 64, 4, 0.0009765625)
    val wm = w.toMap
    val zm = fx.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("b"), r.getAs[Long]("c")))
      .groupBy(_._1).view.mapValues(_.map(x => x._3 * wm(x._2)).sum).toMap
    val lab = docs.select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en")).toMap
    val pos = zm.collect { case (d, z) if lab(d) => z }.toSeq
    val neg = zm.collect { case (d, z) if !lab(d) => z }.toSeq
    // O(nP*nN) literal definition: wins count 2, ties count 1, in halves
    val num2 = pos.iterator.map(zp =>
      2L * neg.count(_ < zp) + neg.count(_ == zp)).sum
    val expected = num2.toDouble / (2.0 * pos.size * neg.size)
    val row = Curation.classifierAuc(docs).collect() match { case Array(r) => r }
    assert(row.getLong(1) === pos.size.toLong && row.getLong(2) === neg.size.toLong)
    assert(math.abs(row.getDouble(0) - expected) <= 1e-6,
      s"auc ${row.getDouble(0)} vs brute $expected")
    assert(row.getDouble(0) > 0.5, "en-vs-rest model should rank better than chance")
    // the two-phase prefix sum is a function of the score order, not of
    // where the range boundaries land
    val p2 = Curation.classifierAuc(docs, parts = 2).collect()
    val p17 = Curation.classifierAuc(docs, parts = 17).collect()
    assert(p2.toSeq === p17.toSeq)
  }

  test("textrankKeywords equals an in-JVM weighted power iteration, bit-for-bit") {
    val texts = docs.select($"text").collect().map(_.getString(0))
    val cooc = texts.iterator.flatMap { t =>
      val ws = t.split(" ", -1)
      if (ws.length >= 2)
        ws.iterator.sliding(2).withPartial(false)
          .filter(p => p.head != p(1))
          .map(p => if (p.head < p(1)) (p.head, p(1)) else (p(1), p.head))
      else Iterator.empty
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tokCount = texts.iterator.flatMap(_.split(" ", -1)).toSeq
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val kept = cooc.filter { case ((a, b), _) =>
      tokCount(a) >= 5L && tokCount(b) >= 5L }
    val edges = kept.toSeq.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val wdeg = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = wdeg.keySet.toSeq
    val n = nodes.size.toLong
    var rank = nodes.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to 4) {
      val s = edges.groupBy(_._2).view
        .mapValues(_.map { case (src, _, w) => (rank(src) * w) / wdeg(src) }.sum)
      rank = nodes.map(nd => nd -> (150000L / n + (17L * s(nd)) / 20L)).toMap
    }
    val expected = rank.toSeq.map { case (t, r) => (t, wdeg(t), r) }
      .sortBy { case (t, _, r) => (-r, t) }.take(20)
    val got = TextAnalysis.textrankKeywords(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.forall(_._3 > 0L))
  }

  test("hourlyAutocorrelation equals brute force on the zero-filled series") {
    val nsPerHour = 3600L * 1000000000L
    val hours = Tables.events(spark, sf).select($"ts").collect()
      .map(_.getLong(0) / nsPerHour)
    val counts = hours.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val xs = (hours.min to hours.max).map(h => counts.getOrElse(h, 0L))
    val n = xs.length.toLong
    val s = xs.sum
    val ys = xs.map(x => n * x - s)
    val den = ys.map(y => y * y).sum.toDouble
    val got = Events.hourlyAutocorrelation(Tables.events(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) === (1 to 24))
    got.foreach { case (lag, nPairs, acf) =>
      assert(nPairs === n - lag, s"lag $lag pair count")
      val num = (0 until (n - lag).toInt).map(i => ys(i) * ys(i + lag)).sum
      assert(math.abs(acf - num.toDouble / den) <= 1e-6, s"lag $lag: $acf")
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9)
    }
  }

  test("abValueTest equals brute-force md5 arms and moments; A/A split is calibrated") {
    def md5hex(v: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = Tables.events(spark, sf)
    val vals = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"value").collect()
      .map(r => (Integer.parseInt(md5hex(r.getLong(0).toString).substring(0, 4), 16) % 2,
        math.round(r.getDouble(1) * 10000)))
    val a = vals.filter(_._1 == 0).map(_._2)
    val b = vals.filter(_._1 == 1).map(_._2)
    def mean(xs: Array[Long]) = xs.sum.toDouble / xs.length
    def svar(xs: Array[Long]) = {
      val n = xs.length; val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
      (s2.toDouble - s1.toDouble * s1 / n) / (n - 1)
    }
    val z = (mean(a) - mean(b)) /
      math.sqrt(svar(a) / a.length + svar(b) / b.length)
    val row = Events.abValueTest(ev).collect() match { case Array(r) => r }
    assert((row.getLong(0), row.getLong(1)) === ((a.length.toLong, b.length.toLong)))
    assert(math.abs(row.getDouble(2) - mean(a) / 1e4) <= 1e-3)
    assert(math.abs(row.getDouble(3) - mean(b) / 1e4) <= 1e-3)
    assert(math.abs(row.getDouble(4) - z) <= 1e-3, s"z ${row.getDouble(4)} vs $z")
    // the arms see the same process: an A/A split should not "detect" an
    // effect (|z| inside the 1.96 line on any healthy fixture)
    assert(math.abs(row.getDouble(4)) < 1.96, s"A/A z unexpectedly large: ${row.getDouble(4)}")
  }

  test("motifCensus: brute-force subsequence existence over every ordered triple (q236)") {
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts".cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val types = rows.map(_._2).distinct.sorted
    val byUser = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(e => (e._2, e._3)).toVector).toMap
    // direct subsequence check (independent of the greedy frontier chain)
    def hasMotif(seq: Vector[(String, Long)], a: String, b: String, c: String): Boolean = {
      val ia = seq.indexWhere(_._1 == a)
      if (ia < 0) return false
      val ib = seq.indexWhere(e => e._1 == b && e._2 > seq(ia)._2, ia + 1)
      if (ib < 0) return false
      seq.exists(e => e._1 == c && e._2 > seq(ib)._2)
    }
    val expected = (for {
      a <- types; b <- types; c <- types
      n = byUser.values.count(s => hasMotif(s, a, b, c)).toLong
      if n > 0
    } yield ((a, b, c), (n, java.math.BigDecimal.valueOf(n.toDouble / byUser.size)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))).toMap
    val got = Events.motifCensus(Tables.events(spark, sf)).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
    // order carries information: a crafted one-way stream yields the
    // forward motif and not its reverse (the dense fixture satisfies
    // every triple, so asymmetry needs construction)
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val oneWay = Seq((1L, 0L, "signup", 1L, 0.0), (1L, 1L, "click", 2L, 0.0),
      (1L, 2L, "purchase", 3L, 0.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val c236 = Events.motifCensus(oneWay).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(c236.contains(("signup", "click", "purchase")))
    assert(!c236.contains(("purchase", "click", "signup")))
  }

  test("survivalCurve: brute-force KM product; censoring holds the curve up (q235)") {
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val NsDay = 86400L * 1000000000L
    val ev = Tables.events(spark, sf)
    val rows = ev.select($"user_id", $"event_type", $"ts".cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val mx = rows.map(_._3).max
    val su = rows.filter(_._2 == "signup").groupBy(_._1).map { case (u, g) => (u, g.map(_._3).min) }
    val pu = su.toSeq.map { case (u, s) =>
      val p = rows.filter(r => r._1 == u && r._2 == "purchase" && r._3 > s).map(_._3)
      if (p.nonEmpty) ((p.min - s) / NsDay, 1L) else ((mx - s) / NsDay, 0L)
    }
    val byT = pu.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, g) => (t, g.size.toLong, g.map(_._2).sum) }
    var atRisk = pu.size.toLong
    var ls = 0L; var zero = false
    val expected = byT.map { case (t, nT, d) =>
      if (d >= atRisk) zero = true
      else ls += math.round(math.log((atRisk - d).toDouble / atRisk) * 1e6)
      val s = if (zero) 0.0 else round4(math.exp(ls / 1e6))
      val row = (t, atRisk, d, nT - d, s)
      atRisk -= nT
      row
    }
    val got = Events.survivalCurve(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    assert(got.map(_._5) === got.map(_._5).sorted.reverse, "S(t) is non-increasing")
    // crafted censoring: 2 of 4 signups never purchase — they must exit
    // as at-risk lower bounds (S holds at 0.5), not be counted as
    // conversions (which would drive S to 0)
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val crafted = Seq(
      (1L, "signup", 0L), (1L, "purchase", 1L * NsDay),
      (2L, "signup", 0L), (2L, "purchase", 2L * NsDay),
      (3L, "signup", 0L), // never converts — censored at t=10
      (4L, "signup", 0L), // never converts — censored at t=10
      (9L, "click", 10L * NsDay) // frontier marker
    ).map { case (u, t, ts) => (u, 0L, t, ts, 0.0) }
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val c = Events.survivalCurve(crafted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    // t=1: 4 at risk, 1 converts -> S=0.75; t=2: 3 at risk, 1 converts
    // -> S=0.5; t=10: the 2 censored exit with S still 0.5 (not 0)
    assert(c === Seq((1L, 4L, 1L, 0L, 0.75), (2L, 3L, 1L, 0L, 0.5),
      (10L, 2L, 0L, 2L, 0.5)))
  }

  test("cupedAbTest: brute-force theta/adjustment; variance reduction is real (q232)") {
    def md5hex(v: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = Tables.events(spark, sf)
    val days = ev.select(expr("ts div 86400000000000").as("d")).agg(
      expr("(min(d) + max(d) + 1) div 2")).collect()(0).getLong(0)
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", expr("ts div 86400000000000").as("d"), $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 10000)))
    val allUsers = ev.select($"user_id").distinct().collect().map(_.getLong(0))
    val xy = allUsers.map { u =>
      val mine = purch.filter(_._1 == u)
      val arm = Integer.parseInt(md5hex(u.toString).substring(0, 4), 16) % 2
      (arm, mine.filter(_._2 < days).map(_._3).sum, mine.filter(_._2 >= days).map(_._3).sum)
    }
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._2).sum.toDouble, xy.map(_._3).sum.toDouble)
    val sxy = xy.map(t => BigInt(t._2) * BigInt(t._3)).sum
    val sxx = xy.map(t => BigInt(t._2) * BigInt(t._2)).sum
    val theta = (n * sxy.toDouble - sx * sy) / (n * sxx.toDouble - sx * sx)
    val xbar = sx / n
    def stats(arm: Int) = {
      val g = xy.filter(_._1 == arm)
      val (gx, gy) = (g.map(_._2), g.map(_._3))
      val gn = g.length.toDouble
      val my = gy.sum / gn; val mx = gx.sum / gn
      def sv(zs: Array[Long]) = {
        val s1 = zs.sum.toDouble
        (zs.map(z => BigInt(z) * BigInt(z)).sum.toDouble - s1 * s1 / gn) / (gn - 1)
      }
      val cov = (g.map(t => BigInt(t._2) * BigInt(t._3)).sum.toDouble -
        gx.sum.toDouble * gy.sum / gn) / (gn - 1)
      (gn, my, mx, sv(gy), sv(gx), cov)
    }
    val (na, mya, mxa, vya, vxa, ca) = stats(0)
    val (nb, myb, mxb, vyb, vxb, cb) = stats(1)
    val row = Events.cupedAbTest(ev).collect() match { case Array(r) => r }
    assert((row.getLong(0), row.getLong(1)) === ((na.toLong, nb.toLong)))
    assert(math.abs(row.getDouble(2) - theta) <= 1e-4, s"theta ${row.getDouble(2)} vs $theta")
    assert(math.abs(row.getDouble(5) - (mya - theta * (mxa - xbar)) / 1e4) <= 1e-2)
    assert(math.abs(row.getDouble(6) - (myb - theta * (mxb - xbar)) / 1e4) <= 1e-2)
    val vaa = vya - 2 * theta * ca + theta * theta * vxa
    val vab = vyb - 2 * theta * cb + theta * theta * vxb
    val zc = ((mya - theta * (mxa - xbar)) - (myb - theta * (mxb - xbar))) /
      math.sqrt(vaa / na + vab / nb)
    assert(math.abs(row.getDouble(8) - zc) <= 1e-3, s"z_cuped ${row.getDouble(8)} vs $zc")
    // the whole point: adjusted variance is never larger (theta is the
    // pooled least-squares minimizer, so pooled reduction >= 0), and the
    // A/A split stays calibrated after adjustment
    assert(row.getDouble(9) >= 0.0, "pooled variance reduction must be non-negative")
    assert(math.abs(row.getDouble(8)) < 1.96, s"A/A z_cuped large: ${row.getDouble(8)}")
  }

  test("msprtMonitor: brute-force Lambda; A/A refuses to stop, a real effect stops (q237)") {
    def md5hex(v: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = Tables.events(spark, sf)
    val vals = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"value").collect()
      .map(r => (Integer.parseInt(md5hex(r.getLong(0).toString).substring(0, 4), 16) % 2,
        math.round(r.getDouble(1) * 10000)))
    val a = vals.filter(_._1 == 0).map(_._2)
    val b = vals.filter(_._1 == 1).map(_._2)
    def mean(xs: Array[Long]) = xs.sum.toDouble / xs.length
    def svar(xs: Array[Long]) = {
      val n = xs.length; val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
      (s2.toDouble - s1.toDouble * s1 / n) / (n - 1)
    }
    val th = mean(b) - mean(a)
    val se2 = svar(a) / a.length + svar(b) / b.length
    val t2 = 50000.0 * 50000.0
    val lam = math.sqrt(se2 / (se2 + t2)) *
      math.exp(th * th * t2 / (2.0 * se2 * (se2 + t2)))
    val row = Events.msprtMonitor(ev).collect() match { case Array(r) => r }
    assert((row.getLong(0), row.getLong(1)) === ((a.length.toLong, b.length.toLong)))
    assert(math.abs(row.getDouble(4) - lam) <= 1e-3, s"lambda ${row.getDouble(4)} vs $lam")
    // the peeking guarantee on an A/A: the always-valid p must not be
    // anywhere near a stop (fixed-horizon q192 z is already inside 1.96)
    assert(row.getDouble(5) > 0.5, s"A/A always-valid p too low: ${row.getDouble(5)}")
    // inject a real +40.00 treatment effect on arm 1 — the monitor must stop
    val treated = ev.withColumn("value",
      when(graft.operators.Scale.md5SlicePos($"user_id", 0, 2) === 1L,
        $"value" + 40.0).otherwise($"value"))
    val tr = Events.msprtMonitor(treated).collect() match { case Array(r) => r }
    assert(tr.getDouble(5) < 0.05, s"treated p should stop: ${tr.getDouble(5)}")
  }

  test("abValueTest Σv² overflow fails LOUDLY (ANSI), never a silent wrong z") {
    // the documented long envelope (~1e6 events/arm at value scale ×1e4)
    // is enforced by ANSI arithmetic: vm ≈ 2e9 per row squares to 4e18,
    // so an arm with ≥ 3 such rows overflows the long Sum — the session
    // must THROW, not wrap into a corrupted z-score
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val huge = (1L to 8L).map(u =>
      (u, "purchase", 200000.0)).toDF("user_id", "event_type", "value")
    val e = intercept[Exception] {
      Events.abValueTest(huge).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[ArithmeticException] ||
        Option(c.getMessage).exists(m =>
          m.contains("ARITHMETIC_OVERFLOW") || m.contains("overflow"))),
      s"expected a loud overflow, got: $e")
  }

  test("cusumDriftDays: closed form equals the textbook max(0, S+dev) recursion") {
    val nsPerDay = 86400L * 1000000000L
    val rows = Tables.events(spark, sf).select($"ts", $"value").collect()
      .map(r => ((r.getLong(0) / nsPerDay) * 86400, math.round(r.getDouble(1) * 10000)))
    val byDay = rows.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toSeq.sortBy(_._1)
    val totN = byDay.map(_._2._1).sum
    val totS = byDay.map(_._2._2).sum
    val k = (10000L * totS) / totN
    var sUp = 0L; var sDn = 0L
    val expected = byDay.map { case (day, (n, s1)) =>
      val xm = (10000L * s1) / n
      sUp = math.max(0L, sUp + (xm - k))
      sDn = math.max(0L, sDn + (k - xm))
      (day, n, xm, sUp, sDn, sUp > 50000L || sDn > 50000L)
    }
    val got = Events.cusumDriftDays(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("labelPropagation: md5 mask accounting, recovery bounds, zero-round identity, round monotonicity") {
    def md5hex(v: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def rows(rounds: Int) = Similarity.labelPropagation(embs, rounds = rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = rows(2)
    assert(got.nonEmpty)
    got.foreach { case (l, h, rec, cor) =>
      assert(cor <= rec && rec <= h, s"label $l bounds: $cor <= $rec <= $h") }
    // the hidden population is exactly the md5-parity coin's tails
    val hidden = embs.select($"vec_id").collect().map(_.getLong(0))
      .count(u => Integer.parseInt(md5hex(u.toString).substring(0, 4), 16) % 2 == 1)
    assert(got.map(_._2).sum === hidden.toLong)
    // zero rounds = the clamp alone: nothing recovered
    assert(rows(0).forall(_._3 == 0L))
    // labels only spread: one round recovers a subset of two rounds
    assert(rows(1).map(_._3).sum <= got.map(_._3).sum)
    // deterministic end to end (fresh Lloyd training included)
    assert(rows(2).toSeq === got.toSeq)
  }

  test("sessionAttribution equals brute-force first-touch credit; purchases conserved") {
    val evs = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        math.round(r.getDouble(4) * 10000)))
    val gapNs = 1800L * 1000000000L
    val sessions = evs.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._3, e._2))
      val out = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          if (cur._3 - prev._3 > gapNs) out += scala.collection.mutable.ArrayBuffer(cur)
          else out.last += cur
        case _ =>
      }
      out
    }.toSeq
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = sessions
      .map { s =>
        val purch = s.filter(_._4 == "purchase")
        (s.head._4, purch.length.toLong, purch.map(_._5).sum)
      }
      .groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum, r2(g.map(_._3).sum / 10000.0)))
      .toSeq.map { case (t, (ns, np, v)) => (t, ns, np, v) }.sortBy(_._1)
    val got = Events.sessionAttribution(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.map(_._3).sum === evs.count(_._4 == "purchase").toLong,
      "every purchase must be attributed exactly once")
  }

  test("phraseSearch equals a brute-force sliding-window scan; multi-word required") {
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val phrase = "big order scan".split(" ").toSeq
    val expected = texts.flatMap { case (id, t) =>
      val ws = t.split(" ", -1).toSeq
      val n = ws.sliding(phrase.length).count(_ == phrase)
      if (n > 0) Some((id, "big order scan", n.toLong)) else None
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.phraseSearch(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "the default phrase is planted at every SF")
    intercept[IllegalArgumentException] { TextAnalysis.phraseSearch(docs, "single") }
  }

  test("datasetFingerprint: partition-invariant, sensitive to any single-doc change") {
    import graft.operators.Governance
    def fp(df: org.apache.spark.sql.DataFrame) =
      Governance.datasetFingerprint(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val base = fp(docs)
    assert(base.nonEmpty)
    // XOR fold is merge-order-free: any partitioning gives the identity
    assert(fp(docs.repartition(7)) === base)
    // flipping one document's text changes ONLY its source's fingerprint
    val tweaked = docs.withColumn("text",
      when($"doc_id" === 0L, concat($"text", lit(" x"))).otherwise($"text"))
    val changed = fp(tweaked)
    val src0 = docs.filter($"doc_id" === 0L).select($"source").collect()(0).getString(0)
    base.zip(changed).foreach { case (b, c) =>
      assert(b._1 === c._1 && b._2 === c._2)
      if (b._1 == src0) assert(b._4 !== c._4, "touched source must re-fingerprint")
      else assert(b._4 === c._4, s"untouched source ${b._1} must keep its fingerprint")
    }
  }

  test("heldOutPerplexity equals a brute-force held-out add-one bigram scorer") {
    def md5hex(v: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isTrain(id: Long): Boolean =
      Integer.parseInt(md5hex(id.toString).substring(0, 4), 16) % 2 == 0
    val dd = docs.select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).toSeq))
    val train = dd.filter(d => isTrain(d._1))
    val cb = train.flatMap(d => d._3.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cu = cb.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val v = train.flatMap(_._3).distinct.length.toLong
    val perLang = dd.filterNot(d => isTrain(d._1))
      .flatMap(d => d._3.sliding(2).filter(_.length == 2).map(p => (d._2, (p(0), p(1)))))
      .groupBy(_._1).view.mapValues { g =>
        val units = g.map { case (_, bg) =>
          val c = cb.getOrElse(bg, 0L); val u = cu.getOrElse(bg._1, 0L)
          math.round(-math.log((c + 1.0) / (u + v)) / math.log(2.0) * 1e6)
        }.sum
        val unseen = g.count { case (_, bg) => !cb.contains(bg) }.toLong
        (g.length.toLong, units, unseen)
      }.toSeq.sortBy(_._1)
    val got = TextAnalysis.heldOutPerplexity(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got.map(_._1) === perLang.map(_._1))
    got.zip(perLang).foreach { case ((lang, n, bpt, ur), (_, (en, eu, eun))) =>
      assert(n === en, s"$lang bigram count")
      assert(math.abs(bpt - eu.toDouble / en / 1e6) <= 1e-3, s"$lang bits/token")
      // the operator rounds the rate to 6 decimals; brute value is raw
      assert(math.abs(ur - eun.toDouble / en) <= 5e-7, s"$lang unseen rate")
      // held-out scoring must price the unseen mass: rate strictly > 0
      // on a split corpus with a synthetic long-tail vocabulary
      assert(ur >= 0.0 && ur < 1.0)
    }
    assert(got.nonEmpty)
  }

  test("trendTest equals brute-force Mann-Kendall + Theil-Sen on the day frame") {
    val nsPerDay = 86400L * 1000000000L
    val byDay = Tables.events(spark, sf).select($"ts", $"value").collect()
      .map(r => (r.getLong(0) / nsPerDay, math.round(r.getDouble(1) * 10000)))
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum))
      .toSeq.sortBy(_._1)
    val xs = byDay.map { case (d, (n, s1)) => (d, (10000L * s1) / n) }
    val n = xs.length
    val pairs = for (i <- 0 until n; j <- i + 1 until n) yield (xs(i), xs(j))
    val s = pairs.map { case ((_, xi), (_, xj)) =>
      if (xj > xi) 1L else if (xj < xi) -1L else 0L }.sum
    val tieAdj = xs.groupBy(_._2).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val nl = n.toLong
    val varS = (nl * (nl - 1) * (2 * nl + 5) - tieAdj) / 18.0
    val z = if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
    val slopes = pairs.map { case ((di, xi), (dj, xj)) =>
      math.floor((xj - xi) * 1000.0 / (dj - di)).toLong }.sorted
    // Spark-percentile interpolation at q=0.5 (exactQuantileByGroup contract)
    val pos = 0.5 * (slopes.length - 1)
    val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
    val med = if (lo == hi || slopes(lo) == slopes(hi)) slopes(lo).toDouble
      else (hi - pos) * slopes(lo) + (pos - lo) * slopes(hi)
    val row = Events.trendTest(Tables.events(spark, sf)).collect() match {
      case Array(r) => r }
    assert(row.getLong(0) === nl && row.getLong(1) === s)
    assert(math.abs(row.getDouble(2) - varS) <= 1e-3)
    assert(math.abs(row.getDouble(3) - z) <= 1e-3, s"z ${row.getDouble(3)} vs $z")
    assert(math.abs(row.getDouble(4) - med / 1e7) <= 1e-5,
      s"slope ${row.getDouble(4)} vs ${med / 1e7}")
  }

  test("benfordAudit equals brute-force digit counts; chi2 and shares consistent") {
    import graft.operators.Governance
    val vms = Tables.events(spark, sf).select($"value").collect()
      .map(r => math.round(r.getDouble(0) * 10000)).filter(_ > 0L)
    val counts = vms.map(_.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val expChi2 = Governance.BenfordShares.map { case (d, p) =>
      val o = counts.getOrElse(d, 0L)
      (o - total * p) * (o - total * p) / (total * p)
    }.sum
    val got = Governance.benfordAudit(Tables.events(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq === (1 to 9))
    got.foreach { case (d, o, share, bs, chi2) =>
      assert(o === counts.getOrElse(d, 0L), s"digit $d count")
      assert(math.abs(share - o.toDouble / total) <= 5e-7)
      assert(math.abs(bs - math.log10(1.0 + 1.0 / d)) <= 5e-7)
      assert(math.abs(chi2 - expChi2) <= 1e-3, s"chi2 $chi2 vs $expChi2")
    }
    assert(got.map(_._2).sum === total)
  }

  test("framePhashNearDup equals brute-force all-pairs hamming at the pigeonhole dial") {
    def md5hex(b: Array[Byte]): String = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    val ph = docs.select($"doc_id", $"text").collect().map { r =>
      val bytes = r.getString(1).getBytes("UTF-8")
      val nf = math.max(bytes.length / 64 - 1, 0) + 1
      val cnt = new Array[Long](60)
      for (f <- 0 until nf) {
        val slice = bytes.slice(f * 64, math.min(f * 64 + 64, bytes.length))
        val h = java.lang.Long.parseLong(md5hex(slice).substring(0, 15), 16)
        for (j <- 0 until 60) cnt(j) += (h >> j) & 1L
      }
      var p = 0L
      for (j <- 0 until 60) if (2 * cnt(j) > nf) p |= 1L << j
      (r.getLong(0), p)
    }.sortBy(_._1)
    val expected = for {
      i <- ph.indices; j <- (i + 1) until ph.length
      hm = java.lang.Long.bitCount(ph(i)._2 ^ ph(j)._2)
      if hm <= 3
    } yield (ph(i)._1, ph(j)._1, hm)
    val got = Multimodal.framePhashNearDup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // the banded engine path vs the exhaustive JVM path: equality IS the
    // pigeonhole recall theorem (hamming <= 3 over 4 bands => 1 exact)
    assert(got === expected)
    assert(got.nonEmpty, "the fixture's planted near-dups must surface")
    assert(got.exists(_._3 == 0), "byte-identical re-entries hash to hamming 0")
  }

  test("basketLift equals brute-force session baskets; lift identity holds") {
    val evs = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gapNs = 1800L * 1000000000L
    val baskets = evs.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val sorted = g.sortBy(e => (e._3, e._2))
      var seq = 0L; var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._3 - prev > gapNs) seq += 1
        prev = e._3
        ((uid, seq), e._4)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toSeq
    val n = baskets.length
    val perType = baskets.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = baskets.flatMap { case (_, ts) =>
      ts.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) }
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((a, b), nab) => (a, b, perType(a), perType(b), nab) }
      .sortBy(x => (x._1, x._2))
    val got = Events.basketLift(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.map(x => (x._1, x._2, x._3, x._4, x._5)).toSeq === expected)
    got.foreach { case (a, b, na, nb, nab, sup, lift) =>
      assert(math.abs(sup - nab.toDouble / n) <= 5e-7, s"$a/$b support")
      assert(math.abs(lift - nab.toDouble * n / (na * nb)) <= 5e-7, s"$a/$b lift")
      assert(nab <= math.min(na, nb))
    }
    assert(got.nonEmpty)
  }

  test("interArrivalFit equals brute-force per-observation KS; distinct-gap form is exact") {
    val evs = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = evs.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._3, e._2)).map(_._3)
      sorted.sliding(2).collect { case Array(a, b) => b - a }
    }.toSeq.sorted
    val n = gaps.length
    val lam = n.toDouble / gaps.map(BigInt(_)).sum.toDouble
    def fexp(x: Long) = 1.0 - math.exp(-(lam * x))
    val d = gaps.zipWithIndex.map { case (x, i) =>
      math.max((i + 1).toDouble / n - fexp(x), fexp(x) - i.toDouble / n)
    }.max
    val row = Events.interArrivalFit(Tables.events(spark, sf)).collect() match {
      case Array(r) => r }
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - lam * 3.6e12) <= 1e-4)
    assert(math.abs(row.getDouble(2) - d) <= 2e-6, s"D ${row.getDouble(2)} vs $d")
    assert(row.getBoolean(3) === (row.getDouble(2) > 1.36 / math.sqrt(n.toDouble)))
    // a KS distance is a probability-scale quantity
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }

  test("htEstimate equals brute-force bottom-k Horvitz-Thompson; estimate is in range") {
    def md5hex(v: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val dd = docs.select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keyed = dd.map { case (id, w) =>
      val u = md5hex(id.toString).take(13).zipWithIndex
        .map { case (c, i) => Integer.parseInt(c.toString, 16) * math.pow(16.0, -(i + 1)) }
        .sum
      (id, w, -math.log(u) / w)
    }.sortBy(x => (x._3, x._1))
    val tau = keyed(50)._3
    val sample = keyed.take(50)
    val sd = sample.map { case (_, w, _) =>
      math.round(1e4 / (1.0 - math.exp(-(w * tau)))) }.sum
    val sc2 = sample.map { case (_, w, _) =>
      math.round(w * 1e4 / (1.0 - math.exp(-(w * tau)))) }.sum
    val row = graft.operators.Sampling.htEstimate(docs).collect() match {
      case Array(r) => r }
    assert(row.getLong(0) === 50L)
    assert(row.getLong(1) === dd.length.toLong)
    assert(row.getLong(3) === dd.map(_._2).sum)
    assert(math.abs(row.getDouble(2) - sd / 1e4) <= 1e-2, s"docs ${row.getDouble(2)}")
    assert(math.abs(row.getDouble(4) - sc2 / 1e4) <= 1e-2, s"chars ${row.getDouble(4)}")
    // one concrete 50-row draw should land in the estimator's ballpark
    // (HT is unbiased over draws; this pins THIS deterministic draw)
    assert(row.getDouble(2) > dd.length * 0.4 && row.getDouble(2) < dd.length * 2.5)
  }

  test("kCellsFor: the sqrt IVF dial law - floor, growth, bounded cells, auto==explicit") {
    import graft.operators.Similarity.kCellsFor
    // floor 16 up to 256 vectors, then ceil(sqrt(N))
    assert(kCellsFor(1) === 16 && kCellsFor(256) === 16 && kCellsFor(257) === 17)
    assert(kCellsFor(500) === 23)   // the sf0.001/sf0.01 fixture dial
    assert(kCellsFor(2000) === 45)  // sf0.1
    assert(kCellsFor(20000) === 142 && kCellsFor(60000) === 245) // x10/x30
    // sqrt growth: 4x the corpus doubles the cell count (exact on squares)
    assert(kCellsFor(40000) === 2 * kCellsFor(10000))
    // monotone, and expected per-cell population stays ~sqrt(N) - the
    // bound that keeps within-cell candidate work at N^1.5, not N^2/16
    var prev = 0
    for (n <- Seq(1L, 10L, 256L, 500L, 2000L, 20000L, 60000L, 1000000L, 100000000L)) {
      val kc = kCellsFor(n)
      assert(kc >= prev); prev = kc
      assert(n.toDouble / kc <= math.sqrt(n.toDouble) + 1.0,
        s"per-cell population at n=$n must stay ~sqrt(n)")
    }
    // AutoCells resolves to exactly the explicit kCellsFor(count) graph
    val auto = Similarity.cellKnnGraph(embs, 5, Similarity.AutoCells).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(e => (e._1, e._2)).toSeq
    val explicit = Similarity.cellKnnGraph(embs, 5, kCellsFor(embs.count())).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(e => (e._1, e._2)).toSeq
    assert(auto === explicit && auto.nonEmpty)
  }

  test("assignCells: expression form and wide join form are bit-identical argmins") {
    // the wide (broadcast-join + struct-min) form exists because a
    // k-wide least() hits the JIT HugeMethodLimit cliff between ~100
    // and ~250 terms; this proves switching forms can never change a
    // result - same round6(-cos) grid, same (negcos, cid) tie order
    import graft.functions.VectorFunctions.cosine_sim
    val corpus = embs.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("v"))
    // deterministic 23-centroid table from the corpus itself
    val cents = corpus.orderBy(md5($"vec_id".cast("string")), $"vec_id")
      .limit(23).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def rows(wide: Boolean) =
      Similarity.assignCells(corpus, cents, wide).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    val narrow = rows(wide = false)
    val wideF = rows(wide = true)
    assert(narrow === wideF)
    assert(narrow.length === embs.count())
  }

  test("mutualNeighborPairs: exactly the bidirectional edges of the shared kNN graph") {
    val edges = Similarity.cellKnnGraph(embs, 5, Similarity.AutoCells).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val dir = edges.map(e => (e._1, e._2)).toSet
    val expected = edges
      .filter(e => e._1 < e._2 && dir((e._2, e._1)))
      .map(e => (e._1, e._2, e._3)).sortBy(x => (x._1, x._2)).toSeq
    val got = Similarity.mutualNeighborPairs(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // mutuality is strictly harder than one-sided membership
    assert(got.length < edges.count(e => e._1 < e._2))
    got.foreach { case (_, _, c) => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9) }
  }

  test("marginScoredPairs: brute-force ratio margin over the mutual pairs; hub deflation") {
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val edges = Similarity.cellKnnGraph(embs, 5, Similarity.AutoCells).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // (s6, k) kept separate so the brute force mirrors the engine's exact
    // operation order: (sa/ka + sb/kb) / 2e6
    val deg = edges.groupBy(_._1).map { case (id, es) =>
      id -> (es.map(e => math.round(e._3 * 1e6)).sum.toDouble, es.length.toDouble)
    }
    val mutual = Similarity.mutualNeighborPairs(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected = mutual.map { case (a, b, c) =>
      val ((sa, ka), (sb, kb)) = (deg(a), deg(b))
      val d = (sa / ka + sb / kb) / 2e6
      (a, b, c, if (d > 0) round6(c / d) else Double.NaN)
    }
    val got = Similarity.marginScoredPairs(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) === mutual,
      "margin scoring covers exactly the mutual pair set")
    got.zip(expected).foreach { case (g, e) =>
      assert(g._4 == e._4 || (g._4.isNaN && e._4.isNaN), s"margin ${g._1},${g._2}") }
    assert(got.nonEmpty)
    // the criterion must actually deflate somewhere: equal-cos pairs in
    // denser neighborhoods get lower margins, so margin ordering differs
    // from cosine ordering
    val byCos = got.sortBy(g => (-g._3, g._1, g._2)).map(g => (g._1, g._2))
    val byMargin = got.sortBy(g => (-g._4, g._1, g._2)).map(g => (g._1, g._2))
    assert(byCos !== byMargin, "margin must re-rank, not rescale")
  }

  test("dbscanProfile: roles partition the corpus; core mass shrinks with minPts and eps") {
    def roles(eps: Double, minPts: Int) =
      Similarity.dbscanProfile(embs, eps = eps, minPts = minPts).collect()
        .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val base = roles(0.2, 4)
    val nVecs = embs.count()
    assert(base.values.sum === nVecs, "every vector gets exactly one role")
    val labelCounts = embs.groupBy($"label").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    labelCounts.foreach { case (l, n) =>
      assert(base.collect { case ((`l`, _), c) => c }.sum === n, s"label $l mass") }
    def coreMass(m: Map[(Long, String), Long]) =
      m.collect { case ((_, "core"), c) => c }.sum
    // raising minPts or eps can only demote cores
    assert(coreMass(roles(0.2, 8)) <= coreMass(base))
    assert(coreMass(roles(0.3, 4)) <= coreMass(base))
    // deterministic end to end (fresh Lloyd training included)
    assert(roles(0.2, 4) === base)
  }

  test("silhouetteProfile: bounded scores, members conserved, argmin consistency") {
    val rows = Similarity.silhouetteProfile(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum === embs.count(), "every vector scored once")
    rows.foreach { case (cid, n, s, npos) =>
      // silhouette lives in [-1, 1]
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9, s"cluster $cid mean $s")
      assert(npos >= 0L && npos <= n)
    }
    // Lloyd assigns each vector to its argmax-cos centroid, so cos_own >=
    // cos_bestOther pointwise: every per-vector s >= 0, hence every
    // cluster mean >= 0 and n_positive can only miss exact-tie zeros
    rows.foreach { case (cid, _, s, _) =>
      assert(s >= 0.0, s"cluster $cid mean must be nonnegative under argmax assignment") }
    // deterministic end to end
    assert(Similarity.silhouetteProfile(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      === rows.toSeq)
  }

  test("clusterStability: ARI wiring, combinatorial bounds, determinism") {
    val row = Similarity.clusterStability(embs).collect() match { case Array(r) => r }
    val (n, sij, sa, sb) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(n === embs.count())
    // pair-count combinatorics: joint concentration can't exceed either margin
    assert(sij <= math.min(sa, sb))
    assert(sa <= n * (n - 1) / 2 && sb <= n * (n - 1) / 2)
    // the emitted ari must BE the ARI of the emitted integer parts
    val t = (n * (n - 1) / 2).toDouble
    val exp = sa.toDouble * sb / t
    val ari = (sij - exp) / ((sa + sb) / 2.0 - exp)
    assert(math.abs(row.getDouble(4) - ari) <= 5e-7)
    assert(row.getDouble(4) <= 1.0 + 1e-9)
    // deterministic across full retrainings
    val again = Similarity.clusterStability(embs).collect() match { case Array(r) => r }
    assert(again.toSeq === row.toSeq)
  }

  private implicit class Interp(private val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }

  test("unseenMass: Chao1 + Good-Turing equal brute force; template and all-unique corpora hit the closed forms (q265)") {
    val rows = docs.select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def roundN(v: Double, k: Int): Double =
      BigDecimal(v).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = rows.groupBy(_._1).view.mapValues { ds =>
      val cnt = ds.flatMap(_._2.split(" ", -1))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nTok = cnt.values.sum; val vocab = cnt.size.toLong
      val f1 = cnt.values.count(_ == 1L).toLong
      val f2 = cnt.values.count(_ == 2L).toLong
      (nTok, vocab, f1, f2,
        roundN(vocab + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1)), 2),
        roundN(f1.toDouble / nTok, 6))
    }.toMap
    val got = graft.operators.TextAnalysis.unseenMass(docs).collect()
    assert(got.length == exp.size)
    got.foreach { g =>
      val e = exp(g.getString(0))
      assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4),
        g.getDouble(5), g.getDouble(6)) == e)
    }
    // closed forms: a template corpus has exhausted its vocabulary
    // (f1 = 0 -> chao1 = observed vocab, unseen mass 0); an all-unique
    // corpus is all singletons (gt mass 1, chao1 = V + V(V-1)/2)
    import spark.implicits._
    val template = (1 to 50).map(i => ("tpl", "alpha beta gamma"))
      .toDF("source", "text")
    val t = graft.operators.TextAnalysis.unseenMass(template).collect()(0)
    assert(t.getLong(2) == 3L && t.getLong(3) == 0L)
    assert(t.getDouble(5) == 3.0 && t.getDouble(6) == 0.0)
    val unique = Seq(("uniq", (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("source", "text")
    val u = graft.operators.TextAnalysis.unseenMass(unique).collect()(0)
    assert(u.getLong(2) == 40L && u.getLong(3) == 40L)
    assert(u.getDouble(5) == roundN(40 + 40.0 * 39 / 2.0, 2))
    assert(u.getDouble(6) == 1.0)
  }

  test("kneserNeyEval equals a brute-force interpolated-KN scorer on the q198 split (q269)") {
    def md5hex(v: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isTrain(id: Long): Boolean =
      Integer.parseInt(md5hex(id.toString).substring(0, 4), 16) % 2 == 0
    val dd = docs.select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).toSeq))
    val train = dd.filter(d => isTrain(d._1))
    val cb = train.flatMap(d => d._3.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cu = cb.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val n1w1 = cb.keys.toSeq.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1w2 = cb.keys.toSeq.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nb = cb.size.toLong
    val v = train.flatMap(_._3).distinct.length.toLong
    def pKn(bg: (String, String)): Double = {
      val pc = (n1w2.getOrElse(bg._2, 0L) + 1.0) / (nb + v)
      cu.get(bg._1) match {
        case Some(u) =>
          math.max(cb.getOrElse(bg, 0L).toDouble - 0.75, 0.0) / u +
            0.75 * n1w1(bg._1) / u * pc
        case None => pc
      }
    }
    val perLang = dd.filterNot(d => isTrain(d._1))
      .flatMap(d => d._3.sliding(2).filter(_.length == 2).map(p => (d._2, (p(0), p(1)))))
      .groupBy(_._1).view.mapValues { g =>
        val units = g.map { case (_, bg) =>
          math.round(-math.log(pKn(bg)) / math.log(2.0) * 1e6)
        }.sum
        val backoff = g.count { case (_, bg) => !cu.contains(bg._1) }.toLong
        (g.length.toLong, units, backoff)
      }.toSeq.sortBy(_._1)
    val got = TextAnalysis.kneserNeyEval(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got.map(_._1) === perLang.map(_._1))
    got.zip(perLang).foreach { case ((lang, n, bpt, br), (_, (en, eu, ebk))) =>
      assert(n === en, s"$lang bigram count")
      assert(math.abs(bpt - eu.toDouble / en / 1e6) <= 1e-3, s"$lang bits/token")
      assert(math.abs(br - ebk.toDouble / en) <= 5e-7, s"$lang backoff rate")
    }
    // corpus-level comparison vs add-one is INFORMATIONAL on this
    // fixture: the synthetic near-uniform vocabulary lacks the natural-
    // language continuation skew Chen & Goodman's empirical law rides
    // (measured: KN within 0.2% of add-one here, slightly behind)
    val knBits = got.map(g => g._2 * g._3).sum / got.map(_._2).sum
    val a1 = TextAnalysis.heldOutPerplexity(docs).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    val a1Bits = a1.map(g => g._1 * g._2).sum / a1.map(_._1).sum
    assert(math.abs(knBits - a1Bits) / a1Bits < 0.05)

    // the CONSTRUCTED continuation law — the insight that defines KN:
    // two equally-unseen test bigrams "q the" and "q z" where 'the'
    // follows 20 distinct train contexts and 'z' (equally FREQUENT)
    // follows one. Add-one prices them identically; KN must price
    // 'the' cheaper (fewer bits) because continuation counts, not raw
    // frequency, drive the backoff.
    import spark.implicits._
    val trainIds = Iterator.from(1).map(_.toLong).filter(isTrain)
    val testIds = Iterator.from(1).map(_.toLong).filterNot(isTrain)
    val trainDocs = (1 to 20).map(i => (trainIds.next(), s"ctx$i the", "tr")) ++
      (1 to 20).map(_ => (trainIds.next(), "y z", "tr"))
    val testDocs = Seq((testIds.next(), "q the", "hi"), (testIds.next(), "q z", "lo"))
    val corpus = (trainDocs ++ testDocs).toDF("doc_id", "text", "lang")
    val kn = TextAnalysis.kneserNeyEval(corpus).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(kn("hi") < kn("lo"),
      s"KN must price the versatile continuation cheaper: $kn")
    val ao = TextAnalysis.heldOutPerplexity(corpus).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(ao("hi") == ao("lo"),
      s"add-one cannot distinguish them: $ao")
  }

  test("lexicalJsDivergence: the support-bounded form equals the naive full-grid JSD; 0 and 1 closed forms (q280)") {
    def roundN(v: Double, k: Int): Double =
      BigDecimal(v).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val rows = docs.select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (r.getString(0), t)))
    val ct = rows.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val bySrc = rows.groupBy(_._1)
    val got = graft.operators.TextAnalysis.lexicalJsDivergence(docs).collect()
    assert(got.length == bySrc.size)
    got.foreach { g =>
      val src = g.getString(0)
      val cs = bySrc(src).map(_._2).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      val ns = bySrc(src).size.toLong
      // the operator's support-bounded sum + closed-form tail, replayed
      val sum6 = cs.map { case (tok, c) =>
        val p = c.toDouble / ns
        val q = (ct(tok) - c).toDouble / (n - ns)
        val m = (p + q) / 2.0
        val tq = if (ct(tok) - c > 0) q * log2(q / m) else 0.0
        math.round((p * log2(p / m) + tq) * 1000000.0)
      }.sum
      val restSup = cs.map { case (tok, c) => ct(tok) - c }.sum
      val qOut = ((n - ns) - restSup).toDouble / (n - ns)
      val jsd = 0.5 * (sum6 / 1000000.0) + 0.5 * qOut
      assert(g.getLong(1) == ns)
      assert(g.getDouble(2) == roundN(jsd, 6))
      assert(g.getDouble(3) == roundN(qOut, 6))
      // ...and it equals the NAIVE zero-filled full-union-grid JSD — the
      // identity the closed-form tail rests on (tolerance: the operator
      // micro-quantizes per in-support term)
      val naive = ct.keys.map { tok =>
        val p = cs.getOrElse(tok, 0L).toDouble / ns
        val q = (ct(tok) - cs.getOrElse(tok, 0L)).toDouble / (n - ns)
        val m = (p + q) / 2.0
        val tp = if (p > 0) p * log2(p / m) else 0.0
        val tq = if (q > 0) q * log2(q / m) else 0.0
        0.5 * (tp + tq)
      }.sum
      assert(math.abs(jsd - naive) < 1e-4, s"$src closed-form vs naive")
      assert(g.getDouble(2) >= 0.0 && g.getDouble(2) <= 1.0)
    }
    // closed forms: a proportional clone scores exactly 0; disjoint
    // vocabularies score exactly 1
    import spark.implicits._
    val clone = (Seq.fill(30)(("a", "x y z")) ++ Seq.fill(60)(("b", "x y z")))
      .toDF("source", "text")
    val jc = graft.operators.TextAnalysis.lexicalJsDivergence(clone).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(jc("a") == 0.0 && jc("b") == 0.0)
    val disjoint = (Seq.fill(10)(("a", "aa bb")) ++ Seq.fill(10)(("b", "cc dd")))
      .toDF("source", "text")
    val jd = graft.operators.TextAnalysis.lexicalJsDivergence(disjoint).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(jd("a") == 1.0 && jd("b") == 1.0)
  }

  test("lshDialPlanner equals the closed form; monotone in t and b; the chosen dial is the lexicographic argmin (q289)") {
    def q6(x: Double): Long = math.round(x * 1e6)
    val n = Tables.embeddings(spark, sf).count()
    val p = 1.0 - math.acos(0.9) / math.Pi
    val p0 = 1.0 - math.acos(0.5) / math.Pi
    def r6(t: Long, b: Long): Long = q6(1.0 - math.pow(1.0 - math.pow(p, b), t))
    def a6(t: Long, b: Long): Long = q6(1.0 - math.pow(1.0 - math.pow(p0, b), t))
    val got = Similarity.lshDialPlanner(Tables.embeddings(spark, sf)).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(got.size == 32 * 16)
    def roundK(v: Double, k: Int): Double =
      java.math.BigDecimal.valueOf(v).setScale(k, java.math.RoundingMode.HALF_UP).doubleValue()
    got.foreach { case ((t, b), (rec, adm, cost, cand, meets, _)) =>
      assert(rec == roundK(r6(t, b) / 1e6, 6) && adm == roundK(a6(t, b) / 1e6, 6))
      assert(cost == t * b)
      assert(cand == (BigInt(a6(t, b)) * (n * (n - 1) / 2) + 500000) / 1000000)
      assert(meets == (r6(t, b) >= 950000L))
    }
    // monotone laws on the quantized values: more tables never lose
    // recall; more bits never gain admit
    for (b <- 1L to 16L; t <- 1L until 32L)
      assert(got((t, b))._1 <= got((t + 1, b))._1)
    for (t <- 1L to 32L; b <- 1L until 16L)
      assert(got((t, b))._2 >= got((t, b + 1))._2)
    // the chosen dial: unique, meets the target, and every other
    // meeting dial is lexicographically worse on (admit, cost, t)
    val chosen = got.filter(_._2._6).toSeq
    assert(chosen.size == 1)
    val ((ct, cb), (_, _, ccost, _, _, _)) = chosen.head
    val cKey = (a6(ct, cb) * 1000 + ccost) * 100 + ct
    got.foreach { case ((t, b), (_, _, cost, _, meets, isChosen)) =>
      if (meets && !isChosen)
        assert((a6(t, b) * 1000 + cost) * 100 + t > cKey)
    }
    // the q226 production dial (24 tables x 12 bits) sits on this grid
    // with the documented ~0.98 per-pair recall at tau = 0.9
    val prod = got((24L, 12L))._1
    assert(prod > 0.97 && prod < 0.99, s"24x12 recall drifted: $prod")
    // a 64x32 grid (cost up to 2048) overflowed the former fixed
    // *1000/*100 packing; the widened key must still pick the true
    // lexicographic (admit, cost, t) argmin over ALL meeting dials
    val big = Similarity.lshDialPlanner(Tables.embeddings(spark, sf),
      maxTables = 64, maxBits = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        r.getBoolean(6), r.getBoolean(7)))
    assert(big.length == 64 * 32)
    val bigChosen = big.filter(_._5)
    assert(bigChosen.length == 1)
    val bc = bigChosen.head
    val bKey = (a6(bc._1, bc._2), bc._3, bc._1)
    big.filter(d => d._4 && !d._5).foreach { d =>
      assert(Ordering[(Long, Long, Long)].gt((a6(d._1, d._2), d._3, d._1), bKey),
        s"64x32 grid: ${(d._1, d._2)} beats the chosen dial ${(bc._1, bc._2)}")
    }
    // past the documented packing bound the planner refuses loudly
    val err = intercept[IllegalArgumentException] {
      Similarity.lshDialPlanner(Tables.embeddings(spark, sf),
        maxTables = 2000, maxBits = 2000)
    }
    assert(err.getMessage.contains("grid"))
  }

  test("lofOutliers equals the brute-force integer pipeline; uniform density scores exactly 1; a planted loose point tops the list (q290)") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // brute force off the SAME shared kNN graph, mirroring the exact
    // integer ops (d6 longs, greatest reachability, half-up lrd)
    val edges = Similarity.cellKnnGraph(embs, 5, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round((1.0 - r.getDouble(2)) * 1e6)))
    val kd = edges.groupBy(_._1).view
      .mapValues(g => (g.map(_._3).max, g.length.toLong)).toMap
    val sr = edges.groupBy(_._1).view
      .mapValues(_.map(e => math.max(kd(e._2)._1, e._3)).sum).toMap
    val lrd6 = kd.keys.map { id =>
      val s = sr(id)
      id -> (if (s > 0) Some((2 * kd(id)._2 * 1000000000000L + s) / (2 * s)) else None)
    }.toMap
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val expected = kd.keys.flatMap { id =>
      val nbs = edges.filter(_._1 == id).flatMap(e => lrd6(e._2))
      for {
        l <- lrd6(id) if l > 0 && nbs.nonEmpty
      } yield (id, round4((nbs.sum.toDouble / nbs.length) / l))
    }.toSeq.sortBy(x => (-x._2, x._1)).take(50)
    val got = Similarity.lofOutliers(embs, kCells = 16).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // uniform geometry: all pairwise cosines equal -> every reachability
    // equal -> LOF exactly 1.0 for every emitted point
    def unit(xs: Seq[Double]): Seq[Float] = {
      val n = math.sqrt(xs.map(x => x * x).sum)
      xs.map(x => (x / n).toFloat)
    }
    val dim = 26
    val ortho = (0 until 24).map { i =>
      val v = Array.fill(dim)(0.05); v(i) = 1.0
      (i.toLong, unit(v.toSeq), 0)
    }.toDF("vec_id", "embedding", "label")
    val u = Similarity.lofOutliers(ortho, kCells = 16).collect()
    assert(u.nonEmpty && u.forall(_.getDouble(3) == 1.0),
      "equal pairwise geometry must score LOF exactly 1")
    // a dense core + one LOOSE point (two cells at most, so every point
    // keeps a core-sized neighborhood): core internal cos ~0.991 (d6 ~9e3), loose at
    // cos ~0.64 (d6 ~3.6e5) -> its neighborhood density is ~40x lower
    val core = (0 until 20).map { i =>
      val v = Array.fill(dim)(1.0); v(i % dim) += 0.5
      (i.toLong, unit(v.toSeq), 0)
    }
    val loose = {
      val v = Array.fill(dim)(1.0); v(0) += 8.0
      Seq((99L, unit(v.toSeq), 0))
    }
    val planted = (core ++ loose).toDF("vec_id", "embedding", "label")
    val p = Similarity.lofOutliers(planted, kCells = 2).collect()
    assert(p.head.getLong(0) == 99L, "the loose point must take LOF rank 1")
    assert(p.head.getDouble(3) > 5.0, s"loose-point LOF too small: ${p.head.getDouble(3)}")
    val coreLofs = p.tail.map(_.getDouble(3))
    assert(coreLofs.forall(_ < 1.5), "core points must stay near LOF 1")
  }

  test("tokenBurstiness equals brute force; once-per-doc scores exactly 0, a one-doc burst exactly 10 - 10/N (q297)") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val rows = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nDocs = rows.length.toLong
    val perTok = rows.flatMap { case (id, t) =>
      t.split(" ", -1).filter(_.nonEmpty).groupBy(identity).map {
        case (tok, g) => (tok, id, g.length.toLong)
      }
    }.groupBy(_._1).view.mapValues { g =>
      val s1 = g.map(_._3).sum
      (g.size.toLong, s1, g.map(c => c._3 * c._3).sum)
    }.filter(_._2._1 >= 50L).toMap
    val expected = perTok.map { case (tok, (df, s1, s2)) =>
      (tok, df, s1,
        round4((s2.toDouble - s1.toDouble * s1.toDouble / nDocs) / s1))
    }.toSeq.sortBy(e => (-e._4, e._1)).take(25)
    val got = TextAnalysis.tokenBurstiness(Tables.documents(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // constructed: "flat" appears exactly once in every doc (dispersion
    // exactly 0); "burst" appears 10 times in ONE doc of N = 10
    // (dispersion exactly (100 - 100/10)/10 = 9.0)
    val docs = (1 to 10).map { i =>
      val burst = if (i == 1) " " + ("burst " * 10).trim else ""
      (i.toLong, ("flat" + burst), "en", "s", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val c = TextAnalysis.tokenBurstiness(docs, minDf = 1L).collect()
      .map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(c("flat") == 0.0 && c("burst") == 9.0)
  }

  test("assetStore: parquet BINARY round-trips every kind's bytes; cache hit serves the same files; metadata read prunes payload (round 14)") {
    import Multimodal.{BmpCodec, WavCodec}
    val generators: Map[String, Long => Array[Byte]] = Map(
      "bmp" -> BmpCodec.encode, "wav16" -> WavCodec.encode,
      "wav8" -> WavCodec.encode8, "wav4" -> WavCodec.encode4,
      "wavburst" -> WavCodec.encodeBurst)
    for ((kind, gen) <- generators) {
      val store = Multimodal.assetStore(docs, kind)
      val rows = store.select(col("asset_id"), col("media_type"),
          col("n_bytes"), col("payload"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getAs[Array[Byte]](3)))
      assert(rows.nonEmpty, s"$kind store is empty")
      rows.foreach { case (id, mt, nb, stored) =>
        val fresh = gen(id)
        assert(java.util.Arrays.equals(stored, fresh),
          s"$kind asset $id: stored parquet bytes != generator bytes")
        assert(nb === fresh.length.toLong, s"$kind asset $id n_bytes")
        if (kind == "bmp")
          assert(mt === (if (id % 3 == 0) "image"
                         else if (id % 3 == 1) "audio" else "video"))
        else { assert(mt === "audio"); assert(id % 3 === 1) }
      }
      // wav kinds cover exactly the audio rotation; bmp the whole corpus
      val expectIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
        .filter(d => kind == "bmp" || d % 3 == 1).sorted
      assert(rows.map(_._1).sorted.toSeq === expectIds.toSeq, s"$kind id set")
      // cache hit: a semantically-identical corpus plan re-serves the
      // SAME parquet files (no second write)
      val again = Multimodal.assetStore(Tables.documents(spark, sf), kind)
      assert(again.inputFiles.sorted.toSeq === store.inputFiles.sorted.toSeq,
        s"$kind: cache miss on an identical corpus plan")
    }
    // metadata-only consumers prune the payload column at the reader
    val metaPlan = Multimodal.assetStore(docs, "bmp")
      .select(col("media_type"), col("n_bytes"))
      .queryExecution.executedPlan.toString
    val readSchemas = metaPlan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach(s => assert(!s.contains("payload"),
      s"metadata query must prune payload: $s"))
  }

  test("TarCodec: hand-built golden header parses; writer matches an independent header construction; corrupt/truncated archives fail loudly (round 14)") {
    import graft.operators.WebDataset.TarCodec
    // ---- golden: a 512-byte ustar header built FIELD BY FIELD here,
    // independently of the codec (offsets and the space-seeded checksum
    // straight from the POSIX spec), for member "a.txt" holding "hello"
    val content = "hello".getBytes("US-ASCII")
    val golden = new Array[Byte](512)
    def putG(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, golden, off, b.length)
    }
    putG(0, "a.txt")
    putG(100, "0000644\u0000"); putG(108, "0000000\u0000")
    putG(116, "0000000\u0000")
    putG(124, "00000000005\u0000") // size 5, 11 octal digits
    putG(136, "00000000000\u0000")
    java.util.Arrays.fill(golden, 148, 156, ' '.toByte)
    golden(156) = '0'
    putG(257, "ustar\u0000"); putG(263, "00")
    putG(329, "0000000\u0000"); putG(337, "0000000\u0000")
    val ck = golden.map(_ & 0xff).sum
    putG(148, f"$ck%06o" + "\u0000 ")
    assert(TarCodec.header("a.txt", 5L) === golden,
      "codec header diverges from the independent POSIX construction")
    // a full golden archive: header + padded content + end marker,
    // blocked to 10240 — and the parser must read it back exactly
    val archive = new Array[Byte](10240)
    System.arraycopy(golden, 0, archive, 0, 512)
    System.arraycopy(content, 0, archive, 512, 5)
    val parsed = TarCodec.parse(archive)
    assert(parsed.length === 1 && parsed.head._1 === "a.txt")
    assert(java.util.Arrays.equals(parsed.head._2, content))
    assert(TarCodec.archive(Seq(("a.txt", content))) === archive,
      "writer output diverges from the hand-built golden archive")
    // ---- loud-failure corners
    val flipped = archive.clone(); flipped(0) = 'b' // name byte -> checksum breaks
    val e1 = intercept[IllegalArgumentException](TarCodec.parse(flipped))
    assert(e1.getMessage.contains("checksum"))
    val truncated = java.util.Arrays.copyOfRange(archive, 0, 600)
    val e2 = intercept[IllegalArgumentException](TarCodec.parse(truncated))
    assert(e2.getMessage.contains("corrupt tar"))
    val overrun = archive.clone() // size field says 8 GiB in a 10 KiB buffer
    System.arraycopy("77777777777\u0000".getBytes("US-ASCII"), 0, overrun, 124, 12)
    intercept[IllegalArgumentException](TarCodec.parse(overrun))
    intercept[IllegalArgumentException](TarCodec.header("x" * 101, 1L))
    // ---- padding classes: member sizes straddling block boundaries
    // round-trip (511 -> 1 block, 512 -> 1 block exact, 513 -> 2 blocks)
    val sizes = Seq(0, 1, 511, 512, 513, 1024)
    val mem = sizes.zipWithIndex.map { case (n, i) =>
      (s"m$i.bin", Array.tabulate(n)(j => ((i * 31 + j) % 256).toByte))
    }
    val multi = TarCodec.archive(mem)
    assert(multi.length === TarCodec.archiveBytes(sizes))
    val back = TarCodec.parse(multi)
    assert(back.map(_._1) === mem.map(_._1))
    back.zip(mem).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b)) }
  }

  test("WebDataset shards: member walk equals the per-asset generators; shard grouping law; sample pairing complete (round 14)") {
    import graft.operators.{Multimodal, WebDataset}
    val members = WebDataset.tarMembers(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[Array[Byte]](3)))
    val imageIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 3 == 0).sorted
    assert(members.length === 2 * imageIds.length, "two members per sample")
    // every image id appears exactly once per extension, in its shard
    val span = 3L * WebDataset.ShardAssets
    for (id <- imageIds) {
      val shard = id / span
      val bmp = members.filter(m => m._1 == shard && m._3 == s"$id.bmp")
      val side = members.filter(m => m._1 == shard && m._3 == s"$id.json")
      assert(bmp.length === 1 && side.length === 1, s"sample $id incomplete")
      assert(java.util.Arrays.equals(bmp.head._4, Multimodal.BmpCodec.encode(id)),
        s"member $id.bmp bytes diverge from the generator")
      assert(new String(side.head._4, "US-ASCII") === WebDataset.sidecar(id))
    }
    // archive length on disk == the codec's block arithmetic per shard
    for ((shard, group) <- members.groupBy(_._1)) {
      val lens = group.sortBy(_._3).map(_._4.length)
      // recompute independently of the member ORDER the walk returned
      val expect = WebDataset.TarCodec.archiveBytes(lens)
      assert(group.head._2 === expect.toLong,
        s"shard $shard archive length != block arithmetic")
    }
  }
}
