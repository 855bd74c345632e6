package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only LSH-family scaling experiment (Test/runMain graft.ProfileScaling).
  *
  * Builds synthetic corpora at 1x / 3x / 10x the sf0.1 document count
  * (10x ~ sf1) and measures the q27 core (pair pipeline: banding +
  * candidate generation + exact-Jaccard verification) and the q53 core
  * (connected-component survivors) at each scale, with candidate and
  * pair counts — the empirical check that everything past banding is
  * candidate-proportional, i.e. wall-time and candidate volume grow
  * ~linearly with the corpus.
  *
  * Replica construction: replica 0 is the sf0.1 corpus verbatim; replica
  * r >= 1 maps every word w to the length-preserving pseudo-word
  * substr(md5(w || ':' || r), 1, len(w)). The map is a function of
  * (word, replica) only, so two near-dup documents inside a replica
  * transform identically — each replica carries the same near-dup pair
  * structure — while distinct replicas share (essentially) no
  * vocabulary (no cross-replica near-dups, no artificial quadratic
  * duplicate blowup from naive copying); preserving word lengths keeps
  * the shingle statistics, and hence the background candidate-collision
  * rate, comparable to the original corpus. Corpora are written to
  * target/scaling/ as parquet so every measured run scans from disk
  * like the registered queries.
  */
object ProfileScaling {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outRoot = "target/scaling"
    val spark = GraftSession
      .builder(appName = "graft-scaling", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text")

    def replica(r: Int): DataFrame =
      if (r == 0) base
      else base.select(
        ($"doc_id" + lit(r * 10000000L)).as("doc_id"),
        array_join(
          transform(split($"text", " "),
            w => md5(concat(w, lit(s":$r"))).substr(lit(1), greatest(length(w), lit(1)))),
          " ").as("text"))

    val scales = Seq(1, 3, 10)
    scales.foreach { s =>
      val dir = s"$outRoot/x$s"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        (0 until s).map(replica).reduce(_ union _)
          .repartition(32).write.mode("overwrite").parquet(dir)
      }
    }

    // warm the JIT/codegen on the smallest corpus before measuring —
    // both halves, so the x1 measurement isn't charged one-time compile
    Dedup.clearPairIndexCache()
    Dedup.survivorsOverPairs(Dedup.pairIndex(spark.read.parquet(s"$outRoot/x1"))).count()

    println("[scaling] scale docs candidates pairs t_pairs_s t_components_s")
    val rows = scales.map { s =>
      val docs = spark.read.parquet(s"$outRoot/x$s")
      val nDocs = docs.count()
      Dedup.clearPairIndexCache()
      System.gc()
      // candidate count via the same bucket pipeline (measured separately
      // so the pair timing below stays a single clean pipeline run)
      val (pairs, tPairs) = time {
        val p = Dedup.pairIndex(docs)
        p.count() -> p
      }
      val (nSurv, tComp) = time {
        Dedup.survivorsOverPairs(pairs._2).count()
      }
      val buckets = Dedup.bandBuckets(docs)
        .groupBy($"band", $"bh").agg(count(lit(1)).as("k")).filter($"k" > 1)
        .agg(coalesce(sum(expr("k * (k - 1) div 2")), lit(0L)).cast("long"))
        .collect()(0).getLong(0)
      println(f"[scaling] x$s%-2d $nDocs%6d $buckets%9d ${pairs._1}%5d $tPairs%8.2f $tComp%8.2f surv=$nSurv")
      (s, nDocs, buckets, pairs._1, tPairs, tComp)
    }
    // least-squares scaling exponent of t_pairs vs docs (log-log)
    val xs = rows.map(r => math.log(r._2.toDouble))
    val ys = rows.map(r => math.log(r._5))
    val mx = xs.sum / xs.size; val my = ys.sum / ys.size
    val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    println(f"[scaling] pair-pipeline scaling exponent (log-log slope): $slope%.2f")

    // q97 core (duplicated-span detection): gram counts + islands should
    // scale with gram occurrences, i.e. ~linearly in the corpus. The
    // pseudo-word map preserves each replica's duplicated spans (short
    // words can md5-collide, so replicas run slightly dup-richer than
    // the original — counts are reported, not assumed).
    println("[scaling] spans: scale docs affected dup_tokens t_s")
    val spanRows = scales.map { s =>
      val docs = spark.read.parquet(s"$outRoot/x$s")
      System.gc()
      val (res, t) = time {
        val r = graft.operators.Curation.duplicatedSpans(docs)
          .agg(coalesce(count(lit(1)), lit(0L)).as("affected"),
            coalesce(sum($"dup_tokens"), lit(0L)).as("dup_tokens"))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      println(f"[scaling] spans x$s%-2d ${docs.count()}%6d ${res._1}%6d ${res._2}%9d $t%8.2f")
      (s, t)
    }
    val sx = spanRows.map(r => math.log(r._1.toDouble))
    val sy = spanRows.map(r => math.log(r._2))
    val smx = sx.sum / sx.size; val smy = sy.sum / sy.size
    val sslope = sx.zip(sy).map { case (x, y) => (x - smx) * (y - smy) }.sum /
      sx.map(x => (x - smx) * (x - smx)).sum
    println(f"[scaling] span-pipeline scaling exponent (log-log slope): $sslope%.2f")

    // q106 core (bigram-LM surprisal): the scoring join is the only new
    // token-proportional stage of round 4 — bigram-table rows and
    // wall-time should grow ~linearly (replicas share no vocabulary, so
    // the model table is replica-additive)
    println("[scaling] bigram-lm: scale docs bigram_rows t_s")
    val lmRows = scales.map { s =>
      val docs = spark.read.parquet(s"$outRoot/x$s")
      System.gc()
      val (nBigrams, t) = time {
        val r = graft.operators.TextAnalysis.bigramSurprisal(docs)
        r.write.format("noop").mode("overwrite").save()
        // distinct corpus bigram count = the model-table size
        docs.select(split($"text", " ").as("ts")).filter(size($"ts") >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))")).as("b"))
          .agg(count_distinct($"b")).collect()(0).getLong(0)
      }
      println(f"[scaling] bigram-lm x$s%-2d ${docs.count()}%6d $nBigrams%9d $t%8.2f")
      (s, t)
    }
    val lx = lmRows.map(r => math.log(r._1.toDouble))
    val ly = lmRows.map(r => math.log(r._2))
    val lmx = lx.sum / lx.size; val lmy = ly.sum / ly.size
    val lslope = lx.zip(ly).map { case (x, y) => (x - lmx) * (y - lmy) }.sum /
      lx.map(x => (x - lmx) * (x - lmx)).sum
    println(f"[scaling] bigram-lm scaling exponent (log-log slope): $lslope%.2f")

    // q122 core (rare-term-blocked tf-idf cosine pairs): replicas share
    // no vocabulary, so df stays per-replica and blocked candidates are
    // replica-additive — candidates/pairs should grow ~linearly. (Pair
    // counts can drift a little across scales: N grows, so idf = ln(N/df)
    // reweights the top-8 vectors — reported, not assumed.)
    println("[scaling] tfidf-pairs: scale docs pairs t_s")
    val tpRows = scales.map { s =>
      val docs = spark.read.parquet(s"$outRoot/x$s")
      System.gc()
      val (nPairs, t) = time {
        graft.operators.Matching.tfidfCosinePairs(docs).count()
      }
      println(f"[scaling] tfidf-pairs x$s%-2d ${docs.count()}%6d $nPairs%6d $t%8.2f")
      (s, t)
    }
    val tx = tpRows.map(r => math.log(r._1.toDouble))
    val ty = tpRows.map(r => math.log(r._2))
    val tmx = tx.sum / tx.size; val tmy = ty.sum / ty.size
    val tslope = tx.zip(ty).map { case (x, y) => (x - tmx) * (y - tmy) }.sum /
      tx.map(x => (x - tmx) * (x - tmx)).sum
    println(f"[scaling] tfidf-pairs scaling exponent (log-log slope): $tslope%.2f")

    // q121 core (fuzzy catalog match): the fact table grows 10x but the
    // NAME CATALOG is constant (64 names), so after the distinct-name
    // reduction the matcher's work should be ~flat — the
    // catalog-proportional claim made empirical
    println("[scaling] fuzzy-match: scale rows pairs t_s")
    val partBase = Tables.part(spark, sfDir).select($"p_partkey", $"p_name")
    scales.foreach { s =>
      val rep = (0 until s).map(r =>
        partBase.select(($"p_partkey" + lit(r * 10000000L)).as("p_partkey"), $"p_name"))
        .reduce(_ union _)
      System.gc()
      val (nPairs, t) = time {
        graft.operators.Matching.fuzzyNameMatch(rep).count()
      }
      println(f"[scaling] fuzzy-match x$s%-2d ${rep.count()}%8d $nPairs%5d $t%8.2f")
    }
    spark.stop()
  }
}
