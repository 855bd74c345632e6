package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for the training-data pipeline (SURVEY.md §2.2 ➕):
  * exact (content-hash groupBy), MinHash+LSH banding, SimHash, and exact
  * n-gram Jaccard. All hash primitives are md5-derived so results are
  * engine-independent (the DuckDB oracles compute the identical values).
  *
  * Scale design:
  *   - exact dedup: one hash-shuffle on the fingerprint, no full-text
  *     comparisons.
  *   - MinHash+LSH: signatures are computed in a single groupBy over
  *     exploded shingles (map-side partial min per hash), candidates come
  *     from band-bucket self-joins (shuffle on band hash, never all-pairs),
  *     then candidates are verified with exact Jaccard. This is the
  *     standard shape that survives 100 TB; the all-pairs variant
  *     (`ngramJaccardPairs`) exists as the small-data oracle/baseline.
  *   - SimHash: per-doc 32-bit signature via one aggregation, then pairs by
  *     signature band (here small-data self-join; at scale, bucket by
  *     signature prefix).
  */
object Dedup {

  /** Character n-gram shingles of `text` (default 5-grams), with
    * multiplicity. `transform(sequence(...))` stays inside codegen.
    */
  def shingleArray(text: Column, n: Int = 5): Column =
    transform(
      // clamp at 1: Spark's sequence(1, 0) would produce a *descending* [1,0]
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** Exact dedup by content fingerprint (md5 of normalized text): keep the
    * smallest doc_id per fingerprint group. Input is unioned with itself to
    * prove duplicates collapse (the fixtures are dup-free).
    */
  def exactDedup(documents: DataFrame): DataFrame = {
    val doubled = documents.select($"doc_id", $"lang", $"text")
      .union(documents.select($"doc_id" + 1000000, $"lang", $"text"))
    doubled
      .groupBy(TextAnalysis.fingerprintCol($"text").as("fingerprint"))
      .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .groupBy()
      .agg(
        count(lit(1)).as("n_unique"),
        sum($"n_copies").as("n_total"),
        sum(when($"n_copies" > 1, 1).otherwise(0)).as("n_dup_groups"))
  }

  /** Distinct shingle set per doc: (doc_id, shingle) rows. */
  private def shingleSet(documents: DataFrame, n: Int): DataFrame =
    documents
      .select($"doc_id", explode(shingleArray($"text", n)).as("g"))
      .distinct()

  /** Exact all-pairs n-gram Jaccard >= threshold. O(pairs-sharing-a-shingle)
    * — correct at small scale and the ground truth the LSH path is verified
    * against; at 100 TB use `minhashLshPairs` instead.
    */
  def ngramJaccardPairs(documents: DataFrame, n: Int = 5, threshold: Double = 0.6): DataFrame = {
    val toks = shingleSet(documents, n)
    val sizes = toks.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val inter = toks.as("a")
      .join(toks.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("id2") === col("s2.doc_id"))
      .select($"id1", $"id2",
        round($"i" / (col("s1.sz") + col("s2.sz") - $"i"), 6).as("jaccard"))
      .filter($"jaccard" >= threshold)
      .orderBy($"id1", $"id2")
  }

  /** MinHash signature entry h_s(doc) = min over shingles g of
    * md5(s || ':' || g), compared lexicographically — a string-valued
    * minhash, identical in any engine with md5. 128 hashes.
    */
  val NumHashes = 128
  val BandRows  = 4
  val NumBands: Int = NumHashes / BandRows // 32

  /** Candidate pairs from LSH banding, verified with exact Jaccard.
    * P(miss) for a pair at similarity s is (1-s^4)^32 — ~5e-8 at s=0.8 —
    * so on data with a similarity gap the output equals the exact
    * all-pairs result while the work stays near-linear.
    */
  def minhashLshPairs(documents: DataFrame, n: Int = 5, threshold: Double = 0.6): DataFrame = {
    val toks = shingleSet(documents, n)
    // one aggregation computes all 128 mins (map-side partial min)
    val sigCols = (0 until NumHashes).map(s => min(md5(concat(lit(s + ":"), $"g"))).as(s"h$s"))
    val sigs = toks.groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*)
    // band hash = md5 of the band's concatenated minhashes
    val bandCols = (0 until NumBands).map { b =>
      val rows = (0 until BandRows).map(r => col(s"h${b * BandRows + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", rows: _*)).as("bh"))
    }
    val buckets = sigs
      .select($"doc_id", explode(array(bandCols: _*)).as("bb"))
      .select($"doc_id", $"bb.band".as("band"), $"bb.bh".as("bh"))
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    // exact-Jaccard verification of candidates only
    val toksA = toks.withColumnRenamed("doc_id", "id1")
    val toksB = toks.toDF("id2b", "g2")
    val sizes = toks.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(toksA, Seq("id1"))
      .join(toksB, $"id2" === $"id2b" && $"g" === $"g2")
      .groupBy($"id1", $"id2")
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("s1"), $"id1" === col("s1.doc_id"))
      .join(sizes.as("s2"), $"id2" === col("s2.doc_id"))
      .select($"id1", $"id2",
        round($"i" / (col("s1.sz") + col("s2.sz") - $"i"), 6).as("jaccard"))
      .filter($"jaccard" >= threshold)
      .orderBy($"id1", $"id2")
  }

  /** 32-bit SimHash: bit i = sign of the +-1 sum over shingles (with
    * multiplicity) of parity(md5(g)[i]) — engine-independent integer
    * arithmetic. One aggregation per doc.
    */
  def simhashSignatures(documents: DataFrame, n: Int = 5): DataFrame = {
    val grams = documents.select($"doc_id", explode(shingleArray($"text", n)).as("g"))
    val bitSums = (0 until 32).map { i =>
      sum(ascii(substring(md5($"g"), i + 1, 1)) % 2 * 2 - 1).as(s"s$i")
    }
    val agg = grams.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 32)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select($"doc_id", sig.as("sig"))
  }

  /** Near-dup pairs by SimHash hamming distance <= maxHamming. Small-data
    * all-pairs on the 1-row-per-doc signature table (cheap); at scale,
    * bucket by signature bands first (pigeonhole: hamming<=k pairs share
    * one of k+1 prefix bands).
    */
  def simhashPairs(documents: DataFrame, n: Int = 5, maxHamming: Int = 1): DataFrame = {
    val sig = simhashSignatures(documents, n)
    sig.as("a")
      .join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        expr("bit_count(a.sig ^ b.sig)").cast("int").as("hamming"))
      .filter($"hamming" <= maxHamming)
      .orderBy($"id1", $"id2")
  }
}
