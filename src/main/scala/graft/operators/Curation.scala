package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the training-data pipeline (SURVEY.md §2.2
  * ➕): benchmark decontamination, repetition-based quality signals, and
  * source-mixture rebalancing — the steps that sit between dedup and
  * tokenization in a real 100 TB curation run.
  *
  * All formulas are exact integer counts and deterministic double ratios
  * (rounded to 6 decimals), so the DuckDB oracles reproduce every row
  * bit-for-bit.
  */
object Curation {

  /** Word n-grams of `text` (whitespace tokens joined with single spaces),
    * with multiplicity. Empty array when the document has fewer than `n`
    * words — the explicit branch matters because Spark's `sequence(1, 0)`
    * DESCENDS and ANSI-mode `element_at` past the end throws.
    */
  def wordGrams(text: Column, n: Int): Column = {
    val ws = split(text, " ")
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark decontamination: flag corpus documents whose distinct word
    * `n`-gram sets overlap a benchmark/eval set (here: `doc_id <
    * nBenchmark`) above `threshold` — the standard guard against test-set
    * leakage into training data.
    *
    * Scale design: the benchmark side is the published eval suites — tiny
    * relative to the corpus and explicitly `broadcast` — so the contaminated-
    * gram probe is a broadcast hash join against the corpus's exploded
    * grams (no shuffle of the big side); the only shuffle is the per-doc
    * count aggregation over the matching grams, which is
    * benchmark-proportional, not corpus-proportional. At 100 TB the same
    * plan holds: corpus scan → broadcast probe → near-empty aggregate.
    */
  def decontaminate(documents: DataFrame, nBenchmark: Long = 50, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val bench = documents.filter($"doc_id" < nBenchmark)
      .select(explode(array_distinct(wordGrams($"text", n))).as("g"))
      .distinct()
    documents.filter($"doc_id" >= nBenchmark)
      .select($"doc_id", array_distinct(wordGrams($"text", n)).as("gs"))
      .select($"doc_id", size($"gs").cast("long").as("n_grams"), explode($"gs").as("g"))
      .join(broadcast(bench), Seq("g"))
      .groupBy($"doc_id", $"n_grams")
      .agg(count(lit(1)).as("n_contaminated"))
      .select($"doc_id", $"n_grams", $"n_contaminated",
        round($"n_contaminated" / $"n_grams", 6).as("contamination"))
      .filter($"contamination" >= threshold)
      .orderBy($"doc_id")
  }

  /** Per-document repetition signals (the Gopher/MassiveText-style quality
    * rules): fraction of all word 2-grams claimed by the single most
    * frequent one, duplicate fraction of word 2-grams, and duplicate
    * fraction of word 3-grams. High values mark boilerplate / TEMPLATE spam
    * that survives exact dedup because of small edits.
    *
    * Shape: explode grams → per-(doc, gram) count (map-side partial
    * aggregation absorbs the fan-out) → per-doc ratios. One shuffle per
    * gram width, both keyed on doc_id-compatible keys; no joins against
    * the corpus, no driver-side state.
    */
  def repetitionSignals(documents: DataFrame): DataFrame = {
    def dupStats(n: Int, top: Boolean): DataFrame = {
      val counts = documents
        .select($"doc_id", explode(wordGrams($"text", n)).as("g"))
        .groupBy($"doc_id", $"g")
        .agg(count(lit(1)).as("c"))
      val aggs = Seq(
        round((sum($"c") - count(lit(1))) / sum($"c"), 6).as(s"dup_${n}gram_frac")) ++
        (if (top) Seq(round(max($"c") / sum($"c"), 6).as(s"top_${n}gram_frac")) else Nil)
      counts.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
    }
    dupStats(2, top = true)
      .join(dupStats(3, top = false), Seq("doc_id"))
      .select($"doc_id", $"top_2gram_frac", $"dup_2gram_frac", $"dup_3gram_frac")
      .orderBy($"doc_id")
  }

  /** Source-mixture rebalancing: per (lang, source) stratum, its document
    * and token mass, its share of the corpus, and the sampling weight that
    * would draw a uniform-over-strata mixture — the bookkeeping behind
    * "upsample the small domains" mixing policies.
    *
    * Shape: one corpus scan → groupBy(lang, source) with map-side combine;
    * the corpus-wide totals come from an unpartitioned window over the
    * AGGREGATED frame (rows = stratum count, not corpus size), so no second
    * scan and no driver round-trip.
    */
  def mixtureWeights(documents: DataFrame): DataFrame = {
    val groups = documents
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split($"text", " ")).cast("long")).as("tokens"))
    val w = Window.partitionBy() // bounded by stratum count, not corpus rows
    groups
      .select($"lang", $"source", $"n_docs", $"tokens",
        sum($"tokens").over(w).as("total_tokens"),
        count(lit(1)).over(w).as("n_strata"))
      .select($"lang", $"source", $"n_docs", $"tokens",
        round($"tokens" / $"total_tokens", 6).as("token_share"),
        round($"total_tokens" / ($"n_strata" * $"tokens"), 6).as("uniform_weight"))
      .orderBy($"lang", $"source")
  }
}
