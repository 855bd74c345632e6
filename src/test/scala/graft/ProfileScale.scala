package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only one-decade scale experiment (Test/runMain) — the r7/r8
  * verdicts' oldest open ask: every committed number is sf0.1; this
  * runs the five headline index carriers (q27 LSH near-dup, q48
  * bucketed embedding near-dup, q143 classifier training, q148 PQ ANN,
  * q178 containment discovery) COLD on a deterministic ×REPL
  * (default 10) inflation of the sf0.1 fixtures, so the committed
  * record gains one measured decade instead of replica extrapolation.
  *
  * Inflation is designed so per-replica work is an EXACT copy of the
  * original and cross-replica work is nil — i.e. the honest linear
  * yardstick (ideal = ×REPL wall): a sublinear measurement means fixed
  * costs amortize; superlinear means a stage scales with a cross-record
  * structure it shouldn't.
  *
  * - documents ×REPL: replica r>0 shifts doc_id by r·10M and suffixes
  *   every whitespace token with `~r`. Replica vocabularies are
  *   DISJOINT, so shingle/minhash/containment candidates stay within a
  *   replica and candidate volume scales exactly ×REPL; doc count,
  *   per-doc token counts, and df RANKS are preserved per replica.
  * - embeddings ×REPL: replica r>0 shifts vec_id by r·10M and applies a
  *   per-replica deterministic ±1 diagonal (sign = parity of
  *   hash(dim_index, r)). A shared diagonal is an isometry — dot(S·x,
  *   S·y) = dot(x, y) — so every replica's pairwise geometry (cosines,
  *   distances, near-dup pairs) is bit-identical to the original, while
  *   cross-replica signs decorrelate (no new near-dup pairs).
  *
  * The inflated tables land as plain parquet under a scratch dir laid
  * out like a fixture dir, so each carrier runs through the REGISTERED
  * SparkEntry.queries path unchanged. q178 is additionally run at
  * verifyWaves ∈ {1,4}: peak live shingle-array volume in the verify
  * join is the one stage the wave dial exists for, and ×10 is where it
  * should start to matter.
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
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)
    val docsN: DataFrame = (0 until repl).map { r =>
      if (r == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1~" + r))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionAll _)
    val embsN: DataFrame = (0 until repl).map { r =>
      if (r == 0) embs
      else embs
        .withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, i) -> CASE WHEN pmod(hash(i, $r), 2) = 0 THEN x ELSE -x END)"))
    }.reduce(_ unionAll _)
    docsN.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embsN.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val nd = spark.read.parquet(s"$outDir/documents.parquet").count()
    val ne = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    println(s"[scale] inflated fixtures at $outDir: documents=$nd embeddings=$ne (x$repl of $sfDir)")

    // JVM/codegen warm-up outside the measured region (the bench's move)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // ---- the measured region: registered carriers, cold, bench order --
    val carriers = Seq("q27_dedup_minhash_lsh", "q48_embedding_neardup",
      "q143_classifier_weights", "q148_pq_ann", "q152_pc1_power",
      "q178_containment")
    carriers.foreach { name =>
      time(s"x$repl ${name}") {
        SparkEntry.queries(name)(spark, outDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // the wave dial's raison d'être is bounded peak live array volume in
    // the verify join — measure it where it should matter
    for (w <- Seq(1, 4)) time(s"x$repl q178 containmentDiscover waves=$w") {
      Dedup.containmentDiscover(
          Tables.documents(spark, outDir), verifyWaves = w)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
