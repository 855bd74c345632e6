package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators for the cases AQE cannot rewrite
  * (e.g., skewed aggregation keys, or a skewed join below a stage AQE has
  * already committed). The reference hard-codes one skew strategy — roll
  * probe chunks over at 1M rows while reusing the build side
  * (`/root/reference/D/Program.cs:131-139`); salting is the shuffle-native
  * generalization: spread one hot key over `salts` reducers, then (for
  * aggregation) fold the partials.
  */
object Scale {

  /** Salted two-phase aggregation: sum(valueCol) by key where some keys are
    * hot. Phase 1 groups by (key, salt) — the hot key spreads over `salts`
    * reducers; phase 2 folds the per-salt partials. Deterministic: the salt
    * comes from hashing `saltSource`, not from rand().
    */
  def saltedSumByKey(
      df: DataFrame, key: String, valueCol: String, saltSource: String,
      salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(xxhash64(col(saltSource)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))

  /** Deterministic fixed-size per-group top-K by a rank key, selected in
    * two stages: a per-(group, salt) pre-rank keeps at most K rows per
    * salted cell, then the final per-group rank runs over the ~64*K
    * finalists. Exactly equal to the single global per-group rank (each
    * cell's top-K contains every row that could be in the group's global
    * top-K), but no reducer ever sees more than 1/64th of a group — a
    * low-cardinality group column would otherwise funnel the corpus
    * through a handful of partitions. Shared by `Similarity.labelCohesion`
    * and `Sampling.stratifiedSample`.
    */
  def topKPerGroup(df: DataFrame, group: Column, rankKey: Column, tie: Column,
      saltSource: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = df
      .withColumn("_rkey", rankKey)
      .withColumn("_salt", pmod(xxhash64(saltSource), lit(64)))
    val preW = Window.partitionBy(group, col("_salt")).orderBy(col("_rkey"), tie)
    val w = Window.partitionBy(group).orderBy(col("_rkey"), tie)
    salted
      .withColumn("_prn", row_number().over(preW)).filter(col("_prn") <= k)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .drop("_rkey", "_salt", "_prn", "_rn")
  }

  /** Salted equi-join for a skewed fact side: the dim side is replicated
    * `salts` times (explode over the salt range — dim must be small enough
    * to replicate, which is exactly the skewed-join regime), the fact side
    * gets a deterministic salt, and the join key becomes (key, salt). The
    * hot fact key now lands on `salts` reducers instead of one.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, factSaltSource: String,
      salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(xxhash64(col(factSaltSource)), lit(salts)))
    val saltedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("bigint"))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
