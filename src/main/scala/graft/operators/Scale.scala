package graft.operators

import org.apache.spark.sql.DataFrame
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
