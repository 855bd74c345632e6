package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Aggregators

/** Typed Dataset surface (SURVEY.md §1.4: case-class `Encoder`s where type
  * safety helps): the reference pipeline re-expressed over `Dataset[T]`
  * with a typed Aggregator — compile-time field checks, same physical plan
  * family as the untyped form.
  */
object Typed {

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double)

  /** groupByKey + typed TwoLevelSum (the reference's partial+final sum as
    * an Aggregator) — output canonicalized for the oracle.
    */
  def statusTotals(spark: SparkSession, orders: DataFrame): DataFrame = {
    import spark.implicits.newProductEncoder
    val ds: Dataset[Order] = orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[Order]
    ds.groupByKey(_.o_orderstatus)(org.apache.spark.sql.Encoders.STRING)
      .agg(new Aggregators.TwoLevelSumOf[Order](_.o_totalprice).toColumn.name("raw_total"))
      .toDF("o_orderstatus", "raw_total")
      .select(col("o_orderstatus"), round(col("raw_total"), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }
}
