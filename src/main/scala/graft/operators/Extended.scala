package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave relational surface: grouping sets, date parts, JSON scalar
  * extraction, pivot, and an as-of join composed from built-ins (SURVEY.md
  * §2.2 — Spark has no native as-of join; preference (a) is composition,
  * which keeps Catalyst in full control of the plan).
  */
object Extended {

  /** GROUPING SETS with explicit per-set aggregates (via SQL — also
    * exercises the spark.sql surface over registered views).
    */
  def groupingSets(spark: SparkSession, orders: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Calendar breakdown: year/quarter extraction pushed into one pass. */
  def ordersByCalendar(orders: DataFrame): DataFrame =
    orders
      .groupBy(
        year($"o_orderdate").cast("bigint").as("order_year"),
        quarter($"o_orderdate").cast("bigint").as("order_quarter"))
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"order_year", $"order_quarter")

  /** JSON scalar extraction from the events props column: parse once,
    * aggregate the extracted field. Codegen'd path (get_json_object), no
    * UDFs.
    */
  def jsonStats(events: DataFrame): DataFrame =
    events
      .select($"event_type",
        // try_cast: malformed/non-integer k becomes null on BOTH engines
        // (plain cast would throw under ANSI mode)
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        round(avg($"k"), 4).as("avg_k"))
      .orderBy($"event_type")

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: per-user event-type counts as columns. Explicit value list so
    * the output schema is static (required for a deterministic oracle and
    * for any sane 100 TB plan — value discovery would scan twice).
    */
  def eventPivot(events: DataFrame): DataFrame =
    events
      .groupBy($"user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes)
      .orderBy($"user_id")

  /** Price bands for the range join: irregular [lo, hi) intervals with a
    * sort-stable label prefix.
    */
  val PriceBands: Seq[(String, Double, Double)] = Seq(
    ("b1_budget", 0.0, 50000.0),
    ("b2_standard", 50000.0, 150000.0),
    ("b3_premium", 150000.0, 300000.0),
    ("b4_flagship", 300000.0, 600000.0))

  private val BandBucketWidth = 50000.0

  /** Range (interval-containment) join: each order joins the band whose
    * [lo, hi) interval contains its total price — the brief's "range join"
    * custom operator, built with the interval-bucketing trick instead of a
    * theta join: each band explodes into the fixed-width buckets it
    * overlaps, the fact side computes its bucket, and the join is an
    * EQUI-join on bucket followed by the containment filter. With a
    * four-row band table Spark would happily nested-loop a broadcast; the
    * bucketed shape is the one that still works when the interval table is
    * millions of rows (IP ranges, time windows) — candidate pairs are
    * bounded by overlap, not |fact| x |intervals|.
    */
  def priceBandJoin(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val bands = PriceBands.toDF("band", "lo", "hi")
      .withColumn("bucket",
        explode(sequence(
          ($"lo" / BandBucketWidth).cast("long"),
          // hi is exclusive: the last overlapped bucket starts below hi
          (($"hi" - 0.01) / BandBucketWidth).cast("long"))))
    orders
      .withColumn("bucket", ($"o_totalprice" / BandBucketWidth).cast("long"))
      .join(bands, Seq("bucket"))
      .filter($"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"band")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"band")
  }

  /** As-of join composed from built-ins: each purchase event picks up the
    * most recent click value at-or-before it for the same user. Union the
    * two tagged streams, one window pass per user ordered by time carrying
    * the last non-null click value forward, then keep the purchases. One
    * shuffle on user_id; no range-join explosion — this is the standard
    * Spark-native as-of shape.
    */
  def asofPurchaseClick(events: DataFrame): DataFrame = {
    val tagged = events
      .filter($"event_type".isin("purchase", "click"))
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value",
        when($"event_type" === "click", $"value").as("click_value"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_value", last($"click_value", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id",
        round($"value", 2).as("purchase_value"),
        round(coalesce($"last_click_value", lit(0.0)), 2).as("asof_click_value"))
      .orderBy($"user_id", $"event_id")
  }

  /** The expected event-type catalog for the reconciliation audit:
    * `refund` is expected but absent from the stream, and the stream's
    * `error` type is not in the catalog — so the FULL OUTER join exercises
    * all three null branches non-vacuously.
    */
  val ExpectedEventTypes: Seq[String] = Seq("click", "purchase", "refund", "signup", "view")

  /** Event-type reconciliation — the full-outer join variant (the one
    * member of the join family not yet surfaced as a query): observed
    * stream types vs the expected catalog, classifying each type as
    * matched / catalog_only (expected, never seen) / stream_only
    * (arriving untyped traffic). Aggregate-then-join: the full outer
    * runs over type-cardinality relations, never rows.
    */
  def eventTypeReconciliation(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits.{localSeqToDatasetHolder, newIntEncoder, newStringEncoder}
    val catalog = ExpectedEventTypes.toDF("expected_type")
    events
      .groupBy($"event_type").agg(count(lit(1)).as("n_events"))
      .join(catalog, $"event_type" === $"expected_type", "full_outer")
      .select(
        coalesce($"event_type", $"expected_type").as("etype"),
        when($"event_type".isNotNull && $"expected_type".isNotNull, "matched")
          .when($"event_type".isNull, "catalog_only")
          .otherwise("stream_only").as("status"),
        coalesce($"n_events", lit(0L)).as("n_events"))
      .orderBy($"etype")
  }

  /** ONE SQL text for the correlated-subquery query, shared verbatim by
    * the Spark surface and the DuckDB oracle — the query itself is the
    * contract, the engines differ only in how they plan it. The
    * comparison cross-multiplies in DECIMAL (the q80 discipline) so no
    * float average enters a predicate: `price · n > Σprice` is exact
    * integer-scaled arithmetic on both engines.
    */
  val AboveAvgSpendersSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND CAST(o.o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM orders)
      |        > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders))
      |ORDER BY c_custkey""".stripMargin

  /** Correlated-subquery SQL surface: customers with at least one
    * above-average order — a correlated EXISTS plus two scalar
    * subqueries. The point is the PLANNING: Catalyst decorrelates the
    * EXISTS into a left-semi hash join and evaluates each scalar
    * subquery once (reused broadcast scalar), so the executed plan has
    * no per-row subquery loop — spec-asserted. A user migrating SQL
    * gets set-based plans, not nested iteration.
    */
  def aboveAvgSpenders(spark: SparkSession, customer: DataFrame,
      orders: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("customer")
    orders.createOrReplaceTempView("orders")
    spark.sql(AboveAvgSpendersSql)
  }
}
