package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends GraftSuite {

  test("entry flagship returns 25 nations with positive totals") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 25)
    assert(rows.forall(_.getDouble(1) > 0.0))
  }

  test("every declared query has an oracle or is explicitly rows-only") {
    // driver records a weaker rows-only check for queries without oracles;
    // since round 5 every registered query carries an oracle (q38's
    // approx sketches ride envelope booleans the oracle states literally)
    val rowsOnly = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }

  test("all queries execute and are non-empty except the empty-by-design ones") {
    // FK-clean data => q07 may be empty; random embeddings => q48 empty at 0.9
    val emptyOk = Set("q07_join_anti", "q48_embedding_neardup")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      // scale guard: no registered plan may fall back to an unbroadcast
      // cartesian product (the 1-row scalar crossJoins plan as
      // BroadcastNestedLoopJoin with a broadcast side, which is fine)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      val n = df.count()
      assert(n >= 0, s"$name failed")
      if (!emptyOk(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("range join: bucketed form equals the naive theta join, plan stays equi-join") {
    import graft.operators.Extended
    val orders = Tables.orders(spark, sf)
    val bucketed = Extended.priceBandJoin(orders)
    // naive containment theta join (the oracle's shape) as the ground truth
    val naive = {
      import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
      val bands = Extended.PriceBands.toDF("band", "lo", "hi")
      orders.join(bands, col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("band"))
    }
    assert(bucketed.collect().map(_.toSeq).toSeq === naive.collect().map(_.toSeq).toSeq)
    // every order lands in exactly one band
    assert(bucketed.agg(sum(col("n"))).collect()(0).getLong(0) === orders.count())
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
  }

  test("orphan check: fact FK integrity holds (reference asserts via throw, D/Program.cs:310)") {
    val n = Relational
      .orphanCheck(Tables.orders(spark, sf), Tables.customer(spark, sf))
      .collect()(0).getLong(0)
    assert(n === 0L)
  }

  test("partial/final aggregation equivalence: union-reagg == direct agg") {
    val direct = Relational
      .totalByNation(Tables.orders(spark, sf), Tables.customer(spark, sf), Tables.nation(spark, sf))
      .select("n_name", "total")
    val viaUnion = Relational
      .unionReagg(Tables.orders(spark, sf), Tables.customer(spark, sf), Tables.nation(spark, sf))
    assert(direct.except(viaUnion).isEmpty && viaUnion.except(direct).isEmpty)
  }

  test("aggregation invariant under shuffle-partition count (reference skew/chunking analog)") {
    val expected = Relational.sumByGroup(Tables.lineitem(spark, sf)).collect().toSeq
    for (parts <- Seq(1, 7)) {
      val li = Tables.lineitem(spark, sf).repartition(parts)
      val got = Relational.sumByGroup(li).collect().toSeq
      assert(got === expected, s"mismatch at $parts partitions")
    }
  }

  test("filter and projection push into the parquet scan") {
    val plan = Relational
      .filterProject(Tables.lineitem(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), "expected parquet PushedFilters")
    assert(plan.contains("l_quantity"), "expected pushed quantity predicate")
  }

  test("dimension joins broadcast (no shuffle of the fact side for dims)") {
    val plan = Relational
      .totalByNation(Tables.orders(spark, sf), Tables.customer(spark, sf), Tables.nation(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins, got:\n$plan")
  }

  test("topk plans as TakeOrderedAndProject (no global sort shuffle)") {
    val plan = Relational
      .topK(Tables.orders(spark, sf), Tables.customer(spark, sf), Tables.nation(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject, got:\n$plan")
  }

  test("coalesce default: nulls become 0.0 not dropped") {
    val df = Relational.coalesceDefault(Tables.orders(spark, sf))
    val total = df.agg(sum("n")).collect()(0).getLong(0)
    assert(total === Tables.orders(spark, sf).count())
  }

  test("large orders (Q18 shape): equals brute force; cut is TakeOrderedAndProject") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val qty = li.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val bigKeys = qty.filter(_._2 > 300.0).keySet
    val expected = orders.filter(o => bigKeys(o._1))
      .sortBy(o => (-o._3, o._1)).take(100).map(_._1).toSeq
    val df = Relational.largeOrders(Tables.customer(spark, sf),
      Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    val got = df.collect().map(_.getLong(2)).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k cut, got:\n$plan")
  }

  test("part-supplier counts (Q16 shape): equals brute force; denylist join broadcasts") {
    val denied = Tables.supplier(spark, sf).filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val pairs = Tables.lineitem(spark, sf).select(col("l_partkey"), col("l_suppkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(p => denied(p._2))
    val brands = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3))).toMap
    val expected = pairs.groupBy(p => brands(p._1))
      .map { case (k, g) => (k._1, k._2, k._3, g.map(_._2).distinct.length.toLong) }
      .toSeq.sortBy { case (b, t, s, c) => (-c, b, t, s) }
    val df = Relational.partSupplierCounts(Tables.part(spark, sf),
      Tables.supplier(spark, sf), Tables.lineitem(spark, sf))
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"denylist must broadcast anti-join, got:\n$plan")
  }

  private def utcMillis(day: String): Long =
    java.time.LocalDate.parse(day).atStartOfDay.toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  // fixture date columns are TIMESTAMP_NTZ -> LocalDateTime in rows
  private def tsMillis(r: org.apache.spark.sql.Row, i: Int): Long = r.get(i) match {
    case t: java.sql.Timestamp => t.getTime
    case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  test("late-order priority (Q4 shape): equals brute-force EXISTS; semi-join plan") {
    val lagMs = 60L * 24 * 3600 * 1000
    val lateKeys = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_shipdate"))
      .collect().map(r => (r.getLong(0), tsMillis(r, 1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), tsMillis(r, 1), r.getString(2)))
    val from = utcMillis("1996-01-01")
    val to = utcMillis("1996-07-01")
    val expected = orders
      .filter(o => o._2 >= from && o._2 < to)
      .filter(o => lateKeys.get(o._1).exists(_ > o._2 + lagMs))
      .groupBy(_._3).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val df = Relational.lateOrderPriority(Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join, got:\n$plan")
    // the tsLit dispatch exists to keep this predicate scan-pushable
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") && plan.contains("LessThan(o_orderdate"),
      s"date window must reach the orders scan as pushed filters, got:\n$plan")
  }

  test("shipclass priority (Q12 shape): equals brute-force conditional counts") {
    val prio = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val from = utcMillis("1996-01-01")
    val to = utcMillis("1997-01-01")
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .collect().map(r => (r.getLong(0), r.getString(1), tsMillis(r, 2)))
      .filter(l => l._3 >= from && l._3 < to)
    val high = Set("1-URGENT", "2-HIGH")
    // prio.get mirrors the inner join: an orders-orphan line is dropped,
    // not crashed on (FK-clean today, but the test should share the
    // query's semantics, not assume them)
    val joined = lines.flatMap(l => prio.get(l._1).map(p => (l._2, p)))
    val expected = joined.groupBy(_._1).view.mapValues { g =>
      val h = g.count(x => high(x._2)).toLong
      (h, g.length - h)
    }.toSeq.map { case (f, (h, l)) => (f, h, l) }.sortBy(_._1)
    val df = Relational.shipclassPriority(Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.exists(_._2 > 0) && got.exists(_._3 > 0))
  }

  test("promo revenue share (Q14 shape): equals brute force; one row, bounded pct") {
    val partTypes = Tables.part(spark, sf).select(col("p_partkey"), col("p_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val from = utcMillis("1996-01-01")
    val to = utcMillis("1996-04-01")
    // flatMap over partTypes.get mirrors the inner join: a part-orphan
    // line contributes to NEITHER total, matching the query's semantics
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      .collect().map(r => (r.getLong(0), r.getDouble(1) * (1.0 - r.getDouble(2)),
        tsMillis(r, 3)))
      .filter(l => l._3 >= from && l._3 < to)
      .flatMap(l => partTypes.get(l._1).map(t => (t, l._2)))
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val promo = r2(lines.filter(_._1 == "PROMO").map(_._2).sum)
    val total = r2(lines.map(_._2).sum)
    val row = Relational.promoRevenueShare(Tables.part(spark, sf), Tables.lineitem(spark, sf))
      .collect() match { case Array(r) => r }
    // half-cent tolerance: the in-JVM sum and Spark's distributed agg
    // accumulate in different orders; a true sum within FP noise of an
    // x.xx5 boundary may round to different cents (the oracle gate is
    // the bit-level check; decimalTotals is the order-invariant form)
    assert(math.abs(row.getDouble(1) - promo) <= 0.011, s"promo ${row.getDouble(1)} vs $promo")
    assert(math.abs(row.getDouble(2) - total) <= 0.011, s"total ${row.getDouble(2)} vs $total")
    assert(row.getDouble(0) > 0.0 && row.getDouble(0) < 100.0)
  }

  test("money4 discipline: EXACT cent totals, association-order-free (q182)") {
    // mirrors the operator's integer boundary in the JVM: per-row
    // half-up quantize to 1e-4 units (BigDecimal.valueOf is Spark
    // ROUND's own double path — same shortest-repr HALF_UP), exact
    // long sum (order-free by construction), half-up to cents
    def q4(x: Double): Long = java.math.BigDecimal.valueOf(x * 10000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    def dollars(r4: Long): Double = math.floor((r4 + 50) / 100.0) / 100.0
    val partTypes = Tables.part(spark, sf).select(col("p_partkey"), col("p_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val from = utcMillis("1996-01-01"); val to = utcMillis("1996-04-01")
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      .collect().map(r => (r.getLong(0), r.getDouble(1) * (1.0 - r.getDouble(2)),
        tsMillis(r, 3)))
      .filter(l => l._3 >= from && l._3 < to)
      .flatMap(l => partTypes.get(l._1).map(t => (t, l._2)))
    val promo = dollars(lines.filter(_._1 == "PROMO").map(l => q4(l._2)).sum)
    val total = dollars(lines.map(l => q4(l._2)).sum)
    val row = Relational.promoRevenueShare(Tables.part(spark, sf), Tables.lineitem(spark, sf))
      .collect() match { case Array(r) => r }
    // NO tolerance: the long accumulation is association-order-free, so
    // distributed and in-JVM totals are the same bits — the property the
    // old round(sum(double), 2) path could not promise near x.xx5
    assert(row.getDouble(1) === promo, s"promo ${row.getDouble(1)} vs $promo")
    assert(row.getDouble(2) === total, s"total ${row.getDouble(2)} vs $total")
    // partition invariance: a different physical layout, identical bits
    val row2 = Relational.promoRevenueShare(Tables.part(spark, sf),
      Tables.lineitem(spark, sf).repartition(7)).collect() match { case Array(r) => r }
    assert(row2.getDouble(1) === row.getDouble(1) &&
      row2.getDouble(2) === row.getDouble(2) &&
      row2.getDouble(0) === row.getDouble(0))
  }

  // ---- derived partsupp + the three previously fixture-blocked TPC-H shapes

  /** In-JVM re-derivation of Tables.partsuppDerived: (availqty, cost_c). */
  private def brutePartsupp(): Map[(Long, Long), (Long, Long)] =
    Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1).view.mapValues { g =>
        val qty = g.map(_._2._1).sum.toLong
        val cents = g.map(x => java.math.BigDecimal.valueOf(x._2._2 * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()).sum
        (qty, cents / qty)
      }.toMap

  test("partsuppDerived == in-JVM derivation; positive costs; pair-grain keys") {
    val got = Tables.partsuppDerived(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val expected = brutePartsupp()
    assert(got === expected)
    assert(got.nonEmpty && got.values.forall { case (q, c) => q > 0 && c > 0 })
  }

  test("min-cost supplier (Q2 shape): every row hits its part's regional minimum") {
    val ps = brutePartsupp()
    val euSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE").select(col("s_suppkey"))
      .collect().map(_.getLong(0)).toSet
    val targets = Tables.part(spark, sf)
      .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val minC = ps.toSeq
      .filter { case ((p, s), _) => targets(p) && euSupp(s) }
      .groupBy(_._1._1).view.mapValues(_.map(_._2._2).min).toMap
    val got = Relational.minCostSupplier(Tables.part(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf), Tables.region(spark, sf),
      Tables.partsuppDerived(spark, sf)).collect()
    assert(got.nonEmpty)
    // completeness: one row per (part, min-cost supplier) pair under the cap
    val expectedRows = ps.toSeq.collect {
      case ((p, s), (_, c)) if targets(p) && euSupp(s) && c == minC(p) => (p, s) }.toSet
    assert(got.length === expectedRows.size)
    got.foreach { r =>
      val p = r.getLong(3)
      assert(math.round(r.getDouble(5) * 100) === minC(p),
        s"part $p: ${r.getDouble(5)} is not the regional min ${minC(p)}")
    }
  }

  test("product profit (Q9 shape): equals brute force per (nation, year)") {
    val ps = brutePartsupp()
    val boltParts = Tables.part(spark, sf).filter(col("p_name").contains("bolt"))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val suppNat = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orderYear = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderdate"))
      .collect().map { r =>
        val y = r.get(1) match {
          case t: java.time.LocalDateTime => t.getYear
          case t: java.sql.Timestamp => t.toLocalDateTime.getYear
        }
        r.getLong(0) -> y
      }.toMap
    def q4(x: Double): Long = java.math.BigDecimal.valueOf(x * 10000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val expected = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .filter(r => boltParts(r.getLong(0)))
      .map { r =>
        val cost = ps((r.getLong(0), r.getLong(1)))._2
        ((suppNat(r.getLong(1)), orderYear(r.getLong(2))),
          q4(r.getDouble(4) * (1.0 - r.getDouble(5))) -
            cost * 100L * r.getDouble(3).toLong)
      }
      .groupBy(_._1).view
      .mapValues(g => math.floor((g.map(_._2).sum + 50) / 100.0) / 100.0)
      .toMap
    val got = Relational.productTypeProfit(Tables.part(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf), Tables.orders(spark, sf),
      Tables.lineitem(spark, sf), Tables.partsuppDerived(spark, sf)).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got.nonEmpty && got === expected)
  }

  test("important stock (Q11 shape): exactly the parts above 1.5x the mean value") {
    val ps = brutePartsupp()
    val euSupp = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE").select(col("s_suppkey"))
      .collect().map(_.getLong(0)).toSet
    val perPart = ps.toSeq
      .filter { case ((_, s), _) => euSupp(s) }
      .groupBy(_._1._1).view
      .mapValues(_.map { case (_, (q, c)) => c * q }.sum).toMap
    val total = perPart.values.sum
    val n = perPart.size.toLong
    val expected = perPart.collect {
      case (p, v) if v * n * 2 > 3 * total => p -> v / 100.0 }.toMap
    val got = Relational.importantStock(Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf),
      Tables.partsuppDerived(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty && got === expected)
    // descending-value order with partkey tiebreak is a total order
    val rows = Relational.importantStock(Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf),
      Tables.partsuppDerived(spark, sf)).collect()
      .map(r => (r.getDouble(1), r.getLong(0)))
    assert(rows.sliding(2).forall {
      case Array((v1, p1), (v2, p2)) => v1 > v2 || (v1 == v2 && p1 < p2)
      case _ => true
    })
  }

  test("customer distribution (Q13 shape): equals brute force; zero bucket kept") {
    val byCust = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") =!= "F")
      .select(col("o_custkey")).collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val custs = Tables.customer(spark, sf).select(col("c_custkey")).collect().map(_.getLong(0))
    val expected = custs.map(c => byCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case (c, n) => (c, n) }
      .sortBy { case (c, n) => (-n, -c) }
    val got = Relational.customerOrderDistribution(
        Tables.customer(spark, sf), Tables.orders(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    // every customer lands in exactly one bucket — the left join's promise
    assert(got.map(_._2).sum === custs.length.toLong)
  }

  test("small-qty revenue (Q17 shape): equals brute-force correlated avg; no fact shuffle join") {
    val brandParts = Tables.part(spark, sf).filter(col("p_brand") === "Brand#5")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(l => brandParts(l._1))
    val avgQ = lines.groupBy(_._1).view.mapValues(g => g.map(_._2).sum / g.length).toMap
    val expected = lines.filter(l => l._2 < 0.2 * avgQ(l._1)).map(_._3).sum / 7.0
    val df = Relational.smallQuantityRevenue(Tables.part(spark, sf), Tables.lineitem(spark, sf))
    val got = df.collect() match { case Array(r) => r.getDouble(0) }
    assert(math.abs(got - expected) <= 0.011, s"$got vs $expected")
    // both the brand key set and the per-part average frame must broadcast:
    // the fact table is never the build side and never shuffles for a join
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"Q17 must not sort-merge the fact table:\n$plan")
  }

  test("idle balance (Q22 shape): equals brute force; scalar subquery broadcasts") {
    val openCusts = Tables.orders(spark, sf).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val custs = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val nations = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val pos = custs.map(_._2).filter(_ > 0.0)
    val avgBal = pos.sum / pos.length
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = custs
      .filter(c => !openCusts(c._1) && c._2 > avgBal)
      .groupBy(c => nations(c._3)).view
      .mapValues(g => (g.length.toLong, r2(g.map(_._2).sum)))
      .toSeq.map { case (n, (cnt, bal)) => (n, cnt, bal) }.sortBy(_._1)
    val df = Relational.idleCustomerBalance(
      Tables.customer(spark, sf), Tables.orders(spark, sf), Tables.nation(spark, sf))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(x => (x._1, x._2)) === expected.map(x => (x._1, x._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) <= 0.011, s"${g._1}: ${g._3} vs ${e._3}") }
    assert(got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must plan as anti join:\n$plan")
  }

  test("nation volume (Q7 shape): equals brute force; dimension chains broadcast") {
    val suppNat = dimNation(Tables.supplier(spark, sf), "s_suppkey", "s_nationkey")
    val custNat = dimNation(Tables.customer(spark, sf), "c_custkey", "c_nationkey")
    val orderCust = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val from = utcMillis("1996-01-01"); val to = utcMillis("1998-01-01")
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getLong(0), r.getLong(1), tsMillis(r, 2),
        r.getDouble(3) * (1.0 - r.getDouble(4))))
      .filter(l => l._3 >= from && l._3 < to)
      .map { l =>
        val sn = suppNat(l._2); val cn = custNat(orderCust(l._1))
        val yr = java.time.Instant.ofEpochMilli(l._3).atZone(java.time.ZoneOffset.UTC).getYear
        ((sn, cn, yr), l._4)
      }
      .filter { case ((sn, cn, _), _) =>
        (sn == "NATION_12" && cn == "NATION_13") || (sn == "NATION_13" && cn == "NATION_12") }
      .groupBy(_._1).view.mapValues(g => r2(g.map(_._2).sum))
      .toSeq.map { case ((sn, cn, yr), rev) => (sn, cn, yr, rev) }.sortBy(x => (x._1, x._2, x._3))
    val df = Relational.nationVolumeShipping(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got.map(x => (x._1, x._2, x._3)) === expected.map(x => (x._1, x._2, x._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) <= 0.011, s"${g._1}->${g._2}/${g._3}: ${g._4} vs ${e._4}") }
    assert(got.nonEmpty)
  }

  test("market share (Q8 shape): equals brute force; share in (0,1)") {
    val suppNat = dimNation(Tables.supplier(spark, sf), "s_suppkey", "s_nationkey")
    val natRegion = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_regionkey"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val regions = Tables.region(spark, sf).select(col("r_regionkey"), col("r_name"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val custRegion = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => r.getLong(0) -> regions(natRegion(r.getInt(1)))).toMap
    val typedParts = Tables.part(spark, sf).filter(col("p_type") === "STANDARD")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val from = utcMillis("1996-01-01"); val to = utcMillis("1998-01-01")
    val ordersIn = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), r.getLong(1), tsMillis(r, 2)))
      .filter(o => o._3 >= from && o._3 < to && custRegion(o._2) == "ASIA")
      .map(o => o._1 -> java.time.Instant.ofEpochMilli(o._3)
        .atZone(java.time.ZoneOffset.UTC).getYear).toMap
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3) * (1.0 - r.getDouble(4))))
      .filter(l => typedParts(l._2) && ordersIn.contains(l._1))
      .map(l => (ordersIn(l._1), suppNat(l._3) == "NATION_3", l._4))
      .groupBy(_._1).view.mapValues { g =>
        (r2(g.filter(_._2).map(_._3).sum), r2(g.map(_._3).sum))
      }.toSeq.map { case (yr, (nat, tot)) => (yr, nat, tot) }.sortBy(_._1)
    val df = Relational.nationMarketShare(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf), Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf), Tables.part(spark, sf))
    val got = df.collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got.map(_._1) === expected.map(_._1))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._2) <= 0.011 && math.abs(g._4 - e._3) <= 0.011,
        s"year ${g._1}: (${g._3},${g._4}) vs (${e._2},${e._3})")
      assert(g._2 >= 0.0 && g._2 <= 1.0)
    }
    assert(got.nonEmpty)
  }

  test("brand bands (Q19 shape): equals brute force; envelope filters push to both scans") {
    val partInfo = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val bands = Seq(("Brand#3", 1, 10, 5.0, 15.0), ("Brand#12", 1, 20, 15.0, 25.0),
      ("Brand#21", 1, 30, 25.0, 35.0))
    def qualifies(brand: String, size: Int, qty: Double): Boolean =
      bands.exists { case (b, s1, s2, q1, q2) =>
        brand == b && size >= s1 && size <= s2 && qty >= q1 && qty <= q2 }
    val expected = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2) * (1.0 - r.getDouble(3))))
      .flatMap(l => partInfo.get(l._1).map { case (b, s) => (b, s, l._2, l._3) })
      .filter(x => qualifies(x._1, x._2, x._3)).map(_._4).sum
    val df = Relational.brandBandRevenue(Tables.part(spark, sf), Tables.lineitem(spark, sf))
    val got = df.collect() match { case Array(r) => r.getDouble(0) }
    assert(math.abs(got - expected) <= 0.011, s"$got vs $expected")
    // the OR's derivable hulls must reach both parquet scans as pushed filters
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_quantity") && plan.contains("LessThanOrEqual(l_quantity"),
      s"quantity hull must push to the lineitem scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(p_size") && plan.contains("LessThanOrEqual(p_size"),
      s"size hull must push to the part scan:\n$plan")
  }

  test("top supplier (Q15 shape): equals brute force; genuine ties all surface") {
    val from = utcMillis("1996-01-01"); val to = utcMillis("1996-04-01")
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rev = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getLong(0), tsMillis(r, 1), r.getDouble(2) * (1.0 - r.getDouble(3))))
      .filter(l => l._2 >= from && l._2 < to)
      .groupBy(_._1).view.mapValues(g => r2(g.map(_._3).sum)).toMap
    val names = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mx = rev.values.max
    val expected = rev.filter(_._2 == mx).toSeq
      .map { case (k, v) => (k, names(k), v) }.sortBy(_._1)
    val got = Relational.topSupplierRevenue(Tables.supplier(spark, sf), Tables.lineitem(spark, sf))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // sums are rounded on both sides; match keys exactly, values to a half-cent
    assert(got.map(_._1) === expected.map(_._1))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._2 === e._2 && math.abs(g._3 - e._3) <= 0.011) }
    assert(got.nonEmpty)
  }

  test("forecast revenue (Q6 shape): equals brute force; every conjunct pushes to the scan") {
    val from = utcMillis("1996-01-01"); val to = utcMillis("1997-01-01")
    val lines = Tables.lineitem(spark, sf)
      .select(col("l_shipdate"), col("l_discount"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (tsMillis(r, 0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .filter(l => l._1 >= from && l._1 < to &&
        l._2 >= 0.05 && l._2 <= 0.07 && l._3 < 24.0)
    val df = Relational.forecastRevenueDelta(Tables.lineitem(spark, sf))
    val row = df.collect() match { case Array(r) => r }
    assert(row.getLong(1) === lines.length.toLong)
    assert(math.abs(row.getDouble(0) - lines.map(l => l._4 * l._2).sum) <= 0.011)
    // the default 100-char metadata clip truncates the PushedFilters
    // list mid-entry; widen it for the assertion window only
    val key = "spark.sql.maxMetadataStringLength"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "4096")
      val plan = Relational.forecastRevenueDelta(Tables.lineitem(spark, sf))
        .queryExecution.executedPlan.toString
      Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity").foreach(p =>
        assert(plan.contains(p), s"conjunct $p must reach the scan:\n$plan"))
    } finally spark.conf.set(key, prev)
  }

  // shared dim-chain helper: key -> nation name through the nation table
  private def dimNation(dim: org.apache.spark.sql.DataFrame,
      keyCol: String, natCol: String): Map[Long, String] = {
    val nations = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    dim.select(col(keyCol), col(natCol))
      .collect().map(r => r.getLong(0) -> nations(r.getInt(1))).toMap
  }
}
