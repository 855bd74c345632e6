package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver fixtures (TESTDATA.md).
  *
  * Parquet self-describes its schema, so no explicit StructType is needed;
  * Catalyst prunes columns and pushes predicates into the scan
  * (`PushedFilters` / `ReadSchema` in `.explain("formatted")`), which is the
  * Spark-native version of the reference's hand-fused projection-at-scan
  * (`/root/reference/D/Program.cs:421-427`, `:446-453`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Expected Spark logical type(s) per fixture column — the drift guard's
    * reference. The driver regenerates /root/testdata between rounds and
    * has silently migrated physical types before (TIMESTAMP(NANOS) →
    * TIMESTAMP(MICROS) broke every events query for a day); this turns
    * the next migration into a named one-line diagnosis at first load.
    * Timestamp columns accept {timestamp, timestamp_ntz, bigint}: all
    * three encodings the loaders know how to normalize; anything ELSE
    * (or a renamed/added column) is what the warning exists for.
    */
  private val TsTypes = Set("timestamp", "timestamp_ntz", "bigint")
  private val ExpectedColumns: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> TsTypes, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> TsTypes),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> TsTypes,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>", "array<double>"),
      "label" -> Set("int")))

  /** Diagnose a loaded fixture schema against the expectation: missing,
    * renamed/added, and type-migrated columns, each as one named line.
    * Pure on the schema so specs can fake a drifted fixture.
    */
  def fixtureDrift(name: String,
      schema: org.apache.spark.sql.types.StructType): Seq[String] =
    ExpectedColumns.get(name).toSeq.flatMap { exp =>
      val have = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
      val expNames = exp.map(_._1).toSet
      val missing = exp.collect { case (c, _) if !have.contains(c) =>
        s"$name.$c is MISSING (fixture dropped or renamed the column)" }
      val extra = schema.fieldNames.filterNot(expNames).toSeq.map(c =>
        s"$name.$c (${have(c)}) is NEW (fixture grew a column)")
      val changed = exp.collect {
        case (c, ok) if have.contains(c) && !ok(have(c)) =>
          s"$name.$c reads as ${have(c)}, expected ${ok.mkString(" or ")} " +
            "(physical-type migration — check the loader's normalization)" }
      missing ++ extra ++ changed
    }

  /** DATA-level drift probe for the byte==char assumption the multimodal
    * frame ops lean on: `framePhashNearDup`/`frameDedup`/`frameSample`
    * slice the binary payload by BYTE offsets while their DuckDB oracles
    * slice `documents.text` with substr (CHARACTER offsets) — DuckDB 1.0
    * has no md5-over-BLOB, so the oracle cannot slice bytes. The two
    * agree exactly when every document is pure ASCII (1 byte per char),
    * which the driver fixtures guarantee; a regenerated fixture with
    * multi-byte UTF-8 text would silently change frame checksums and
    * fail the q203/q94 gates with no hint why. This probe names that
    * cause: it counts documents whose UTF-8 byte length differs from
    * their character length (one scan, one scalar). Specs assert 0 on
    * the fixtures; run it first when a frame-family gate breaks.
    */
  def nonAsciiDocs(documents: DataFrame): Long =
    documents.filter(org.apache.spark.sql.functions.octet_length(
        org.apache.spark.sql.functions.col("text")) =!=
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .count()

  /** Data-level drift probe for `partsuppDerived`'s two fixture
    * invariants (same pattern as [[nonAsciiDocs]]): counts lineitem
    * rows whose `l_quantity` is fractional or non-positive.
    *
    * Why both engines need it: the derivation (and Relational's Q9
    * consumer) takes `sum(l_quantity).cast("long")`, where Spark's
    * double→long cast TRUNCATES but the DuckDB oracle's
    * `CAST(... AS BIGINT)` rounds to NEAREST — they agree only while
    * every quantity is integer-valued, so a regenerated fixture with
    * fractional quantities would silently diverge all three q211–q213
    * gates with no hint why. And `cents div ps_availqty` throws ANSI
    * DIVIDE_BY_ZERO if any (part,supplier) group sums to zero quantity
    * — loud but far from the cause. Specs assert 0 on the fixtures;
    * run this first when a partsupp-family gate breaks.
    */
  def quantityDriftRows(lineitem: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    lineitem.filter(col("l_quantity") =!= floor(col("l_quantity")) ||
        col("l_quantity") <= 0).count()
  }

  // warn once per (dir, table) per JVM — metadata-only, no data scan
  private val driftChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (driftChecked.add(s"$dir|$name")) {
      fixtureDrift(name, df.schema).foreach(d =>
        System.err.println(s"[graft.Tables] FIXTURE DRIFT: $d"))
    }
    df
  }

  /** Normalize a date column that a NANOS-era fixture delivers as raw
    * nanosecond-epoch longs (the `nanosAsLong` flag that `events` sets is
    * session-wide, so orders/lineitem read under it too) back to
    * TIMESTAMP_NTZ — exact integer `div 1000` to micros, and the UTC
    * session makes NTZ wall-clock == the instant. This is what makes the
    * drift guard's "bigint is an encoding the loaders know how to
    * normalize" claim TRUE for the date-window consumers (q44/q45/q170/
    * q176/q180–q182): without it a NANOS fixture regeneration would feed
    * raw longs to timestamp comparisons. No-op on current (MICROS)
    * fixtures.
    */
  private[graft] def normalizeTsCol(df: DataFrame, colName: String): DataFrame =
    df.schema.fields.find(_.name == colName) match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn(colName, org.apache.spark.sql.functions
          .expr(s"timestamp_micros($colName div 1000)").cast("timestamp_ntz"))
      case _ => df
    }

  /** Derived `partsupp` — the TPC-H table the driver fixtures do not
    * ship, reconstructed DETERMINISTICALLY from lineitem so the three
    * blocked relational shapes (Q2/Q9/Q11 → q211–q213) become
    * expressible and ORACLE-CHECKABLE: the DuckDB oracles state the
    * identical derivation as a CTE, so the gate proves both engines
    * agree on the derivation itself, not just the downstream query.
    *
    * Semantics: one row per (part, supplier) pair that actually shipped
    * — `ps_availqty` = total shipped quantity (integer-valued doubles,
    * exact long), `ps_supplycost_c` = average unit price in integer
    * CENTS (per-line cents are exact via the money4-style ROUND; the
    * one division is integer TRUNCATION of positive operands, where
    * DuckDB's floor-`//` and Spark's trunc-`div` agree). Keeping cost
    * in cents keeps every consumer's arithmetic exact until its own
    * dollar boundary.
    *
    * Scale shape: one map-side-combined groupBy over lineitem — the
    * same cost class as any fact aggregate; a production lake would
    * materialize it once (the events-cache pattern) rather than
    * re-derive per query, but at fixture SFs the derivation is cheap
    * and keeping it lazy keeps the loaders stateless.
    *
    * Fixture invariants (probed by [[quantityDriftRows]], spec-asserted
    * 0): `l_quantity` is integer-valued (the long cast truncates in
    * Spark but rounds in the DuckDB oracle — they agree only on exact
    * integers) and strictly positive (a zero-quantity group would make
    * `cents div ps_availqty` throw ANSI DIVIDE_BY_ZERO here).
    */
  def partsuppDerived(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum(col("l_quantity")).cast("long").as("ps_availqty"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("cents"))
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"),
        col("ps_availqty"), expr("cents div ps_availqty").as("ps_supplycost_c"))
  }

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame =
    normalizeTsCol(load(spark, dir, "orders"), "o_orderdate")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    normalizeTsCol(load(spark, dir, "lineitem"), "l_shipdate")
  /** The events fixture has stored TIMESTAMP(NANOS) (older drivers) or
    * TIMESTAMP(MICROS) (current). Downstream operators want raw
    * nanosecond-epoch longs (exact integer time arithmetic — see
    * operators.Events): NANOS needs `nanosAsLong`, which forces the
    * NON-vectorized legacy reader, taxing every events query; MICROS
    * arrives as TIMESTAMP_NTZ and needs an exact unit conversion.
    *
    * Fix: a one-time re-encode of the table to plain INT64 nanos parquet in
    * a local cache keyed by the source file's identity (path, size, mtime).
    * The first read pays the legacy scan once; every later read — across
    * queries AND across JVMs, since the cache is on disk — uses the
    * vectorized reader. Identical values, identical schema apart from the
    * physical ts type. At 100 TB the equivalent move is re-encoding the
    * ingest once to a reader-friendly layout rather than paying a slow scan
    * per query forever.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = new java.io.File(s"$dir/events.parquet")
    // md5 of the full identity string — a 32-bit String.hashCode could
    // collide across fixture dirs and silently serve the wrong cache; the
    // sanitized parent-dir segment keeps entries human-attributable.
    // "int64ns-v2" versions the cache FORMAT: v1 entries were written
    // before the loader normalized TIMESTAMP(MICROS) fixtures and could
    // hold a raw timestamp column — a stale v1 dir must never be served
    val identity = new java.util.StringJoiner("|")
      .add(src.getCanonicalPath).add(src.length.toString).add(src.lastModified.toString)
      .add("int64ns-v2")
      .toString
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(identity.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tag = Option(src.getParentFile).map(_.getName).getOrElse("root")
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val key = s"$tag-$digest"
    val root = sys.env.getOrElse("SPARK_GRAFT_EVENTS_CACHE", "target/graft-events-cache")
    val dest = new java.io.File(root, key)
    def ready = new java.io.File(dest, "_SUCCESS").isFile
    Tables.synchronized {
      if (!ready) {
        // write to a process-private temp dir, then atomically rename into
        // place — concurrent JVMs either win the rename or discard their
        // copy, never observe a half-written cache
        val tmp = new java.io.File(root, s"$key.tmp${ProcessHandle.current().pid()}")
        // normalize ts to INT64 nanosecond-epoch whatever the fixture's
        // physical type: TIMESTAMP(NANOS) arrives as long already (via
        // nanosAsLong); TIMESTAMP(MICROS) — the driver's current fixture
        // encoding — arrives as TIMESTAMP_NTZ and is converted exactly
        // (UTC session timezone, so NTZ wall-clock == the instant)
        val raw = load(spark, dir, "events")
        val tsNanos = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => raw
          case _ =>
            import org.apache.spark.sql.functions.{col, unix_micros}
            raw.withColumn("ts",
              unix_micros(col("ts").cast("timestamp")) * 1000L)
        }
        tsNanos.write.mode("overwrite").parquet(tmp.toString)
        if (!(tmp.renameTo(dest) || ready)) {
          throw new IllegalStateException(s"events cache rename failed: $tmp -> $dest")
        }
        if (tmp.exists()) { // lost the race: another process already cached
          import scala.reflect.io.Directory
          new Directory(tmp).deleteRecursively()
        }
      }
    }
    spark.read.parquet(dest.toString)
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
