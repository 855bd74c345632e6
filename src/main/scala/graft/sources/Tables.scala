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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
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
