package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** One sorted output file, without betting on an implementation detail:
    * global order surviving `coalesce(1)` happens to hold today but is
    * not contracted by Spark. When the query's analyzed plan ends in a
    * global Sort over plain output columns (every registered query does —
    * the determinism contract is "explicit orderBy on a unique key"),
    * re-assert that exact ordering (direction + null ordering) WITHIN the
    * single coalesced partition; a sort on already-sorted data is one
    * no-op-cheap pass. Queries whose top-level sort keys are not bare
    * attributes fall back to today's behavior unchanged.
    */
  private[graft] def stableSingleFile(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, NullsFirst, NullsLast}
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    import org.apache.spark.sql.functions.col
    val one = df.coalesce(1)
    df.queryExecution.analyzed match {
      case s: Sort if s.global =>
        val cols = s.order.flatMap { o =>
          o.child match {
            case a: Attribute => Some((o.direction, o.nullOrdering) match {
              case (Ascending, NullsFirst)  => col(a.name).asc_nulls_first
              case (Ascending, NullsLast)   => col(a.name).asc_nulls_last
              case (Descending, NullsFirst) => col(a.name).desc_nulls_first
              case (Descending, NullsLast)  => col(a.name).desc_nulls_last
            })
            case _ => None
          }
        }
        if (cols.length == s.order.length) one.sortWithinPartitions(cols: _*) else one
      case _ => one
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .builder(appName = "graft-verify", master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset (the driver never sets it): comma-separated query
    // names to dump/compare — keeps local delta gates at minutes, not the
    // ~50-minute full-oracle DuckDB grind at sf0.1.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_VERIFY_QUERIES").map(_.split(",").map(_.trim).toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
        try stableSingleFile(fn(spark, sfDir)).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
