package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One family's slice of the pipeline query surface: the driver-contract
  * entries plus their DuckDB oracles (keys must match 1:1).
  */
private[graft] trait QueryFamily {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

/** LLM-training-data-pipeline queries (SURVEY.md §2.2 ➕) and their DuckDB
  * oracles. Split from SparkEntry for readability; SparkEntry concatenates.
  * Round 9 split this file again, by operator family (it had grown to
  * ~4,800 lines): each family object under graft/queries/ carries its
  * entries and oracles verbatim; this object is the stable registration
  * point and asserts the families stay disjoint and query/oracle-aligned.
  *
  * Oracle strategy: every hash primitive is md5-based and every formula is
  * exact integer / deterministic double arithmetic, so DuckDB reproduces
  * results bit-for-bit. Where Spark runs the scalable algorithm (LSH) the
  * oracle runs the exact small-data equivalent (all-pairs) — recall of the
  * LSH path at the chosen thresholds is 1 minus ~5e-8, so outputs match.
  */
object PipelineQueries {

  private val families: Seq[QueryFamily] = Seq(
    DedupQueries, SimilarityQueries, TextQueries, CurationQueries,
    EventsQueries, SamplingQueries, ScaleQueries, GovernanceQueries,
    MultimodalQueries, ExtendedQueries, InferenceQueries)

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val m = families.map(_.queries).reduce(_ ++ _)
    require(m.size == families.map(_.queries.size).sum,
      "duplicate query keys across family files")
    m
  }

  lazy val oracleSql: Map[String, String] = {
    val m = families.map(_.oracleSql).reduce(_ ++ _)
    require(m.size == families.map(_.oracleSql.size).sum,
      "duplicate oracle keys across family files")
    require(m.keySet == queries.keySet,
      "queries/oracleSql key sets diverge across family files")
    m
  }
}
