package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.Relational
import graft.sources.Tables

/** File-format coverage beyond the reference's CSV (SURVEY.md §2.2): the
  * same result must round-trip losslessly through parquet, ORC, JSON, and
  * CSV sinks/sources.
  */
class FormatsSpec extends GraftSuite {

  private lazy val result: DataFrame =
    Relational.totalByNation(
      Tables.orders(spark, sf), Tables.customer(spark, sf), Tables.nation(spark, sf))

  private def roundtrip(fmt: String): Seq[(String, Double, Long)] = {
    val dir = Files.createTempDirectory(s"graft_$fmt").toString + "/out"
    result.write.format(fmt).option("header", "true").mode("overwrite").save(dir)
    val back = fmt match {
      case "csv" =>
        spark.read.format(fmt).option("header", "true")
          .schema("n_name STRING, total DOUBLE, n_orders BIGINT").load(dir)
      case _ => spark.read.format(fmt).load(dir)
    }
    back.select("n_name", "total", "n_orders")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
  }

  test("parquet/orc/json/csv round-trips agree") {
    val expected = result.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      assert(roundtrip(fmt) === expected, s"$fmt round-trip diverged")
    }
  }
}
