package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Fidelity
import graft.sources.CsvSource

/** Golden-file fidelity against the reference's exact input/output format
  * (FIXTURES.md §1; golden role = `/root/reference/D/bin/Debug/result.csv`).
  */
class FidelitySpec extends GraftSuite {

  private def res(name: String): String =
    getClass.getResource(s"/fidelity/$name").getPath

  private lazy val donors    = CsvSource.donors(spark, res("donors.csv"))
  private lazy val donations = CsvSource.donations(spark, res("donations.csv"))

  test("golden: donation total by state matches hand-checked expected") {
    val got = Fidelity.donationTotalByState(donors, donations)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === Seq(("California", 125.75), ("New York", 10.10), ("Texas", 56.00)))
  }

  test("golden: matches committed expected_result.csv after parse") {
    val expected = spark.read.option("header", "true").csv(res("expected_result.csv"))
      .select(col("State"), col("Total Donation Amount").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val got = Fidelity.donationTotalByState(donors, donations)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got === expected)
  }

  test("empty amount field defaults to 0.0, not dropped (O6, D/Program.cs:451)") {
    // D002 donated once with an empty amount; the row must survive the join
    // (California total counts D001's 125.75 + D002's 0.0).
    assert(donations.filter($"amount" === 0.0).count() === 1)
    assert(donations.count() === 7)
  }

  test("strict join throws on orphan donation (O12, D/Program.cs:310)") {
    val orphans = CsvSource.donations(spark, res("donations_orphan.csv"))
    val ex = intercept[Exception] {
      Fidelity.donationTotalByStateStrict(donors, orphans).collect()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("\n")
    assert(messages.contains("orphan donation: donor_id=D999"))
  }

  test("strict join equals plain join on FK-clean data") {
    val strict = Fidelity.donationTotalByStateStrict(donors, donations).collect().toSeq
    val plain  = Fidelity.donationTotalByState(donors, donations).collect().toSeq
    assert(strict === plain)
  }

  test("strict join does NOT throw on a donor with a blank state (only on a missing key)") {
    // a blank 'Donor State' field parses as null; the reference aggregates it
    // as a value (D/Program.cs:310 throws only on a missing donor_id key)
    val blankStateDonors = donors.select($"donor_id", lit(null).cast("string").as("donor_state"))
    val rows = Fidelity.donationTotalByStateStrict(blankStateDonors, donations).collect()
    assert(rows.length === 1, "all donations group under the single null state")
    assert(rows(0).isNullAt(0))
  }

  test("CSV sink writes header + F2 amounts (O15, D/Program.cs:475-484)") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/result"
    val result = Fidelity.donationTotalByState(donors, donations).coalesce(1)
    CsvSource.writeResultCsv(result, "donor_state", "total", out)
    val lines = spark.read.textFile(out).collect().toSeq
    assert(lines.head === "State,Total Donation Amount")
    assert(lines.tail.toSet === Set("California,125.75", "New York,10.10", "Texas,56.00"))
  }

  test("CSV quoting: Spark parser is a strict superset of the reference tokenizer (SURVEY §7.4)") {
    // the reference splits naively on commas (D/Program.cs:563) and would
    // break "Los Angeles, CA" into two fields; our reader must not
    val dir = java.nio.file.Files.createTempDirectory("graft_quoted")
    val f = dir.resolve("donors_quoted.csv")
    java.nio.file.Files.writeString(f,
      """Donor ID,Donor City,Donor State,Donor Is Teacher,Donor Zip
        |D001,"Los Angeles, CA area",California,No,90001
        |""".stripMargin)
    val d = CsvSource.donors(spark, f.toString).collect()
    assert(d.length === 1)
    assert(d(0).getString(0) === "D001")
    assert(d(0).getString(1) === "California") // col 2 survives the quoted comma in col 1
  }

  test("O16: chunked CSV re-export carries original headers and round-trips through the readers") {
    val base = java.nio.file.Files.createTempDirectory("graft_chunks").toString
    CsvSource.writeDonorChunks(donors, 3, s"$base/donors")
    CsvSource.writeDonationChunks(donations, 3, s"$base/donations")
    // every non-empty chunk file restates the reference's original header
    val donorFiles = new java.io.File(s"$base/donors").listFiles()
      .filter(f => f.getName.endsWith(".csv") && f.length > 0)
    assert(donorFiles.nonEmpty)
    donorFiles.foreach { f =>
      val src = scala.io.Source.fromFile(f)
      try assert(src.getLines().next() === "Donor ID,Donor City,Donor State,Donor Is Teacher,Donor Zip")
      finally src.close()
    }
    // chunks re-read through the same scan operators reproduce the inputs
    val donorsBack = CsvSource.donors(spark, s"$base/donors").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(donorsBack === donors.collect().map(r => (r.getString(0), r.getString(1))).toSet)
    val donationsBack = CsvSource.donations(spark, s"$base/donations").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(donationsBack === donations.collect().map(r => (r.getString(0), r.getDouble(1))).toSet)
  }

  test("range co-partition preserves totals and co-locates keys (O8/O9)") {
    for (parts <- Seq(1, 3)) {
      val (d, dn) = Fidelity.rangeCoPartition(donors, donations, parts)
      val got = Fidelity.donationTotalByState(d, dn)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got === Seq(("California", 125.75), ("New York", 10.10), ("Texas", 56.00)))
    }
    // range partitions are key-disjoint: each donor_id maps to one partition
    val (_, dn3) = Fidelity.rangeCoPartition(donors, donations, 3)
    val spread = dn3.withColumn("pid", spark_partition_id())
      .groupBy($"donor_id").agg(countDistinct($"pid").as("nparts"))
      .agg(max($"nparts")).collect()(0).getLong(0)
    assert(spread === 1L)
  }

  private implicit class Interp(private val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
