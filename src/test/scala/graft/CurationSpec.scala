package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.sources.Tables

class CurationSpec extends GraftSuite {

  private lazy val docs = Tables.documents(spark, sf)

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def grams(text: String, n: Int): Seq[String] = {
    val ws = text.split(" ", -1).toSeq
    if (ws.length < n) Nil else ws.sliding(n).map(_.mkString(" ")).toSeq
  }

  test("wordGrams matches sliding windows and is empty below n words") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "xyz").toDF("text")
      .select(Curation.wordGrams($"text", 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got === Seq(Seq("a b c", "b c d"), Nil, Nil))
  }

  test("decontaminate equals the brute-force overlap computation") {
    val fixture = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val bench = fixture.filter(_._1 < 50).flatMap(d => grams(d._2, 3)).toSet
    val expected = fixture.filter(_._1 >= 50).flatMap { case (id, text) =>
      val gs = grams(text, 3).distinct
      val cont = gs.count(bench.contains)
      val ratio = round6(cont.toDouble / gs.size)
      if (cont > 0 && ratio >= 0.5) Some((id, gs.size.toLong, cont.toLong, ratio)) else None
    }.sortBy(_._1)
    val got = Curation.decontaminate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "fixture should contain contaminated docs (planted near-dups)")
    assert(got.size < fixture.size - 50, "threshold must be selective")
  }

  test("decontaminate broadcasts the benchmark side") {
    val plan = Curation.decontaminate(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe join in:\n$plan")
  }

  test("repetitionSignals equals the brute-force ratios") {
    val fixture = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = fixture.flatMap { case (id, text) =>
      val g2 = grams(text, 2); val g3 = grams(text, 3)
      if (g2.isEmpty || g3.isEmpty) None
      else {
        val c2 = g2.groupBy(identity).map(_._2.size)
        val c3 = g3.groupBy(identity).map(_._2.size)
        Some((id,
          round6(c2.max.toDouble / g2.size),
          round6((g2.size - c2.size).toDouble / g2.size),
          round6((g3.size - c3.size).toDouble / g3.size)))
      }
    }.sortBy(_._1)
    val got = Curation.repetitionSignals(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.size === fixture.size)
  }

  test("mixtureWeights: shares sum to 1, weights rebalance to uniform") {
    val rows = Curation.mixtureWeights(docs).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"token shares sum to $shareSum")
    // weight * share == 1/n_strata for every stratum (the rebalance law)
    val n = rows.length
    rows.foreach { r =>
      val w = r.getDouble(5); val s = r.getDouble(4)
      assert(math.abs(w * s - 1.0 / n) < 1e-4,
        s"stratum ${r.getString(0)}/${r.getString(1)}: w*s = ${w * s}")
    }
  }

  test("sorted_intersect_count rejects unsorted or non-distinct input with NULL") {
    import spark.implicits._
    val df = Seq((Seq(3L, 1L, 2L), Seq(1L, 2L, 3L)), // left unsorted
      (Seq(1L, 1L, 2L), Seq(1L, 2L, 3L)),            // left has duplicates
      (Seq(1L, 2L, 3L), Seq(3L, 2L)),                // right unsorted
      (Seq(1L, 2L, 4L), Seq(2L, 4L, 8L))             // both valid
    ).toDF("a", "b")
      .select(graft.functions.MinHashFunctions.sorted_intersect_count($"a", $"b").as("i"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got === Seq(None, None, None, Some(2L)))
  }

  test("SQL-registered cosine_sim accepts array<float> embeddings") {
    graft.functions.VectorFunctions.register(spark)
    Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_sql_coerce")
    val rows = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_sql_coerce").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
