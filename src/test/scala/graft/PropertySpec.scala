package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Fidelity

/** ScalaCheck properties promised in SURVEY.md §5.4: aggregation invariance
  * under permutation/partitioning, and the range-partition routing model of
  * the reference's cutoff shuffle (O8/O9, `D/Program.cs:63-149`).
  * (Plain scalacheck Gen with fixed seeds — the scalatest bridge artifact
  * is not in the offline cache.)
  */
class PropertySpec extends GraftSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val donorGen: Gen[List[(String, String)]] = for {
    n      <- Gen.choose(1, 40)
    ids    <- Gen.listOfN(n, Gen.choose(1, 999))
    states <- Gen.listOfN(n, Gen.oneOf("CA", "TX", "NY", "WA", "other"))
  } yield ids.distinct.zip(states).map { case (id, st) => (f"D$id%03d", st) }

  test("property: group-sum invariant under row permutation and partition count") {
    import spark.implicits._
    samples(donorGen.flatMap(d => Gen.choose(1L, 1000000L).map((d, _))), 8)
      .foreach { case (donors, seed) =>
        val rnd = new scala.util.Random(seed)
        val donations = donors.flatMap { case (id, _) =>
          Seq.fill(rnd.nextInt(3) + 1)((id, (rnd.nextInt(10000) + 1) / 100.0))
        }
        val dDf = donors.toDF("donor_id", "donor_state")
        def total(rows: Seq[(String, Double)], parts: Int) =
          Fidelity.donationTotalByState(
            dDf, rows.toDF("donor_id", "amount").repartition(parts))
            .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
        val base = total(donations, 1)
        assert(total(rnd.shuffle(donations), 3) === base)
        assert(total(donations.reverse, 7) === base)
      }
  }

  test("property: repartitionByRange co-partitions build and probe consistently (O8/O9)") {
    import spark.implicits._
    samples(donorGen, 6).filter(_.length >= 2).foreach { donors =>
      val donations = donors.map { case (id, _) => (id, 1.0) }
      val (d, dn) = Fidelity.rangeCoPartition(
        donors.toDF("donor_id", "donor_state"),
        donations.toDF("donor_id", "amount"), 3)
      // each donor_id lands in the same partition on both sides (the
      // cutoff-routing invariant the reference requires of its binary
      // search, D/Program.cs:121-127)
      val dParts = d.select($"donor_id", spark_partition_id().as("p"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val dnParts = dn.select($"donor_id", spark_partition_id().as("p"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      dnParts.foreach { case (id, p) => assert(dParts(id) === p, s"donor $id split across sides") }
    }
  }

  test("property: jaccard is symmetric-keyed, bounded, and 1 for identical texts") {
    import spark.implicits._
    val textGen = Gen.listOfN(30, Gen.oneOf("data", "spark", "row", "key", "agg"))
      .map(_.mkString(" "))
    samples(Gen.listOfN(6, textGen), 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, threshold = 0.0).collect()
      pairs.foreach { r =>
        assert(r.getLong(0) < r.getLong(1), "pair key must be ordered (id1 < id2)")
        val j = r.getDouble(2)
        assert(j >= 0.0 && j <= 1.0)
      }
      val dup = Seq((0L, texts.head), (1L, texts.head)).toDF("doc_id", "text")
      val j = graft.operators.Dedup.ngramJaccardPairs(dup, threshold = 0.0)
        .collect().head.getDouble(2)
      assert(j === 1.0)
    }
  }
}
