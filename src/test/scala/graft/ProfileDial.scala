package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dev-only experiment (Test/runMain graft.ProfileDial): candidate volume
  * and planted-pair recall of the MULTIPLICATIVE-mix hyperplane family vs
  * the additive family, on the ProfileScaling x1 embedding corpus. The
  * round-5 lsh-dial measurement showed the additive family's correlated
  * planes cost both selectivity (24x12 cuts candidates only 3.4x, not the
  * ~20x independent-plane math) and recall (69/100 planted pairs at
  * 24x12 vs the ~99% prediction); this harness measures whether
  * decorrelating the planes (the projCoef trick) recovers the math.
  */
object ProfileDial {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession
      .builder(appName = "graft-dial", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // multiplicative index mixing — decorrelates planes (cf. Similarity.projCoef)
    def coefNew(plane: Int, i: Column): Column =
      (((i + 17) * lit((plane + 1).toLong * 104729L) + lit(plane.toLong * 7919L)) % 2001L - 1000L)
        .cast("double") / 1000.0

    def bucketsNew(v: Column, tables: Int, bits: Int): Column =
      array((0 until tables).map { t =>
        (0 until bits).map { b =>
          val plane = t * bits + b
          val proj = aggregate(
            zip_with(v, sequence(lit(1), size(v)), (x, i) => x * coefNew(plane, i)),
            lit(0.0), (acc, x) => acc + x)
          when(round(proj, 6) > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*)

    val dim = 64
    def planted(embs: DataFrame): DataFrame = {
      val half = dim / 2
      embs.filter($"vec_id" < 100).select(
        ($"vec_id" + 90000000L).as("vec_id"),
        array((0 until dim).map { j =>
          val sign = if ((j * 7919 + 3) % 2 == 0) 1.0f else -1.0f
          (element_at($"embedding", j + 1) * 0.92f +
            element_at($"embedding", ((j + half) % dim) + 1) * (0.39f * sign))
        }: _*).as("embedding"))
    }

    val base = spark.read.parquet("target/scaling/emb_x1")
    val withPlanted = base.unionByName(planted(base)).localCheckpoint()
    val corpus = withPlanted
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
      .repartition(64, $"vec_id")
      .localCheckpoint()

    Seq((8, 6), (24, 12)).foreach { case (tables, bits) =>
      val bucketed = corpus
        .select($"vec_id", posexplode(bucketsNew($"v", tables, bits)))
        .select($"vec_id", $"pos".as("t"), $"col".as("bk"))
        .localCheckpoint()
      val cands = bucketed
        .groupBy($"t", $"bk").agg(count(lit(1)).as("k")).filter($"k" > 1)
        .agg(coalesce(sum(expr("k * (k - 1) div 2")), lit(0L)).cast("long"))
        .collect()(0).getLong(0)
      // planted-pair recovery through the bucket stage: pair (i, i+9e7)
      // is a candidate iff the two collide in some table
      val hits = bucketed.as("a")
        .join(bucketed.as("b"),
          col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
            col("b.vec_id") === col("a.vec_id") + 90000000L)
        .select(col("a.vec_id")).distinct().count()
      println(f"[dial-new] ${tables}x$bits%-2d candidates=$cands%9d planted_cand=$hits%3d/100")
    }
    spark.stop()
  }
}
