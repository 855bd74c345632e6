package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scratch: stage walls of q311 layoutSkippingAudit (orders, o_orderdate). */
object ProfileQ311 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "profile-q311", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q311] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val files = 64; val parts = 32
    val df = sources.Tables.orders(spark, sfDir)
    val base = df.select(col("o_orderkey").as("id"), col("o_orderdate").as("k"))
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      def fileStats(order: Seq[Column], layout: String): DataFrame = {
        val f = base.repartitionByRange(parts, order: _*)
          .localCheckpoint(eager = false)
          .withColumn("pid", spark_partition_id().cast("int"))
        val wBase = Window.orderBy($"pid")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val subtot = f.groupBy($"pid").agg(count(lit(1)).as("t"))
          .localCheckpoint(eager = false)
        val bases = subtot
          .withColumn("base", sum($"t").over(wBase) - $"t")
          .select($"pid", $"base")
        val total = subtot.agg(sum($"t").as("n"))
        val wIn = Window.partitionBy($"pid").orderBy(order: _*)
        f.join(broadcast(bases), Seq("pid"))
          .withColumn("r0", $"base" + row_number().over(wIn).cast("long") - 1L)
          .crossJoin(broadcast(total))
          .withColumn("f", expr(s"r0 * ${files}L div n"))
          .groupBy($"f")
          .agg(min($"k").as("lo"), max($"k").as("hi"))
          .withColumn("layout", lit(layout))
      }
      val s1 = time("fileStats(sorted) noop") {
        val s = fileStats(Seq($"k", $"id"), "sorted"); noop(s); s }
      val s2 = time("fileStats(arrival) noop") {
        val s = fileStats(Seq($"id"), "arrival"); noop(s); s }
      val stats = time("stats union checkpoint (materialize)") {
        s1.unionByName(s2).localCheckpoint(eager = false)
      }
      val probes = base.select($"k").distinct()
      time("probes distinct noop") { noop(probes) }
      val reads = probes.crossJoin(broadcast(stats))
        .filter($"k" >= $"lo" && $"k" <= $"hi")
        .groupBy($"layout", $"k").agg(count(lit(1)).as("nf"))
      time("probe crossjoin + agg noop") { noop(reads) }
      val nProbes = probes.agg(count(lit(1)).as("n_probes_all"))
      val out = reads.groupBy($"layout")
        .agg(sum($"nf").as("reads_total"), max($"nf").as("max_files_read"))
        .crossJoin(broadcast(nProbes))
        .select($"layout", $"n_probes_all".as("n_probes"), $"reads_total",
          $"max_files_read",
          round($"reads_total".cast("double") / $"n_probes_all", 6)
            .as("avg_files_read"))
        .join(stats.groupBy($"layout").agg(countDistinct($"f").as("n_files")), Seq("layout"))
      time("final rollup noop") { noop(out.orderBy($"layout")) }
    }
    spark.stop()
  }
}
