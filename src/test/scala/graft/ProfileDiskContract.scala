package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Scratch: stage walls of the disk-contract heads q272 / q228 / q242. */
object ProfileDiskContract {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "profile-disk", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Events, Governance, Curation, Similarity}
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[disk] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      // ---- q272 ----
      val ev = sources.Tables.events(spark, sfDir)
      val qdir = graft.sources.Scratch.dir("graft_qsk_shards_prof")
      time("q272 write even (topK+fingerprint+parquet)") {
        Events.writeDailyQuantileSketches(
          ev.filter(expr("(ts div 86400000000000) % 2 = 0")), s"$qdir/even")
      }
      time("q272 write odd") {
        Events.writeDailyQuantileSketches(
          ev.filter(expr("(ts div 86400000000000) % 2 = 1")), s"$qdir/odd")
      }
      time("q272 serve (noop)") {
        noop(Events.quantilesFromSketchFiles(spark, Seq(s"$qdir/even", s"$qdir/odd")))
      }
      // ---- q228 ----
      val sdir = graft.sources.Scratch.dir("graft_sketch_shards_prof")
      time("q228 write even") {
        Events.writeDailySketches(
          ev.filter(expr("(ts div 86400000000000) % 2 = 0")), s"$sdir/even")
      }
      time("q228 write odd") {
        Events.writeDailySketches(
          ev.filter(expr("(ts div 86400000000000) % 2 = 1")), s"$sdir/odd")
      }
      time("q228 serve (noop)") {
        noop(Events.distinctUsersFromSketchFiles(spark, Seq(s"$sdir/even", s"$sdir/odd")))
      }
      // ---- q242 ----
      val docs = sources.Tables.documents(spark, sfDir)
      val base = docs.filter(col("doc_id") % 10 =!= 1)
      val fdir = graft.sources.Scratch.dir("graft_fp_prof")
      time("q242 writeDatasheetPartials") {
        Curation.writeDatasheetPartials(base, s"$fdir/partials")
      }
      val embs = sources.Tables.embeddings(spark, sfDir)
      val embBase = embs.filter(col("vec_id") % 10 =!= 1)
      time("q242 writePqIndex") { Similarity.writePqIndex(embBase, s"$fdir/pq") }
      time("q242 writeSpectralModel") {
        Similarity.writeSpectralModel(embBase, s"$fdir/abtt")
      }
      val mutated = base.withColumn("text",
        when(col("doc_id") === 5L, concat(col("text"), lit("~")))
          .otherwise(col("text")))
      val embMut = embBase.withColumn("label",
        when(col("vec_id") === 5L, col("label") + 1).otherwise(col("label")))
      time("q242 stalenessReport (noop)") {
        noop(Governance.stalenessReport(spark, Seq(
          ("ds_fresh", s"$fdir/partials", base, Governance.docCanonical),
          ("ds_grown", s"$fdir/partials", docs, Governance.docCanonical),
          ("ds_mutated", s"$fdir/partials", mutated, Governance.docCanonical),
          ("pq_fresh", s"$fdir/pq", embBase, Governance.embCanonical),
          ("pq_grown", s"$fdir/pq", embs, Governance.embCanonical),
          ("pq_mutated", s"$fdir/pq", embMut, Governance.embCanonical),
          ("sp_fresh", s"$fdir/abtt", embBase, Governance.embCanonical),
          ("sp_mutated", s"$fdir/abtt", embMut, Governance.embCanonical))))
      }
    }
    spark.stop()
  }
}
