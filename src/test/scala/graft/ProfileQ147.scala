package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window

/** Scratch: stage walls of q147 capstoneV2 (width=8, minDocs=3, k=8). */
object ProfileQ147 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "profile-q147", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Curation, Dedup, Scale}
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q147] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val documents = sources.Tables.documents(spark, sfDir)
    val width = 8; val minDocs = 3; val k = 8
    val buckets = 64; val rounds = 4; val lr = 0.0009765625
    val targetLang = "en"

    // pre-warm the session artifacts the bench carriers charge elsewhere
    time("warm: trainQualityWeights (q143 carrier)") {
      Curation.trainQualityWeights(documents, targetLang, buckets, rounds, lr)
    }
    time("warm: pairIndex (q27 carrier)") { noop(Dedup.pairIndex(documents)) }

    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val segs = documents
        .select($"doc_id", split($"text", " ").as("ws"))
        .select($"doc_id",
          posexplode(transform(
            sequence(lit(0), floor((size($"ws") - 1) / width).cast("int")),
            i => concat_ws(" ", slice($"ws", i * width + 1, lit(width))))))
        .select($"doc_id", $"pos".as("si"), $"col".as("seg"), md5($"col").as("h"))
      val bpHashes = segs.groupBy($"h")
        .agg(countDistinct($"doc_id").as("df"))
        .filter($"df" >= minDocs)
        .select($"h")
      val cleaned = time("stage1: boilerplate-clean rebuild (checkpoint)") {
        segs.join(bpHashes, Seq("h"), "left_anti")
          .groupBy($"doc_id")
          .agg(concat_ws(" ",
            transform(array_sort(collect_list(struct($"si", $"seg"))),
              x => x.getField("seg"))).as("text"))
          .localCheckpoint()
      }
      // stage 2: dupSpanIslands inline (it is private)
      import graft.functions.TextFunctions.word_grams
      val grams = cleaned
        .filter(size(split($"text", " ")) >= k)
        .select($"doc_id", posexplode(word_grams($"text", k)))
        .select($"doc_id", $"pos", md5($"col").as("h"))
      val dup = grams.groupBy($"h").agg(count(lit(1)).as("occ")).filter($"occ" >= 2)
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      val islands = grams
        .join(dup.select($"h"), Seq("h"))
        .select($"doc_id", $"pos")
        .withColumn("prev_end",
          max($"pos" + (k - 1)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("island",
          sum(when($"prev_end".isNull || $"pos" > $"prev_end" + 1, 1L).otherwise(0L)).over(w))
        .groupBy($"doc_id", $"island")
        .agg(min($"pos").cast("long").as("s"), (max($"pos") + (k - 1)).cast("long").as("e"))
      val covered = islands
        .select($"doc_id", explode(sequence($"s", $"e")).as("pos"))
      val keptToks = time("stage2: islands + keptToks (checkpoint)") {
        cleaned
          .select($"doc_id", posexplode(split($"text", " ")))
          .select($"doc_id", $"pos".cast("long").as("pos"), $"col".as("tok"))
          .join(covered, Seq("doc_id", "pos"), "left_anti")
          .localCheckpoint()
      }
      val fx2 = keptToks
        .select($"doc_id", Scale.md5SlicePos($"tok", 0, buckets).as("b"))
        .groupBy($"doc_id", $"b").agg(count(lit(1)).as("c"))
        .unionAll(documents.select($"doc_id", lit(-1L).as("b"), lit(1L).as("c")))
      val (_, wts) = Curation.trainQualityWeights(documents, targetLang, buckets, rounds, lr)
      val accepted = time("stage3: score + accept (checkpoint)") {
        fx2
          .join(broadcast(spark.createDataFrame(wts).toDF("b", "wm")), Seq("b"))
          .groupBy($"doc_id").agg(sum($"c" * $"wm").as("zm"))
          .select($"doc_id",
            round(lit(1e6) / (lit(1.0) + exp(-($"zm" / lit(1e6)))), 0)
              .cast("long").as("pm"))
          .filter((conv(substring(md5($"doc_id".cast("string")), 1, 5), 16, 10)
            .cast("bigint") % 1000000L) < $"pm")
          .select($"doc_id")
          .localCheckpoint()
      }
      val dropped = time("stage4: restricted pairs + survivors (noop)") {
        val d = Dedup.survivorsOverPairs(
            Dedup.restrictPairs(Dedup.pairIndex(documents), accepted))
          .filter(!$"survives")
          .select($"doc_id")
        noop(d); d
      }
      val srcOf = documents.select($"doc_id", $"source")
      val keptCounts = keptToks.groupBy($"doc_id").agg(count(lit(1)).as("kt"))
      val accBySrc = srcOf.join(accepted, Seq("doc_id"), "left_semi")
        .groupBy($"source").agg(count(lit(1)).as("n_accepted"))
      val finBySrc = srcOf
        .join(accepted, Seq("doc_id"), "left_semi")
        .join(dropped, Seq("doc_id"), "left_anti")
        .join(keptCounts, Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_final"),
          sum(coalesce($"kt", lit(0L))).as("toks_final"))
      val out = documents.groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .join(accBySrc, Seq("source"), "left")
        .join(finBySrc, Seq("source"), "left")
        .select($"source", $"n_docs",
          coalesce($"n_accepted", lit(0L)).as("n_accepted"),
          coalesce($"n_final", lit(0L)).as("n_final"),
          coalesce($"toks_final", lit(0L)).as("toks_final"))
        .orderBy($"source")
      time("final rollup (noop)") { noop(out) }
    }
    spark.stop()
  }
}
