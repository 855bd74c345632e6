package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window

/** Scratch: q147/q99 sub-stage A/B — double-explode vs window-count forms. */
object ProfileQ147b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "profile-q147b", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q147b] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val documents = sources.Tables.documents(spark, sfDir)
    val width = 8; val minDocs = 3; val k = 8

    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val segs = documents
        .select($"doc_id", split($"text", " ").as("ws"))
        .select($"doc_id",
          posexplode(transform(
            sequence(lit(0), floor((size($"ws") - 1) / width).cast("int")),
            i => concat_ws(" ", slice($"ws", i * width + 1, lit(width))))))
        .select($"doc_id", $"pos".as("si"), $"col".as("seg"), md5($"col").as("h"))
      time("segs single explode pass (noop)") { noop(segs) }
      val bpHashes = segs.groupBy($"h")
        .agg(countDistinct($"doc_id").as("df"))
        .filter($"df" >= minDocs)
        .select($"h")
      time("bpHashes agg branch (noop)") { noop(bpHashes) }
      val cleanedOld = time("stage1 OLD: anti-join + rebuild (checkpoint)") {
        segs.join(bpHashes, Seq("h"), "left_anti")
          .groupBy($"doc_id")
          .agg(concat_ws(" ",
            transform(array_sort(collect_list(struct($"si", $"seg"))),
              x => x.getField("seg"))).as("text"))
          .localCheckpoint()
      }
      // NEW stage1: one explode, df via dense_rank over (h) — no second pass
      val wH = Window.partitionBy($"h").orderBy($"doc_id")
      val wHAll = Window.partitionBy($"h")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cleanedNew = time("stage1 NEW: window-df + rebuild (checkpoint)") {
        segs
          .withColumn("df", max(dense_rank().over(wH)).over(wHAll))
          .filter($"df" < minDocs)
          .groupBy($"doc_id")
          .agg(concat_ws(" ",
            transform(array_sort(collect_list(struct($"si", $"seg"))),
              x => x.getField("seg"))).as("text"))
          .localCheckpoint()
      }
      // CKPT stage1: materialize segs once, same anti-join shape (skew-safe)
      val cleanedCkpt = time("stage1 CKPT: segs checkpoint + anti-join (checkpoint)") {
        val segsM = segs.localCheckpoint()
        val bp = segsM.groupBy($"h")
          .agg(countDistinct($"doc_id").as("df"))
          .filter($"df" >= minDocs)
          .select($"h")
        segsM.join(bp, Seq("h"), "left_anti")
          .groupBy($"doc_id")
          .agg(concat_ws(" ",
            transform(array_sort(collect_list(struct($"si", $"seg"))),
              x => x.getField("seg"))).as("text"))
          .localCheckpoint()
      }
      val chkOld = cleanedOld.agg(count(lit(1)), sum(length($"text")), sum(md5($"text").substr(1, 8).cast("string").isNotNull.cast("long"))).collect()(0)
      val chkNew = cleanedNew.agg(count(lit(1)), sum(length($"text")), sum(md5($"text").substr(1, 8).cast("string").isNotNull.cast("long"))).collect()(0)
      val hOld = cleanedOld.select(md5(concat_ws("|", $"doc_id", $"text")).as("m")).agg(sum(conv($"m".substr(1, 8), 16, 10).cast("long"))).collect()(0)
      val hNew = cleanedNew.select(md5(concat_ws("|", $"doc_id", $"text")).as("m")).agg(sum(conv($"m".substr(1, 8), 16, 10).cast("long"))).collect()(0)
      val hCkpt = cleanedCkpt.select(md5(concat_ws("|", $"doc_id", $"text")).as("m")).agg(sum(conv($"m".substr(1, 8), 16, 10).cast("long"))).collect()(0)
      println(s"[q147b] stage1 equal: rows/len ${chkOld == chkNew}, hash ${hOld == hNew} ($hOld vs $hNew), ckpt ${hOld == hCkpt}")

      val cleaned = cleanedOld
      import graft.functions.TextFunctions.word_grams
      val grams = cleaned
        .filter(size(split($"text", " ")) >= k)
        .select($"doc_id", posexplode(word_grams($"text", k)))
        .select($"doc_id", $"pos", md5($"col").as("h"))
      time("grams single explode pass (noop)") { noop(grams) }
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      def islandsFrom(dupPos: DataFrame): DataFrame = dupPos
        .withColumn("prev_end",
          max($"pos" + (k - 1)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("island",
          sum(when($"prev_end".isNull || $"pos" > $"prev_end" + 1, 1L).otherwise(0L)).over(w))
        .groupBy($"doc_id", $"island")
        .agg(min($"pos").cast("long").as("s"), (max($"pos") + (k - 1)).cast("long").as("e"))
      val dup = grams.groupBy($"h").agg(count(lit(1)).as("occ")).filter($"occ" >= 2)
      val islOld = time("stage2 OLD: dup-agg + join + islands (noop)") {
        val i = islandsFrom(grams.join(dup.select($"h"), Seq("h")).select($"doc_id", $"pos"))
        noop(i); i
      }
      val wHC = Window.partitionBy($"h")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val islNew = time("stage2 NEW: window-occ + islands (noop)") {
        val i = islandsFrom(grams
          .withColumn("occ", count(lit(1)).over(wHC))
          .filter($"occ" >= 2)
          .select($"doc_id", $"pos"))
        noop(i); i
      }
      val islCkpt = time("stage2 CKPT: grams checkpoint + dup-agg + join (noop)") {
        val gramsM = grams.localCheckpoint()
        val dupM = gramsM.groupBy($"h").agg(count(lit(1)).as("occ")).filter($"occ" >= 2)
        val i = islandsFrom(gramsM.join(dupM.select($"h"), Seq("h")).select($"doc_id", $"pos"))
        noop(i); i
      }
      val iOld = islOld.agg(count(lit(1)), sum($"s" * 31 + $"e"), sum(conv(md5(concat_ws("|", $"doc_id", $"island", $"s", $"e")).substr(1, 8), 16, 10).cast("long"))).collect()(0)
      val iNew = islNew.agg(count(lit(1)), sum($"s" * 31 + $"e"), sum(conv(md5(concat_ws("|", $"doc_id", $"island", $"s", $"e")).substr(1, 8), 16, 10).cast("long"))).collect()(0)
      val iCkpt = islCkpt.agg(count(lit(1)), sum($"s" * 31 + $"e"), sum(conv(md5(concat_ws("|", $"doc_id", $"island", $"s", $"e")).substr(1, 8), 16, 10).cast("long"))).collect()(0)
      println(s"[q147b] stage2 equal: $iOld vs $iNew -> ${iOld == iNew}, ckpt ${iOld == iCkpt}")
    }
    spark.stop()
  }
}
