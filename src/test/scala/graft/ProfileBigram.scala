package graft

import org.apache.spark.sql.functions._

/** Scratch: HOF transform(sequence) bigram explode vs native word_grams. */
object ProfileBigram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "profile-bigram", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bg] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val documents = sources.Tables.documents(spark, sfDir).repartition(64)
      .localCheckpoint()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 3) {
      println(s"=== rep $rep")
      time("HOF bigram explode + count") {
        noop(documents.select($"doc_id", split($"text", " ").as("ts"))
          .filter(size($"ts") >= 2)
          .select($"doc_id", explode(expr(
            "transform(sequence(1, size(ts) - 1), i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))")).as("b"))
          .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
          .groupBy($"doc_id", $"w1", $"w2").agg(count(lit(1)).as("k")))
      }
      time("native word_grams(2) explode + substring_index + count") {
        noop(documents
          .select($"doc_id", explode(graft.functions.TextFunctions.word_grams(
            $"text", 2)).as("g"))
          .select($"doc_id", substring_index($"g", " ", 1).as("w1"),
            substring_index($"g", " ", -1).as("w2"))
          .groupBy($"doc_id", $"w1", $"w2").agg(count(lit(1)).as("k")))
      }
      time("native word_grams(2) explode keep g + count") {
        noop(documents
          .select($"doc_id", explode(graft.functions.TextFunctions.word_grams(
            $"text", 2)).as("g"))
          .groupBy($"doc_id", $"g").agg(count(lit(1)).as("k")))
      }
    }
    spark.stop()
  }
}
