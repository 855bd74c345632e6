package graft

import org.apache.spark.sql.functions._

/** Scratch: where does q177 setCoverSelect spend its time? */
object ProfileQ177 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "profile-q177", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q177] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val documents = sources.Tables.documents(spark, sfDir)
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val toks = time("toks build + checkpoint") {
        documents
          .select($"doc_id",
            explode(array_distinct(graft.operators.Curation.wordGrams($"text", 2))).as("tok"))
          .repartition(64, $"doc_id")
          .localCheckpoint()
      }
      var picked = List.empty[Long]
      for (r <- 1 to 5) {
        val covered = toks.filter($"doc_id".isin(picked: _*)).select($"tok")
        val pick = time(s"round $r argmax") {
          toks.join(broadcast(covered), Seq("tok"), "left_anti")
            .groupBy($"doc_id").agg(count(lit(1)).as("n"))
            .orderBy($"n".desc, $"doc_id").limit(1)
            .collect()
        }
        if (pick.nonEmpty) picked ::= pick(0).getLong(0)
      }
      println(s"picked: ${picked.reverse}")
    }
    spark.stop()
  }
}
