package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** Scratch profiling harness (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "graft-profile", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1000.0
        if (dur.exists(_ > 0.3))
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} ${dur.getOrElse(-1.0)}%.2f s  ${si.name.take(80)}")
      }
    })

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    spark.range(1000000L).selectExpr("sum(id)").collect()

    val targets = Seq("q27_dedup_minhash_lsh", "q53_dedup_survivors")
    for (name <- targets; i <- 1 to 3) {
      System.gc()
      time(s"$name run$i")(noop(SparkEntry.queries(name)(spark, sfDir)))
    }
    spark.stop()
  }
}
