package graft

/** Dev harness: print the formatted physical plan of named queries
  * (SPARK_GRAFT_PROFILE_QUERIES) — used for the per-operator plan audits
  * recorded in SURVEY §6.
  */
object ProfileExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession
      .builder(appName = "graft-explain", master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = sys.env.get("SPARK_GRAFT_PROFILE_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("q163_erasure_bm25"))
    for (name <- names) {
      println(s"==== $name ====")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
