package graft

/** Dev harness (temporary): inventory every empty-partitionSpec
  * WindowExec in every registered query's static plan (AQE off), with
  * a structural signature of what bounds its input — the audit behind
  * the ScaleSpec unpartitioned-window sweep.
  */
object ProfileWindows {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession
      .builder(appName = "graft-winaudit", master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def sig(p: SparkPlan): String = {
      import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
      import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec, LocalTableScanExec, RDDScanExec}
      import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
      val bound = p.collectFirst {
        case l: GlobalLimitExec => s"limit"
        case l: LocalLimitExec => s"locallimit"
        case t: TakeOrderedAndProjectExec => s"takeOrdered(${t.limit})"
        case a: BaseAggregateExec =>
          s"agg(${a.groupingExpressions.map(_.references.map(_.name).mkString(".")).mkString(",")})"
        case l: LocalTableScanExec => "localtable"
        case r: RDDScanExec => "rddscan"
      }
      bound.getOrElse("NONE:" + p.nodeName)
    }
    val out = new StringBuilder
    SparkEntry.queries.toSeq
      .sortBy { case (n, _) => n.drop(1).takeWhile(_.isDigit).toInt }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan
          val wins = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
          if (wins.nonEmpty) {
            val sigs = wins.map(w => sig(w.child)).groupBy(identity)
              .map { case (s, g) => s"${g.size}x[$s]" }.toSeq.sorted.mkString(" ")
            out.append(s"WIN $name ${wins.size} $sigs\n")
          }
        } catch { case e: Throwable =>
          out.append(s"ERR $name ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}\n")
        }
      }
    print(out.toString)
    spark.stop()
  }
}
