package graft

import graft.operators.Similarity
import graft.sources.Tables

/** Dev-only diagnostic (Test/runMain) for the ×30 q48 hard failure seen
  * in round 9's ProfileScale: the 8×6-dial run died with "Total size of
  * serialized results of 22 tasks (1065.0 MiB) is bigger than
  * spark.driver.maxResultSize" right after the candidate pair set
  * materialized (~17 GB of checkpoint blocks). Hypothesis: the planner
  * BROADCASTS the candidate side of the verify join — its size estimate
  * descends from `explode(pair_combinations(...))`, whose row-count
  * estimate is bucket-count-proportional, i.e. blind to the K² in-bucket
  * expansion — and the broadcast build's driver collect is what blows
  * the 1 GB result cap. This main reruns the same shape with
  * maxResultSize raised and prints the FINAL adaptive plan, so the join
  * strategies actually chosen are on the record.
  */
object ProfileNeardupPlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale30")
    val spark = GraftSession
      .builder(appName = "graft-neardup-plan", master = "local[32]", shufflePartitions = 32)
      .config("spark.driver.maxResultSize", sys.env.getOrElse("SPARK_GRAFT_MAXRES", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs = Tables.embeddings(spark, dir)
    val t0 = System.nanoTime()
    val df = Similarity.embeddingNearDup(embs, threshold = 0.45, tables = 8, bits = 6)
    df.write.format("noop").mode("overwrite").save()
    println(f"[plan] x30 q48 8x6 with maxResultSize raised: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val plan = df.queryExecution.executedPlan.toString
    println("[plan] ---- final adaptive plan (truncated) ----")
    println(plan.split("\n").take(80).mkString("\n"))
    val broadcasts = plan.split("\n").filter(l =>
      l.contains("BroadcastHashJoin") || l.contains("BroadcastExchange"))
    println(s"[plan] broadcast nodes: ${broadcasts.size}")
    broadcasts.take(10).foreach(l => println("[plan] " + l.trim.take(160)))
    spark.stop()
  }
}
