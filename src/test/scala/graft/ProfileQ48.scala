package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Dev-only stage profiler for the embedding near-dup pipeline. */
object ProfileQ48 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession
      .builder(appName = "graft-q48", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q48] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    spark.range(1000000L).selectExpr("sum(id)").collect()
    val embs = Tables.embeddings(spark, sfDir)
    val corpus = embs.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))

    val bucketed = corpus
      .repartition(64, col("vec_id"))
      .select(col("vec_id"),
        posexplode(graft.functions.VectorFunctions.hyperplane_buckets(
          col("v"), Similarity.NeardupTables, Similarity.NeardupBits)))
      .select(col("vec_id"), col("pos").as("t"), col("col").as("bk"))
    time("bucketed (noop)") { bucketed.write.format("noop").mode("overwrite").save() }

    val candidates = bucketed
      .groupBy(col("t"), col("bk"))
      .agg(collect_list(col("vec_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """filter(
          |  flatten(transform(ids, a -> transform(ids, b -> struct(a AS id1, b AS id2)))),
          |  p -> p.id1 < p.id2)""".stripMargin)).as("p"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
      .distinct()
    println(s"[q48] candidate pairs: ${time("candidates count") { candidates.count() }}")
    time("candidates again (noop)") { candidates.write.format("noop").mode("overwrite").save() }
    time("full cold") {
      Similarity.embeddingNearDup(embs, 0.45).write.format("noop").mode("overwrite").save()
    }
    time("full warm") {
      Similarity.embeddingNearDup(embs, 0.45).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
