package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev-only materializer for the round-12 sf1 ORACLE sweep
  * (Test/runMain graft.ProfileSf1Data): builds `target/sf1eq/` — an
  * sf1-equivalent table DIRECTORY in the driver's single-file-per-table
  * layout, so BOTH engines (graft.Verify and tools/check.py's DuckDB)
  * read the same parquet and the t2 gate runs at 100× the driver's
  * correctness scale.
  *
  * Scaled ×10 with the ProfileScaling replica maps (replica-disjoint
  * vocabulary — no artificial cross-replica quadratics):
  *  - documents: length-preserving pseudo-words per replica, lang /
  *    source / n_chars carried;
  *  - embeddings: signed cyclic permutation per replica (orthogonal,
  *    within-replica cosines exact);
  *  - events: id offsets, everything else verbatim (new users, same
  *    temporal pattern);
  *  - part: key offset + pseudo-word p_name per replica (keeps the
  *    q233 blocking per-replica — linear, the tagged regime).
  * The six remaining TPC-H tables copy sf0.1 verbatim (no sf1 head
  * touches them).
  */
object ProfileSf1Data {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = "target/sf1eq"
    val spark = GraftSession
      .builder(appName = "graft-sf1data", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def pseudo(w: org.apache.spark.sql.Column, r: Int) =
      md5(concat(w, lit(s":$r"))).substr(lit(1), greatest(length(w), lit(1)))

    def writeSingle(df: DataFrame, table: String): Unit = {
      val tmp = s"$out/_tmp_$table"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$out/$table.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      println(s"[sf1eq] wrote $table")
    }

    new java.io.File(out).mkdirs()

    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    def docReplica(r: Int): DataFrame =
      if (r == 0) docs
      else docs.select(($"doc_id" + lit(r * 10000000L)).as("doc_id"),
        array_join(transform(split($"text", " "), w => pseudo(w, r)), " ").as("text"),
        $"lang", $"source", $"n_chars")
    writeSingle((0 until 10).map(docReplica).reduce(_ unionByName _), "documents")

    val embs = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding", $"label")
    val dim = embs.select(size($"embedding")).first().getInt(0)
    def vecReplica(r: Int): DataFrame =
      if (r == 0) embs
      else {
        val shift = (r * 7) % dim
        embs.select(($"vec_id" + lit(r * 10000000L)).as("vec_id"),
          array((0 until dim).map { i =>
            val sign = if (((i + 1) * 104729 + r * 7919) % 2 == 0) 1.0f else -1.0f
            element_at($"embedding", ((i + shift) % dim) + 1) * lit(sign)
          }: _*).as("embedding"), $"label")
      }
    writeSingle((0 until 10).map(vecReplica).reduce(_ unionByName _), "embeddings")

    val events = spark.read.parquet(s"$sfDir/events.parquet")
    def evtReplica(r: Int): DataFrame =
      if (r == 0) events
      else events.select(($"event_id" + lit(r * 10000000L)).as("event_id"),
        $"ts", ($"user_id" + lit(r * 10000000L)).as("user_id"),
        $"event_type", $"value", $"props")
    writeSingle((0 until 10).map(evtReplica).reduce(_ unionByName _), "events")

    val part = Tables.part(spark, sfDir)
    def partReplica(r: Int): DataFrame =
      if (r == 0) part
      else part.select(($"p_partkey" + lit(r * 10000000L)).as("p_partkey"),
        array_join(transform(split($"p_name", " "), w => pseudo(w, r)), " ").as("p_name"),
        $"p_brand", $"p_type", $"p_size", $"p_retailprice")
    writeSingle((0 until 10).map(partReplica).reduce(_ unionByName _), "part")

    // orders: ×10 by key offset, payload columns verbatim (round 14 —
    // q311's layout audit reads (o_orderdate, o_orderkey); a verbatim
    // copy would make its "sf1eq" cell run at sf0.1 scale). Offsets keep
    // keys unique; dates repeat per replica, so probe density rises the
    // way a real 10× table's would.
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def ordReplica(r: Int): DataFrame =
      if (r == 0) orders
      else orders
        .withColumn("o_orderkey", $"o_orderkey" + lit(r * 100000000L))
        .withColumn("o_custkey", $"o_custkey" + lit(r * 100000000L))
    writeSingle((0 until 10).map(ordReplica).reduce(_ unionByName _), "orders")

    for (t <- Seq("region", "nation", "customer", "supplier", "lineitem")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[sf1eq] copied $t")
    }
    spark.stop()
  }
}
