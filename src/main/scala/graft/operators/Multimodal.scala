package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.2 ➕): image/audio/video as
  * opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / frame-sample stages a training pipeline runs over
  * them.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC FAKE (`fakeDecode`): it derives pixel-like
  * features arithmetically from the bytes. Everything around it — the
  * binary column, metadata struct schema, per-partition batch processing,
  * partition sizing — is real Spark plumbing that swaps in a real codec
  * unchanged.
  */
object Multimodal {

  /** Media asset schema: opaque payload + typed metadata, the layout a
    * 100 TB multimodal lake uses (payload in parquet binary or pointers to
    * object storage; metadata filterable without touching bytes).
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("checksum", StringType))), nullable = true)))

  /** Synthesize a binary asset table from `documents` (the driver fixtures
    * carry no real media): payload = UTF-8 bytes of the text. Deterministic,
    * so oracles can recompute every derived feature.
    */
  def assetsFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      $"doc_id".as("asset_id"),
      when($"doc_id" % 3 === 0, "image").when($"doc_id" % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      $"text".cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length($"text".cast("binary")).cast("long").as("n_bytes"),
        md5($"text".cast("binary")).as("checksum")).as("meta"))

  /** DETERMINISTIC FAKE decode: "width/height/duration" derived from the
    * checksum bytes arithmetically. A real deployment replaces exactly this
    * projection with a codec call (mapInArrow / rdd.mapPartitions batching);
    * the schema and everything downstream is unchanged.
    */
  def fakeDecode(assets: DataFrame): DataFrame =
    assets.select(
      $"asset_id",
      $"media_type",
      $"meta.n_bytes".as("n_bytes"),
      (ascii(substring($"meta.checksum", 1, 1)) % 16 * 64 + 64).as("width"),
      (ascii(substring($"meta.checksum", 2, 1)) % 16 * 64 + 64).as("height"),
      round($"meta.n_bytes" / 1000.0, 3).as("duration_s"))

  /** Batched per-partition decode: the integration shape for a REAL codec
    * (image/audio libraries amortize setup per batch, not per row).
    * `decoder` receives the whole partition's (asset_id, payload) stream
    * and yields feature rows; the default is the same DETERMINISTIC FAKE
    * as `fakeDecode` so tests can prove the two paths agree. Swapping in a
    * JNI/library decoder changes only the function body — partitioning,
    * schema, and downstream plan are untouched.
    */
  def decodeBatched(
      assets: DataFrame,
      decoder: Iterator[(Long, Array[Byte], String)] => Iterator[(Long, String, Long, Int, Int)] =
        defaultFakeDecoder): DataFrame = {
    import assets.sparkSession.implicits.newProductEncoder
    val out = assets
      .select($"asset_id", $"payload", $"media_type")
      .as[(Long, Array[Byte], String)]
      .mapPartitions(decoder)
      .toDF("asset_id", "media_type", "n_bytes", "width", "height")
    out.withColumn("duration_s", round(col("n_bytes") / 1000.0, 3))
  }

  /** The fake codec: byte-derived dimensions identical to `fakeDecode`'s
    * expression form (md5 of payload -> first two hex chars).
    */
  private def defaultFakeDecoder(
      rows: Iterator[(Long, Array[Byte], String)]): Iterator[(Long, String, Long, Int, Int)] = {
    val md = java.security.MessageDigest.getInstance("MD5") // per-partition setup, amortized
    rows.map { case (id, payloadOrNull, mediaType) =>
      // a codec is a total function: null payload decodes as empty media
      // (unlike fakeDecode's null propagation — the seam's contract)
      val payload = if (payloadOrNull == null) Array.empty[Byte] else payloadOrNull
      // width/height need only the first digest byte (= first two hex chars)
      val hex = f"${md.digest(payload)(0)}%02x"
      (id, mediaType, payload.length.toLong,
        hex(0).toInt % 16 * 64 + 64, hex(1).toInt % 16 * 64 + 64)
    }
  }

  /** Feature-extract stage over decoded assets: per-media-type stats. */
  def mediaProfile(documents: DataFrame): DataFrame =
    fakeDecode(assetsFromDocuments(documents))
      .groupBy($"media_type")
      .agg(
        count(lit(1)).as("n_assets"),
        sum($"n_bytes").as("total_bytes"),
        round(avg($"width"), 4).as("avg_width"),
        round(avg($"height"), 4).as("avg_height"),
        round(sum($"duration_s"), 3).as("total_duration"))
      .orderBy($"media_type")

  /** Frame-sample stage: take every k-th "frame" (byte window) of each
    * video payload — the batch shape of video frame extraction: explode to
    * (asset, frame_no, frame_bytes) rows, repartition-friendly.
    * ASCII payload constraint (like RollingHash): the oracle slices text by
    * characters while this slices payload bytes — identical only when
    * chars == bytes, which the fixtures guarantee.
    */
  /** Frame-level dedup across the whole asset table — the multimodal
    * member of the dedup family: checksum every `frameBytes` window of
    * every payload and report the duplicated frames (shared intro/outro
    * cards, repeated stock footage) with a deterministic keeper. One
    * hash-shuffle on the frame checksum, no frame-content comparisons —
    * `exactDedup`'s shape applied to frames instead of documents, so it
    * scales identically (state per distinct checksum, duplicates-only
    * output).
    */
  def frameDedup(documents: DataFrame, frameBytes: Int = 64): DataFrame =
    assetsFromDocuments(documents)
      .select($"asset_id", $"payload",
        explode(sequence(lit(0),
          greatest(floor($"meta.n_bytes" / frameBytes).cast("int") - 1, lit(0))))
          .as("frame_no"))
      .select($"asset_id", $"frame_no".cast("bigint").as("frame_no"),
        md5($"payload".substr(($"frame_no" * frameBytes + 1).cast("int"), lit(frameBytes)))
          .as("fc"))
      .groupBy($"fc")
      .agg(count(lit(1)).as("n_copies"), countDistinct($"asset_id").as("n_assets"),
        min(struct($"asset_id", $"frame_no")).as("k"))
      .filter($"n_copies" > 1)
      .select($"fc".as("frame_checksum"), $"n_copies", $"n_assets",
        $"k.asset_id".as("keeper_asset"), $"k.frame_no".as("keeper_frame"))
      .orderBy($"frame_checksum")

  /** Perceptual-hash near-dup over media assets (q203): a 60-bit
    * signature per asset from the PER-BIT MAJORITY of its frame hashes
    * (the SimHash construction applied at the asset grain), banded into
    * 4 disjoint 15-bit LSH keys, with hamming-distance verification on
    * band-sharing candidates. Completes the media dedup ladder: q94
    * finds byte-identical FRAMES, this finds assets whose frame SETS
    * mostly agree — re-encoded or lightly-edited copies whose bytes
    * differ (majority bits survive a minority of changed frames).
    *
    * The real pHash DCTs decoded pixels; the container has no codecs,
    * so the per-frame feature is the deterministic frame checksum (the
    * module's documented fake-decode seam — swap `fc` for a codec's
    * frame feature and nothing downstream changes). What IS real: the
    * banding recall theorem (hamming ≤ 3 over 4 disjoint bands ⇒ ≥ 1
    * band exact, by pigeonhole — so the oracle's exact all-pairs form
    * doubles as the blocking's recall proof, the q178 convention), the
    * bucket-join candidate generation (never all-pairs on the engine
    * side), and the integer bit arithmetic (majority counts, shifts,
    * bit_count — engine-exact everywhere).
    *
    * ASCII fixture assumption (like frameSample): frames slice the
    * payload by BYTE offsets; the oracle slices text by CHARACTER
    * offsets (DuckDB has no md5-over-BLOB). They agree iff bytes ==
    * chars — `Tables.nonAsciiDocs` is the drift probe that names this
    * cause if a regenerated fixture ever ships multi-byte text.
    */
  def framePhashNearDup(documents: DataFrame, frameBytes: Int = 64,
      maxHamming: Int = 3): DataFrame = {
    val frames = assetsFromDocuments(documents)
      .select($"asset_id", $"payload",
        explode(sequence(lit(0),
          greatest(floor($"meta.n_bytes" / frameBytes).cast("int") - 1, lit(0))))
          .as("frame_no"))
      .select($"asset_id",
        md5($"payload".substr(($"frame_no" * frameBytes + 1).cast("int"), lit(frameBytes)))
          .as("fc"))
    val phash = frames
      .select($"asset_id",
        conv(substring($"fc", 1, 15), 16, 10).cast("long").as("h"))
      .select($"asset_id", $"h", explode(sequence(lit(0), lit(59))).as("j"))
      .select($"asset_id", $"j", expr("shiftright(h, CAST(j AS INT)) & 1").as("bit"))
      .groupBy($"asset_id", $"j")
      .agg(sum($"bit").as("c"), count(lit(1)).as("nf"))
      .groupBy($"asset_id")
      .agg(sum(when($"c" * 2 > $"nf",
          expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")).otherwise(0L))
        .as("phash"))
      .localCheckpoint() // probed by 4 band projections + the verify join
    val bands = phash.select($"asset_id", $"phash",
        explode(sequence(lit(0), lit(3))).as("b"))
      .select($"asset_id", $"phash", $"b",
        expr("shiftright(phash, CAST(b * 15 AS INT)) & 32767").as("bkey"))
    bands.select($"asset_id".as("id1"), $"phash".as("p1"), $"b", $"bkey")
      .join(bands.select($"asset_id".as("id2"), $"phash".as("p2"), $"b", $"bkey"),
        Seq("b", "bkey"))
      .filter($"id1" < $"id2")
      .select($"id1", $"id2", expr("bit_count(p1 ^ p2)").cast("int").as("hamming"))
      .distinct() // a close pair can share several bands
      .filter($"hamming" <= maxHamming)
      .orderBy($"id1", $"id2")
  }

  def frameSample(documents: DataFrame, frameBytes: Int = 64, every: Int = 4): DataFrame = {
    val assets = assetsFromDocuments(documents).filter($"media_type" === "video")
    assets
      .select($"asset_id", $"payload",
        explode(sequence(lit(0),
          greatest(floor($"meta.n_bytes" / frameBytes).cast("int") - 1, lit(0)))).as("frame_no"))
      .filter($"frame_no" % every === 0)
      .select(
        $"asset_id", $"frame_no".cast("bigint").as("frame_no"),
        md5($"payload".substr(($"frame_no" * frameBytes + 1).cast("int"), lit(frameBytes)))
          .as("frame_checksum"))
      .orderBy($"asset_id", $"frame_no")
  }
}
