package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Scale
import graft.sources.Tables
import graft.OracleHelpers._

/** Scale family queries: scale mechanics: skew salting, bucketed join, Z-order, sketches-at-scale.
  * Split from PipelineQueries (round 9) -- entries and oracles are moved
  * verbatim; PipelineQueries concatenates the families and asserts the
  * key sets stay disjoint and aligned.
  */
private[graft] object ScaleQueries extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // salted two-phase agg must equal the plain group-sum (the oracle IS the
    // plain SQL) — proving skew mitigation does not change results
    "q39_salted_agg" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Scale.saltedSumByKey(Tables.orders(s, d), "o_orderstatus", "o_totalprice", "o_orderkey")
        .select(col("o_orderstatus"), round(col("sum_o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderstatus"))
    }),
    // md5-Bloom runtime-filter accounting: orders probed against a Bloom of
    // BUILDING-segment customers
    "q72_bloom_prefilter" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Scale.bloomPrefilterStats(Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"), "c_custkey")
    }),
    // KMV sketch join-cardinality estimate (orders keys vs customer keys)
    "q77_kmv_intersect" -> ((s, d) =>
      Scale.kmvIntersectEstimate(Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey")),
    // Z-order (Morton) layout report: per-z-bucket spread of both columns
    "q78_zorder_stats" -> ((s, d) => Scale.zOrderBucketStats(Tables.orders(s, d))),
    // the HLL / approx-percentile surface made ORACLE-CHECKABLE: the
    // estimates themselves are implementation-defined (Spark's HLL++ and
    // KLL-style summaries have no DuckDB twin), so the query reports the
    // EXACT stats (hash-checked) plus booleans asserting each estimate
    // sits inside its deterministic error envelope — HLL within 2×rsd
    // (rsd default 0.05) of the exact distinct count, approx_percentile's
    // median between the exact p45/p55 cuts (accuracy 10000 => 1e-4 rank
    // error; the envelope is ~500× wider). The oracle states the booleans
    // literally, so a sketch regression fails the gate — strictly stronger
    // than the rows-only check this query shipped with through round 4
    // (the deterministic twins q54/q87 remain the hash-exact sketches).
    "q38_sketch_envelope" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val li = Tables.lineitem(s, d)
      // envelope cuts come from a $100-BUCKETED price histogram, not the
      // raw near-unique column: exactQuantileByGroup's state is one
      // counter per distinct value, which for a continuous column would
      // degenerate to row-proportional state (measured 16 s at sf0.1 —
      // exactly the failure mode its scaladoc warns about). Bucketing
      // bounds the state at price-range/100 cells; floor is monotone, so
      // bucketed quantiles bracket the true ones within one bucket width
      // and the envelope below widens by that margin.
      def cut(q: Double, name: String) =
        Scale.exactQuantileByGroup(
          li.select(col("l_returnflag"),
            (floor(col("l_extendedprice") / 100) * 100).as("pb")),
          "l_returnflag", "pb", q)
          .withColumnRenamed("cut", name)
      // exact-distinct and sketch halves aggregate SEPARATELY and join on
      // the 3-row group frame: mixing count(DISTINCT) with the
      // TypedImperative sketch aggregates in one agg forces an Expand +
      // object-agg fallback measured at 11.4 s vs 1.5+1.3 s split
      val exact = li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("exact_parts"))
      val sketch = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("hll_parts"),
          expr("approx_percentile(l_extendedprice, 0.5)").as("ap50"))
      exact
        .join(sketch, Seq("l_returnflag"))
        .join(cut(0.45, "p45"), Seq("l_returnflag"))
        .join(cut(0.55, "p55"), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_rows"), col("exact_parts"),
          (abs(col("hll_parts") - col("exact_parts"))
            <= col("exact_parts") * 0.10).as("hll_within_10pct"),
          (col("ap50") >= col("p45") - 100 && col("ap50") <= col("p55") + 200)
            .as("p50_in_envelope"))
        .orderBy(col("l_returnflag"))
    }),
    // shuffle-key skew audit: power-of-two histogram of per-key row
    // counts for a prospective join/agg key (exact bin() bucketing)
    "q157_key_skew" -> ((s, d) => Scale.keySkewAudit(Tables.events(s, d), "user_id")),
    // small-file compaction planner over the REAL multimodal asset
    // store: sequential next-fit bin packing (size desc, id asc) into
    // 64 KiB outputs via the fully distributed two-stage prefix sum —
    // the lakehouse maintenance pass a 100 TB table schedules (round 13)
    "q310_compaction_plan" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Scale.compactionPlan(
        graft.operators.Multimodal.assetStore(Tables.documents(s, d), "bmp")
          .select(col("asset_id"), col("n_bytes")),
        "asset_id", "n_bytes", targetBytes = 64L * 1024)
    }),
    // file-skipping layout audit: how many rank-slice "files" a point
    // predicate on o_orderdate reads from min/max footer stats, sorted
    // layout vs arrival layout — the OPTIMIZE-effectiveness number a
    // lakehouse table reports after a re-layout (round 13)
    "q311_layout_skipping" -> ((s, d) =>
      Scale.layoutSkippingAudit(Tables.orders(s, d), "o_orderdate", "o_orderkey")),
    // small-file debt per media family over the real asset store — the
    // trigger metric that decides when q310's planner runs; has the
    // round-13 streaming twin (EventStreams.compactionDebtStream)
    "q312_compaction_debt" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Scale.compactionDebt(
        graft.operators.Multimodal.assetStore(Tables.documents(s, d), "bmp")
          .select(col("media_type"), col("n_bytes")),
        "media_type", "n_bytes")
    }),
    // per-family compaction plan — output files never mix families; the
    // offset resets per family via a family-partitioned base window
    "q313_compaction_keyed" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Scale.compactionPlanKeyed(
        graft.operators.Multimodal.assetStore(Tables.documents(s, d), "bmp")
          .select(col("media_type"), col("asset_id"), col("n_bytes")),
        "media_type", "asset_id", "n_bytes", targetBytes = 64L * 1024)
    }),
    // the maintenance loop's closing report: current vs planned file
    // count per family + the reduction a compaction run delivers,
    // beside the debt share that triggered it (q312 -> q313 -> this)
    "q315_compaction_forecast" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Scale.compactionForecast(
        graft.operators.Multimodal.assetStore(Tables.documents(s, d), "bmp")
          .select(col("media_type"), col("asset_id"), col("n_bytes")),
        "media_type", "asset_id", "n_bytes", targetBytes = 64L * 1024)
    }),
    // the maintenance loop EXECUTED (round 14): apply q313's keyed plan
    // to the real asset store — physically concatenate every planned
    // bin's payloads into one blob on scratch disk — then reconcile the
    // re-LISTED post-state (filesystem sizes via the binaryFile source)
    // against the forecast: planned == actual file counts, bytes
    // conserved, debt share collapsed. The oracle computes the plan's
    // closed form; any byte the writer drops or duplicates flips a
    // hash-gated match column.
    "q316_compaction_execute" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      Scale.compactionExecute(
        graft.operators.Multimodal.assetStore(Tables.documents(s, d), "bmp")
          .select(col("media_type"), col("asset_id"), col("n_bytes"),
            col("payload")),
        "media_type", "asset_id", "n_bytes", "payload",
        graft.sources.Scratch.dir("graft_compaction_exec"),
        targetBytes = 64L * 1024)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q39_salted_agg" ->
      """SELECT o_orderstatus, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q72_bloom_prefilter" -> {
      val ps = (0 until 3).map(j => posSql("h", j, 16384))
      s"""WITH dimk AS (
         |  SELECT DISTINCT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
         |),
         |dh AS (SELECT key, md5(CAST(key AS VARCHAR)) AS h FROM dimk),
         |dimpos AS (
         |  SELECT DISTINCT p FROM (SELECT unnest([${ps.mkString(", ")}]) AS p FROM dh)
         |),
         |probe AS (SELECT DISTINCT o_custkey AS key FROM orders),
         |ph AS (SELECT key, md5(CAST(key AS VARCHAR)) AS h FROM probe),
         |pk AS (
         |  SELECT key, len(ps) AS np, unnest(ps) AS p FROM (
         |    SELECT key, list_distinct([${ps.mkString(", ")}]) AS ps FROM ph)
         |),
         |hits AS (
         |  SELECT pk.key, np, count(d.p) AS nh
         |  FROM pk LEFT JOIN dimpos d USING (p) GROUP BY 1, 2
         |),
         |flag AS (
         |  SELECT (nh = np) AS pass, (dk.key IS NOT NULL) AS member
         |  FROM hits h LEFT JOIN dimk dk ON h.key = dk.key
         |)
         |SELECT count(*) AS n_probe,
         | CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         | CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
         | CAST(sum(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
         | CASE WHEN count(*) > sum(CASE WHEN member THEN 1 ELSE 0 END)
         |   THEN round(sum(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) * 1.0 /
         |     (count(*) - sum(CASE WHEN member THEN 1 ELSE 0 END)), 6)
         |   ELSE 0.0 END AS fp_rate
         |FROM flag""".stripMargin
    },
    "q77_kmv_intersect" ->
      // KMV merge math replicated exactly: k-min sketches per side, sorted
      // distinct union cut at k, jaccard = in-both fraction, union estimate
      // = 63/hexFraction(kth) (the q54 exact-binary-fraction trick)
      """WITH ha AS (SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders),
        |hb AS (SELECT DISTINCT md5(CAST(c_custkey AS VARCHAR)) AS h FROM customer),
        |ka AS (SELECT h FROM ha ORDER BY h LIMIT 64),
        |kb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
        |ku AS (
        |  SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
        |  ORDER BY h LIMIT 64
        |),
        |flags AS (
        |  SELECT u.h, (a.h IS NOT NULL AND b.h IS NOT NULL) AS inboth,
        |    row_number() OVER (ORDER BY u.h) AS rn, count(*) OVER () AS nu
        |  FROM ku u LEFT JOIN ka a ON u.h = a.h LEFT JOIN kb b ON u.h = b.h
        |),
        |stats AS (
        |  SELECT max(nu) AS nu,
        |    CAST(sum(CASE WHEN inboth THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    max(CASE WHEN rn = nu THEN h END) AS kth
        |  FROM flags
        |),
        |est AS (
        |  SELECT nu, nb * 1.0 / nu AS j,
        |    CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE)
        |      ELSE 63 / list_sum(list_transform(generate_series(1, 13),
        |        i -> (strpos('0123456789abcdef', substr(kth, i, 1)) - 1) * power(16.0, -i)))
        |    END AS uest
        |  FROM stats
        |),
        |ex AS (
        |  SELECT count(*) AS n_exact FROM (
        |    SELECT DISTINCT o_custkey FROM orders
        |    WHERE o_custkey IN (SELECT c_custkey FROM customer))
        |)
        |SELECT CAST(nu AS BIGINT) AS n_kmin, round(j, 6) AS jaccard_est,
        | round(uest, 4) AS union_est, round(j * uest, 4) AS intersect_est, n_exact
        |FROM est CROSS JOIN ex""".stripMargin,
    "q78_zorder_stats" -> {
      // interleave term b: bit b of x lands at position 2b, of y at 2b+1
      val terms = (0 until 16).map(b =>
        s"((x // ${1L << b}) % 2) * ${1L << (2 * b)} + ((y // ${1L << b}) % 2) * ${1L << (2 * b + 1)}")
        .mkString("(", " + ", ")")
      s"""WITH raw AS (
         |  SELECT o_custkey % 65536 AS x,
         |    CAST(floor(o_totalprice) AS BIGINT) % 65536 AS y
         |  FROM orders
         |),
         |bounds AS (SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1 FROM raw),
         |s AS (
         |  SELECT
         |    CASE WHEN x1 = x0 THEN 0 ELSE ((x - x0) * 65535) // (x1 - x0) END AS x,
         |    CASE WHEN y1 = y0 THEN 0 ELSE ((y - y0) * 65535) // (y1 - y0) END AS y
         |  FROM raw CROSS JOIN bounds
         |),
         |z AS (SELECT x, y, $terms AS z FROM s)
         |SELECT z // 16777216 AS z_bucket, count(*) AS n,
         | min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // the envelope booleans are stated literally: the oracle asserts the
    // exact stats by value and the estimates by CONTRACT (inside their
    // documented error envelopes) — a Spark sketch regression flips a
    // boolean and fails the hash compare
    "q38_sketch_envelope" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  true AS hll_within_10pct, true AS p50_in_envelope
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q157_key_skew" ->
      // bucket = length(bin(c)) - 1 == floor(log2(c)) computed on the
      // integer binary form — exact in both engines
      """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows_total FROM c)
        |SELECT length(bin(c)) - 1 AS log2_bucket, count(*) AS n_keys,
        |  CAST(sum(c) AS BIGINT) AS n_rows, max(c) AS max_rows_per_key,
        |  round(CAST(sum(c) AS DOUBLE) / t.n_rows_total, 4) AS row_share
        |FROM c, t GROUP BY 1, t.n_rows_total
        |ORDER BY log2_bucket""".stripMargin,
    "q310_compaction_plan" ->
      // file sizes are the BMP closed form (real payload length ==
      // fileBytes(w, h), pinned by the q244 codec gate); the global
      // running offset is a plain window here (DuckDB single-node) —
      // the ENGINE side runs the distributed two-stage prefix sum
      """WITH d AS (
        |  SELECT doc_id AS file_id,
        |    CAST(54 + (((16 + (doc_id * 7) % 48) * 3 + 3) // 4) * 4
        |           * (16 + (doc_id * 13) % 32) AS BIGINT) AS n_bytes
        |  FROM documents
        |),
        |o AS (
        |  SELECT file_id, n_bytes,
        |    sum(n_bytes) OVER (ORDER BY n_bytes DESC, file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_bytes AS start_off
        |  FROM d
        |)
        |SELECT CAST(start_off // 65536 AS BIGINT) AS bin, count(*) AS n_files,
        | CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        | min(n_bytes) AS min_file_bytes, max(n_bytes) AS max_file_bytes,
        | min(file_id) AS first_file
        |FROM o GROUP BY bin ORDER BY bin""".stripMargin,
    "q311_layout_skipping" ->
      // file = floor(rank0 * files / N) over each layout's total order
      // ((k, id) sorted / (id) arrival; id unique => total); reads =
      // distinct probes x per-file [min, max] footer ranges. The global
      // row_number is a plain window here (DuckDB single-node) — the
      // ENGINE side runs the two-phase distributed prefix count
      """WITH base AS (SELECT o_orderkey AS id, o_orderdate AS k FROM orders),
        |n AS (SELECT count(*) AS n FROM base),
        |r AS (
        |  SELECT id, k,
        |    row_number() OVER (ORDER BY k, id) - 1 AS rs,
        |    row_number() OVER (ORDER BY id) - 1 AS ra
        |  FROM base
        |),
        |fs AS (
        |  SELECT 'sorted' AS layout, rs * 64 // n.n AS f,
        |    min(k) AS lo, max(k) AS hi
        |  FROM r, n GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'arrival', ra * 64 // n.n, min(k), max(k)
        |  FROM r, n GROUP BY 1, 2
        |),
        |probes AS (SELECT DISTINCT k FROM base),
        |reads AS (
        |  SELECT layout, k, count(*) AS nf
        |  FROM probes JOIN fs ON k >= lo AND k <= hi
        |  GROUP BY 1, 2
        |),
        |agg AS (
        |  SELECT layout, count(*) AS n_probes,
        |    CAST(sum(nf) AS BIGINT) AS reads_total,
        |    max(nf) AS max_files_read,
        |    round(CAST(sum(nf) AS DOUBLE) / count(*), 6) AS avg_files_read
        |  FROM reads GROUP BY 1
        |),
        |nfl AS (SELECT layout, count(DISTINCT f) AS n_files FROM fs GROUP BY 1)
        |SELECT a.layout, nfl.n_files, a.n_probes, a.reads_total,
        | a.max_files_read, a.avg_files_read
        |FROM agg a JOIN nfl USING (layout) ORDER BY layout""".stripMargin,
    "q312_compaction_debt" ->
      // file sizes = the BMP closed form per doc; family = the q35
      // media rotation; debt = conditional sums under the 4096 threshold
      """WITH f AS (
        |  SELECT
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS family,
        |    CAST(54 + (((16 + (doc_id * 7) % 48) * 3 + 3) // 4) * 4
        |           * (16 + (doc_id * 13) % 32) AS BIGINT) AS n_bytes
        |  FROM documents
        |)
        |SELECT family, count(*) AS n_files,
        | CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        | CAST(count(CASE WHEN n_bytes < 4096 THEN 1 END) AS BIGINT) AS small_files,
        | CAST(coalesce(sum(CASE WHEN n_bytes < 4096 THEN n_bytes END), 0) AS BIGINT)
        |   AS small_bytes,
        | round(CAST(coalesce(sum(CASE WHEN n_bytes < 4096 THEN n_bytes END), 0)
        |   AS DOUBLE) / sum(n_bytes), 6) AS debt_share
        |FROM f GROUP BY family ORDER BY family""".stripMargin,
    "q313_compaction_keyed" ->
      // the q310 window-cumsum oracle with the running offset
      // PARTITIONED BY family — output files never mix families
      """WITH d AS (
        |  SELECT
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS family,
        |    doc_id AS file_id,
        |    CAST(54 + (((16 + (doc_id * 7) % 48) * 3 + 3) // 4) * 4
        |           * (16 + (doc_id * 13) % 32) AS BIGINT) AS n_bytes
        |  FROM documents
        |),
        |o AS (
        |  SELECT family, file_id, n_bytes,
        |    sum(n_bytes) OVER (PARTITION BY family
        |      ORDER BY n_bytes DESC, file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_bytes AS start_off
        |  FROM d
        |)
        |SELECT family, CAST(start_off // 65536 AS BIGINT) AS bin,
        | count(*) AS n_files,
        | CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        | min(n_bytes) AS min_file_bytes, max(n_bytes) AS max_file_bytes,
        | min(file_id) AS first_file
        |FROM o GROUP BY family, bin ORDER BY family, bin""".stripMargin,
    "q315_compaction_forecast" ->
      // the q312 debt CTE joined with the q313 plan collapsed to a
      // per-family bin count; reduction = 1 - planned/current
      """WITH d AS (
        |  SELECT
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS family,
        |    doc_id AS file_id,
        |    CAST(54 + (((16 + (doc_id * 7) % 48) * 3 + 3) // 4) * 4
        |           * (16 + (doc_id * 13) % 32) AS BIGINT) AS n_bytes
        |  FROM documents
        |),
        |debt AS (
        |  SELECT family, count(*) AS n_files,
        |    CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |    CAST(count(CASE WHEN n_bytes < 4096 THEN 1 END) AS BIGINT)
        |      AS small_files,
        |    round(CAST(coalesce(sum(CASE WHEN n_bytes < 4096 THEN n_bytes END), 0)
        |      AS DOUBLE) / sum(n_bytes), 6) AS debt_share
        |  FROM d GROUP BY family
        |),
        |o AS (
        |  SELECT family,
        |    sum(n_bytes) OVER (PARTITION BY family
        |      ORDER BY n_bytes DESC, file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_bytes AS start_off
        |  FROM d
        |),
        |plan AS (
        |  SELECT family, count(DISTINCT start_off // 65536) AS planned_files
        |  FROM o GROUP BY family
        |)
        |SELECT debt.family, debt.n_files, debt.total_bytes, debt.small_files,
        | debt.debt_share, plan.planned_files,
        | round(1.0 - CAST(plan.planned_files AS DOUBLE) / debt.n_files, 6)
        |   AS file_reduction
        |FROM debt JOIN plan USING (family) ORDER BY family""".stripMargin,
    "q316_compaction_execute" ->
      // the executed plan's closed form: before-state debt, the q313
      // keyed next-fit collapsed per family, and the post-state the
      // EXECUTION must land on — actual == planned counts, bytes
      // conserved, debt share recomputed over BIN totals. The engine's
      // actual_* columns come from re-listing the written blobs, so a
      // faithless writer hash-mismatches every match column.
      """WITH d AS (
        |  SELECT
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS family,
        |    doc_id AS file_id,
        |    CAST(54 + (((16 + (doc_id * 7) % 48) * 3 + 3) // 4) * 4
        |           * (16 + (doc_id * 13) % 32) AS BIGINT) AS n_bytes
        |  FROM documents
        |),
        |before_s AS (
        |  SELECT family, count(*) AS n_files_before,
        |    CAST(sum(n_bytes) AS BIGINT) AS total_bytes_before,
        |    round(CAST(coalesce(sum(CASE WHEN n_bytes < 4096 THEN n_bytes END), 0)
        |      AS DOUBLE) / sum(n_bytes), 6) AS debt_share_before
        |  FROM d GROUP BY family
        |),
        |o AS (
        |  SELECT family, n_bytes,
        |    sum(n_bytes) OVER (PARTITION BY family
        |      ORDER BY n_bytes DESC, file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_bytes AS start_off
        |  FROM d
        |),
        |bins AS (
        |  SELECT family, start_off // 65536 AS bin,
        |    CAST(sum(n_bytes) AS BIGINT) AS bin_bytes
        |  FROM o GROUP BY family, bin
        |),
        |plan AS (
        |  SELECT family, count(*) AS planned_files,
        |    round(CAST(coalesce(sum(CASE WHEN bin_bytes < 4096 THEN bin_bytes END), 0)
        |      AS DOUBLE) / sum(bin_bytes), 6) AS debt_share_after
        |  FROM bins GROUP BY family
        |)
        |SELECT b.family, b.n_files_before, b.total_bytes_before,
        | b.debt_share_before, p.planned_files,
        | p.planned_files AS actual_files, TRUE AS files_match,
        | b.total_bytes_before AS actual_bytes, TRUE AS bytes_match,
        | p.debt_share_after
        |FROM before_s b JOIN plan p USING (family) ORDER BY family""".stripMargin,
  )
}
