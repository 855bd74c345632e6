package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Governance
import graft.sources.Tables
import graft.OracleHelpers._

/** Governance family queries: governance: erasure audit, profiling, Benford, fingerprints.
  * Split from PipelineQueries (round 9) -- entries and oracles are moved
  * verbatim; PipelineQueries concatenates the families and asserts the
  * key sets stay disjoint and aligned.
  */
private[graft] object GovernanceQueries extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // right-to-erasure tombstones at the index-row grain: delete list
    // anti-joins the postings-shaped frames, df/N/avgdl recompute from
    // survivors — bit-identical to re-ingesting the filtered corpus
    "q163_erasure_bm25" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Governance.erasureBm25(docs, Governance.erasureRequests(docs))
    }),
    // the compliance report a deletion batch ships with: per-source doc
    // and token-mass impact, retained fraction in exact ppm
    "q164_erasure_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Governance.erasureAudit(docs, Governance.erasureRequests(docs))
    }),
    // erasure over the dedup graph: drop pairs touching deleted ids from
    // the session pair index (no re-banding), re-run components — a
    // deleted bridge doc splits its cluster exactly as a full re-run would
    "q165_erasure_survivors" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Governance.erasureSurvivors(docs, Governance.erasureRequests(docs))
    }),
    // ANALYZE-style per-column profile (exact NDV, nulls, min/max) over
    // orders: one unpivoted pass, ncols-state agg; timestamps profile in
    // epoch-micros space (string formats are engine-dependent)
    "q176_table_profile" -> ((s, d) => Governance.tableProfile(Tables.orders(s, d))),
    // order-free 60-bit XOR dataset fingerprint per source: the corpus
    // version identity, any merge order, no overflow
    "q197_dataset_fingerprint" -> ((s, d) =>
      Governance.datasetFingerprint(Tables.documents(s, d))),
    // Benford first-digit audit of the value column: integer-string
    // digit extraction, shared literal constants, per-digit chi2 terms
    "q202_benford" -> ((s, d) => Governance.benfordAudit(Tables.events(s, d))),
    // per-language source concentration of token mass: HHI, Gini, top
    // share — integer aggregates, one double division per reported ratio
    "q216_source_concentration" -> ((s, d) =>
      Governance.sourceConcentration(Tables.documents(s, d))),
    // star-wide referential-integrity profile: per FK edge, nulls,
    // orphans, distinct keys, max fan-out (q08 generalized to the schema)
    "q223_fk_profile" -> ((s, d) => Governance.fkProfile(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.part(s, d),
      Tables.supplier(s, d), Tables.customer(s, d), Tables.nation(s, d),
      Tables.region(s, d))),
    // l-diversity audit: within each (nation, segment) quasi-identifier
    // cell, how diverse is the sensitive balance band -- the leak
    // k-anonymity's size-only bound cannot see
    "q230_l_diversity" -> ((s, d) =>
      Governance.lDiversityReport(Tables.customer(s, d))),
    // persisted-artifact staleness guard: the datasheet partials, the
    // PQ serving bundle, and the spectral model are each built from a
    // base slice WITH a build-slice fingerprint; the report compares it
    // against (a) the same slice (fresh), (b) the grown corpus
    // (count+hash flip), (c) one row mutated in place (count holds,
    // hash flips) - the failure mode only the content hash can see.
    // PQ/spectral are the LONGEST-LIVED artifacts in production: a code
    // table built from a previous corpus silently serves wrong
    // neighbors, exactly what this report exists to catch.
    "q242_artifact_staleness" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, concat, lit, when}
      val docs = Tables.documents(s, d)
      val base = docs.filter(col("doc_id") % 10 =!= 1)
      val dir = graft.sources.Scratch.dir("graft_fp")
      graft.operators.Curation.writeDatasheetPartials(base, s"$dir/partials")
      val mutated = base.withColumn("text",
        when(col("doc_id") === 5L, concat(col("text"), lit("~")))
          .otherwise(col("text")))
      val embs = Tables.embeddings(s, d)
      val embBase = embs.filter(col("vec_id") % 10 =!= 1)
      graft.operators.Similarity.writePqIndex(embBase, s"$dir/pq")
      graft.operators.Similarity.writeSpectralModel(embBase, s"$dir/abtt")
      val embMut = embBase.withColumn("label",
        when(col("vec_id") === 5L, col("label") + 1).otherwise(col("label")))
      Governance.stalenessReport(s, Seq(
        ("ds_fresh", s"$dir/partials", base, Governance.docCanonical),
        ("ds_grown", s"$dir/partials", docs, Governance.docCanonical),
        ("ds_mutated", s"$dir/partials", mutated, Governance.docCanonical),
        ("pq_fresh", s"$dir/pq", embBase, Governance.embCanonical),
        ("pq_grown", s"$dir/pq", embs, Governance.embCanonical),
        ("pq_mutated", s"$dir/pq", embMut, Governance.embCanonical),
        ("sp_fresh", s"$dir/abtt", embBase, Governance.embCanonical),
        ("sp_mutated", s"$dir/abtt", embMut, Governance.embCanonical)))
    }),
    // t-closeness EMD audit on the q230 QI frame: exact-integer prefix
    // differences over the ordered band domain (completes the
    // k-anonymity / l-diversity / t-closeness privacy triple)
    "q256_t_closeness" -> ((s, d) =>
      Governance.tClosenessReport(Tables.customer(s, d))),
    // declarative constraint suite: per-table one-scan conditional
    // aggregation + uniqueness + broadcast FK probe
    "q257_constraint_audit" -> ((s, d) =>
      Governance.constraintAudit(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d))),
  )

  /** The q223 FK-edge list shared by the oracle generator below. */
  private val FkEdges = Seq(
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))

  /** q242 oracle: the q197 strpos-arithmetic 60-bit md5 parse over the
    * '|'-joined doc/embedding canonicals, XOR-folded per slice; each
    * scenario row compares the BUILT (base-slice) fingerprint to its
    * current slice. Embedding components render as exact 1e-6-grid
    * integers (float -> DOUBLE is exact, round-then-BIGINT matches
    * Spark's HALF_UP on the identical double).
    */
  private def stalenessSql: String = {
    def hv(idx: Int) = s"(strpos('0123456789abcdef', substr(h, $idx, 1)) - 1)"
    val h60 = (2 to 15).foldLeft(hv(1))((acc, i) => s"($acc * 16 + ${hv(i)})")
    def fp(src: String, canonical: String) =
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(coalesce(bit_xor(CAST($h60 AS BIGINT)), 0) AS BIGINT) AS x
         |FROM (SELECT md5($canonical) AS h FROM $src)""".stripMargin
    val docCanon = """CAST(doc_id AS VARCHAR) || '|' || lang || '|' ||
      | source || '|' || text""".stripMargin
    val embCanon = """CAST(vec_id AS VARCHAR) || '|' ||
      | CAST(label AS VARCHAR) || '|' ||
      | array_to_string(list_transform(embedding,
      |   u -> CAST(CAST(round(CAST(u AS DOUBLE) * 1e6) AS BIGINT) AS VARCHAR)), ',')""".stripMargin
    def row(label: String, built: String, cur: String) =
      s"""SELECT '$label' AS artifact, $built.n AS n_built, $built.x AS hash_built,
         |  $cur.n AS n_current, $cur.x AS hash_current,
         |  $built.n = $cur.n AS count_match, $built.x = $cur.x AS hash_match,
         |  ($built.n = $cur.n AND $built.x = $cur.x) AS fresh
         |FROM $built, $cur""".stripMargin
    s"""WITH base AS (SELECT * FROM documents WHERE doc_id % 10 <> 1),
       |mut AS (
       |  SELECT doc_id, CASE WHEN doc_id = 5 THEN text || '~' ELSE text END AS text,
       |    lang, source FROM base
       |),
       |ebase AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 1),
       |emut AS (
       |  SELECT vec_id, embedding,
       |    CASE WHEN vec_id = 5 THEN label + 1 ELSE label END AS label
       |  FROM ebase
       |),
       |b AS (${fp("base", docCanon)}),
       |cf AS (SELECT n, x FROM b),
       |cg AS (${fp("documents", docCanon)}),
       |cm AS (${fp("mut", docCanon)}),
       |eb AS (${fp("ebase", embCanon)}),
       |ef AS (SELECT n, x FROM eb),
       |eg AS (${fp("embeddings", embCanon)}),
       |em AS (${fp("emut", embCanon)})
       |${row("ds_fresh", "b", "cf")}
       |UNION ALL
       |${row("ds_grown", "b", "cg")}
       |UNION ALL
       |${row("ds_mutated", "b", "cm")}
       |UNION ALL
       |${row("pq_fresh", "eb", "ef")}
       |UNION ALL
       |${row("pq_grown", "eb", "eg")}
       |UNION ALL
       |${row("pq_mutated", "eb", "em")}
       |UNION ALL
       |${row("sp_fresh", "eb", "ef")}
       |UNION ALL
       |${row("sp_mutated", "eb", "em")}
       |ORDER BY artifact""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q242_artifact_staleness" -> stalenessSql,
    "q163_erasure_bm25" ->
      // q79's exact CTEs over the corpus minus the erasure congruence
      // class — the oracle states the tombstone law itself: serve-time
      // anti-join == re-ingest of the filtered corpus (stats and all)
      """WITH live AS (SELECT * FROM documents WHERE doc_id % 41 <> 3),
        |dl AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM live
        |),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM live
        |  ) WHERE term IN ('table', 'data', 'row') GROUP BY 1, 2
        |),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT doc_id,
        |    round(sum(ln((n - df + 0.5) / (df + 0.5) + 1) * tf * (1.2 + 1) /
        |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY doc_id
        |)
        |SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q164_erasure_audit" ->
      // integer token masses; the only division is the final ppm ratio
      """WITH d AS (
        |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CASE WHEN doc_id % 41 = 3 THEN 1 ELSE 0 END AS del
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(del) AS BIGINT) AS n_erased,
        |  CAST(sum(toks) AS BIGINT) AS tokens_total,
        |  CAST(sum(CASE WHEN del = 1 THEN toks ELSE 0 END) AS BIGINT) AS tokens_erased,
        |  CAST(round(1e6 * (sum(toks) - sum(CASE WHEN del = 1 THEN toks ELSE 0 END))
        |    / sum(toks), 0) AS BIGINT) AS retained_ppm
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q165_erasure_survivors" ->
      // q53's recursive components over the pair set with BOTH endpoints
      // retained — the tombstone-at-pair-grain law in SQL (equals the
      // filtered-corpus re-run by the restrictPairs per-pair-local
      // identity)
      s"""WITH RECURSIVE pairs AS (
         |  SELECT id1, id2 FROM (
         |$JaccardSql
         |  ) jt WHERE id1 % 41 <> 3 AND id2 % 41 <> 3
         |),
         |edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs
         |),
         |reach(node, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
         |)
         |SELECT node AS doc_id, min(label) AS cluster_rep,
         | (node = min(label)) AS survives
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    "q176_table_profile" -> {
      // one UNION ALL branch per orders column, same type dispatch as
      // the operator: numerics (and epoch_us-mapped timestamps) profile
      // as DOUBLE, strings lexicographically; n_nulls = count(*) −
      // count(col) (both BIGINT — no sum, dtype-clean)
      def num(c: String, e: String) =
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(count(*) - count($e) AS BIGINT) AS n_nulls,
           |  count(DISTINCT CAST($e AS DOUBLE)) AS n_distinct,
           |  min(CAST($e AS DOUBLE)) AS min_num,
           |  max(CAST($e AS DOUBLE)) AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  min($c) AS min_str, max($c) AS max_str
           |FROM orders""".stripMargin
      Seq(
        num("o_orderkey", "o_orderkey"),
        num("o_custkey", "o_custkey"),
        str("o_orderstatus"),
        num("o_totalprice", "o_totalprice"),
        num("o_orderdate", "epoch_us(o_orderdate)"),
        str("o_orderpriority"),
      ).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    "q197_dataset_fingerprint" -> {
      // 60-bit content hash via strpos arithmetic (DuckDB has no conv);
      // XOR fold is merge-order-free on both engines
      def hv(idx: Int) = s"(strpos('0123456789abcdef', substr(h, $idx, 1)) - 1)"
      val h60 = (2 to 15).foldLeft(hv(1))((acc, i) => s"($acc * 16 + ${hv(i)})")
      s"""WITH f AS (
         |  SELECT source,
         |    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
         |  FROM documents
         |),
         |g AS (SELECT source, CAST($h60 AS BIGINT) AS hv, toks FROM f)
         |SELECT source, count(*) AS n_docs,
         | CAST(sum(toks) AS BIGINT) AS n_tokens,
         | bit_xor(hv) AS fingerprint
         |FROM g GROUP BY source ORDER BY source""".stripMargin
    },
    "q202_benford" -> {
      val values = Governance.BenfordShares
        .map { case (d, p) => s"($d, ${String.format("%.17e", Double.box(p))})" }
        .mkString(", ")
      s"""WITH b(digit, benford_share) AS (VALUES $values),
         |dg AS (
         |  SELECT CAST(substr(CAST(vm AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         |    count(*) AS n_obs
         |  FROM (SELECT CAST(round(value * 10000, 0) AS BIGINT) AS vm FROM events)
         |  WHERE vm > 0 GROUP BY 1
         |),
         |j AS (SELECT b.digit, CAST(coalesce(dg.n_obs, 0) AS BIGINT) AS n_obs,
         |        b.benford_share
         |      FROM b LEFT JOIN dg USING (digit)),
         |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM j),
         |c AS (SELECT round(CAST(sum(
         |        (n_obs - n_total * benford_share) * (n_obs - n_total * benford_share)
         |          / (n_total * benford_share)) AS DOUBLE), 4) AS chi2
         |      FROM j, t)
         |SELECT digit, n_obs,
         | round(n_obs * 1.0 / t.n_total, 6) AS obs_share,
         | round(benford_share, 6) AS benford_share,
         | c.chi2 AS chi2
         |FROM j, t, c ORDER BY digit""".stripMargin
    },
    "q216_source_concentration" ->
      // Gini via the ascending-rank identity G = (2Σi·x − (n+1)Σx)/(nΣx):
      // all aggregates BIGINT-exact, each ratio one double division
      """WITH s AS (
        |  SELECT lang, source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY lang, source
        |),
        |r AS (
        |  SELECT lang, tokens,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY tokens, source)
        |      AS BIGINT) AS i
        |  FROM s
        |),
        |a AS (
        |  SELECT lang, count(*) AS n_sources,
        |    CAST(sum(tokens) AS BIGINT) AS total_tokens,
        |    CAST(max(tokens) AS BIGINT) AS top,
        |    CAST(sum(tokens * tokens) AS BIGINT) AS sq,
        |    CAST(sum(i * tokens) AS BIGINT) AS rm
        |  FROM r GROUP BY lang
        |)
        |SELECT lang, n_sources, total_tokens,
        | round(top * 1.0 / total_tokens, 6) AS top_share,
        | round(sq * 1.0 / (total_tokens * total_tokens), 6) AS hhi,
        | round((2 * rm - (n_sources + 1) * total_tokens) * 1.0
        |   / (n_sources * total_tokens), 6) AS gini
        |FROM a ORDER BY lang""".stripMargin,
    "q223_fk_profile" -> {
      // one generated block per FK edge: child-key histogram LEFT JOIN
      // parent key set; all counters BIGINT
      val blocks = FkEdges.map { case (name, child, fk, parent, pk) =>
        s"""SELECT '$name' AS fk_edge,
           | CAST(sum(g.c) AS BIGINT) AS n_rows,
           | CAST(sum(CASE WHEN g.k IS NULL THEN g.c ELSE 0 END) AS BIGINT) AS n_nulls,
           | CAST(sum(CASE WHEN g.k IS NOT NULL AND pk.k IS NULL THEN g.c ELSE 0 END)
           |   AS BIGINT) AS n_orphans,
           | CAST(sum(CASE WHEN g.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_distinct_keys,
           | CAST(coalesce(max(CASE WHEN g.k IS NOT NULL THEN g.c END), 0) AS BIGINT)
           |   AS max_fanout
           |FROM (SELECT $fk AS k, count(*) AS c FROM $child GROUP BY 1) g
           |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $parent) pk ON g.k = pk.k""".stripMargin
      }
      blocks.mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
    },
    "q230_l_diversity" ->
      // q90's micro-unit quantization: integer log2 terms, exact cell
      // sums, floats only in the two final divisions
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
        |  FROM customer
        |),
        |cells AS (
        |  SELECT c_nationkey, c_mktsegment, band, count(*) AS c
        |  FROM b GROUP BY 1, 2, 3
        |)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  count(*) AS distinct_l,
        |  round(log2(CAST(sum(c) AS BIGINT))
        |    - CAST(sum(c * CAST(round(log2(c) * 1e6) AS BIGINT)) AS BIGINT)
        |      / 1e6 / CAST(sum(c) AS BIGINT), 4) AS entropy_bits,
        |  (count(*) >= 3) AS l_diverse
        |FROM cells GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q256_t_closeness" ->
      // ordered-attribute EMD as exact-integer prefix differences over
      // the zero-filled QI x band grid; one double division renders t
      """WITH base AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
        |  FROM customer
        |),
        |cells AS (
        |  SELECT c_nationkey, c_mktsegment, band, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2, 3
        |),
        |bands AS (SELECT band, CAST(sum(c) AS BIGINT) AS tb FROM cells GROUP BY 1),
        |qi AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(sum(c) AS BIGINT) AS ng
        |  FROM cells GROUP BY 1, 2
        |),
        |tot AS (
        |  SELECT CAST(sum(tb) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS m
        |  FROM bands
        |),
        |grid AS (
        |  SELECT q.c_nationkey, q.c_mktsegment, b.band, q.ng, b.tb,
        |    coalesce(x.c, 0) AS c
        |  FROM qi q CROSS JOIN bands b
        |  LEFT JOIN cells x ON x.c_nationkey = q.c_nationkey
        |    AND x.c_mktsegment = q.c_mktsegment AND x.band = b.band
        |),
        |cum AS (
        |  SELECT c_nationkey, c_mktsegment, ng, t.n, t.m,
        |    CAST(sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS fg,
        |    CAST(sum(tb) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS fa
        |  FROM grid CROSS JOIN tot t
        |),
        |emd AS (
        |  SELECT c_nationkey, c_mktsegment, max(ng) AS n_rows,
        |    sum(CAST(abs(fg * n - fa * ng) AS HUGEINT)) AS s_num,
        |    max(n) AS n, max(m) AS m
        |  FROM cum GROUP BY 1, 2
        |),
        |fin AS (
        |  SELECT c_nationkey, c_mktsegment, n_rows,
        |    round(CAST(s_num AS DOUBLE)
        |      / (CAST(n_rows AS DOUBLE) * n * (m - 1)), 6) AS t_emd
        |  FROM emd
        |)
        |SELECT c_nationkey, c_mktsegment, n_rows, t_emd,
        |  t_emd <= 0.2 AS t_close
        |FROM fin ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q257_constraint_audit" ->
      // one aggregate scan per table + uniqueness + NOT EXISTS FK probe;
      // "constraint" quoted (reserved word)
      """WITH li AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |    CAST(sum(CASE WHEN NOT (l_extendedprice > 0.0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |    CAST(sum(CASE WHEN NOT (l_returnflag IN ('A', 'N', 'R'))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
        |    CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
        |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |      AS BIGINT) AS v_uniq
        |  FROM lineitem
        |),
        |ord AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN NOT (o_totalprice > 0.0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |    CAST(sum(CASE WHEN NOT (o_orderstatus IN ('F', 'O', 'P'))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_null,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_uniq
        |  FROM orders
        |),
        |fk AS (
        |  SELECT CAST(count(*) AS BIGINT) AS v FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |),
        |rep AS (
        |  SELECT 'lineitem.quantity_in_1_50' AS "constraint", n AS n_checked,
        |    v_qty AS n_violations FROM li
        |  UNION ALL SELECT 'lineitem.extendedprice_positive', n, v_price FROM li
        |  UNION ALL SELECT 'lineitem.returnflag_domain', n, v_flag FROM li
        |  UNION ALL SELECT 'lineitem.discount_in_0_1', n, v_disc FROM li
        |  UNION ALL SELECT 'lineitem.linekey_unique', n, v_uniq FROM li
        |  UNION ALL SELECT 'orders.totalprice_positive', n, v_price FROM ord
        |  UNION ALL SELECT 'orders.orderstatus_domain', n, v_status FROM ord
        |  UNION ALL SELECT 'orders.orderdate_not_null', n, v_null FROM ord
        |  UNION ALL SELECT 'orders.orderkey_unique', n, v_uniq FROM ord
        |  UNION ALL SELECT 'orders.custkey_fk_customer',
        |    (SELECT n FROM ord), v FROM fk
        |)
        |SELECT "constraint", n_checked, n_violations,
        |  n_violations = 0 AS pass
        |FROM rep ORDER BY "constraint"""".stripMargin,
  )
}
