package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Matching}
import graft.sources.Tables
import graft.OracleHelpers._

/** Dedup family queries: exact/near-duplicate discovery (MinHash-LSH, SimHash, containment, dup-graph analytics).
  * Split from PipelineQueries (round 9) -- entries and oracles are moved
  * verbatim; PipelineQueries concatenates the families and asserts the
  * key sets stay disjoint and aligned.
  */
private[graft] object DedupQueries extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_dedup_exact"      -> ((s, d) => Dedup.exactDedup(Tables.documents(s, d))),
    "q26_ngram_jaccard"    -> ((s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d))),
    "q27_dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLshPairs(Tables.documents(s, d))),
    "q28_dedup_simhash"    -> ((s, d) => Dedup.simhashPairs(Tables.documents(s, d))),
    "q53_dedup_survivors" -> ((s, d) => Dedup.nearDupSurvivors(Tables.documents(s, d))),
    // incremental ingest dedup: new batch (doc_id < 100) vs indexed corpus
    "q74_incremental_neardup" -> ((s, d) => Dedup.incrementalNearDupPairs(Tables.documents(s, d))),
    // which sources duplicate each other: near-dup pairs per source pair
    "q83_dup_sources" -> ((s, d) => Dedup.dupSourceMatrix(Tables.documents(s, d))),
    // quality-aware dedup canonicalization: keep the best cluster member,
    // not the min-id one (rides the shared pair index)
    "q108_quality_canonical" -> ((s, d) => Dedup.qualityCanonical(Tables.documents(s, d))),
    // dedup tuning: pair/doc counts at each tau >= the banding design
    // point, from one pair-index build
    "q115_threshold_sweep" -> ((s, d) => Dedup.thresholdSweep(Tables.documents(s, d))),
    // dedup QA: near-dup cluster-size histogram off the shared pair index
    "q118_cluster_sizes" -> ((s, d) =>
      Dedup.clusterSizeDistribution(Tables.documents(s, d))),
    // containment refinement: per near-dup pair, containment of the
    // smaller shingle set + size ratio (quote/inclusion vs mutual dup)
    "q120_containment" -> ((s, d) => Dedup.containmentRefine(Tables.documents(s, d))),
    // fuzzy entity resolution over the part-name catalog: token-blocked
    // Levenshtein pairs with the row mass behind each name
    "q121_fuzzy_match" -> ((s, d) => Matching.fuzzyNameMatch(Tables.part(s, d))),
    // sparse lexical similarity: rare-term-blocked cosine over top-8
    // tf-idf vectors (the text-side complement of q48's embedding LSH)
    "q122_tfidf_pairs" -> ((s, d) => Matching.tfidfCosinePairs(Tables.documents(s, d))),
    // reciprocal-rank fusion of the BM25 and dense-cosine rankings
    "q126_hybrid_rrf" -> ((s, d) =>
      Matching.hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d))),
    // dedup QA: MinHash-vs-SimHash pair-set agreement classes
    "q133_method_agreement" -> ((s, d) => Dedup.methodAgreement(Tables.documents(s, d))),
    // near-dup graph shape: triangles vs wedges (cliques vs chains)
    "q137_dup_graph_shape" -> ((s, d) => Dedup.dupGraphShape(Tables.documents(s, d))),
    // one-document containment search: who contains >=50% of doc 0's
    // shingles (the on-demand provenance lookup)
    "q139_containment_search" -> ((s, d) =>
      Dedup.containmentSearch(Tables.documents(s, d))),
    // PageRank centrality over the verified near-dup graph (rides the
    // q27 pair index): integer micro-unit power iteration, d = 17/20
    "q151_neardup_pagerank" -> ((s, d) => Dedup.neardupPagerank(Tables.documents(s, d))),
    // canonicalization-aware exact dedup: raw vs normalized fingerprints
    // per source, with planted case/punct variants (see scaladoc)
    "q155_norm_dedup" -> ((s, d) => Dedup.normalizedDedup(Tables.documents(s, d))),
    // q151's rank consumed as the survivor policy: per-cluster keeper =
    // max rank, tie -> min id (rides the pair index + rank frame)
    "q162_rank_canonical" -> ((s, d) => Dedup.rankCanonical(Tables.documents(s, d))),
    // MMR diversified re-rank: greedy λ=7/10 selection from each query's
    // top-16 cosine pool — all float math stays in the codegen'd cosine
    // (q29 contract); the greedy is integer-only inside flatMapGroups
    "q166_mmr_rerank" -> ((s, d) => Matching.mmrRerank(Tables.embeddings(s, d))),
    // core numbers of the near-dup graph via 8 iterated-h-index rounds
    // (Lü et al. 2016 — converges to coreness; both engines compute the
    // same fixed truncation); rides the session pair index
    "q175_kcore" -> ((s, d) => Dedup.kcoreDecomposition(Tables.documents(s, d))),
    // asymmetric containment discovery (bottom-m one-sided sketch):
    // the quote/inclusion pairs symmetric MinHash banding cannot see;
    // oracle states the exact all-pairs form → the gate proves recall
    "q178_containment" -> ((s, d) => Dedup.containmentDiscover(Tables.documents(s, d))),
    // the same containment discovery on the HEAPS-LAW fixture: vocabulary
    // grows with corpus size (the raw corpus's ~2k-type vocabulary makes
    // q178 a degenerate near-all-pairs worst case), so this bench head
    // measures the prefix-filter PLAN at realistic posting selectivity
    "q302_containment_heaps" -> ((s, d) =>
      Dedup.containmentDiscover(Dedup.heapsContainmentCorpus(Tables.documents(s, d)))),
    // term-frequency-aware refinement of the verified near-dup pairs:
    // token-multiset weighted Jaccard (sum-min / sum-max) beside the
    // set-Jaccard score; rides the session pair index
    "q229_weighted_jaccard" -> ((s, d) =>
      Dedup.weightedJaccardRefine(Tables.documents(s, d))),
    // Fellegi-Sunter EM over blocked part pairs: unsupervised m/u
    // probabilities and log2 match weights per comparison field
    "q233_fs_linkage" -> ((s, d) =>
      Matching.fsLinkageWeights(Tables.part(s, d))),
    // apply the learned FS weights: score every blocked pair, emit
    // matches above 4 bits of evidence (learn -> score -> classify)
    "q239_fs_matches" -> ((s, d) =>
      Matching.fsLinkageMatches(Tables.part(s, d))),
    // blocking-quality report: pair completeness over planted twins +
    // reduction ratio of the (brand, size) blocking (the q226 recipe
    // applied to the linkage family's candidate generator)
    "q292_blocking_quality" -> ((s, d) =>
      Matching.blockingQuality(Tables.part(s, d))),
  )

  /** The q233 EM chain, unrolled round-for-round (the q143 oracle
    * pattern): micro-unit scalars carried through w0..w{rounds} CTEs,
    * E-step posteriors quantized via the SAME double expression order
    * as the engine, integer M-step with the [1, 999999] clamp.
    */
  private def fsEmSql(rounds: Int): String =
    fsEmPrefix(rounds) + "\n" + fsWeightsFinal(rounds)

  private def fsApplySql(rounds: Int, minBits: Double): String =
    fsEmPrefix(rounds) + "\n" + fsMatchesFinal(rounds, minBits)

  private def fsWeightsFinal(rounds: Int): String =
    s"""SELECT field, round(mm / 1e6, 6) AS m, round(uu / 1e6, 6) AS u,
       |  round(log2(CAST(mm AS DOUBLE) / uu), 4) AS w_agree,
       |  round(log2(CAST(1000000 - mm AS DOUBLE) / (1000000 - uu)), 4)
       |    AS w_disagree
       |FROM (
       |  SELECT 'type_eq' AS field, m1 AS mm, u1 AS uu FROM w$rounds
       |  UNION ALL SELECT 'price_band_eq', m2, u2 FROM w$rounds
       |  UNION ALL SELECT 'name_tok2', m3, u3 FROM w$rounds
       |  UNION ALL SELECT 'name_lev10', m4, u4 FROM w$rounds
       |)
       |ORDER BY field""".stripMargin

  /** q239's final: score every candidate with the fitted weights, fixed
    * field order, filter on the rounded bits.
    */
  private def fsMatchesFinal(rounds: Int, minBits: Double): String = {
    def term(k: Int): String =
      s"""(CASE WHEN c.g$k = 1 THEN log2(CAST(m$k AS DOUBLE) / u$k)
         |  ELSE log2(CAST(1000000 - m$k AS DOUBLE) / (1000000 - u$k)) END)"""
        .stripMargin
    s"""SELECT key_a, key_b, score_bits FROM (
       |  SELECT c.key_a, c.key_b,
       |    round(${(1 to 4).map(term).mkString("\n      + ")}, 4) AS score_bits
       |  FROM cand c, w$rounds
       |)
       |WHERE score_bits >= $minBits
       |ORDER BY key_a, key_b""".stripMargin
  }

  private def fsEmPrefix(rounds: Int): String = {
    def prod(pcol: String): String = (1 to 4).map(k =>
      s"(CASE WHEN g$k = 1 THEN $pcol$k / 1e6 ELSE 1 - $pcol$k / 1e6 END)")
      .mkString(" * ")
    def rnd(i: Int): String =
      s"""e$i AS MATERIALIZED (
         |  SELECT g1, g2, g3, g4,
         |    CAST(round(1e6 * (((p6 / 1e6) * ${prod("m")})
         |      / ((p6 / 1e6) * ${prod("m")} + (1 - p6 / 1e6) * ${prod("u")})))
         |      AS BIGINT) AS gm
         |  FROM cand, w${i - 1}
         |),
         |s$i AS (
         |  SELECT CAST(sum(gm) AS BIGINT) AS sg, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(1000000 - gm) AS BIGINT) AS sug,
         |${(1 to 4).map(k =>
            s"    CAST(sum(CASE WHEN g$k = 1 THEN gm ELSE 0 END) AS BIGINT) AS sm$k,\n" +
            s"    CAST(sum(CASE WHEN g$k = 1 THEN 1000000 - gm ELSE 0 END) AS BIGINT) AS su$k")
          .mkString(",\n")}
         |  FROM e$i
         |),
         |w$i AS (
         |  SELECT
         |${(1 to 4).map(k =>
            s"    least(greatest((CAST(1000000 AS HUGEINT) * sm$k + sg // 2) // sg, 1), 999999) AS m$k,\n" +
            s"    least(greatest((CAST(1000000 AS HUGEINT) * su$k + sug // 2) // sug, 1), 999999) AS u$k")
          .mkString(",\n")},
         |    least(greatest((sg + n // 2) // n, 1), 999999) AS p6
         |  FROM s$i
         |)""".stripMargin
    s"""WITH recs AS (
       |  SELECT p_partkey, p_name, p_brand, p_type, p_size,
       |    floor(p_retailprice / 100) AS pb,
       |    list_distinct(string_split(p_name, ' ')) AS toks
       |  FROM part
       |),
       |cand AS MATERIALIZED (
       |  SELECT
       |    a.p_partkey AS key_a, b.p_partkey AS key_b,
       |    CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS g1,
       |    CASE WHEN a.pb = b.pb THEN 1 ELSE 0 END AS g2,
       |    CASE WHEN len(list_intersect(a.toks, b.toks)) >= 2 THEN 1 ELSE 0 END AS g3,
       |    CASE WHEN levenshtein(a.p_name, b.p_name) <= 10 THEN 1 ELSE 0 END AS g4
       |  FROM recs a JOIN recs b ON a.p_brand = b.p_brand
       |    AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
       |),
       |w0 AS (SELECT CAST(100000 AS BIGINT) AS p6,
       |${(1 to 4).map(k =>
          s"  CAST(900000 AS BIGINT) AS m$k, CAST(100000 AS BIGINT) AS u$k")
        .mkString(",\n")}),
       |${(1 to rounds).map(rnd).mkString(",\n")}""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q25_dedup_exact" ->
      """WITH groups AS (
        |  SELECT md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp,
        |    min(doc_id) AS keeper_id, count(*) AS n_copies
        |  FROM documents GROUP BY 1
        |)
        |SELECT count(*) AS n_unique, CAST(sum(n_copies) AS BIGINT) AS n_total,
        | CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
        |FROM groups""".stripMargin,
    "q26_ngram_jaccard"     -> JaccardSql,
    "q27_dedup_minhash_lsh" -> JaccardSql,
    "q28_dedup_simhash"     -> SimhashSql,
    "q53_dedup_survivors" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT id1, id2 FROM (
         |$JaccardSql
         |  ) jt
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
    "q74_incremental_neardup" ->
      s"""WITH $GramsCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS new_id, b.doc_id AS old_id, count(*) AS i
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < 100 AND b.doc_id >= 100
         |  GROUP BY 1, 2
         |)
         |SELECT new_id, old_id, round(i * 1.0 / (s1.sz + s2.sz - i), 6) AS jaccard
         |FROM inter
         |JOIN sizes s1 ON new_id = s1.doc_id
         |JOIN sizes s2 ON old_id = s2.doc_id
         |WHERE round(i * 1.0 / (s1.sz + s2.sz - i), 6) >= 0.6
         |ORDER BY new_id, old_id""".stripMargin,
    "q83_dup_sources" ->
      s"""WITH pairs AS (
         |$JaccardSql
         |)
         |SELECT least(m1.source, m2.source) AS source_a,
         | greatest(m1.source, m2.source) AS source_b,
         | count(*) AS n_pairs
         |FROM pairs
         |JOIN documents m1 ON pairs.id1 = m1.doc_id
         |JOIN documents m2 ON pairs.id2 = m2.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q108_quality_canonical" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT id1, id2 FROM (
         |$JaccardSql
         |  ) jt
         |),
         |edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs
         |),
         |reach(node, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
         |),
         |m AS (SELECT node AS doc_id, min(label) AS cluster_rep FROM reach GROUP BY node),
         |q AS (SELECT doc_id, $QualityExprSql AS quality FROM documents),
         |best AS (
         |  SELECT cluster_rep, doc_id AS canonical_id, round(quality, 4) AS canonical_quality
         |  FROM (
         |    SELECT m.cluster_rep, m.doc_id, q.quality,
         |      row_number() OVER (PARTITION BY m.cluster_rep
         |                         ORDER BY q.quality DESC, m.doc_id) AS rn
         |    FROM m JOIN q USING (doc_id)
         |  ) WHERE rn = 1
         |)
         |SELECT m.doc_id, m.cluster_rep, b.canonical_id,
         | (m.doc_id = b.canonical_id) AS keeps, b.canonical_quality
         |FROM m JOIN best b USING (cluster_rep) ORDER BY m.doc_id""".stripMargin,
    "q115_threshold_sweep" ->
      s"""WITH jp AS (
         |  SELECT id1, id2, jaccard FROM (
         |$JaccardSql
         |  ) jt
         |),
         |th(threshold) AS (VALUES (CAST(0.6 AS DOUBLE)), (0.7), (0.8), (0.9)),
         |f AS (
         |  SELECT threshold, id1, id2 FROM jp CROSS JOIN th WHERE jaccard >= threshold
         |),
         |np AS (SELECT threshold, count(*) AS p FROM f GROUP BY threshold),
         |nd AS (
         |  SELECT threshold, count(DISTINCT d) AS dd FROM (
         |    SELECT threshold, id1 AS d FROM f
         |    UNION ALL SELECT threshold, id2 FROM f
         |  ) GROUP BY threshold
         |)
         |SELECT threshold, coalesce(p, 0) AS n_pairs, coalesce(dd, 0) AS n_docs
         |FROM th LEFT JOIN np USING (threshold) LEFT JOIN nd USING (threshold)
         |ORDER BY threshold""".stripMargin,
    "q118_cluster_sizes" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT id1, id2 FROM (
         |$JaccardSql
         |  ) jt
         |),
         |edges AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION ALL SELECT id2, id1 FROM pairs
         |),
         |reach(node, label) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
         |),
         |m AS (SELECT node, min(label) AS cluster_rep FROM reach GROUP BY node),
         |cs AS (SELECT cluster_rep, count(*) AS sz FROM m GROUP BY cluster_rep)
         |SELECT sz AS cluster_size, count(*) AS n_clusters, CAST(sum(sz) AS BIGINT) AS n_docs
         |FROM cs GROUP BY sz ORDER BY cluster_size""".stripMargin,
    "q120_containment" ->
      s"""WITH $GramsCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT id1, id2,
         | round(i * 1.0 / (s1.sz + s2.sz - i), 6) AS jaccard,
         | round(i * 1.0 / least(s1.sz, s2.sz), 6) AS containment,
         | round(least(s1.sz, s2.sz) * 1.0 / greatest(s1.sz, s2.sz), 6) AS size_ratio
         |FROM inter
         |JOIN sizes s1 ON id1 = s1.doc_id
         |JOIN sizes s2 ON id2 = s2.doc_id
         |WHERE round(i * 1.0 / (s1.sz + s2.sz - i), 6) >= 0.6
         |ORDER BY id1, id2""".stripMargin,
    "q121_fuzzy_match" ->
      // token blocking is lossless for the stated semantics (pairs must
      // share a token), so the oracle replicates block -> verify exactly
      """WITH names AS (SELECT p_name, count(*) AS n_parts FROM part GROUP BY 1),
        |toks AS (SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM names),
        |cand AS (
        |  SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_name < b.p_name
        |),
        |v AS (
        |  SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS INT) AS edit_dist
        |  FROM cand
        |)
        |SELECT name_a, name_b, edit_dist, na.n_parts AS parts_a, nb.n_parts AS parts_b
        |FROM v
        |JOIN names na ON na.p_name = name_a
        |JOIN names nb ON nb.p_name = name_b
        |WHERE edit_dist <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    "q122_tfidf_pairs" ->
      // integer micro-unit sums (the PSI trick) make dot/norm order-free;
      // association mirrors the Scala side exactly (w*w'*1e6)
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |  ) GROUP BY 1, 2
        |),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |w AS (
        |  SELECT doc_id, term, df, round(tf * ln(n_docs / df), 4) AS w,
        |    n_docs * 64 // 1000 AS df_cap
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |),
        |topw AS (
        |  SELECT doc_id, term, df, w, df_cap FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term) AS r
        |    FROM w
        |  ) WHERE r <= 8
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM topw a JOIN topw b ON a.term = b.term AND a.doc_id < b.doc_id
        |  WHERE a.df <= a.df_cap
        |),
        |nrm AS (
        |  SELECT doc_id, sum(CAST(round(w * w * 1e6) AS BIGINT)) AS nsq
        |  FROM topw GROUP BY 1
        |),
        |dots AS (
        |  SELECT id_a, id_b, sum(CAST(round(a.w * b.w * 1e6) AS BIGINT)) AS dot
        |  FROM cand
        |  JOIN topw a ON a.doc_id = id_a
        |  JOIN topw b ON b.doc_id = id_b AND b.term = a.term
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        | round((dot / 1e6) / (sqrt(na.nsq / 1e6) * sqrt(nb.nsq / 1e6)), 4) AS cos
        |FROM dots
        |JOIN nrm na ON na.doc_id = id_a
        |JOIN nrm nb ON nb.doc_id = id_b
        |WHERE round((dot / 1e6) / (sqrt(na.nsq / 1e6) * sqrt(nb.nsq / 1e6)), 4) >= 0.7
        |ORDER BY id_a, id_b""".stripMargin,
    "q126_hybrid_rrf" ->
      // q79's BM25 CTE + the q29-style dense ranking; RRF terms are
      // integer micro-units so the fused score is order-free
      s"""WITH dl AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents
         |),
         |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
         |  ) WHERE term IN ('table', 'data', 'row') GROUP BY 1, 2
         |),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT doc_id,
         |    round(sum(ln((n - df + 0.5) / (df + 0.5) + 1) * tf * (1.2 + 1) /
         |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         |  GROUP BY doc_id
         |),
         |lex AS (
         |  SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS r_lex
         |  FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20
         |),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |cos AS (
         |  SELECT vec_id, round(${cosSql("qv", "v")}, 6) AS cos
         |  FROM e CROSS JOIN q WHERE vec_id <> 0
         |),
         |vec AS (
         |  SELECT vec_id AS id,
         |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INT) AS r_vec
         |  FROM cos ORDER BY cos DESC, vec_id LIMIT 20
         |),
         |fused AS (
         |  SELECT coalesce(lex.id, vec.id) AS id, r_lex, r_vec,
         |    coalesce(CAST(round(1e6 / (r_lex + 60)) AS BIGINT), 0) +
         |    coalesce(CAST(round(1e6 / (r_vec + 60)) AS BIGINT), 0) AS rrf_micro
         |  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
         |)
         |SELECT id, r_lex, r_vec, rrf_micro FROM fused
         |ORDER BY rrf_micro DESC, id LIMIT 10""".stripMargin,
    "q133_method_agreement" ->
      // both pair sets are the established q27/q28 oracle bodies, nested
      // as CTE subqueries and full-outer classified
      s"""WITH mh AS (SELECT id1, id2 FROM ($JaccardSql)),
         |sh AS (SELECT id1, id2 FROM ($SimhashSql)),
         |j AS (
         |  SELECT CASE
         |    WHEN mh.id1 IS NOT NULL AND sh.id1 IS NOT NULL THEN 'both'
         |    WHEN mh.id1 IS NOT NULL THEN 'minhash_only'
         |    ELSE 'simhash_only' END AS agreement
         |  FROM mh FULL OUTER JOIN sh ON mh.id1 = sh.id1 AND mh.id2 = sh.id2
         |)
         |SELECT agreement, count(*) AS n_pairs FROM j
         |GROUP BY agreement ORDER BY agreement""".stripMargin,
    "q137_dup_graph_shape" ->
      // edges = the exact-Jaccard pair set (q27's oracle body); wedges
      // from degrees, triangles via the a<b<c oriented joins
      s"""WITH edges AS (SELECT id1, id2 FROM ($JaccardSql)),
         |deg AS (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT id1 AS node FROM edges UNION ALL SELECT id2 FROM edges
         |  ) GROUP BY 1
         |),
         |w AS (
         |  SELECT count(*) AS n_nodes,
         |    coalesce(CAST(sum(deg * (deg - 1) // 2) AS BIGINT), 0) AS n_wedges
         |  FROM deg
         |),
         |t AS (
         |  SELECT count(*) AS n_triangles
         |  FROM edges e1
         |  JOIN edges e2 ON e2.id1 = e1.id2
         |  JOIN edges e3 ON e3.id1 = e1.id1 AND e3.id2 = e2.id2
         |),
         |ne AS (SELECT count(*) AS n_edges FROM edges)
         |SELECT n_nodes, n_edges, n_wedges, n_triangles,
         | CASE WHEN n_wedges = 0 THEN 0.0
         |      ELSE round(3.0 * n_triangles / n_wedges, 6) END AS clustering
         |FROM ne CROSS JOIN w CROSS JOIN t""".stripMargin,
    "q139_containment_search" ->
      // grams are per-doc DISTINCT (GramsCte's list_distinct), so the
      // shared count is exact set intersection
      s"""WITH $GramsCte,
         |q AS (SELECT g FROM grams WHERE doc_id = 0),
         |qs AS (SELECT count(*) AS q_size FROM q),
         |shared AS (
         |  SELECT doc_id, count(*) AS n_shared
         |  FROM grams JOIN q USING (g)
         |  WHERE doc_id <> 0 GROUP BY doc_id
         |)
         |SELECT doc_id, n_shared, q_size, round(n_shared / q_size, 6) AS containment
         |FROM shared CROSS JOIN qs
         |WHERE round(n_shared / q_size, 6) >= 0.5
         |ORDER BY doc_id""".stripMargin,
    "q151_neardup_pagerank" -> {
      // edges = q27's exact pair set symmetrized; 4 power iterations
      // UNROLLED (MATERIALIZED per round), pure integer micro-units:
      // seed 1e6//N, base 0.15e6//N, contrib rank//deg, d = 17/20
      def iter(i: Int) =
        s"""pr$i AS MATERIALIZED (
           |  SELECT d.node, d.deg,
           |    CAST((150000 // nn.n) + (17 * s.s) // 20 AS BIGINT) AS rank_m
           |  FROM pdeg d
           |  JOIN (
           |    SELECT e.dst AS node, CAST(sum(r.rank_m // r.deg) AS BIGINT) AS s
           |    FROM pedges e JOIN pr${i - 1} r ON r.node = e.src GROUP BY 1
           |  ) s ON s.node = d.node
           |  CROSS JOIN nn
           |)""".stripMargin
      s"""WITH e0 AS MATERIALIZED (SELECT id1, id2 FROM ($JaccardSql)),
         |pedges AS (SELECT id1 AS src, id2 AS dst FROM e0
         |  UNION ALL SELECT id2, id1 FROM e0),
         |pdeg AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM pedges GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM pdeg),
         |pr0 AS (SELECT node, deg, 1000000 // nn.n AS rank_m FROM pdeg CROSS JOIN nn),
         |${(1 to 4).map(iter).mkString(",\n")}
         |SELECT node AS doc_id, deg, CAST(rank_m AS BIGINT) AS rank_micro FROM pr4
         |ORDER BY doc_id""".stripMargin
    },
    "q155_norm_dedup" ->
      // every 10th doc re-enters uppercased + punct-padded; raw md5 keeps
      // variants distinct, the normalized form must merge them
      """WITH v AS (
        |  SELECT doc_id + 10000000 AS doc_id,
        |    ('  ' || upper(text) || ' !!') AS text, source
        |  FROM documents WHERE doc_id % 10 = 0
        |),
        |a AS (SELECT doc_id, text, source FROM documents
        |      UNION ALL SELECT doc_id, text, source FROM v),
        |f AS (SELECT source, md5(text) AS raw_fp,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g'))) AS norm_fp
        |  FROM a)
        |SELECT source, count(*) AS n_docs,
        |  count(DISTINCT raw_fp) AS n_unique_raw,
        |  count(DISTINCT norm_fp) AS n_unique_norm,
        |  count(DISTINCT raw_fp) - count(DISTINCT norm_fp) AS n_merged_by_norm
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "q162_rank_canonical" -> {
      // q108's reach-CTE components + q151's unrolled integer rank chain;
      // keeper per cluster = (rank_m DESC, doc_id) row 1. Every sum-derived
      // column CAST to BIGINT (the --dtypes discipline).
      def iter(i: Int) =
        s"""pr$i AS MATERIALIZED (
           |  SELECT d.node, d.deg,
           |    CAST((150000 // nn.n) + (17 * s.s) // 20 AS BIGINT) AS rank_m
           |  FROM pdeg d
           |  JOIN (
           |    SELECT e.dst AS node, CAST(sum(r.rank_m // r.deg) AS BIGINT) AS s
           |    FROM pedges e JOIN pr${i - 1} r ON r.node = e.src GROUP BY 1
           |  ) s ON s.node = d.node
           |  CROSS JOIN nn
           |)""".stripMargin
      s"""WITH RECURSIVE e0 AS MATERIALIZED (SELECT id1, id2 FROM ($JaccardSql)),
         |pedges AS (SELECT id1 AS src, id2 AS dst FROM e0
         |  UNION ALL SELECT id2, id1 FROM e0),
         |pdeg AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM pedges GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM pdeg),
         |pr0 AS (SELECT node, deg, 1000000 // nn.n AS rank_m FROM pdeg CROSS JOIN nn),
         |${(1 to 4).map(iter).mkString(",\n")},
         |reach(node, label) AS (
         |  SELECT src, src FROM pedges
         |  UNION
         |  SELECT e.src, r.label FROM pedges e JOIN reach r ON e.dst = r.node
         |),
         |m AS (SELECT node AS doc_id, min(label) AS cluster_rep FROM reach GROUP BY node),
         |rk AS (SELECT node AS doc_id, CAST(rank_m AS BIGINT) AS rank_micro FROM pr4),
         |best AS (
         |  SELECT cluster_rep, doc_id AS canonical_id, rank_micro AS canonical_rank
         |  FROM (
         |    SELECT m.cluster_rep, m.doc_id, rk.rank_micro,
         |      row_number() OVER (PARTITION BY m.cluster_rep
         |                         ORDER BY rk.rank_micro DESC, m.doc_id) AS rn
         |    FROM m JOIN rk USING (doc_id)
         |  ) WHERE rn = 1
         |)
         |SELECT m.doc_id, m.cluster_rep, b.canonical_id,
         |  (m.doc_id = b.canonical_id) AS keeps, rk.rank_micro, b.canonical_rank
         |FROM m JOIN rk USING (doc_id) JOIN best b USING (cluster_rep)
         |ORDER BY m.doc_id""".stripMargin
    },
    "q166_mmr_rerank" -> {
      // greedy MMR UNROLLED: 8 selection steps as CTE pairs (candidate
      // maxsim vs the selected-so-far set, then the argmax pick) — the
      // same unrolled-iteration oracle pattern as Lloyd (q70) and
      // PageRank (q151); all scores in integer micro-units, objective
      // compared as 7·rel − 3·maxsim (λ = 7/10 multiplied through)
      def step(i: Int) =
        s"""cand$i AS (
           |  SELECT p.query_id, p.vec_id, p.rel_m, max(s.sim_m) AS maxsim_m
           |  FROM pool p
           |  JOIN msim s ON s.query_id = p.query_id AND s.id1 = p.vec_id
           |  JOIN sel${i - 1} t ON t.query_id = s.query_id AND t.vec_id = s.id2
           |  WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x
           |    WHERE x.query_id = p.query_id AND x.vec_id = p.vec_id)
           |  GROUP BY 1, 2, 3
           |),
           |pick$i AS (
           |  SELECT query_id, vec_id, rel_m, maxsim_m, $i AS pick FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY 7 * rel_m - 3 * maxsim_m DESC, vec_id) AS rn
           |    FROM cand$i) WHERE rn = 1
           |),
           |sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM pick$i)""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
         |rel AS (
         |  SELECT query_id, e.vec_id, e.v,
         |    CAST(round(round(${cosSql("qv", "e.v")}, 6) * 1e6) AS BIGINT) AS rel_m
         |  FROM e, q WHERE e.vec_id <> q.query_id
         |),
         |pool AS MATERIALIZED (
         |  SELECT query_id, vec_id, v, rel_m FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY rel_m DESC, vec_id) AS rn FROM rel) WHERE rn <= 16
         |),
         |msim AS MATERIALIZED (
         |  SELECT a.query_id, a.vec_id AS id1, b.vec_id AS id2,
         |    CAST(round(round(${cosSql("a.v", "b.v")}, 6) * 1e6) AS BIGINT) AS sim_m
         |  FROM pool a JOIN pool b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
         |),
         |sel1 AS (
         |  SELECT query_id, vec_id, rel_m, CAST(0 AS BIGINT) AS maxsim_m, 1 AS pick
         |  FROM (
         |    SELECT query_id, vec_id, rel_m, row_number() OVER (PARTITION BY query_id
         |      ORDER BY rel_m DESC, vec_id) AS rn FROM pool) WHERE rn = 1
         |),
         |${(2 to 8).map(step).mkString(",\n")}
         |SELECT query_id, CAST(pick AS INT) AS rnk, vec_id,
         |  rel_m AS rel_micro, maxsim_m AS maxsim_micro
         |FROM sel8 ORDER BY query_id, rnk""".stripMargin
    },
    "q175_kcore" -> {
      // q151's symmetrized pair edges; 8 h-index rounds UNROLLED —
      // each round: neighbor values ranked descending per node, new
      // value = max(least(value, rank)). row_number/least/max stay
      // BIGINT (no sum anywhere — dtype-audit clean by construction)
      def rnd(i: Int) =
        s"""h$i AS MATERIALIZED (
           |  SELECT dst AS node, max(least(c, rn)) AS c FROM (
           |    SELECT e.dst, h.c,
           |      row_number() OVER (PARTITION BY e.dst ORDER BY h.c DESC) AS rn
           |    FROM pedges e JOIN h${i - 1} h ON e.src = h.node
           |  ) GROUP BY dst
           |)""".stripMargin
      s"""WITH e0 AS MATERIALIZED (SELECT id1, id2 FROM ($JaccardSql)),
         |pedges AS (SELECT id1 AS src, id2 AS dst FROM e0
         |  UNION ALL SELECT id2, id1 FROM e0),
         |pdeg AS MATERIALIZED (
         |  SELECT src AS node, count(*) AS deg FROM pedges GROUP BY 1
         |),
         |h0 AS (SELECT node, deg AS c FROM pdeg),
         |${(1 to 8).map(rnd).mkString(",\n")}
         |SELECT d.node AS doc_id, d.deg, h8.c AS core
         |FROM pdeg d JOIN h8 ON h8.node = d.node
         |ORDER BY doc_id""".stripMargin
    },
    "q178_containment" ->
      // EXACT all-ordered-pairs containment on distinct char-5-grams —
      // deliberately ignorant of the engine's bottom-m blocking, so the
      // gate proves the sketch's recall (the q26/q27 convention)
      s"""WITH $GramsCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a AS contained_id, id_b AS container_id,
         |  round(i * 1.0 / sa.sz, 6) AS containment,
         |  round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
         |FROM inter
         |JOIN sizes sa ON id_a = sa.doc_id
         |JOIN sizes sb ON id_b = sb.doc_id
         |WHERE round(i * 1.0 / sa.sz, 6) >= 0.9
         |ORDER BY contained_id, container_id""".stripMargin,
    "q302_containment_heaps" ->
      // the q178 exact all-ordered-pairs gate over the SQL re-derivation
      // of the Heaps corpus (integer-only arithmetic renders the
      // identical text in both engines; planted pairs d -> d-3 for
      // d = 3 mod 10 have containment exactly 1.0 by prefix construction)
      """WITH hsrc AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 3 AND doc_id >= 3
        |      THEN doc_id - 3 ELSE doc_id END AS src,
        |    (doc_id % 10 = 3 AND doc_id >= 3) AS contained
        |  FROM documents
        |),
        |hlen AS (
        |  SELECT doc_id, src,
        |    CASE WHEN contained THEN (30 + src % 40) // 2 + 2
        |      ELSE 30 + src % 40 END AS len
        |  FROM hsrc
        |),
        |hcorp AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(0, len),
        |      j -> 'w' || substr(md5(CAST((src * 131 + j * 97) % (src + 50) AS VARCHAR)), 1, 6)), ' ') AS text
        |  FROM hlen
        |),
        |grams AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([substr(text, i, 5) for i in range(1, greatest(length(text)-4, 1)+1)])) AS g
        |  FROM hcorp
        |),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a AS contained_id, id_b AS container_id,
        |  round(i * 1.0 / sa.sz, 6) AS containment,
        |  round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON id_a = sa.doc_id
        |JOIN sizes sb ON id_b = sb.doc_id
        |WHERE round(i * 1.0 / sa.sz, 6) >= 0.9
        |ORDER BY contained_id, container_id""".stripMargin,
    "q229_weighted_jaccard" ->
      // pairs = the exact >= 0.6 shingle-Jaccard set (the q26/q27 oracle);
      // weighted score from token multisets: sum-min over shared tokens,
      // sum-max = tot_a + tot_b - sum-min
      s"""WITH $GramsCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |),
         |pairs AS (
         |  SELECT id1, id2, round(i * 1.0 / (s1.sz + s2.sz - i), 6) AS jaccard
         |  FROM inter
         |  JOIN sizes s1 ON id1 = s1.doc_id
         |  JOIN sizes s2 ON id2 = s2.doc_id
         |  WHERE round(i * 1.0 / (s1.sz + s2.sz - i), 6) >= 0.6
         |),
         |tf AS (
         |  SELECT doc_id, t AS tok, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
         |  ) GROUP BY 1, 2
         |),
         |tot AS (SELECT doc_id, sum(tf) AS tot FROM tf GROUP BY 1),
         |smin AS (
         |  SELECT p.id1, p.id2, sum(least(a.tf, b.tf)) AS smin
         |  FROM pairs p
         |  JOIN tf a ON a.doc_id = p.id1
         |  JOIN tf b ON b.doc_id = p.id2 AND b.tok = a.tok
         |  GROUP BY 1, 2
         |)
         |SELECT p.id1, p.id2, p.jaccard,
         |  round(coalesce(s.smin, 0) * 1.0
         |    / (t1.tot + t2.tot - coalesce(s.smin, 0)), 6) AS w_jaccard
         |FROM pairs p
         |LEFT JOIN smin s ON p.id1 = s.id1 AND p.id2 = s.id2
         |JOIN tot t1 ON p.id1 = t1.doc_id
         |JOIN tot t2 ON p.id2 = t2.doc_id
         |ORDER BY p.id1, p.id2""".stripMargin,
    "q233_fs_linkage" -> fsEmSql(3),
    "q239_fs_matches" -> fsApplySql(3, 4.0),
    "q292_blocking_quality" ->
      // planted twins (even keys in-block, odd shifted out), block-size
      // frame counts, recovery by the actual block-key comparison
      """WITH base AS (SELECT p_partkey, p_brand, p_size FROM part),
        |twins AS (
        |  SELECT p_partkey + 90000000 AS p_partkey, p_brand,
        |    CASE WHEN p_partkey % 2 = 0 THEN p_size ELSE p_size + 1 END AS p_size
        |  FROM base WHERE p_partkey < 50
        |),
        |alln AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
        |blocks AS (
        |  SELECT p_brand, p_size, CAST(count(*) AS BIGINT) AS m
        |  FROM alln GROUP BY 1, 2
        |),
        |agg AS (
        |  SELECT CAST(sum(m) AS BIGINT) AS n,
        |    CAST(sum(m * (m - 1) // 2) AS BIGINT) AS cand
        |  FROM blocks
        |),
        |rec AS (
        |  SELECT CAST(count(*) AS BIGINT) AS rec
        |  FROM base b JOIN twins t ON b.p_partkey = t.p_partkey - 90000000
        |  WHERE b.p_brand = t.p_brand AND b.p_size = t.p_size
        |),
        |npl AS (SELECT CAST(count(*) AS BIGINT) AS npl FROM twins)
        |SELECT n AS n_records, npl AS n_planted,
        |  rec AS n_recovered,
        |  round(CAST(rec AS DOUBLE) / npl, 4) AS pair_completeness,
        |  cand AS n_candidate_pairs,
        |  CAST(n * (n - 1) // 2 AS BIGINT) AS n_all_pairs,
        |  round(1.0 - CAST(cand AS DOUBLE) / (n * (n - 1) // 2), 6)
        |    AS reduction_ratio
        |FROM agg, rec, npl""".stripMargin,
  )
}
