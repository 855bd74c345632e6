package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Events, Inference}
import graft.sources.Tables

/** Inference family queries (round 11): hypothesis tests, multiple-testing
  * correction, rank statistics, causal panel, forecast baseline. Every
  * oracle mirrors the engine's double expressions operation-for-operation;
  * cross-row sums of doubles are quantized to integer micro-units on BOTH
  * sides so the statistic totals are order-free (the q90 discipline).
  */
private[graft] object InferenceQueries extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // two-way χ² independence over the full zero-filled source×lang grid
    "q245_chi2_independence" -> ((s, d) =>
      Inference.chi2Independence(Tables.documents(s, d))),
    // per-source two-proportion z panel + Benjamini–Hochberg step-up
    "q246_bh_fdr" -> ((s, d) => Inference.bhFdrPanel(Tables.documents(s, d))),
    // Mann–Whitney rank-sum with tie-corrected variance, src0 vs src1
    "q247_mann_whitney" -> ((s, d) =>
      Inference.mannWhitney(Tables.documents(s, d))),
    // Kruskal–Wallis rank ANOVA across all sources
    "q248_kruskal_wallis" -> ((s, d) =>
      Inference.kruskalWallis(Tables.documents(s, d))),
    // Spearman ρ (tie-averaged ranks) between n_chars and token count
    "q249_spearman" -> ((s, d) => Inference.spearmanRho(Tables.documents(s, d))),
    // difference-in-differences on per-user pre/post purchase change
    "q250_did" -> ((s, d) => Events.didEstimate(Tables.events(s, d))),
    // leave-one-source-out influence on corpus mean length / pass rate
    "q251_jackknife" -> ((s, d) =>
      Inference.jackknifeInfluence(Tables.documents(s, d))),
    // seasonal-naive lag-7 forecast scored on the trailing week
    "q252_seasonal_naive" -> ((s, d) =>
      Events.seasonalNaiveEval(Tables.events(s, d))),
    // two-sample KS: exact integer ECDF supremum, 8-term Kolmogorov tail
    "q253_ks_two_sample" -> ((s, d) =>
      Inference.ksTwoSample(Tables.documents(s, d))),
    // per-source KS drift panel vs pooled rest + BH step-up
    "q254_ks_panel" -> ((s, d) => Inference.ksPanel(Tables.documents(s, d))),
    // plug-in MI + marginal entropies + NMI: the effect-size companion
    // to q245's chi2 (micro-quantized cross-cell sums; observed cells
    // only — zero cells contribute exactly 0 to MI, unlike chi2)
    "q262_mutual_info" -> ((s, d) =>
      Inference.mutualInformation(Tables.documents(s, d))),
    // empirical-Bayes beta-binomial shrinkage of per-source pass rates:
    // the ensemble prices its own prior, small sources shrink to it
    "q278_eb_shrinkage" -> ((s, d) =>
      Inference.ebShrunkRates(Tables.documents(s, d))),
    // two-arm log-rank test on time-to-conversion: the censoring-aware
    // comparison of the q235 KM curves across the md5 arm coin
    "q281_logrank" -> ((s, d) => Events.logrankTest(Tables.events(s, d))),
    // revenue-per-click ratio metric with the delta-method
    // user-clustered se: denominator unit != randomization unit
    "q282_ratio_metric" -> ((s, d) =>
      Events.ratioMetricDelta(Tables.events(s, d))),
    // TOST equivalence: both one-sided nulls rejected before claiming
    // "the arms are the same to within ±5% of the pooled mean"
    "q283_tost_equivalence" -> ((s, d) =>
      Events.tostEquivalence(Tables.events(s, d))),
    // Cohen's kappa + McNemar between the char-length and token-count
    // quality screens: chance-corrected agreement + disagreement
    // directionality, the audit before swapping labeling functions
    "q284_labeler_agreement" -> ((s, d) =>
      Inference.labelerAgreement(Tables.documents(s, d))),
    // weight-of-evidence / information value of the " the "-count
    // feature for lang = 'en': the per-bucket directional feature
    // screen beside q262's MI
    "q287_woe_iv" -> ((s, d) => Inference.woeIvPanel(Tables.documents(s, d))),
    // sharp regression discontinuity at the n_chars >= 300 gate: local
    // linear fits both sides, the jump at the cutoff with its se
    "q291_rd_gate_audit" -> ((s, d) =>
      Inference.rdGateAudit(Tables.documents(s, d))),
    // Cochran-Armitage: does conversion rise MONOTONICALLY with
    // activity (scored log2 buckets) - the ordered-alternative test
    "q298_cochran_armitage" -> ((s, d) =>
      Events.cochranArmitage(Tables.events(s, d))))

  /** DuckDB text of [[Inference.upperTail]]: 1−Φ(x) for the SQL
    * expression `x` (must be non-negative), Abramowitz–Stegun 26.2.17
    * with identical constants and Horner order.
    */
  private def upperTailSql(x: String): String =
    s"""(exp(($x) * ($x) / (-2.0)) * 0.3989422804014327
       | * ((((( 1.330274429 * (1.0 / (1.0 + 0.2316419 * ($x)))
       |   + -1.821255978) * (1.0 / (1.0 + 0.2316419 * ($x)))
       |   + 1.781477937) * (1.0 / (1.0 + 0.2316419 * ($x)))
       |   + -0.356563782) * (1.0 / (1.0 + 0.2316419 * ($x)))
       |   + 0.319381530) * (1.0 / (1.0 + 0.2316419 * ($x)))))""".stripMargin

  /** DuckDB text of [[Inference.kolmogorovTail]] — shared with the
    * q259 changepoint oracle, so it lives in [[OracleHelpers]].
    */
  private def kolmTailSql(lam: String, l2: String): String =
    OracleHelpers.kolmTailSql(lam, l2)

  def oracleSql: Map[String, String] = Map(
    "q245_chi2_independence" ->
      // full grid: margins cross-joined, observed zero-filled; the χ²
      // total sums per-cell micro-unit longs (order-free)
      """WITH cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2
        |),
        |rws AS (SELECT source, CAST(count(*) AS BIGINT) AS rt FROM documents GROUP BY 1),
        |cls AS (SELECT lang, CAST(count(*) AS BIGINT) AS ct FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT source) AS BIGINT) AS nr,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS nc
        |  FROM documents
        |),
        |grid AS (
        |  SELECT r.source, c.lang, coalesce(x.o, 0) AS o, r.rt, c.ct,
        |    t.n, t.nr, t.nc
        |  FROM rws r CROSS JOIN cls c CROSS JOIN tot t
        |  LEFT JOIN cells x ON x.source = r.source AND x.lang = c.lang
        |),
        |g2 AS (
        |  SELECT source, lang, o, CAST(rt AS DOUBLE) * ct / n AS e, nr, nc
        |  FROM grid
        |),
        |g3 AS (
        |  SELECT source, lang, o, e, (o - e) * (o - e) / e AS contrib, nr, nc
        |  FROM g2
        |)
        |SELECT source, lang, o AS observed, round(e, 4) AS expected,
        |  round(contrib, 6) AS contrib,
        |  round(sum(CAST(round(contrib * 1000000.0, 0) AS BIGINT)) OVER ()
        |    / 1000000.0, 4) AS chi2,
        |  CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof
        |FROM g3 ORDER BY source, lang""".stripMargin,
    "q246_bh_fdr" ->
      // two-proportion pooled z per source vs rest; p via A&S 26.2.17;
      // BH step-up on (p rounded to 6, source) order
      s"""WITH per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS ns,
         |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS ks
         |  FROM documents GROUP BY 1
         |),
         |tot AS (
         |  SELECT CAST(sum(ns) AS BIGINT) AS n, CAST(sum(ks) AS BIGINT) AS k,
         |    CAST(count(*) AS BIGINT) AS m
         |  FROM per
         |),
         |base AS (
         |  SELECT source, ns, ks, n - ns AS nr, k - ks AS kr, n, k, m
         |  FROM per CROSS JOIN tot
         |),
         |zed AS (
         |  SELECT base.*,
         |    CASE WHEN nr > 0 AND CAST(k AS DOUBLE) / n > 0.0
         |        AND CAST(k AS DOUBLE) / n < 1.0
         |      THEN (CAST(ks AS DOUBLE) / ns - CAST(kr AS DOUBLE) / nr)
         |        / sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n)
         |          * (1.0 / ns + 1.0 / nr))
         |    END AS z_raw
         |  FROM base
         |),
         |pv AS (
         |  SELECT zed.*,
         |    CASE WHEN z_raw IS NOT NULL
         |      THEN round(least(2.0 * ${upperTailSql("abs(z_raw)")}, 1.0), 6)
         |      ELSE 1.0 END AS p_value
         |  FROM zed
         |),
         |rk AS (
         |  SELECT pv.*,
         |    CAST(row_number() OVER (ORDER BY p_value, source) AS INT) AS p_rank
         |  FROM pv
         |),
         |kst AS (
         |  SELECT rk.*,
         |    max(CASE WHEN p_value <= p_rank * 0.05 / m THEN p_rank END)
         |      OVER () AS kstar
         |  FROM rk
         |)
         |SELECT source, ns AS n_docs, ks AS n_pass,
         |  round(CAST(ks AS DOUBLE) / ns, 4) AS pass_rate,
         |  round(z_raw, 4) AS z_score, p_value, p_rank,
         |  p_rank <= coalesce(kstar, 0) AS significant
         |FROM kst ORDER BY source""".stripMargin,
    "q247_mann_whitney" ->
      // doubled tie-averaged ranks over the distinct-value frame;
      // U, tie-corrected variance, z — one final double expression
      """WITH d AS (
        |  SELECT n_chars AS v,
        |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia
        |  FROM documents WHERE source IN ('src0', 'src1')
        |),
        |bv AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS t, CAST(sum(ia) AS BIGINT) AS ta
        |  FROM d GROUP BY 1
        |),
        |rk AS (
        |  SELECT t, ta,
        |    2 * coalesce(CAST(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      + t + 1 AS r2
        |  FROM bv
        |),
        |agg AS (
        |  SELECT CAST(sum(ta) AS BIGINT) AS n1, CAST(sum(t - ta) AS BIGINT) AS n2,
        |    sum(CAST(ta * r2 AS HUGEINT)) AS r1x2,
        |    sum(CAST(t * t * t - t AS HUGEINT)) AS ties
        |  FROM rk
        |),
        |fin AS (
        |  SELECT n1, n2, n1 + n2 AS n,
        |    CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1) AS u1x2,
        |    CAST(n1 AS DOUBLE) * n2 / 12.0 * (CAST(n1 + n2 + 1 AS DOUBLE)
        |      - CAST(ties AS DOUBLE)
        |        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))) AS var_u,
        |    CAST(ties AS DOUBLE) AS tie_d
        |  FROM agg
        |)
        |SELECT n1, n2, round(u1x2 / 2.0, 1) AS u1,
        |  round(tie_d, 1) AS tie_mass,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND var_u > 0.0
        |    THEN round((u1x2 - CAST(n1 AS DOUBLE) * n2) / (2.0 * sqrt(var_u)), 4)
        |  END AS z_score
        |FROM fin""".stripMargin,
    "q248_kruskal_wallis" ->
      // per-source rank sums from the shared doubled-rank frame; each
      // source's H term micro-quantized before the cross-source sum
      """WITH bv AS (
        |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS t
        |  FROM documents GROUP BY 1
        |),
        |rk AS (
        |  SELECT v, t,
        |    2 * coalesce(CAST(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      + t + 1 AS r2
        |  FROM bv
        |),
        |bsv AS (
        |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2
        |),
        |per AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS nj,
        |    sum(CAST(c * r2 AS HUGEINT)) AS rjx2
        |  FROM bsv JOIN rk USING (v) GROUP BY 1
        |),
        |glb AS (
        |  SELECT CAST(sum(t) AS BIGINT) AS n,
        |    sum(CAST(t * t * t - t AS HUGEINT)) AS ties
        |  FROM rk
        |),
        |terms AS (
        |  SELECT source, nj, rjx2, n, ties,
        |    3.0 * CAST(rjx2 AS DOUBLE) * CAST(rjx2 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (n + 1) * nj) AS cj
        |  FROM per CROSS JOIN glb
        |),
        |hh AS (
        |  SELECT terms.*,
        |    sum(CAST(round(cj * 1000000.0, 0) AS BIGINT)) OVER () / 1000000.0
        |      - 3.0 * (n + 1) AS h_raw,
        |    1.0 - CAST(ties AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n * n - n) AS tie_corr,
        |    count(*) OVER () AS m
        |  FROM terms
        |)
        |SELECT source, nj AS n_docs,
        |  round(CAST(rjx2 AS DOUBLE) / (2.0 * nj), 4) AS mean_rank,
        |  round(h_raw, 4) AS h_stat,
        |  CASE WHEN tie_corr > 0.0 THEN round(h_raw / tie_corr, 4) END
        |    AS h_corrected,
        |  CAST(m - 1 AS BIGINT) AS dof
        |FROM hh ORDER BY source""".stripMargin,
    "q249_spearman" ->
      // tie-averaged doubled ranks on both axes, Pearson on ranks with
      // HUGEINT moments; token count = len of single-space split
      """WITH d AS (
        |  SELECT n_chars AS x,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS y
        |  FROM documents
        |),
        |bx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS t FROM d GROUP BY 1),
        |rx AS (
        |  SELECT v AS x,
        |    2 * coalesce(CAST(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      + t + 1 AS rx
        |  FROM bx
        |),
        |by_ AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS t FROM d GROUP BY 1),
        |ry AS (
        |  SELECT v AS y,
        |    2 * coalesce(CAST(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      + t + 1 AS ry
        |  FROM by_
        |),
        |j AS (
        |  SELECT rx.rx, ry.ry
        |  FROM d JOIN rx USING (x) JOIN ry USING (y)
        |),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(rx AS HUGEINT)) AS sx, sum(CAST(ry AS HUGEINT)) AS sy,
        |    sum(CAST(rx * rx AS HUGEINT)) AS sxx,
        |    sum(CAST(ry * ry AS HUGEINT)) AS syy,
        |    sum(CAST(rx * ry AS HUGEINT)) AS sxy
        |  FROM j
        |),
        |fin AS (
        |  SELECT n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cv,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
        |  FROM m
        |)
        |SELECT n,
        |  CASE WHEN vx > 0.0 AND vy > 0.0
        |    THEN round(cv / (sqrt(vx) * sqrt(vy)), 6) END AS rho_spearman
        |FROM fin""".stripMargin,
    "q250_did" ->
      // per-user pre/post micro-unit change over the distinct-user
      // universe (q232's frame), Welch z on the change between md5 arms
      s"""WITH mid AS (
         |  SELECT (min(d) + max(d) + 1) // 2 AS m
         |  FROM (SELECT epoch_ns(ts) // 86400000000000 AS d FROM events)
         |),
         |pu AS (
         |  SELECT user_id,
         |    CAST(sum(CASE WHEN epoch_ns(ts) // 86400000000000 < (SELECT m FROM mid)
         |      THEN CAST(round(value * 10000, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN epoch_ns(ts) // 86400000000000 >= (SELECT m FROM mid)
         |      THEN CAST(round(value * 10000, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1
         |),
         |um AS (
         |  SELECT ${OracleHelpers.posSql("md5(CAST(u.user_id AS VARCHAR))", 0, 2)} AS arm,
         |    coalesce(p.y, 0) - coalesce(p.x, 0) AS dd
         |  FROM (SELECT DISTINCT user_id FROM events) u
         |  LEFT JOIN pu p USING (user_id)
         |),
         |t AS (
         |  SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN arm = 0 THEN dd ELSE 0 END) AS BIGINT) AS s_a,
         |    sum(CAST(CASE WHEN arm = 0 THEN dd * dd ELSE 0 END AS HUGEINT)) AS ss_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN arm = 1 THEN dd ELSE 0 END) AS BIGINT) AS s_b,
         |    sum(CAST(CASE WHEN arm = 1 THEN dd * dd ELSE 0 END AS HUGEINT)) AS ss_b
         |  FROM um
         |),
         |fin AS (
         |  SELECT t.*,
         |    CAST(s_a AS DOUBLE) / n_a AS ma, CAST(s_b AS DOUBLE) / n_b AS mb,
         |    (CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
         |      / (n_a - 1) AS va,
         |    (CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b)
         |      / (n_b - 1) AS vb
         |  FROM t
         |)
         |SELECT n_a, n_b,
         |  CASE WHEN n_a > 0 THEN round(ma / 10000.0, 4) END AS mean_change_a,
         |  CASE WHEN n_b > 0 THEN round(mb / 10000.0, 4) END AS mean_change_b,
         |  CASE WHEN n_a > 0 AND n_b > 0
         |    THEN round((mb - ma) / 10000.0, 4) END AS did,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 AND (va + vb) > 0
         |    THEN round(sqrt(va / n_a + vb / n_b) / 10000.0, 4) END AS se,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 AND (va + vb) > 0
         |    THEN round((mb - ma) / sqrt(va / n_a + vb / n_b), 4) END AS z_score
         |FROM fin""".stripMargin,
    "q251_jackknife" ->
      // leave-one-out deltas closed-form from per-source sums
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS ns,
        |    CAST(sum(n_chars) AS BIGINT) AS ss,
        |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS ks
        |  FROM documents GROUP BY 1
        |),
        |tot AS (
        |  SELECT CAST(sum(ns) AS BIGINT) AS n, CAST(sum(ss) AS BIGINT) AS s,
        |    CAST(sum(ks) AS BIGINT) AS k
        |  FROM per
        |)
        |SELECT source, ns AS n_docs,
        |  round(CAST(s AS DOUBLE) / n - CAST(s - ss AS DOUBLE) / (n - ns), 6)
        |    AS infl_mean_chars,
        |  round(CAST(k AS DOUBLE) / n - CAST(k - ks AS DOUBLE) / (n - ns), 6)
        |    AS infl_pass_rate
        |FROM per CROSS JOIN tot ORDER BY source""".stripMargin,
    "q252_seasonal_naive" ->
      // calendar lag-7 self-join of the day frame; trailing week held out
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS d, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1
        |),
        |lagged AS (
        |  SELECT a.d, a.c, b.c AS f
        |  FROM daily a JOIN daily b ON a.d = b.d + 7
        |),
        |mx AS (SELECT max(d) AS m FROM daily),
        |scored AS (
        |  SELECT d, c, f, abs(c - f) AS ae,
        |    d > (SELECT m FROM mx) - 7 AS is_test
        |  FROM lagged
        |),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |    CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN NOT is_test THEN ae ELSE 0 END) AS BIGINT) AS sae_train,
        |    CAST(sum(CASE WHEN is_test THEN ae ELSE 0 END) AS BIGINT) AS sae_test,
        |    sum(CASE WHEN is_test THEN ae * 2.0 / (c + f) ELSE 0.0 END) AS ssmape
        |  FROM scored
        |)
        |SELECT n_train, n_test,
        |  CASE WHEN n_train > 0
        |    THEN round(CAST(sae_train AS DOUBLE) / n_train, 4) END AS mae_train,
        |  CASE WHEN n_test > 0
        |    THEN round(CAST(sae_test AS DOUBLE) / n_test, 4) END AS mae_test,
        |  CASE WHEN n_train > 0 AND n_test > 0 AND sae_train > 0
        |    THEN round((CAST(sae_test AS DOUBLE) / n_test)
        |      / (CAST(sae_train AS DOUBLE) / n_train), 6) END AS mase,
        |  CASE WHEN n_test > 0 THEN round(ssmape / n_test, 6) END AS smape
        |FROM agg""".stripMargin,
    "q253_ks_two_sample" ->
      // exact integer supremum |F1·n2 − F2·n1|; one double division; the
      // Kolmogorov tail as a literal 8-term chain
      s"""WITH d AS (
        |  SELECT n_chars AS v,
        |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS i1,
        |    CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS i2
        |  FROM documents WHERE source IN ('src0', 'src1')
        |),
        |bv AS (
        |  SELECT v, CAST(sum(i1) AS BIGINT) AS c1, CAST(sum(i2) AS BIGINT) AS c2
        |  FROM d GROUP BY 1
        |),
        |tot AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
        |  FROM bv
        |),
        |cum AS (
        |  SELECT
        |    CAST(sum(c1) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
        |    CAST(sum(c2) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f2,
        |    n1, n2
        |  FROM bv CROSS JOIN tot
        |),
        |dm AS (
        |  SELECT max(abs(f1 * n2 - f2 * n1)) AS d_num,
        |    max(n1) AS n1, max(n2) AS n2
        |  FROM cum
        |),
        |fin AS (
        |  SELECT n1, n2, d_num,
        |    CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) AS d_raw
        |  FROM dm
        |),
        |lm AS (
        |  SELECT fin.*,
        |    d_raw * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) AS lam
        |  FROM fin
        |),
        |l2t AS (SELECT lm.*, lam * lam AS l2 FROM lm)
        |SELECT n1, n2, d_num, round(d_raw, 6) AS d_stat,
        |  CASE WHEN n1 > 0 AND n2 > 0 THEN
        |    round(${kolmTailSql("lam", "l2")}, 6)
        |  END AS p_value
        |FROM l2t""".stripMargin,
    "q254_ks_panel" ->
      // q253 across all sources vs pooled rest over the FULL
      // source x value grid; BH step-up as q246
      s"""WITH bsv AS (
         |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
         |  FROM documents GROUP BY 1, 2
         |),
         |bv AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM bsv GROUP BY 1),
         |per AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM bsv GROUP BY 1),
         |tot AS (SELECT CAST(sum(t) AS BIGINT) AS n FROM bv),
         |grid AS (
         |  SELECT p.source, b.v, p.ns, b.t, coalesce(x.c, 0) AS c
         |  FROM per p CROSS JOIN bv b
         |  LEFT JOIN bsv x ON x.source = p.source AND x.v = b.v
         |),
         |cum AS (
         |  SELECT source, ns, tt.n,
         |    CAST(sum(c) OVER (PARTITION BY source ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fs,
         |    CAST(sum(grid.t) OVER (PARTITION BY source ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fa
         |  FROM grid CROSS JOIN tot tt
         |),
         |dm AS (
         |  SELECT source, max(abs(fs * (n - ns) - (fa - fs) * ns)) AS d_num,
         |    max(ns) AS ns, max(n) AS n
         |  FROM cum GROUP BY 1
         |),
         |fin AS (
         |  SELECT source, ns, n, d_num,
         |    CASE WHEN ns > 0 AND n - ns > 0
         |      THEN CAST(d_num AS DOUBLE) / (CAST(ns AS DOUBLE) * (n - ns))
         |      ELSE 0.0 END AS d_raw
         |  FROM dm
         |),
         |lm AS (
         |  SELECT fin.*,
         |    d_raw * sqrt(CAST(ns AS DOUBLE) * (n - ns) / n) AS lam
         |  FROM fin
         |),
         |pv AS (
         |  SELECT lm.*,
         |    CASE WHEN ns > 0 AND n - ns > 0
         |      THEN round(${kolmTailSql("lam", "lam * lam")}, 6)
         |      ELSE 1.0 END AS p_value,
         |    count(*) OVER () AS m
         |  FROM lm
         |),
         |rk AS (
         |  SELECT pv.*,
         |    CAST(row_number() OVER (ORDER BY p_value, source) AS INT) AS p_rank
         |  FROM pv
         |),
         |kst AS (
         |  SELECT rk.*,
         |    max(CASE WHEN p_value <= p_rank * 0.05 / m THEN p_rank END)
         |      OVER () AS kstar
         |  FROM rk
         |)
         |SELECT source, ns AS n_docs, d_num, round(d_raw, 6) AS d_stat,
         |  p_value, p_rank,
         |  p_rank <= coalesce(kstar, 0) AS significant
         |FROM kst ORDER BY source""".stripMargin,
    "q262_mutual_info" ->
      // per-cell MI terms and per-margin entropy terms micro-quantized
      // to longs before their cross-cell sums (order-free); log2 is the
      // only libm call, identical expression text both engines
      """WITH cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2
        |),
        |rws AS (SELECT source, CAST(count(*) AS BIGINT) AS rt FROM documents GROUP BY 1),
        |cls AS (SELECT lang, CAST(count(*) AS BIGINT) AS ct FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |mi AS (
        |  SELECT sum(CAST(round(CAST(o AS DOUBLE) / n
        |      * log2(CAST(o AS DOUBLE) * n / (CAST(rt AS DOUBLE) * ct))
        |      * 1000000.0, 0) AS BIGINT)) AS mi6
        |  FROM cells JOIN rws USING (source) JOIN cls USING (lang)
        |  CROSS JOIN tot
        |),
        |hs AS (
        |  SELECT sum(CAST(round(-(CAST(rt AS DOUBLE) / n
        |      * log2(CAST(rt AS DOUBLE) / n)) * 1000000.0, 0) AS BIGINT)) AS h6_rt
        |  FROM rws CROSS JOIN tot
        |),
        |hl AS (
        |  SELECT sum(CAST(round(-(CAST(ct AS DOUBLE) / n
        |      * log2(CAST(ct AS DOUBLE) / n)) * 1000000.0, 0) AS BIGINT)) AS h6_ct
        |  FROM cls CROSS JOIN tot
        |)
        |SELECT n, round(mi6 / 1000000.0, 6) AS mi_bits,
        |  round(h6_rt / 1000000.0, 6) AS h_source,
        |  round(h6_ct / 1000000.0, 6) AS h_lang,
        |  CASE WHEN h6_rt > 0 AND h6_ct > 0 THEN
        |    round(mi6 / 1000000.0
        |      / sqrt((h6_rt / 1000000.0) * (h6_ct / 1000000.0)), 6)
        |  END AS nmi
        |FROM mi CROSS JOIN hs CROSS JOIN hl CROSS JOIN tot""".stripMargin,
    "q278_eb_shrinkage" ->
      // micro-quantized ensemble moments, moment-matched Beta prior,
      // posterior means; stated degenerate conventions mirrored
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS ns,
        |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS ks
        |  FROM documents GROUP BY 1
        |),
        |pr AS (
        |  SELECT per.*,
        |    CAST(round(CAST(ks AS DOUBLE) / ns * 1000000.0, 0) AS BIGINT) AS r6
        |  FROM per
        |),
        |ens AS (
        |  SELECT CAST(count(*) AS BIGINT) AS j, CAST(sum(r6) AS BIGINT) AS sr,
        |    sum(CAST(r6 * r6 AS HUGEINT)) AS srr
        |  FROM pr
        |),
        |base AS (
        |  SELECT pr.*, j,
        |    CAST(sr AS DOUBLE) / CAST(j AS DOUBLE) / 1000000.0 AS m_ens,
        |    CASE WHEN j > 1 THEN
        |      (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / CAST(j AS DOUBLE))
        |        / (j - 1) / 1.0e12
        |    END AS var_ens
        |  FROM pr CROSS JOIN ens
        |),
        |b2 AS (
        |  SELECT base.*,
        |    CASE WHEN var_ens IS NOT NULL AND var_ens > 0.0
        |      THEN m_ens * (1.0 - m_ens) / var_ens - 1.0 END AS m_str
        |  FROM base
        |)
        |SELECT source, ns AS n_docs, ks AS n_pass,
        |  round(CAST(ks AS DOUBLE) / ns, 6) AS raw_rate,
        |  round(CASE WHEN m_str IS NULL THEN m_ens
        |    WHEN m_str <= 0.0 THEN CAST(ks AS DOUBLE) / ns
        |    ELSE (ks + m_ens * m_str) / (ns + m_str) END, 6) AS shrunk_rate,
        |  round(m_ens, 6) AS pooled_rate,
        |  round(coalesce(m_str, 0.0), 4) AS prior_strength
        |FROM b2 ORDER BY source""".stripMargin,
    "q281_logrank" ->
      // q235's per-user frame with the md5 arm; per-time hypergeometric
      // e/v terms micro-quantized before the cross-time sum; one
      // boundary division + sqrt renders z; A&S two-sided tail
      s"""WITH su AS (
         |  SELECT user_id, min(epoch_ns(ts)) AS s_ts FROM events
         |  WHERE event_type = 'signup' GROUP BY 1
         |),
         |fp AS (
         |  SELECT e.user_id, min(epoch_ns(e.ts)) AS p_ts
         |  FROM events e JOIN su USING (user_id)
         |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > su.s_ts
         |  GROUP BY 1
         |),
         |mx AS (SELECT max(epoch_ns(ts)) AS mx FROM events),
         |pu AS (
         |  SELECT ${OracleHelpers.posSql("md5(CAST(su.user_id AS VARCHAR))", 0, 2)} AS arm,
         |    CASE WHEN fp.p_ts IS NOT NULL
         |      THEN (fp.p_ts - su.s_ts) // 86400000000000
         |      ELSE (mx.mx - su.s_ts) // 86400000000000 END AS t,
         |    CASE WHEN fp.p_ts IS NOT NULL THEN 1 ELSE 0 END AS churned
         |  FROM su LEFT JOIN fp USING (user_id), mx
         |),
         |bt AS (
         |  SELECT t, CAST(count(*) AS BIGINT) AS n_t,
         |    CAST(sum(churned) AS BIGINT) AS d,
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ta,
         |    CAST(sum(CASE WHEN arm = 0 THEN churned ELSE 0 END) AS BIGINT) AS d_a
         |  FROM pu GROUP BY 1
         |),
         |tot AS (
         |  SELECT CAST(sum(n_t) AS BIGINT) AS tot,
         |    CAST(sum(n_ta) AS BIGINT) AS tot_a
         |  FROM bt
         |),
         |tr AS (
         |  SELECT bt.*, tot.tot, tot.tot_a,
         |    tot.tot - coalesce(CAST(sum(n_t) OVER wp AS BIGINT), 0) AS r,
         |    tot.tot_a - coalesce(CAST(sum(n_ta) OVER wp AS BIGINT), 0) AS r_a
         |  FROM bt, tot
         |  WINDOW wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |),
         |t2 AS (
         |  SELECT tr.*,
         |    CASE WHEN d >= 1
         |      THEN CAST(round(CAST(d AS DOUBLE) * r_a / r * 1e6) AS BIGINT)
         |      ELSE 0 END AS e6,
         |    CASE WHEN d >= 1 AND r >= 2
         |      THEN CAST(round(CAST(d AS DOUBLE) * (r - d) * r_a * (r - r_a)
         |        / (CAST(r AS DOUBLE) * r * (r - 1)) * 1e6) AS BIGINT)
         |      ELSE 0 END AS v6
         |  FROM tr
         |),
         |m AS (
         |  SELECT CAST(sum(d_a) AS BIGINT) AS o_a, CAST(sum(e6) AS BIGINT) AS se6,
         |    CAST(sum(v6) AS BIGINT) AS sv6, CAST(max(tot_a) AS BIGINT) AS n_a,
         |    CAST(max(tot - tot_a) AS BIGINT) AS n_b
         |  FROM t2
         |)
         |SELECT n_a, n_b, o_a AS observed_a,
         |  round(se6 / 1e6, 4) AS expected_a,
         |  round(sv6 / 1e6, 4) AS variance,
         |  CASE WHEN sv6 > 0
         |    THEN round((o_a - se6 / 1e6) / sqrt(sv6 / 1e6), 4) END AS z_logrank,
         |  CASE WHEN sv6 > 0
         |    THEN round(((o_a - se6 / 1e6) / sqrt(sv6 / 1e6))
         |      * ((o_a - se6 / 1e6) / sqrt(sv6 / 1e6)), 4) END AS chi2,
         |  CASE WHEN sv6 > 0
         |    THEN round(least(2.0 * ${upperTailSql("abs((o_a - se6 / 1e6) / sqrt(sv6 / 1e6))")}, 1.0), 6)
         |  END AS p_value
         |FROM m""".stripMargin,
    "q282_ratio_metric" -> {
      // per-arm delta-method variance of the ratio of per-user sums;
      // exact HUGEINT second moments, finisher mirrored term-for-term
      def svS(s12: String, s1: String, s2: String, n: String) =
        s"(CAST($s12 AS DOUBLE) - CAST($s1 AS DOUBLE) * CAST($s2 AS DOUBLE) / CAST($n AS DOUBLE)) / ($n - 1)"
      def varS(a: String) = {
        val r = s"(CAST(sy_$a AS DOUBLE) / CAST(sx_$a AS DOUBLE))"
        val xbar = s"(CAST(sx_$a AS DOUBLE) / CAST(n_$a AS DOUBLE))"
        s"""((${svS(s"syy_$a", s"sy_$a", s"sy_$a", s"n_$a")}
           |  - 2.0 * $r * ${svS(s"sxy_$a", s"sx_$a", s"sy_$a", s"n_$a")}
           |  + $r * $r * ${svS(s"sxx_$a", s"sx_$a", s"sx_$a", s"n_$a")})
           | / (CAST(n_$a AS DOUBLE) * $xbar * $xbar))""".stripMargin
      }
      val rA = "(CAST(sy_a AS DOUBLE) / CAST(sx_a AS DOUBLE))"
      val rB = "(CAST(sy_b AS DOUBLE) / CAST(sx_b AS DOUBLE))"
      val zS = s"(($rB - $rA) / sqrt(va + vb))"
      s"""WITH pu AS (
         |  SELECT user_id,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(round(value * 10000, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x
         |  FROM events GROUP BY 1
         |),
         |um AS (
         |  SELECT ${OracleHelpers.posSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} AS arm, y, x
         |  FROM pu
         |),
         |m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         |    CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         |    sum(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy_a,
         |    sum(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_a,
         |    sum(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b,
         |    CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         |    sum(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy_b,
         |    sum(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS sxx_b,
         |    sum(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * y ELSE 0 END) AS sxy_b
         |  FROM um
         |),
         |v AS (
         |  SELECT m.*, ${varS("a")} AS va, ${varS("b")} AS vb,
         |    (n_a >= 2 AND n_b >= 2 AND sx_a > 0 AND sx_b > 0) AS ok
         |  FROM m
         |)
         |SELECT n_a, n_b,
         |  CASE WHEN sx_a > 0 THEN round($rA / 1e4, 6) END AS ratio_a,
         |  CASE WHEN sx_b > 0 THEN round($rB / 1e4, 6) END AS ratio_b,
         |  CASE WHEN ok THEN round(($rB - $rA) / 1e4, 6) END AS diff,
         |  CASE WHEN ok AND (va + vb) > 0.0
         |    THEN round(sqrt(va + vb) / 1e4, 6) END AS se,
         |  CASE WHEN ok AND (va + vb) > 0.0 THEN round($zS, 4) END AS z_score,
         |  CASE WHEN ok AND (va + vb) > 0.0
         |    THEN round(least(2.0 * ${upperTailSql(s"abs($zS)")}, 1.0), 6)
         |  END AS p_value
         |FROM v""".stripMargin
    },
    "q283_tost_equivalence" -> {
      // the q237 arm-moment CTE; signed tail dispatches on sign around
      // the A&S x >= 0 kernel; p_tost = max of the two one-sided p's
      def tailS(x: String): String =
        s"(CASE WHEN ($x) >= 0.0 THEN ${upperTailSql(x)} ELSE 1.0 - ${upperTailSql(s"-($x)")} END)"
      val diffS = "(CAST(s1_b AS DOUBLE) / n_b - CAST(s1_a AS DOUBLE) / n_a)"
      val deltaS = "(0.05 * (CAST(s1_a + s1_b AS DOUBLE) / (n_a + n_b)))"
      val zLS = s"(($diffS + $deltaS) / se)"
      val zUS = s"(($deltaS - $diffS) / se)"
      val pS = s"greatest(${tailS(zLS)}, ${tailS(zUS)})"
      s"""WITH f AS (
         |  SELECT ${OracleHelpers.posSql("md5(CAST(user_id AS VARCHAR))", 0, 2)} AS arm,
         |    CAST(round(value * 10000, 0) AS BIGINT) AS vm
         |  FROM events WHERE event_type = 'purchase'
         |),
         |t AS (
         |  SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN arm = 0 THEN vm ELSE 0 END) AS BIGINT) AS s1_a,
         |    CAST(sum(CASE WHEN arm = 0 THEN vm * vm ELSE 0 END) AS BIGINT) AS s2_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN arm = 1 THEN vm ELSE 0 END) AS BIGINT) AS s1_b,
         |    CAST(sum(CASE WHEN arm = 1 THEN vm * vm ELSE 0 END) AS BIGINT) AS s2_b
         |  FROM f
         |),
         |m AS (
         |  SELECT t.*,
         |    sqrt((CAST(s2_a AS DOUBLE) - CAST(s1_a AS DOUBLE) * s1_a / n_a)
         |        / (n_a - 1) / n_a
         |      + (CAST(s2_b AS DOUBLE) - CAST(s1_b AS DOUBLE) * s1_b / n_b)
         |        / (n_b - 1) / n_b) AS se
         |  FROM t
         |)
         |SELECT n_a, n_b,
         |  CASE WHEN n_a >= 1 THEN round(CAST(s1_a AS DOUBLE) / n_a / 1e4, 4) END AS mean_a,
         |  CASE WHEN n_b >= 1 THEN round(CAST(s1_b AS DOUBLE) / n_b / 1e4, 4) END AS mean_b,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 THEN round($diffS / 1e4, 4) END AS diff,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 THEN round($deltaS / 1e4, 4) END AS margin,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se > 0.0
         |    THEN round(se / 1e4, 4) END AS se,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se > 0.0
         |    THEN round($zLS, 4) END AS z_lower,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se > 0.0
         |    THEN round($zUS, 4) END AS z_upper,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se > 0.0
         |    THEN round($pS, 6) END AS p_tost,
         |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se > 0.0
         |    THEN $pS < 0.05 END AS equivalent
         |FROM m""".stripMargin
    },
    "q284_labeler_agreement" -> {
      // exact confusion cells from one scan; kappa and the continuity-
      // corrected McNemar chi2 mirrored shape-for-shape
      val poS = "(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE))"
      val pAS = "(CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))"
      val pBS = "(CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))"
      val peS = s"($pAS * $pBS + (1.0 - $pAS) * (1.0 - $pBS))"
      val chiS = s"""((abs(CAST(n10 - n01 AS DOUBLE)) - 1.0)
                    | * (abs(CAST(n10 - n01 AS DOUBLE)) - 1.0)
                    | / CAST(n10 + n01 AS DOUBLE))""".stripMargin
      s"""WITH lab AS (
         |  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
         |    CASE WHEN len(string_split(text, ' ')) >= 60 THEN 1 ELSE 0 END AS b
         |  FROM documents
         |),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(a * b) AS BIGINT) AS n11,
         |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
         |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
         |  FROM lab
         |)
         |SELECT n, n11 AS n_both, n10 AS n_a_only, n01 AS n_b_only,
         |  n00 AS n_neither,
         |  round($pAS, 6) AS p_a, round($pBS, 6) AS p_b,
         |  round($poS, 6) AS p_observed, round($peS, 6) AS p_chance,
         |  CASE WHEN $peS < 1.0
         |    THEN round(($poS - $peS) / (1.0 - $peS), 6) END AS kappa,
         |  CASE WHEN n10 + n01 > 0 THEN round($chiS, 4) END AS mcnemar_chi2,
         |  CASE WHEN n10 + n01 > 0
         |    THEN round(least(2.0 * ${upperTailSql(s"sqrt($chiS)")}, 1.0), 6)
         |  END AS p_value
         |FROM m""".stripMargin
    },
    "q291_rd_gate_audit" -> {
      // per-side exact OLS moments; intercept/slope/variance finisher
      // mirrored term-for-term; the jump and its se at the cutoff
      def cD(n: String, s: String) = s"CAST(${n}_$s AS DOUBLE)"
      def detS(s: String) =
        s"(${cD("n", s)} * ${cD("suu", s)} - ${cD("su", s)} * ${cD("su", s)})"
      def aS(s: String) =
        s"((${cD("sy", s)} * ${cD("suu", s)} - ${cD("su", s)} * ${cD("suy", s)}) / ${detS(s)})"
      def bS(s: String) =
        s"((${cD("n", s)} * ${cD("suy", s)} - ${cD("su", s)} * ${cD("sy", s)}) / ${detS(s)})"
      def vaS(s: String) =
        s"""((${cD("syy", s)} - ${aS(s)} * ${cD("sy", s)} - ${bS(s)} * ${cD("suy", s)})
           | / (${cD("n", s)} - 2.0) * ${cD("suu", s)} / ${detS(s)})""".stripMargin
      val tauS = s"(${aS("r")} - ${aS("l")})"
      val seS = s"sqrt(${vaS("l")} + ${vaS("r")})"
      val okS = s"(n_l >= 3 AND n_r >= 3 AND ${detS("l")} > 0.0 AND ${detS("r")} > 0.0)"
      s"""WITH base AS (
         |  SELECT n_chars - 300 AS u,
         |    CAST(round(CAST(${OracleHelpers.Stopwords} AS DOUBLE)
         |      / len(string_split(text, ' ')) * 1e6) AS BIGINT) AS y6,
         |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS side
         |  FROM documents
         |  WHERE n_chars >= 150 AND n_chars < 450
         |    AND len(string_split(text, ' ')) >= 1
         |),
         |m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
         |    CAST(sum(CASE WHEN side = 0 THEN u ELSE 0 END) AS BIGINT) AS su_l,
         |    sum(CAST(CASE WHEN side = 0 THEN u * u ELSE 0 END AS HUGEINT)) AS suu_l,
         |    CAST(sum(CASE WHEN side = 0 THEN y6 ELSE 0 END) AS BIGINT) AS sy_l,
         |    sum(CAST(CASE WHEN side = 0 THEN u * y6 ELSE 0 END AS HUGEINT)) AS suy_l,
         |    sum(CAST(CASE WHEN side = 0 THEN y6 * y6 ELSE 0 END AS HUGEINT)) AS syy_l,
         |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
         |    CAST(sum(CASE WHEN side = 1 THEN u ELSE 0 END) AS BIGINT) AS su_r,
         |    sum(CAST(CASE WHEN side = 1 THEN u * u ELSE 0 END AS HUGEINT)) AS suu_r,
         |    CAST(sum(CASE WHEN side = 1 THEN y6 ELSE 0 END) AS BIGINT) AS sy_r,
         |    sum(CAST(CASE WHEN side = 1 THEN u * y6 ELSE 0 END AS HUGEINT)) AS suy_r,
         |    sum(CAST(CASE WHEN side = 1 THEN y6 * y6 ELSE 0 END AS HUGEINT)) AS syy_r
         |  FROM base
         |)
         |SELECT n_l AS n_left, n_r AS n_right,
         |  CASE WHEN $okS THEN round(${aS("l")} / 1e6, 6) END AS y_at_cut_left,
         |  CASE WHEN $okS THEN round(${aS("r")} / 1e6, 6) END AS y_at_cut_right,
         |  CASE WHEN $okS THEN round(${bS("l")} / 1e6, 8) END AS slope_left,
         |  CASE WHEN $okS THEN round(${bS("r")} / 1e6, 8) END AS slope_right,
         |  CASE WHEN $okS THEN round($tauS / 1e6, 6) END AS tau,
         |  CASE WHEN $okS AND $seS > 0.0 THEN round($seS / 1e6, 6) END AS se,
         |  CASE WHEN $okS AND $seS > 0.0 THEN round($tauS / $seS, 4) END AS z_score,
         |  CASE WHEN $okS AND $seS > 0.0
         |    THEN round(least(2.0 * ${upperTailSql(s"abs($tauS / $seS)")}, 1.0), 6)
         |  END AS p_value
         |FROM m""".stripMargin
    },
    "q298_cochran_armitage" -> {
      // exact bucket-score moments; mirrored T/V finisher; A&S tail
      val pb = "(CAST(a AS DOUBLE) / CAST(n AS DOUBLE))"
      val tS = s"(CAST(swa AS DOUBLE) - CAST(swn AS DOUBLE) * $pb)"
      val vS = s"""($pb * (1.0 - $pb)
                  | * (CAST(sw2n AS DOUBLE) - CAST(swn AS DOUBLE) * swn
                  |   / CAST(n AS DOUBLE)))""".stripMargin
      s"""WITH pu AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS c,
         |    CASE WHEN CAST(sum(CASE WHEN event_type = 'purchase'
         |        THEN 1 ELSE 0 END) AS BIGINT) * 5 > count(*)
         |      THEN 1 ELSE 0 END AS y
         |  FROM events GROUP BY 1
         |),
         |bb AS (
         |  SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS w,
         |    CAST(count(*) AS BIGINT) AS nb, CAST(sum(y) AS BIGINT) AS ab
         |  FROM pu GROUP BY 1
         |),
         |m AS (
         |  SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(ab) AS BIGINT) AS a,
         |    CAST(sum(w * nb) AS BIGINT) AS swn,
         |    CAST(sum(w * w * nb) AS BIGINT) AS sw2n,
         |    CAST(sum(w * ab) AS BIGINT) AS swa,
         |    CAST(count(*) AS BIGINT) AS k
         |  FROM bb
         |)
         |SELECT n AS n_users, a AS n_converted, k AS n_buckets,
         |  round($tS, 4) AS t_stat,
         |  CASE WHEN $vS > 0.0 THEN round($tS / sqrt($vS), 4) END AS z_trend,
         |  CASE WHEN $vS > 0.0
         |    THEN round(least(2.0 * ${upperTailSql(s"abs($tS / sqrt($vS))")}, 1.0), 6)
         |  END AS p_value
         |FROM m""".stripMargin
    },
    "q287_woe_iv" -> {
      // Laplace-adjusted class proportions per bucket; WOE and IV terms
      // micro-quantized before the cross-bucket window sum
      val pG = "((g + 0.5) / (gt + 0.5 * kb))"
      val pB = "((b + 0.5) / (bt + 0.5 * kb))"
      s"""WITH rows_ AS (
         |  SELECT least(CAST(${OracleHelpers.occ("the")} AS BIGINT), 7) AS bucket,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents
         |),
         |bb AS (
         |  SELECT bucket, CAST(sum(y) AS BIGINT) AS g,
         |    CAST(sum(1 - y) AS BIGINT) AS b
         |  FROM rows_ GROUP BY 1
         |),
         |tot AS (
         |  SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt,
         |    CAST(count(*) AS BIGINT) AS kb
         |  FROM bb
         |),
         |t2 AS (
         |  SELECT bb.*,
         |    CAST(round(ln($pG / $pB) * 1e6) AS BIGINT) AS woe6,
         |    CAST(round(($pG - $pB) * ln($pG / $pB) * 1e6) AS BIGINT) AS iv6
         |  FROM bb, tot
         |)
         |SELECT bucket, g AS n_en, b AS n_other,
         |  round(woe6 / 1e6, 6) AS woe,
         |  round(CAST(sum(iv6) OVER () AS BIGINT) / 1e6, 6) AS iv
         |FROM t2 ORDER BY bucket""".stripMargin
    })
}
