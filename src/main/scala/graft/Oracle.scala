package graft

/** DuckDB oracle SQL for every entry in SparkEntry.queries — the
  * validated Appendix A suite of SURVEY.md, with cross-engine type
  * normalizations discovered by probing DuckDB 1.0.0 directly:
  *
  *  - avg(DECIMAL) rewritten as cast(sum(DECIMAL) AS DOUBLE)/count(*)
  *    so both engines perform the identical IEEE division (Spark's
  *    avg(DECIMAL) rounds to scale+4 internally);
  *  - sum(BIGINT) wrapped in cast(... AS BIGINT) — DuckDB yields
  *    HUGEINT (int128) which parquet/arrow cannot hash-match;
  *  - ceil/floor outputs cast to BIGINT (DuckDB returns DOUBLE, Spark
  *    LONG — normalize to the integer the value actually is);
  *  - float array elements cast to DOUBLE before round() — DuckDB's
  *    round(FLOAT) stays FLOAT and carries float noise;
  *  - list_cosine_similarity computed on DOUBLE[] — the FLOAT[]
  *    overload accumulates in float (~1e-7 error, flips 4dp rounding);
  *  - sliding-window start built with make_timestamp (session-timezone
  *    independent) instead of to_timestamp (TIMESTAMPTZ).
  */
object Oracle {

  /** DuckDB table ref for a testdata table. */
  private def t(dir: String, name: String): String =
    s"read_parquet('$dir/$name.parquet')"

  /** Shared EDGES prefix for graph queries (SURVEY §2.8). */
  private def edgesWith(dir: String, recursive: Boolean = false): String = {
    val kw = if (recursive) "WITH RECURSIVE" else "WITH"
    s"""$kw raw_e AS (
    SELECT a.l_partkey AS s, b.l_partkey AS t, count(*) AS w
    FROM ${t(dir, "lineitem")} a JOIN ${t(dir, "lineitem")} b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2),
  e AS (SELECT s, t, w FROM raw_e WHERE w >= 2),
  ud AS (SELECT s, t FROM e UNION ALL SELECT t, s FROM e)"""
  }

  /** Shared CTE chain for the MinHash-LSH queries: shingles -> 16-chunk
    * signatures -> 2x8 band keys -> candidate pairs -> exact-Jaccard
    * inputs (`inter`, `sizes`). */
  private def minhashCtes(dir: String): String = {
    val m0_7 = (0 until 8).map(i => s"m$i").mkString(", ',', ")
    val m8_15 = (8 until 16).map(i => s"m$i").mkString(", ',', ")
    val minCols = (0 until 16)
      .map(i => s"min(substr(md5(concat('${i / 4}|', g)), ${1 + 8 * (i % 4)}, 8)) AS m$i")
      .mkString(",\n    ")
    s"""sp AS (SELECT doc_id, lang, generate_subscripts(string_split(text,' '),1) AS pos,
         unnest(string_split(text,' ')) AS w FROM ${t(dir, "documents")}),
sh AS (SELECT DISTINCT a.doc_id, a.lang, concat(a.w,' ',b.w,' ',c.w) AS g
  FROM sp a JOIN sp b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
            JOIN sp c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
wide AS (SELECT doc_id, lang,
    $minCols
  FROM sh GROUP BY 1, 2),
bands AS (
  SELECT doc_id, lang, 0 AS band, md5(concat($m0_7)) AS bkey FROM wide
  UNION ALL
  SELECT doc_id, lang, 1 AS band, md5(concat($m8_15)) AS bkey FROM wide),
cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.band = b.band
    AND a.lang = b.lang AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (SELECT c.d1, c.d2, count(*) AS i
  FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
  GROUP BY 1, 2)"""
  }

  /** Shared CTE chain for the substring-span family (§2.39):
    * positioned 1-based 8-gram md5 shingles → occurrence cap [2,20] →
    * pair join → gaps-and-islands on (d1, d2, pos-diff) → maximal
    * spans of ≥ 12 tokens (island length + 7). Mirrors
    * Pipelines.dupSpans exactly — integer positions, md5 grams. */
  private def spanCtes(dir: String): String =
    s"""WITH sp AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) pos,
    unnest(string_split(text,' ')) w FROM ${t(dir, "documents")}),
sh0 AS (SELECT doc_id, pos,
    md5(concat_ws(' ', w, lead(w,1) OVER wd, lead(w,2) OVER wd,
      lead(w,3) OVER wd, lead(w,4) OVER wd, lead(w,5) OVER wd,
      lead(w,6) OVER wd, lead(w,7) OVER wd)) h,
    (lead(w,7) OVER wd IS NOT NULL) fl
  FROM sp WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)),
sh AS (SELECT doc_id, pos, h FROM sh0 WHERE fl),
keep AS (SELECT h FROM sh GROUP BY h HAVING count(*) BETWEEN 2 AND 20),
fk AS (SELECT doc_id, pos, h FROM sh JOIN keep USING (h)),
pr AS (SELECT a.doc_id d1, b.doc_id d2, a.pos p1, a.pos - b.pos dp
  FROM fk a JOIN fk b ON a.h = b.h AND a.doc_id < b.doc_id),
isl AS (SELECT d1, d2, dp, p1,
    p1 - row_number() OVER (PARTITION BY d1, d2, dp ORDER BY p1) grp
  FROM pr),
spans AS (SELECT d1, d2, min(p1) s1, min(p1) - dp s2, count(*) + 7 tok
  FROM isl GROUP BY d1, d2, dp, grp
  HAVING count(*) + 7 >= 12)"""

  /** §2.46 PII pattern by type — the SAME literal string Pipelines
    * compiles on the Spark side (Java/RE2-identical subset). */
  private def piiPat(name: String): String =
    graft.ops.Pipelines.piiPatterns.collectFirst {
      case (n, p, _) if n == name => p
    }.getOrElse(throw new IllegalArgumentException(name))

  /** §2.46 dirty-corpus fixture as DuckDB SQL — the same doc_id
    * arithmetic injection Pipelines.piiDirtyText declares (BIGINT to
    * VARCHAR concat casts agree between engines). */
  private val piiDirtySql: String =
    """concat(text,
    CASE WHEN doc_id % 5 = 0 THEN concat(' contact user', doc_id, '@example.com now') ELSE '' END,
    CASE WHEN doc_id % 7 = 0 THEN concat(' call ', 300 + doc_id % 600, '-', 200 + doc_id % 700, '-', 1000 + doc_id % 9000, ' today') ELSE '' END,
    CASE WHEN doc_id % 11 = 0 THEN concat(' case ', 100 + doc_id % 900, '-', 10 + doc_id % 90, '-', 1000 + doc_id % 9000, ' filed') ELSE '' END,
    CASE WHEN doc_id % 13 = 0 THEN concat(' from 10.', doc_id % 256, '.', (doc_id * 7) % 256, '.', (doc_id * 13) % 256, ' port') ELSE '' END)"""

  def forDir(dir: String): Map[String, String] = {
    def T(name: String) = t(dir, name)
    val E = edgesWith(dir)
    val ER = edgesWith(dir, recursive = true)

    scala.collection.immutable.ListMap(
      // ---- scans ----
      "scan_project" ->
        s"""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
FROM ${T("lineitem")} WHERE l_quantity > 45.0
ORDER BY l_orderkey, l_linenumber""",

      "filter_complex" ->
        s"""SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM ${T("orders")}
WHERE o_orderstatus IN ('F','O')
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
  AND o_orderpriority LIKE '%URGENT%' AND o_totalprice IS NOT NULL
ORDER BY o_orderkey""",

      "scan_prune_minmax" ->
        s"""SELECT count(*) AS n, min(l_shipdate) AS lo, max(l_shipdate) AS hi,
       round(cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_qty
FROM ${T("lineitem")}""",

      // ---- joins ----
      "join_inner_multi" ->
        s"""SELECT r.r_name, n.n_name,
       count(*) AS n_orders,
       round(cast(sum(cast(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM ${T("orders")} o
JOIN ${T("customer")} c ON o.o_custkey = c.c_custkey
JOIN ${T("nation")} n ON c.c_nationkey = n.n_nationkey
JOIN ${T("region")} r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name""",

      "join_broadcast_dim" ->
        s"""SELECT p.p_brand, count(*) AS n_lines,
       round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS ext_sum
FROM ${T("lineitem")} l JOIN ${T("part")} p ON l.l_partkey = p.p_partkey
WHERE p.p_size >= 25
GROUP BY p.p_brand ORDER BY p.p_brand""",

      "join_left_outer" ->
        s"""SELECT n.n_nationkey, n.n_name, count(s.s_suppkey) AS n_suppliers,
       round(cast(coalesce(sum(cast(s.s_acctbal AS DECIMAL(18,2))), 0) AS DOUBLE), 2) AS bal
FROM ${T("nation")} n LEFT JOIN ${T("supplier")} s ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_nationkey, n.n_name
ORDER BY n.n_nationkey""",

      "join_full_outer" ->
        s"""WITH cn AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM ${T("customer")} GROUP BY 1),
     sn AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM ${T("supplier")} GROUP BY 1)
SELECT coalesce(cn.k, sn.k) AS nationkey,
       coalesce(cn.n_cust, 0) AS n_cust, coalesce(sn.n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
ORDER BY nationkey""",

      "join_semi" ->
        s"""SELECT c.c_custkey, c.c_name
FROM ${T("customer")} c
WHERE EXISTS (SELECT 1 FROM ${T("orders")} o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
ORDER BY c.c_custkey""",

      "join_anti" ->
        s"""SELECT c.c_custkey, c.c_mktsegment
FROM ${T("customer")} c
WHERE NOT EXISTS (SELECT 1 FROM ${T("orders")} o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
ORDER BY c.c_custkey""",

      "join_range_theta" ->
        s"""SELECT e1.user_id, count(*) AS pairs_within_5min
FROM ${T("events")} e1 JOIN ${T("events")} e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
GROUP BY e1.user_id
ORDER BY e1.user_id""",

      "join_null_safe" ->
        s"""WITH c AS (SELECT CASE WHEN user_id % 97 = 0 THEN NULL ELSE user_id END AS k,
    count(*) AS n_clicks
  FROM ${T("events")} WHERE event_type = 'click' GROUP BY 1),
p AS (SELECT CASE WHEN user_id % 97 = 0 THEN NULL ELSE user_id END AS k2,
    count(*) AS n_purchases
  FROM ${T("events")} WHERE event_type = 'purchase' GROUP BY 1)
SELECT c.k AS user_key, c.n_clicks, p.n_purchases
FROM c JOIN p ON c.k IS NOT DISTINCT FROM p.k2
ORDER BY user_key NULLS FIRST""",

      "set_symmetric_diff" ->
        s"""WITH a AS (SELECT DISTINCT l_partkey AS k FROM ${T("lineitem")} WHERE l_quantity > 48),
b AS (SELECT DISTINCT l_partkey AS k FROM ${T("lineitem")} WHERE l_discount > 0.09)
SELECT k, 'only_hi_qty' AS side FROM a WHERE k NOT IN (SELECT k FROM b)
UNION ALL
SELECT k, 'only_discounted' AS side FROM b WHERE k NOT IN (SELECT k FROM a)
ORDER BY k""",

      "join_interval_overlap" ->
        s"""WITH e AS (SELECT event_id, user_id, ts
  FROM ${T("events")} WHERE user_id % 10 = 0)
SELECT a.user_id, a.event_id AS e1, b.event_id AS e2,
  round((300000000 - abs(epoch_us(a.ts) - epoch_us(b.ts))) / 1e6, 3) AS overlap_sec
FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
WHERE abs(epoch_us(a.ts) - epoch_us(b.ts)) < 300000000
ORDER BY a.user_id, e1, e2""",

      "join_asof" ->
        s"""WITH purchases AS (SELECT event_id, user_id, ts, value FROM ${T("events")} WHERE event_type = 'purchase'),
     clicks    AS (SELECT user_id, ts, value FROM ${T("events")} WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       max(c.ts) AS last_click_ts
FROM purchases p JOIN clicks c
  ON c.user_id = p.user_id AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id""",

      "join_lateral_topn" ->
        s"""SELECT n.n_nationkey, n.n_name, c.c_custkey, round(c.c_acctbal, 2) AS bal
FROM ${T("nation")} n,
LATERAL (SELECT c_custkey, c_acctbal FROM ${T("customer")}
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
ORDER BY n.n_nationkey, bal DESC, c.c_custkey""",

      "tpch_q3_shape" ->
        s"""SELECT l.l_orderkey,
  round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM ${T("customer")} c JOIN ${T("orders")} o ON c.c_custkey = o.o_custkey
JOIN ${T("lineitem")} l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 20""",

      "tpch_q5_shape" ->
        s"""SELECT n.n_name,
  round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM ${T("customer")} c
JOIN ${T("orders")} o ON c.c_custkey = o.o_custkey
JOIN ${T("lineitem")} l ON l.l_orderkey = o.o_orderkey
JOIN ${T("supplier")} s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN ${T("nation")} n ON c.c_nationkey = n.n_nationkey
JOIN ${T("region")} r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""",

      // TPC-H Q2 shape: correlated scalar-min subquery — the Spark twin
      // runs the decorrelated (aggregate + join-back) form of the same
      // plan. Price equality compares stored doubles, no arithmetic.
      "tpch_q2_shape" ->
        s"""SELECT DISTINCT p.p_partkey, p.p_brand, s.s_name,
       round(l.l_extendedprice, 2) AS best_price
FROM ${T("part")} p
JOIN ${T("lineitem")} l ON l.l_partkey = p.p_partkey
JOIN ${T("supplier")} s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size <= 3
  AND l.l_extendedprice =
      (SELECT min(l2.l_extendedprice) FROM ${T("lineitem")} l2
       WHERE l2.l_partkey = p.p_partkey)
ORDER BY p.p_partkey, s.s_name""",

      // TPC-H Q18 shape: HAVING-sum IN-subquery; the threshold compares
      // exact DECIMAL sums so both engines agree at the boundary.
      "tpch_q18_shape" ->
        s"""SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       round(cast(sum(cast(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_qty
FROM ${T("customer")} c
JOIN ${T("orders")} o ON c.c_custkey = o.o_custkey
JOIN ${T("lineitem")} l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN
      (SELECT l_orderkey FROM ${T("lineitem")} GROUP BY 1
       HAVING sum(cast(l_quantity AS DECIMAL(18,2))) > 250)
GROUP BY 1, 2, 3
ORDER BY total_qty DESC, o.o_orderkey
LIMIT 20""",

      // TPC-H Q7 shape: bilateral region-pair shipping volume by year
      // (regions, not nations: non-empty even at sf0.001).
      "tpch_q7_shape" ->
        s"""SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
       cast(year(l.l_shipdate) AS BIGINT) AS l_year,
       round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM ${T("lineitem")} l
JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey
JOIN ${T("customer")} c ON o.o_custkey = c.c_custkey
JOIN ${T("supplier")} s ON l.l_suppkey = s.s_suppkey
JOIN ${T("nation")} n1 ON s.s_nationkey = n1.n_nationkey
JOIN ${T("region")} r1 ON n1.n_regionkey = r1.r_regionkey
JOIN ${T("nation")} n2 ON c.c_nationkey = n2.n_nationkey
JOIN ${T("region")} r2 ON n2.n_regionkey = r2.r_regionkey
WHERE (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
   OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
GROUP BY 1, 2, 3
ORDER BY supp_region, cust_region, l_year""",

      // TPC-H Q8 shape: one nation's market share of ASIA revenue by
      // year. Both sums stay exact DECIMAL; only the final division is
      // double (identical IEEE operands both engines).
      "tpch_q8_shape" ->
        s"""SELECT cast(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(cast(sum(CASE WHEN n1.n_name = 'NATION_3'
                  THEN cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))
                  ELSE cast(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS mkt_share,
       round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS total_volume
FROM ${T("lineitem")} l
JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey
JOIN ${T("supplier")} s ON l.l_suppkey = s.s_suppkey
JOIN ${T("nation")} n1 ON s.s_nationkey = n1.n_nationkey
WHERE o.o_custkey IN
      (SELECT c.c_custkey FROM ${T("customer")} c
       JOIN ${T("nation")} n ON c.c_nationkey = n.n_nationkey
       JOIN ${T("region")} r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA')
GROUP BY 1 ORDER BY o_year""",

      // TPC-H Q10 shape: returned-item revenue per customer, 1996Q4.
      "tpch_q10_shape" ->
        s"""SELECT c.c_custkey, c.c_name, n.n_name,
       round(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
       round(max(c.c_acctbal), 2) AS c_acctbal
FROM ${T("customer")} c
JOIN ${T("orders")} o ON c.c_custkey = o.o_custkey
JOIN ${T("lineitem")} l ON l.l_orderkey = o.o_orderkey
JOIN ${T("nation")} n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c.c_custkey
LIMIT 20""",

      "tpch_q14_shape" ->
        s"""SELECT cast(date_trunc('month', l_shipdate) AS DATE) AS month,
  round(100.0 *
    cast(sum(CASE WHEN p_type = 'PROMO'
      THEN cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))
      ELSE cast(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
    cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS promo_pct,
  round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM ${T("lineitem")} l JOIN ${T("part")} p ON l.l_partkey = p.p_partkey
GROUP BY 1 ORDER BY 1""",

      // Q15: top supplier by quarterly revenue (view + scalar max
      // subquery); the "achieves the maximum" test is exact DECIMAL
      // equality in both engines.
      "tpch_q15_shape" ->
        s"""WITH revenue AS (
  SELECT l_suppkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM ${T("lineitem")}
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 2) AS total_rev
FROM ${T("supplier")} JOIN revenue ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey""",

      "tpch_q19_shape" ->
        s"""SELECT
  round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
  count(*) AS n_items
FROM ${T("lineitem")} l JOIN ${T("part")} p ON l.l_partkey = p.p_partkey
 AND ((p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30))""",

      "funnel_three_step" ->
        s"""WITH v AS (SELECT user_id, min(ts) AS t_view FROM ${T("events")}
  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t_click FROM ${T("events")} e
  JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM ${T("events")} e
  JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
  CASE WHEN p.t_purchase IS NOT NULL THEN 3
       WHEN c.t_click IS NOT NULL THEN 2 ELSE 1 END AS stage
FROM v LEFT JOIN c ON c.user_id = v.user_id
       LEFT JOIN p ON p.user_id = v.user_id
ORDER BY v.user_id""",

      "agg_entropy" ->
        s"""WITH c AS (SELECT user_id, event_type, count(*) AS n
  FROM ${T("events")} GROUP BY 1, 2)
SELECT user_id, cast(sum(n) AS BIGINT) AS n_events, count(*) AS n_types,
  round(ln(cast(sum(n) AS DOUBLE)) -
    sum(cast(n AS DOUBLE) * ln(cast(n AS DOUBLE))) / sum(n), 4) AS entropy
FROM c GROUP BY 1 ORDER BY 1""",

      "ts_ohlc" ->
        s"""WITH r AS (SELECT date_trunc('hour', ts) AS h, value,
  row_number() OVER (PARTITION BY date_trunc('hour', ts)
    ORDER BY ts, event_id) AS ra,
  row_number() OVER (PARTITION BY date_trunc('hour', ts)
    ORDER BY ts DESC, event_id DESC) AS rd
  FROM ${T("events")})
SELECT h, round(max(CASE WHEN ra = 1 THEN value END), 2) AS open,
  round(max(value), 2) AS high, round(min(value), 2) AS low,
  round(max(CASE WHEN rd = 1 THEN value END), 2) AS close,
  count(*) AS n
FROM r GROUP BY h ORDER BY h""",

      "pareto_revenue" ->
        s"""WITH bc AS (SELECT o_orderstatus, o_custkey,
  sum(cast(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM ${T("orders")} GROUP BY 1, 2),
r AS (SELECT o_orderstatus, rev,
  sum(rev) OVER (PARTITION BY o_orderstatus
    ORDER BY rev DESC, o_custkey ROWS UNBOUNDED PRECEDING) AS cum,
  sum(rev) OVER (PARTITION BY o_orderstatus) AS total,
  row_number() OVER (PARTITION BY o_orderstatus
    ORDER BY rev DESC, o_custkey) AS rk
  FROM bc)
SELECT o_orderstatus, count(*) AS n_cust,
  cast(min(CASE WHEN cum * 5 >= total * 4 THEN rk END) AS BIGINT) AS n_top80,
  round(cast(min(CASE WHEN cum * 5 >= total * 4 THEN rk END) AS DOUBLE) /
    count(*), 4) AS frac_top80
FROM r GROUP BY 1 ORDER BY 1""",

      "agg_gini" ->
        s"""WITH r AS (SELECT o_orderstatus,
  cast(o_totalprice AS DECIMAL(18,2)) AS x,
  cast(row_number() OVER (PARTITION BY o_orderstatus
    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS i
  FROM ${T("orders")})
SELECT o_orderstatus, count(*) AS n,
  round(cast(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE) /
        cast(count(*) * sum(x) AS DOUBLE), 4) AS gini
FROM r GROUP BY 1 ORDER BY 1""",

      "agg_weighted_median" ->
        s"""WITH t AS (SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
  cast(l_quantity AS DECIMAL(18,2)) AS qd FROM ${T("lineitem")}),
c AS (SELECT l_returnflag, l_extendedprice,
  sum(qd) OVER (PARTITION BY l_returnflag
    ORDER BY l_extendedprice, l_orderkey, l_linenumber
    ROWS UNBOUNDED PRECEDING) AS cum,
  sum(qd) OVER (PARTITION BY l_returnflag) AS total
  FROM t)
SELECT l_returnflag, round(min(l_extendedprice), 2) AS weighted_median,
  round(cast(max(total) AS DOUBLE), 2) AS total_weight
FROM c WHERE cum * 2 >= total GROUP BY 1 ORDER BY 1""",

      // ---- aggregations ----
      "agg_hash_q1" ->
        s"""SELECT l_returnflag, l_linestatus,
       round(cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base,
       round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_disc,
       round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2))) * (1 + cast(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_charge,
       round(cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
       count(*) AS n
FROM ${T("lineitem")}
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",

      "agg_count_distinct" ->
        s"""SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(DISTINCT c_custkey) AS n_cust,
       count(*) AS n
FROM ${T("customer")} GROUP BY c_mktsegment ORDER BY c_mktsegment""",

      "agg_rollup" ->
        s"""SELECT grouping(r.r_name) AS g_region, grouping(n.n_name) AS g_nation,
       coalesce(r.r_name, 'ALL') AS region, coalesce(n.n_name, 'ALL') AS nation,
       count(*) AS n_cust
FROM ${T("customer")} c
JOIN ${T("nation")} n ON c.c_nationkey = n.n_nationkey
JOIN ${T("region")} r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY g_region, g_nation, region, nation""",

      "agg_cube" ->
        s"""SELECT grouping(o_orderstatus) AS g_s, grouping(o_orderpriority) AS g_p,
       coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       round(cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
FROM ${T("orders")}
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY g_s, g_p, status, priority""",

      "agg_grouping_sets" ->
        s"""SELECT grouping(lang) AS g_l, grouping(source) AS g_s,
       coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
       count(*) AS docs, cast(sum(n_chars) AS BIGINT) AS chars
FROM ${T("documents")}
GROUP BY GROUPING SETS ((lang, source), (lang), ())
ORDER BY g_l, g_s, lang, source""",

      "agg_stats" ->
        s"""SELECT event_type, count(*) AS n,
       round(min(value), 2) AS vmin, round(max(value), 2) AS vmax,
       round(cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS vavg,
       round(stddev_samp(value), 4) AS vstd
FROM ${T("events")} GROUP BY event_type ORDER BY event_type""",

      "agg_stats2" ->
        s"""SELECT l_returnflag,
  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
  round(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
  round(var_samp(l_quantity), 4) AS var_q,
  bool_and(l_quantity > 0) AS all_pos,
  bool_or(l_discount > 0.09) AS any_big_disc,
  count(*) AS n
FROM ${T("lineitem")} GROUP BY l_returnflag ORDER BY l_returnflag""",

      "latest_per_key" ->
        s"""SELECT user_id, event_id, event_type, round(value, 2) AS v
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM ${T("events")})
WHERE rn = 1 ORDER BY user_id""",

      "retention_daily" ->
        s"""WITH activity AS (SELECT DISTINCT user_id, cast(date_trunc('day', ts) AS DATE) AS day FROM ${T("events")})
SELECT a.day, count(*) AS active, count(b.user_id) AS retained,
  round(cast(count(b.user_id) AS DOUBLE) / count(*), 4) AS retention
FROM activity a LEFT JOIN activity b ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
GROUP BY a.day ORDER BY a.day""",

      "agg_string_agg" ->
        s"""SELECT c_nationkey, string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
  count(*) AS n
FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM ${T("customer")})
GROUP BY c_nationkey ORDER BY c_nationkey""",

      "funnel_click_purchase" ->
        s"""WITH purchases AS (SELECT event_id, user_id, ts FROM ${T("events")} WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, ts FROM ${T("events")} WHERE event_type = 'click'),
last_click AS (
  SELECT p.event_id, p.user_id, p.ts, max(c.ts) AS c_ts
  FROM purchases p JOIN clicks c ON c.user_id = p.user_id AND c.ts <= p.ts
  GROUP BY 1, 2, 3)
SELECT u.user_id,
  count(p.event_id) AS n_purchases,
  count(lc.event_id) FILTER (WHERE epoch(lc.ts) - epoch(lc.c_ts) <= 3600) AS n_converted,
  round(cast(count(lc.event_id) FILTER (WHERE epoch(lc.ts) - epoch(lc.c_ts) <= 3600) AS DOUBLE)
        / greatest(count(p.event_id), 1), 4) AS conv_rate
FROM (SELECT DISTINCT user_id FROM ${T("events")}) u
LEFT JOIN purchases p ON p.user_id = u.user_id
LEFT JOIN last_click lc ON lc.event_id = p.event_id
GROUP BY u.user_id ORDER BY u.user_id""",

      "agg_having" ->
        s"""SELECT l_suppkey, round(cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS qty
FROM ${T("lineitem")} GROUP BY l_suppkey
HAVING sum(cast(l_quantity AS DECIMAL(18,2))) > 1000
ORDER BY l_suppkey""",

      // ---- windows ----
      "win_rank_topn" ->
        s"""SELECT * FROM (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
         row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
  FROM ${T("orders")}
  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 20
ORDER BY o_orderstatus, rn""",

      "win_lag_lead" ->
        s"""SELECT user_id, event_id, round(value, 2) AS v,
       round(lag(value) OVER w, 2) AS prev_v,
       round(lead(value) OVER w, 2) AS next_v,
       round(value - coalesce(lag(value) OVER w, 0), 2) AS delta
FROM ${T("events")}
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id""",

      "win_moving_frame" ->
        s"""SELECT user_id, event_id,
       round(cast(sum(cast(value AS DECIMAL(18,2)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS mov_sum4
FROM ${T("events")}
ORDER BY user_id, event_id""",

      "win_running_total" ->
        s"""SELECT o_custkey, o_orderkey,
       round(cast(sum(cast(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS run_total
FROM ${T("orders")}
ORDER BY o_custkey, o_orderkey""",

      "win_ntile_dist" ->
        s"""SELECT c_custkey, c_acctbal,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd
FROM ${T("customer")}
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey""",

      "win_first_last" ->
        s"""SELECT o_custkey, o_orderkey,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
  nth_value(o_totalprice, 2) OVER w AS second_price
FROM ${T("orders")}
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey""",

      "win_range_1h" ->
        s"""SELECT event_id, user_id,
  count(*) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour,
  round(cast(sum(cast(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS v_last_hour
FROM ${T("events")}
ORDER BY event_id""",

      "win_ratio" ->
        s"""SELECT user_id, event_id,
  round(cast(value AS DOUBLE) /
    cast(sum(cast(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE), 6) AS share
FROM ${T("events")}
ORDER BY user_id, event_id""",

      "topk_per_group" ->
        s"""SELECT * FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM ${T("part")}
) WHERE rk <= 3
ORDER BY p_brand, rk, p_partkey""",

      // ---- sorts / sets ----
      "sort_multi_limit" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
FROM ${T("lineitem")}
ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100""",

      "set_union" ->
        s"""SELECT c_custkey AS k FROM ${T("customer")} WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS k FROM ${T("orders")} WHERE o_totalprice > 450000.0
ORDER BY k""",

      "set_intersect" ->
        s"""SELECT o_custkey AS k FROM ${T("orders")} WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS k FROM ${T("orders")} WHERE o_orderstatus = 'O'
ORDER BY k""",

      "set_except" ->
        s"""SELECT o_custkey AS k FROM ${T("orders")} WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey AS k FROM ${T("orders")} WHERE o_orderstatus = 'P'
ORDER BY k""",

      "set_ops_all" ->
        s"""WITH a AS (SELECT l_suppkey AS k FROM ${T("lineitem")} WHERE l_quantity > 40),
     b AS (SELECT l_suppkey AS k FROM ${T("lineitem")} WHERE l_discount > 0.05)
SELECT 'union_all' AS op, count(*) AS n FROM (SELECT k FROM a UNION ALL SELECT k FROM b)
UNION ALL
SELECT 'intersect_all', count(*) FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
UNION ALL
SELECT 'except_all', count(*) FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
ORDER BY op""",

      "agg_median_quantile" ->
        s"""SELECT o_orderstatus,
  round(median(o_totalprice), 2) AS med,
  round(quantile_cont(o_totalprice, 0.25), 2) AS q25,
  round(quantile_cont(o_totalprice, 0.90), 2) AS q90,
  count(*) AS n
FROM ${T("orders")} GROUP BY o_orderstatus ORDER BY o_orderstatus""",

      // Robust dispersion: median absolute deviation around the group
      // median (both medians interpolate on identical doubles).
      "agg_mad" ->
        s"""WITH m AS (
  SELECT o_orderstatus, median(o_totalprice) AS m
  FROM ${T("orders")} GROUP BY 1)
SELECT o.o_orderstatus, round(max(m.m), 2) AS med,
  round(median(abs(o.o_totalprice - m.m)), 2) AS mad, count(*) AS n
FROM ${T("orders")} o JOIN m USING (o_orderstatus)
GROUP BY o.o_orderstatus ORDER BY o_orderstatus""",

      // Theil T inequality: μ from the exact DECIMAL group sum; each
      // row's (x/μ)ln(x/μ) term rounded at 8 and DECIMAL-summed.
      "agg_theil_index" ->
        s"""WITH g AS (SELECT o_orderstatus,
  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sx, count(*) AS n
  FROM ${T("orders")} GROUP BY 1),
t AS (SELECT o.o_orderstatus, g.n,
  CAST(round((o.o_totalprice / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) *
    ln(o.o_totalprice / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))), 8) AS DECIMAL(18,8)) AS term
  FROM ${T("orders")} o JOIN g USING (o_orderstatus))
SELECT o_orderstatus,
  round(CAST(sum(term) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6) AS theil,
  CAST(max(n) AS BIGINT) AS n
FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""",

      // ---- scalar function families ----
      "fn_string2" ->
        s"""SELECT p_partkey,
  left(p_name, 4) AS l4, right(p_name, 4) AS r4,
  lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
  split_part(p_type, ' ', 1) AS first_word,
  reverse(p_name) AS rev,
  repeat(p_brand, 2) AS rep2,
  strpos(p_name, 'a') AS pos_a,
  starts_with(p_name, 'small') AS is_small
FROM ${T("part")} ORDER BY p_partkey""",

      "fn_string" ->
        s"""SELECT p_partkey,
       upper(p_brand) AS u, lower(p_type) AS lo,
       substr(p_name, 1, 10) AS pfx, length(p_name) AS len,
       replace(p_brand, '#', '-') AS rep,
       concat(p_brand, ':', p_type) AS cat,
       trim(concat('  ', p_name, '  ')) AS trimmed,
       contains(p_type, 'ECO') AS has_eco,
       regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num
FROM ${T("part")} ORDER BY p_partkey""",

      "fn_date" ->
        s"""SELECT o_orderkey,
       year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
       date_trunc('month', o_orderdate) AS mstart,
       o_orderdate + INTERVAL 30 DAY AS plus30
FROM ${T("orders")} WHERE o_orderkey <= 500 ORDER BY o_orderkey""",

      "fn_format" ->
        s"""SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m') AS ym,
  strftime(o_orderdate, '%Y/%m/%d') AS ymd,
  printf('%.2f', o_totalprice) AS price_s,
  printf('%08d', o_orderkey) AS key_pad,
  concat(o_orderstatus, '/', cast(year(o_orderdate) AS VARCHAR)) AS tag
FROM ${T("orders")} WHERE o_orderkey <= 400 ORDER BY o_orderkey""",

      "fn_date2" ->
        s"""SELECT o_orderkey,
  cast(date_part('hour', o_orderdate) AS BIGINT) AS h,
  cast(date_part('minute', o_orderdate) AS BIGINT) AS mi,
  cast(dayofweek(o_orderdate) AS BIGINT) AS dow,
  cast(last_day(o_orderdate) AS DATE) AS ld,
  cast(date_part('quarter', o_orderdate) AS BIGINT) AS q,
  cast(date_part('doy', o_orderdate) AS BIGINT) AS doy,
  cast(o_orderdate AS DATE) AS d_only
FROM ${T("orders")} WHERE o_orderkey <= 300 ORDER BY o_orderkey""",

      "fn_datediff_join" ->
        s"""SELECT l.l_orderkey, l.l_linenumber,
       date_diff('day', o.o_orderdate, l.l_shipdate) AS ship_delay_days
FROM ${T("lineitem")} l JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey
WHERE l.l_orderkey <= 1000
ORDER BY l.l_orderkey, l.l_linenumber""",

      "fn_math" ->
        s"""SELECT l_orderkey, l_linenumber,
       round(abs(l_extendedprice - 30000.0), 2) AS a,
       cast(ceil(l_quantity) AS BIGINT) AS c, cast(floor(l_discount * 100) AS BIGINT) AS f,
       round(sqrt(l_extendedprice), 4) AS sq,
       round(ln(l_extendedprice + 1), 6) AS lg,
       round(pow(l_quantity, 2), 2) AS p2,
       mod(l_orderkey, 7) AS m7
FROM ${T("lineitem")} WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber""",

      "fn_conditional" ->
        s"""SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000.0 THEN 'big'
            WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'small' END AS bucket,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
       greatest(o_totalprice, 50000.0) AS g, least(o_totalprice, 50000.0) AS l
FROM ${T("orders")} WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",

      "fn_array" ->
        s"""SELECT vec_id, label,
       len(embedding) AS dim,
       round(cast(embedding[1] AS DOUBLE), 6) AS first_elem,
       round(list_aggregate(embedding[1:8], 'sum'), 6) AS head8_sum
FROM ${T("embeddings")} ORDER BY vec_id""",

      "fn_explode_unnest" ->
        s"""SELECT vec_id, count(*) AS n_elems,
       round(sum(abs(cast(v AS DOUBLE))), 4) AS abs_sum
FROM (SELECT vec_id, unnest(embedding) AS v FROM ${T("embeddings")})
GROUP BY vec_id ORDER BY vec_id""",

      "fn_regex" ->
        s"""SELECT p_partkey,
  regexp_replace(p_brand, '[0-9]+', 'N', 'g') AS brand_n,
  regexp_matches(p_name, '^[a-z]+ [a-z]+$$') AS two_words,
  regexp_extract(p_type, '([A-Z]+)', 1) AS first_caps,
  cast(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels
FROM ${T("part")} ORDER BY p_partkey""",

      "fn_array2" ->
        s"""SELECT vec_id,
  list_contains(embedding, embedding[1]) AS has_first,
  cast(list_position(embedding, embedding[3]) AS BIGINT) AS pos3,
  cast(len(list_distinct(embedding)) AS BIGINT) AS n_distinct,
  round(cast(list_aggregate(list_transform(embedding, x -> abs(cast(x AS DOUBLE))), 'max') AS DOUBLE), 6) AS max_abs,
  cast(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
FROM ${T("embeddings")} WHERE vec_id < 300 ORDER BY vec_id""",

      "fn_nulls" ->
        s"""SELECT o_orderkey,
  nullif(o_orderstatus, 'O') IS NULL AS was_open,
  nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS is_f_nullsafe,
  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st2,
  CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN o_totalprice ELSE 0.0 END AS open_price,
  cast(CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS non_null_flag
FROM ${T("orders")} WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",

      "fn_json" ->
        s"""SELECT event_type,
       count(*) AS n_high,
       cast(sum(cast(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS k_sum
FROM ${T("events")}
WHERE cast(json_extract_string(props, '$$.k') AS BIGINT) > 50
GROUP BY event_type ORDER BY event_type""",

      // ---- text / LLM pipeline ----
      "text_wordcount" ->
        s"""SELECT w, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM ${T("documents")})
WHERE w <> ''
GROUP BY w ORDER BY cnt DESC, w LIMIT 20""",

      "text_stats" ->
        s"""SELECT lang, count(*) AS docs,
       round(cast(sum(cast(n_chars AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_chars,
       cast(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM ${T("documents")} GROUP BY lang ORDER BY lang""",

      "text_bigrams" ->
        s"""WITH toks AS (
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")})
SELECT a.w AS w1, b.w AS w2, count(*) AS cnt
FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY a.w, b.w ORDER BY cnt DESC, w1, w2 LIMIT 20""",

      "dedup_exact" ->
        s"""SELECT md5(lower(trim(text))) AS h, min(doc_id) AS canonical_id, count(*) AS copies
FROM ${T("documents")}
GROUP BY md5(lower(trim(text)))
ORDER BY h LIMIT 200""",

      "dedup_near_jaccard" ->
        s"""WITH sample_docs AS (
  SELECT doc_id, lang, n_chars, text FROM ${T("documents")} WHERE doc_id % 10 = 0),
toks AS (
  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS w
  FROM sample_docs),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
  FROM toks a JOIN toks b ON a.w = b.w AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT d1, d2, round(cast(i AS DOUBLE) / (s1.sz + s2.sz - i), 4) AS jaccard
FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
WHERE cast(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.8
ORDER BY d1, d2""",

      "sim_cosine_topk" ->
        s"""WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM ${T("embeddings")} WHERE vec_id < 10),
scored AS (
  SELECT p.pid, e.vec_id AS cand, e.label,
         round(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[])), 4) AS sim
  FROM probes p CROSS JOIN ${T("embeddings")} e
  WHERE e.vec_id <> p.pid),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, cand) AS rk
  FROM scored)
SELECT pid, rk, cand, label, sim FROM ranked WHERE rk <= 5
ORDER BY pid, rk""",

      "sim_knn_label" ->
        s"""WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM ${T("embeddings")} WHERE vec_id < 10),
scored AS (
  SELECT p.pid, e.vec_id AS cand, e.label,
         round(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[])), 4) AS sim
  FROM probes p CROSS JOIN ${T("embeddings")} e
  WHERE e.vec_id <> p.pid),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, cand) AS rk
  FROM scored),
votes AS (
  SELECT pid, label, count(*) AS votes
  FROM ranked WHERE rk <= 5 GROUP BY pid, label)
SELECT pid, label AS predicted, votes FROM (
  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY votes DESC, label) AS vr
  FROM votes) WHERE vr = 1
ORDER BY pid""",

      "multimodal_join" ->
        s"""SELECT e.label, count(*) AS n,
       round(cast(sum(cast(d.n_chars AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_chars,
       round(cast(sum(cast(round(list_aggregate(e.embedding, 'sum'), 6) AS DECIMAL(18,6))) AS DOUBLE), 4) AS vec_mass
FROM ${T("documents")} d JOIN ${T("embeddings")} e ON d.doc_id = e.vec_id
GROUP BY e.label ORDER BY e.label""",

      // ---- training-data pipeline extensions (SURVEY §2.11) ----
      "pipeline_token_count" ->
        s"""SELECT doc_id, lang,
       cast(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_tokens,
       n_chars
FROM ${T("documents")} WHERE doc_id % 7 = 0 ORDER BY doc_id""",

      // the pattern is the SAME generated alternation the Spark side
      // compiles from the frozen vocab (length-desc order = greedy
      // longest-match under both Java and RE2 alternation semantics)
      "pipeline_subword_count" ->
        s"""SELECT doc_id, lang, ws_tokens, subword_tokens,
       round(cast(subword_tokens AS DOUBLE) / ws_tokens, 4) AS fertility
FROM (SELECT doc_id, lang,
        cast(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        cast(len(regexp_extract_all(text, '${graft.ops.Pipelines.subwordPattern}')) AS BIGINT) AS subword_tokens
      FROM ${T("documents")} WHERE doc_id % 13 = 0)
ORDER BY doc_id""",

      "pipeline_quality_score" ->
        s"""WITH s AS (
  SELECT doc_id, lang, text, n_chars, string_split(text, ' ') AS toks FROM ${T("documents")}
  WHERE doc_id % 7 = 0)
SELECT doc_id, lang,
  cast(len(toks) AS BIGINT) AS n_tokens,
  round(cast(n_chars AS DOUBLE) / len(toks), 4) AS avg_tok_len,
  round(cast(len(list_filter(toks, w -> w IN ('the','a','table','value','query'))) AS DOUBLE) / len(toks), 4) AS stop_ratio,
  round(least(1.0, ln(1 + len(toks)) / 5) * (1.0 - cast(len(list_filter(toks, w -> w IN ('the','a','table','value','query'))) AS DOUBLE) / len(toks)), 4) AS quality,
  CASE WHEN len(toks) >= 40 THEN 'long' WHEN len(toks) >= 15 THEN 'mid' ELSE 'short' END AS bucket
FROM s ORDER BY doc_id""",

      "pipeline_lang_id" ->
        s"""WITH toks AS (SELECT DISTINCT doc_id, lang, unnest(string_split(text,' ')) AS w FROM ${T("documents")}),
tk AS (SELECT * FROM toks WHERE w <> ''),
freq AS (SELECT lang, w, count(*) AS df FROM tk GROUP BY 1, 2),
markers AS (SELECT lang AS mlang, w FROM (
  SELECT lang, w, row_number() OVER (PARTITION BY lang ORDER BY df DESC, w) AS rn FROM freq) WHERE rn <= 5),
votes AS (SELECT t.doc_id, m.mlang, count(*) AS hits
  FROM tk t JOIN markers m ON t.w = m.w GROUP BY 1, 2),
pred AS (SELECT doc_id, mlang AS predicted FROM (
  SELECT doc_id, mlang, row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, mlang) AS rn FROM votes) WHERE rn = 1)
SELECT d.lang AS actual, coalesce(p.predicted, 'unknown') AS predicted, count(*) AS docs
FROM ${T("documents")} d LEFT JOIN pred p ON d.doc_id = p.doc_id
GROUP BY 1, 2 ORDER BY 1, 2""",

      "pipeline_fingerprint" ->
        s"""WITH t AS (
  SELECT doc_id, generate_subscripts(string_split(text,' '), 1) AS pos,
         unnest(string_split(text,' ')) AS w
  FROM ${T("documents")} WHERE doc_id % 5 = 0),
sh AS (SELECT DISTINCT a.doc_id, md5(concat(a.w, ' ', b.w, ' ', c.w)) AS h
  FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
           JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2)
SELECT doc_id, count(*) AS n_shingles, min(h) AS fp_min, max(h) AS fp_max
FROM sh GROUP BY doc_id ORDER BY doc_id""",

      "pipeline_contamination" ->
        s"""WITH sp AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
         unnest(string_split(text,' ')) AS w FROM ${T("documents")}),
sh AS (SELECT DISTINCT a.doc_id, concat(a.w,' ',b.w,' ',c.w) AS g
  FROM sp a JOIN sp b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
            JOIN sp c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
ev AS (SELECT doc_id AS e_id, g FROM sh WHERE doc_id % 10 = 0),
tr AS (SELECT doc_id, g FROM sh WHERE doc_id % 10 <> 0),
ov AS (SELECT tr.doc_id, ev.e_id, count(*) AS o
  FROM tr JOIN ev USING (g) GROUP BY 1, 2)
SELECT doc_id, count(*) AS n_eval_hits, max(o) AS max_overlap
FROM ov WHERE o >= 3 GROUP BY doc_id ORDER BY doc_id""",

      "pipeline_domain_mix" ->
        s"""WITH bysrc AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(len(string_split(text,' '))) AS BIGINT) AS n_tokens
  FROM ${T("documents")} GROUP BY source)
SELECT source, n_docs, n_tokens,
  round(cast(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS share,
  round((1.0 / count(*) OVER ()) /
        (cast(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()), 4) AS weight
FROM bysrc ORDER BY source""",

      "fn_fuzzy_match" ->
        s"""WITH p AS (SELECT p_partkey, p_name, string_split(p_name,' ')[2] AS noun
  FROM ${T("part")} WHERE p_partkey % 20 = 0)
SELECT a.noun, a.p_partkey AS p1, b.p_partkey AS p2,
  cast(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM p a JOIN p b ON a.noun = b.noun AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
ORDER BY a.noun, p1, p2""",

      "sample_k_per_group" ->
        s"""SELECT lang, rk, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
    row_number() OVER (PARTITION BY lang
      ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rk
  FROM ${T("documents")})
WHERE rk <= 5 ORDER BY lang, rk""",

      "pipeline_repetition_score" ->
        s"""WITH sp AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
       unnest(string_split(text,' ')) AS w FROM ${T("documents")} WHERE doc_id % 3 = 0),
bg AS (SELECT a.doc_id, concat(a.w,' ',b.w) AS g
  FROM sp a JOIN sp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
per AS (SELECT doc_id, sum(c) AS total, max(c) AS top FROM cnt GROUP BY 1),
tok AS (SELECT doc_id, count(*) AS n_tok, count(DISTINCT w) AS n_distinct
  FROM sp GROUP BY 1)
SELECT doc_id, n_tok,
  round(cast(top AS DOUBLE) / total, 4) AS top_bigram_share,
  round(cast(n_distinct AS DOUBLE) / n_tok, 4) AS ttr,
  CASE WHEN round(cast(top AS DOUBLE) / total, 4) >= 0.05
         OR round(cast(n_distinct AS DOUBLE) / n_tok, 4) <= 0.35
       THEN 'repetitive' ELSE 'ok' END AS verdict
FROM per JOIN tok USING (doc_id) ORDER BY doc_id""",

      "dedup_containment" ->
        s"""WITH sp AS (SELECT doc_id, lang, generate_subscripts(string_split(text,' '),1) AS pos,
     unnest(string_split(text,' ')) AS w FROM ${T("documents")}),
sh AS (SELECT DISTINCT a.doc_id, a.lang, concat(a.w,' ',b.w,' ',c.w) AS g
  FROM sp a JOIN sp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            JOIN sp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1)
SELECT d1, d2, round(cast(i AS DOUBLE) / least(s1.sz, s2.sz), 4) AS containment
FROM inter JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
WHERE round(cast(i AS DOUBLE) / least(s1.sz, s2.sz), 4) >= 0.5
ORDER BY d1, d2""",

      "pipeline_tfidf_topterms" ->
        s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
  FROM ${T("documents")}),
tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
df AS (SELECT w, count(*) AS df FROM (SELECT DISTINCT doc_id, w FROM tok2) GROUP BY w),
n AS (SELECT count(*) AS n FROM ${T("documents")}),
tf AS (SELECT doc_id, w, count(*) AS tf FROM tok2 WHERE doc_id % 11 = 0 GROUP BY 1, 2),
scored AS (SELECT doc_id, w,
  round(cast(tf AS DOUBLE) * ln(cast(n AS DOUBLE) / cast(df AS DOUBLE)), 4) AS tfidf
  FROM tf JOIN df USING (w) CROSS JOIN n)
SELECT doc_id, rk, w, tfidf FROM (
  SELECT doc_id, w, tfidf,
    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, w) AS rk
  FROM scored)
WHERE rk <= 3 ORDER BY doc_id, rk""",

      "dedup_simhash" ->
        s"""WITH sp AS (SELECT doc_id, lang, generate_subscripts(string_split(text,' '),1) AS pos,
         unnest(string_split(text,' ')) AS w FROM ${T("documents")}),
sh AS (SELECT DISTINCT a.doc_id, a.lang, concat(a.w,' ',b.w,' ',c.w) AS g
  FROM sp a JOIN sp b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
            JOIN sp c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
bits AS (SELECT doc_id, lang, bitpos,
    CASE WHEN substr(md5(g), bitpos, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END AS delta
  FROM sh, (SELECT unnest(range(1, 33)) AS bitpos)),
fp AS (SELECT doc_id, lang,
    cast(sum(CASE WHEN sd > 0 THEN (cast(1 AS BIGINT) << (bitpos - 1)) ELSE 0 END) AS BIGINT) AS fp
  FROM (SELECT doc_id, lang, bitpos, sum(delta) AS sd FROM bits GROUP BY 1,2,3)
  GROUP BY 1, 2)
SELECT a.doc_id AS d1, b.doc_id AS d2, cast(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 4
ORDER BY d1, d2""",

      "dedup_minhash_lsh" ->
        s"""WITH ${minhashCtes(dir)}
SELECT d1, d2, round(cast(i AS DOUBLE) / (s1.sz + s2.sz - i), 4) AS jaccard
FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
WHERE cast(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5
ORDER BY d1, d2""",

      "dedup_clusters" ->
        s"""WITH ${minhashCtes(dir)},
pairs AS (SELECT d1, d2
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE cast(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5),
pud AS (SELECT d1 AS s, d2 AS t FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
pn0 AS (SELECT DISTINCT s AS v FROM pud),
pud2 AS (SELECT s, t FROM pud UNION ALL SELECT v, v FROM pn0),
pl0 AS (SELECT v, v AS lbl FROM pn0),
pl1 AS (SELECT pud2.s AS v, min(pl0.lbl) AS lbl FROM pud2 JOIN pl0 ON pl0.v = pud2.t GROUP BY pud2.s),
pl2 AS (SELECT pud2.s AS v, min(pl1.lbl) AS lbl FROM pud2 JOIN pl1 ON pl1.v = pud2.t GROUP BY pud2.s),
pl3 AS (SELECT pud2.s AS v, min(pl2.lbl) AS lbl FROM pud2 JOIN pl2 ON pl2.v = pud2.t GROUP BY pud2.s),
pl4 AS (SELECT pud2.s AS v, min(pl3.lbl) AS lbl FROM pud2 JOIN pl3 ON pl3.v = pud2.t GROUP BY pud2.s)
SELECT lbl AS canonical_id, count(*) AS cluster_size
FROM pl4 GROUP BY lbl ORDER BY canonical_id""",

      "sim_cosine_neardup" ->
        s"""WITH e AS (SELECT vec_id, label, embedding FROM ${T("embeddings")} WHERE vec_id % 2 = 0)
SELECT a.vec_id AS v1, b.vec_id AS v2,
  round(list_cosine_similarity(cast(a.embedding AS DOUBLE[]), cast(b.embedding AS DOUBLE[])), 4) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(cast(a.embedding AS DOUBLE[]), cast(b.embedding AS DOUBLE[])) >= 0.35
ORDER BY v1, v2""",

      "ann_ivf_topk" ->
        s"""WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM ${T("embeddings")} WHERE vec_id < 8),
asg AS (SELECT vec_id, cid FROM (
  SELECT e.vec_id, c.cid,
    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      round(list_cosine_similarity(cast(e.embedding AS DOUBLE[]), cast(c.ce AS DOUBLE[])), 6) DESC, c.cid) AS rn
  FROM ${T("embeddings")} e CROSS JOIN cent c) WHERE rn = 1),
probes AS (SELECT vec_id AS pid, embedding AS pe FROM ${T("embeddings")} WHERE vec_id >= 10 AND vec_id < 20),
pb AS (SELECT pid, cid FROM (
  SELECT p.pid, c.cid,
    row_number() OVER (PARTITION BY p.pid ORDER BY
      round(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(c.ce AS DOUBLE[])), 6) DESC, c.cid) AS rn
  FROM probes p CROSS JOIN cent c) WHERE rn <= 2),
cand AS (SELECT DISTINCT pb.pid, a.vec_id AS cand FROM pb JOIN asg a ON a.cid = pb.cid),
scored AS (SELECT c.pid, c.cand, e.label,
    round(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[])), 4) AS sim
  FROM cand c JOIN probes p ON p.pid = c.pid JOIN ${T("embeddings")} e ON e.vec_id = c.cand
  WHERE c.cand <> c.pid)
SELECT pid, rk, cand, label, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, cand) AS rk FROM scored)
WHERE rk <= 5 ORDER BY pid, rk""",

      // ---- deterministic sampling / splits (md5 16-bit buckets;
      // ('0x'||hex)::BIGINT is DuckDB's hex parse, Spark uses conv) ----
      "sample_deterministic" ->
        s"""SELECT doc_id, lang, n_chars
FROM ${T("documents")}
WHERE ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT < 19660
ORDER BY doc_id""",

      "sample_stratified" ->
        s"""WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT AS bk
  FROM ${T("documents")})
SELECT lang, count(*) AS kept, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM b
WHERE (lang = 'en' AND bk < 16384) OR (lang = 'de' AND bk < 65536)
   OR (lang = 'zh' AND bk < 32768)
GROUP BY lang ORDER BY lang""",

      "sample_hash_split" ->
        s"""WITH b AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT < 13107
              THEN 'test' ELSE 'train' END AS side
  FROM ${T("documents")})
SELECT side, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM b GROUP BY side ORDER BY side""",

      // ---- time series ----
      "ts_resample_gapfill" ->
        s"""WITH ev AS (
  SELECT user_id, date_trunc('day', ts) AS day, event_id, value
  FROM ${T("events")} WHERE user_id < 5),
daily AS (
  SELECT user_id, day, arg_max(value, event_id) AS v
  FROM ev GROUP BY user_id, day),
bounds AS (
  SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
  FROM ${T("events")}),
days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds),
users AS (SELECT DISTINCT user_id FROM ev),
grid AS (SELECT u.user_id, dy.day FROM users u CROSS JOIN days dy),
j AS (SELECT g.user_id, g.day, daily.v
      FROM grid g LEFT JOIN daily ON daily.user_id = g.user_id AND daily.day = g.day)
SELECT user_id, day,
       round(cast(last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS value_ff,
       v IS NOT NULL AS observed
FROM j ORDER BY user_id, day""",

      // ---- graph ----
      "graph_degree" ->
        s"""$E
SELECT s AS node, count(*) AS degree, cast(sum(0) AS BIGINT) AS pad
FROM ud GROUP BY s ORDER BY degree DESC, node LIMIT 50""",

      "graph_2hop" ->
        s"""$E
, start_node AS (SELECT s AS v FROM ud GROUP BY s ORDER BY count(*) DESC, s LIMIT 1),
h1 AS (SELECT DISTINCT t AS v FROM ud, start_node WHERE s = start_node.v),
h2 AS (
  SELECT DISTINCT ud.t AS v FROM ud JOIN h1 ON ud.s = h1.v, start_node
  WHERE ud.t <> start_node.v AND ud.t NOT IN (SELECT v FROM h1))
SELECT 1 AS hop, v FROM h1 UNION ALL SELECT 2 AS hop, v FROM h2
ORDER BY hop, v""",

      "graph_triangles" ->
        s"""$E
SELECT count(*) AS triangles FROM e e1
JOIN e e2 ON e2.s = e1.t
JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t""",

      "graph_cc_labelprop" ->
        s"""$E
, n0 AS (SELECT s AS v FROM ud UNION SELECT t FROM ud),
ud2 AS (SELECT s, t FROM ud UNION ALL SELECT v, v FROM n0),
l0 AS (SELECT v, v AS lbl FROM n0),
l1 AS (SELECT ud2.s AS v, min(l0.lbl) AS lbl FROM ud2 JOIN l0 ON l0.v = ud2.t GROUP BY ud2.s),
l2 AS (SELECT ud2.s AS v, min(l1.lbl) AS lbl FROM ud2 JOIN l1 ON l1.v = ud2.t GROUP BY ud2.s),
l3 AS (SELECT ud2.s AS v, min(l2.lbl) AS lbl FROM ud2 JOIN l2 ON l2.v = ud2.t GROUP BY ud2.s),
l4 AS (SELECT ud2.s AS v, min(l3.lbl) AS lbl FROM ud2 JOIN l3 ON l3.v = ud2.t GROUP BY ud2.s)
SELECT lbl AS component_label, count(*) AS size
FROM l4 GROUP BY lbl ORDER BY size DESC, component_label LIMIT 50""",

      "graph_bfs_3hop" ->
        s"""$ER
, start_node AS (SELECT s AS v FROM ud GROUP BY s ORDER BY count(*) DESC, s LIMIT 1),
reach AS (
  SELECT v, 0 AS depth FROM start_node
  UNION ALL
  SELECT DISTINCT ud.t AS v, r.depth + 1
  FROM reach r JOIN ud ON ud.s = r.v WHERE r.depth < 3)
SELECT v, min(depth) AS depth FROM reach GROUP BY v ORDER BY depth, v""",

      // TRUE recursive CTE twin (round 4): both engines run WITH
      // RECURSIVE — Spark lowers it to a UnionLoop fixpoint, nothing
      // is unrolled by hand on either side.
      "graph_reach_rcte" ->
        s"""$ER
, reach AS (
  SELECT v, 0 AS depth FROM (
    SELECT s AS v FROM ud GROUP BY s ORDER BY count(*) DESC, s LIMIT 1)
  UNION ALL
  SELECT DISTINCT ud.t AS v, r.depth + 1 AS depth
  FROM reach r JOIN ud ON ud.s = r.v WHERE r.depth < 6)
SELECT v, min(depth) AS depth FROM reach GROUP BY v ORDER BY depth, v""",

      // Recursive month spine left-joined to order aggregates: months
      // with zero orders must appear (calendar-dimension generation).
      "rcte_month_spine" ->
        s"""WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00' AS m
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '2001-12-01 00:00:00')
SELECT cast(m AS DATE) AS month,
       count(o_orderkey) AS n_orders,
       round(cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price
FROM months LEFT JOIN ${T("orders")}
  ON date_trunc('month', o_orderdate) = m
GROUP BY m ORDER BY month""",

      "graph_kcore3" ->
        s"""$E,
k1 AS (SELECT s FROM ud GROUP BY s HAVING count(*) >= 3),
u1 AS (SELECT ud.s, ud.t FROM ud JOIN k1 a ON ud.s = a.s JOIN k1 b ON ud.t = b.s),
k2 AS (SELECT s FROM u1 GROUP BY s HAVING count(*) >= 3),
u2 AS (SELECT u1.s, u1.t FROM u1 JOIN k2 a ON u1.s = a.s JOIN k2 b ON u1.t = b.s),
k3 AS (SELECT s FROM u2 GROUP BY s HAVING count(*) >= 3),
u3 AS (SELECT u2.s, u2.t FROM u2 JOIN k3 a ON u2.s = a.s JOIN k3 b ON u2.t = b.s)
SELECT s AS node, count(*) AS degree FROM u3 GROUP BY 1 ORDER BY 1""",

      "graph_pagerank3" ->
        s"""$E
, n0 AS (SELECT s AS v FROM ud UNION SELECT t FROM ud),
deg AS (SELECT s AS v, count(*) AS d FROM ud GROUP BY s),
nn AS (SELECT count(*) AS cnt FROM n0),
p0 AS (SELECT v, cast(1.0 AS DOUBLE) / (SELECT cnt FROM nn) AS pr FROM n0),
p1 AS (SELECT n0.v,
         0.15 / (SELECT cnt FROM nn)
         + 0.85 * cast(coalesce(sum(cast(p0.pr / deg.d AS DECIMAL(28,15))), 0) AS DOUBLE) AS pr
       FROM n0 LEFT JOIN ud ON ud.t = n0.v
       LEFT JOIN p0 ON p0.v = ud.s LEFT JOIN deg ON deg.v = ud.s
       GROUP BY n0.v),
p2 AS (SELECT n0.v,
         0.15 / (SELECT cnt FROM nn)
         + 0.85 * cast(coalesce(sum(cast(p1.pr / deg.d AS DECIMAL(28,15))), 0) AS DOUBLE) AS pr
       FROM n0 LEFT JOIN ud ON ud.t = n0.v
       LEFT JOIN p1 ON p1.v = ud.s LEFT JOIN deg ON deg.v = ud.s
       GROUP BY n0.v),
p3 AS (SELECT n0.v,
         0.15 / (SELECT cnt FROM nn)
         + 0.85 * cast(coalesce(sum(cast(p2.pr / deg.d AS DECIMAL(28,15))), 0) AS DOUBLE) AS pr
       FROM n0 LEFT JOIN ud ON ud.t = n0.v
       LEFT JOIN p2 ON p2.v = ud.s LEFT JOIN deg ON deg.v = ud.s
       GROUP BY n0.v)
SELECT v AS node, round(pr, 8) AS pagerank
FROM p3 ORDER BY pagerank DESC, node LIMIT 30""",

      // ---- streaming-on-batch ----
      "stream_tumbling_1h" ->
        s"""SELECT date_trunc('hour', ts) AS w_start, event_type, count(*) AS n,
       round(cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS v_sum
FROM ${T("events")}
GROUP BY date_trunc('hour', ts), event_type
ORDER BY w_start, event_type""",

      "stream_sliding_1h_30m" ->
        s"""WITH slid AS (
  SELECT make_timestamp((cast(floor((epoch(ts) - off) / 3600) AS BIGINT) * 3600 + off) * 1000000) AS w_start, value
  FROM ${T("events")}, (SELECT unnest([0, 1800]) AS off))
SELECT w_start, count(*) AS n,
       round(cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS v_sum
FROM slid GROUP BY w_start ORDER BY w_start""",

      "stream_sessionize" ->
        s"""WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM ${T("events")}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, event_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged)
SELECT user_id, count(DISTINCT sess_id) AS n_sessions, cast(sum(cnt) AS BIGINT) AS n_events,
       max(cnt) AS max_session_events
FROM (SELECT user_id, sess_id, count(*) AS cnt
      FROM sess GROUP BY user_id, sess_id)
GROUP BY user_id ORDER BY user_id""",

      // ---- subqueries / CTE / pivot ----
      "subq_correlated" ->
        s"""SELECT c.c_custkey, round(c.c_acctbal, 2) AS bal
FROM ${T("customer")} c
WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM ${T("customer")} c2
                     WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c.c_custkey""",

      "subq_scalar_uncorrelated" ->
        s"""SELECT o_orderkey, o_totalprice
FROM ${T("orders")}
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM ${T("orders")})
ORDER BY o_orderkey""",

      "cte_chain_top_supplier" ->
        s"""WITH rev AS (
  SELECT l_suppkey,
         sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS r
  FROM ${T("lineitem")} GROUP BY l_suppkey),
mx AS (SELECT max(r) AS m FROM rev)
SELECT s.s_suppkey, s.s_name, round(cast(rev.r AS DOUBLE), 2) AS revenue
FROM rev JOIN mx ON rev.r = mx.m
JOIN ${T("supplier")} s ON s.s_suppkey = rev.l_suppkey
ORDER BY s.s_suppkey""",

      "pivot_dynamic" ->
        s"""SELECT lang,
  cast(coalesce(sum(CASE WHEN source='src0' THEN 1 END), 0) AS BIGINT) AS src0,
  cast(coalesce(sum(CASE WHEN source='src1' THEN 1 END), 0) AS BIGINT) AS src1,
  cast(coalesce(sum(CASE WHEN source='src2' THEN 1 END), 0) AS BIGINT) AS src2,
  cast(coalesce(sum(CASE WHEN source='src3' THEN 1 END), 0) AS BIGINT) AS src3
FROM ${T("documents")} GROUP BY lang ORDER BY lang""",

      "unpivot_long" ->
        s"""WITH wide AS (
  SELECT l_returnflag,
    round(cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS qty,
    round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS price,
    round(cast(sum(cast(l_tax AS DECIMAL(18,2))) AS DOUBLE), 2) AS tax
  FROM ${T("lineitem")} GROUP BY l_returnflag)
SELECT l_returnflag, metric, val
FROM wide UNPIVOT (val FOR metric IN (qty, price, tax))
ORDER BY l_returnflag, metric""",

      "pivot_manual" ->
        s"""SELECT cast(date_trunc('day', ts) AS DATE) AS day,
       count(*) FILTER (WHERE event_type = 'click') AS clicks,
       count(*) FILTER (WHERE event_type = 'view') AS views,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       count(*) FILTER (WHERE event_type = 'signup') AS signups,
       count(*) FILTER (WHERE event_type = 'error') AS errors
FROM ${T("events")} GROUP BY 1 ORDER BY day""",

      // Multi-measure pivot: count + revenue per pivoted type in one
      // pass; the CASE mirrors Spark's otherwise(0) exactly (a FILTER
      // clause would sum NULL-only groups to NULL, not 0).
      "pivot_multi_measure" ->
        s"""SELECT cast(date_trunc('day', ts) AS DATE) AS day,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_n,
  round(CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2))
    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS click_value,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_n,
  round(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS purchase_value
FROM ${T("events")} GROUP BY 1 ORDER BY day""",

      // ---- round-3 additions ----

      "agg_mode" ->
        s"""WITH c AS (SELECT o_orderstatus, o_orderpriority,
    cast(count(*) AS BIGINT) AS cnt
  FROM ${T("orders")} GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (
    PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority) AS rk
  FROM c)
SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
FROM r WHERE rk = 1 ORDER BY o_orderstatus""",

      "agg_histogram" ->
        s"""SELECT cast(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
  cast(count(*) AS BIGINT) AS n,
  round(cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
FROM ${T("orders")} GROUP BY 1 ORDER BY 1""",

      "join_salted" ->
        s"""SELECT o_orderstatus, cast(count(*) AS BIGINT) AS n,
  round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev
FROM ${T("lineitem")} l JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1""",

      "win_percent_rank_cume" ->
        s"""SELECT c_custkey, c_mktsegment, c_acctbal,
  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
FROM ${T("customer")}
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey""",

      // running COUNT(DISTINCT) composed from a first-occurrence flag
      // (neither engine supports distinct aggregates over windows).
      "win_distinct_running" ->
        s"""WITH f AS (
  SELECT event_id, event_type, ts,
    CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
                                 ORDER BY ts, event_id) = 1
         THEN 1 ELSE 0 END AS flag
  FROM ${T("events")})
SELECT event_id, event_type,
  cast(sum(flag) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_users
FROM f ORDER BY event_id""",

      // moving exact median over a 7-row frame (aggregate-in-frame).
      "win_moving_median" ->
        s"""SELECT event_id, event_type,
  round(median(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
FROM ${T("events")} ORDER BY event_id""",

      // gaps-and-islands: day minus row_number is constant within a
      // consecutive run (all integer/date arithmetic, exact).
      "win_gaps_islands" ->
        s"""WITH days AS (
  SELECT DISTINCT user_id, cast(ts AS DATE) AS day
  FROM ${T("events")} WHERE user_id IS NOT NULL),
g AS (SELECT user_id, day,
  day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS anchor
  FROM days),
st AS (SELECT user_id, anchor, count(*) AS len FROM g GROUP BY 1, 2)
SELECT user_id, count(*) AS n_streaks, max(len) AS longest,
  cast(sum(len) AS BIGINT) AS active_days
FROM st GROUP BY 1 ORDER BY user_id""",

      // corr/regression from EXACT moments: the five sums are
      // order-insensitive decimals, the formulas run once per group on
      // identical IEEE operands (built-in corr()/regr_slope() would
      // accumulate doubles in engine-dependent order).
      "agg_corr_regr" ->
        s"""WITH m AS (
  SELECT l_returnflag,
    cast(count(*) AS DOUBLE) AS n,
    cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
    cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
    cast(sum(cast(l_quantity AS DECIMAL(18,2)) * cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
    cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
    cast(sum(cast(l_quantity AS DECIMAL(18,2)) * cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM ${T("lineitem")} GROUP BY 1)
SELECT l_returnflag, cast(n AS BIGINT) AS n,
  round((n * sxy - sx * sy) /
        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_xy,
  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4) AS intercept
FROM m ORDER BY l_returnflag""",

      // Non-parquet source round-trips: the oracle reads the ORIGINAL
      // parquet; the Spark side went through csv/json/orc.
      "src_csv_roundtrip" ->
        s"""SELECT s_nationkey, count(*) AS n,
  round(cast(sum(cast(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS bal
FROM ${T("supplier")} GROUP BY 1 ORDER BY s_nationkey""",

      "src_json_roundtrip" ->
        s"""SELECT c_mktsegment, count(*) AS n,
  round(cast(sum(cast(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS bal,
  max(c_custkey) AS hi_key
FROM ${T("customer")} GROUP BY 1 ORDER BY c_mktsegment""",

      "src_orc_roundtrip" ->
        s"""SELECT o_orderstatus, count(*) AS n,
  min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
  round(cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
FROM ${T("orders")} GROUP BY 1 ORDER BY o_orderstatus""",

      // bitmap-exact distinct: ids bucket into 64-bit words, bit_or
      // accumulates, popcounts sum — all-integer, cross-engine exact.
      "agg_bitmap_distinct" ->
        s"""WITH words AS (
  SELECT event_type, user_id // 63 AS word_idx,
    bit_or(cast(1 AS BIGINT) << cast(user_id % 63 AS INT)) AS word
  FROM ${T("events")} GROUP BY 1, 2)
SELECT event_type,
  cast(sum(bit_count(word)) AS BIGINT) AS distinct_users,
  count(*) AS n_words
FROM words GROUP BY 1 ORDER BY event_type""",

      "fn_bitwise" ->
        s"""SELECT l_orderkey, cast(l_linenumber AS BIGINT) AS ln,
  l_orderkey & l_partkey AS b_and,
  l_orderkey | l_partkey AS b_or,
  xor(l_orderkey, l_partkey) AS b_xor,
  l_partkey << 3 AS b_shl,
  l_partkey >> 2 AS b_shr,
  cast(bit_count(l_partkey) AS BIGINT) AS b_pop
FROM ${T("lineitem")} WHERE l_orderkey % 50 = 0
ORDER BY l_orderkey, ln""",

      "fn_hash" ->
        s"""SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
FROM ${T("documents")} WHERE doc_id % 11 = 0 ORDER BY doc_id""",

      // arg-extreme aggregates; the ordering value is an exact BIGINT
      // composite (decimal cents * 10^7 + orderkey) so price ties are
      // broken identically in both engines.
      "agg_argminmax" ->
        s"""SELECT o_orderstatus,
  arg_max(o_orderkey,
    cast(cast(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000
      + o_orderkey) AS top_order,
  round(max(o_totalprice), 2) AS top_price,
  arg_min(o_orderkey,
    cast(cast(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000
      + o_orderkey) AS bottom_order,
  round(min(o_totalprice), 2) AS bottom_price,
  count(*) AS n
FROM ${T("orders")} GROUP BY 1 ORDER BY 1""",

      // trailing-window z-score: n/Σx/Σx² are exact DECIMAL window sums
      // (daily total re-anchored to DECIMAL(18,4) so its square stays in
      // precision); only the final z math runs in DOUBLE — identical
      // IEEE operations in both engines.
      "ts_anomaly_zscore" ->
        s"""WITH daily AS (
  SELECT event_type, cast(date_trunc('day', ts) AS DATE) AS d,
         cast(sum(cast(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
  FROM ${T("events")} GROUP BY 1, 2),
win AS (
  SELECT event_type, d, v,
    count(*) OVER w AS n,
    sum(v) OVER w AS sx,
    sum(v * v) OVER w AS ss
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
SELECT event_type, d, round(cast(v AS DOUBLE), 2) AS v,
  round((cast(v AS DOUBLE) - cast(sx AS DOUBLE) / n) /
        sqrt((cast(ss AS DOUBLE) - cast(sx AS DOUBLE) * cast(sx AS DOUBLE) / n)
             / (n - 1)), 3) AS z
FROM win WHERE n >= 4
ORDER BY event_type, d""",

      // try_cast ingestion hygiene: malformed → NULL in both engines.
      "fn_try_cast" ->
        s"""SELECT c_custkey,
  try_cast(substr(c_name, 10) AS BIGINT) AS id_digits,
  try_cast(c_mktsegment AS BIGINT) AS seg_num,
  try_cast(concat(cast(c_custkey AS VARCHAR), '.5') AS DOUBLE) AS with_half,
  try_cast(CASE WHEN c_custkey % 3 = 0 THEN '2024-01-15'
           ELSE 'not a date' END AS DATE) AS maybe_date,
  cast(try_cast(cast(c_acctbal AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS bal_dec
FROM ${T("customer")} ORDER BY c_custkey""",

      "cdc_scd2" ->
        s"""WITH ev AS (SELECT user_id, ts, event_id, event_type
  FROM ${T("events")} WHERE user_id IS NOT NULL AND user_id % 20 = 0),
ch AS (SELECT *, lag(event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM ev),
f AS (SELECT user_id, ts, event_id, event_type FROM ch
  WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type, ts AS valid_from,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM f ORDER BY user_id, valid_from,
  event_type NULLS FIRST, valid_to NULLS FIRST""",

      "join_point_in_time" ->
        s"""WITH ev AS (SELECT user_id, ts, event_id, event_type
  FROM ${T("events")} WHERE user_id IS NOT NULL AND user_id % 20 = 0),
ch AS (SELECT *, lag(event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM ev),
f AS (SELECT user_id, ts, event_id, event_type FROM ch
  WHERE prev IS NULL OR prev <> event_type),
dim AS (SELECT user_id AS d_user, event_type AS state, ts AS valid_from,
  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM f),
p AS (SELECT event_id, user_id, ts FROM ${T("events")}
  WHERE user_id IS NOT NULL AND user_id % 20 = 0 AND event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, dim.state
FROM p JOIN dim ON p.user_id = dim.d_user AND p.ts >= dim.valid_from
  AND (dim.valid_to IS NULL OR p.ts < dim.valid_to)
ORDER BY p.event_id""",

      "graph_jaccard_neighbors" ->
        s"""$E,
deg AS (SELECT s AS node, cast(count(*) AS BIGINT) AS deg FROM ud GROUP BY 1),
com AS (SELECT a.s AS a, b.s AS b, cast(count(*) AS BIGINT) AS common
  FROM ud a JOIN ud b ON a.t = b.t AND a.s < b.s
  GROUP BY 1, 2)
SELECT com.a, com.b, com.common,
  round(com.common / (da.deg + db.deg - com.common), 4) AS jac
FROM com JOIN deg da ON da.node = com.a JOIN deg db ON db.node = com.b
WHERE com.common / (da.deg + db.deg - com.common) >= 0.2
ORDER BY 1, 2""",

      // Adamic-Adar: wedge join + per-center 1/ln(deg) score, rounded
      // then DECIMAL-summed per pair; total-ordered top-100.
      "graph_adamic_adar" ->
        s"""$E,
deg AS (SELECT s AS x, count(*) AS dx FROM ud GROUP BY 1),
sc AS (SELECT x, CAST(round(CAST(1.0 AS DOUBLE) / ln(CAST(dx AS DOUBLE)), 6) AS DECIMAL(18,6)) AS sc FROM deg),
w AS (SELECT a.s AS a, b.s AS b, a.t AS x
  FROM ud a JOIN ud b ON a.t = b.t AND a.s < b.s)
SELECT a, b, CAST(count(*) AS BIGINT) AS common,
  round(CAST(sum(sc.sc) AS DOUBLE), 4) AS adamic_adar
FROM w JOIN sc USING (x)
GROUP BY a, b
ORDER BY adamic_adar DESC, a, b LIMIT 100""",

      // ---- round-6 contract additions (SURVEY §2.14) ----
      // Skew/kurtosis via raw power sums: l_quantity is integral, so
      // s1..s4 are exact doubles in ANY summation order; the moment
      // arithmetic mirrors the Spark expression tree op for op
      // (sqrt(m2*m2*m2), never pow — libm pow is not correctly
      // rounded, sqrt is).
      "agg_higher_moments" ->
        s"""WITH sums AS (
  SELECT l_returnflag, count(*) AS n,
    sum(l_quantity) AS s1,
    sum(l_quantity * l_quantity) AS s2,
    sum(l_quantity * l_quantity * l_quantity) AS s3,
    sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
  FROM ${T("lineitem")} GROUP BY l_returnflag),
m AS (
  SELECT l_returnflag, n, s1 / n AS mean,
    s2 / n - (s1 / n) * (s1 / n) AS m2,
    s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
    s4 / n - 4.0 * (s1 / n) * (s3 / n) + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM sums)
SELECT l_returnflag, n, round(mean, 4) AS mean_qty,
  round(m3 / sqrt(m2 * m2 * m2), 4) AS skewness,
  round(m4 / (m2 * m2) - 3.0, 4) AS kurtosis
FROM m ORDER BY l_returnflag""",

      // Resetting running total: DECIMAL(18,2) window sum is exact, so
      // the frame-order accumulation matches Spark bit for bit.
      "win_reset_running_total" ->
        s"""WITH e AS (
  SELECT event_id, user_id, ts, event_type, CAST(value AS DECIMAL(18,2)) AS v
  FROM ${T("events")} WHERE user_id % 25 = 0),
g AS (
  SELECT event_id, user_id, ts, v,
    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS grp
  FROM e)
SELECT event_id, user_id, CAST(grp AS BIGINT) AS grp,
  round(CAST(sum(v) OVER (PARTITION BY user_id, grp ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS run_total
FROM g ORDER BY user_id, event_id""",

      // Local clustering coefficient over the shared EDGES graph.
      "graph_clustering_coeff" ->
        s"""$E,
deg AS (SELECT s AS v, count(*) AS deg FROM ud GROUP BY 1),
closed AS (
  SELECT u1.s AS v, count(*) AS wedges_closed
  FROM ud u1 JOIN ud u2 ON u1.s = u2.s AND u1.t < u2.t
  JOIN ud e3 ON e3.s = u1.t AND e3.t = u2.t
  GROUP BY 1)
SELECT d.v AS node, CAST(d.deg AS BIGINT) AS degree,
  CAST(coalesce(c.wedges_closed, 0) AS BIGINT) AS wedges_closed,
  round(coalesce(c.wedges_closed, 0) * 2.0 / (d.deg * (d.deg - 1)), 4) AS clustering
FROM deg d LEFT JOIN closed c ON c.v = d.v
WHERE d.deg >= 2
ORDER BY node""",

      // Degree assortativity from exact integer power sums (Spark's
      // LONG sums equal DuckDB's HUGEINTs at these magnitudes, so the
      // corr tree's double operands are identical).
      "graph_assortativity" ->
        s"""$E,
deg AS (SELECT s AS v, count(*) AS deg FROM ud GROUP BY 1),
p AS (SELECT d1.deg AS dx, d2.deg AS dy
  FROM ud JOIN deg d1 ON ud.s = d1.v JOIN deg d2 ON ud.t = d2.v),
sums AS (SELECT count(*) AS n, sum(dx) AS sx, sum(dy) AS sy,
  sum(dx * dy) AS sxy, sum(dx * dx) AS sx2, sum(dy * dy) AS sy2 FROM p)
SELECT CAST(n AS BIGINT) AS n_pairs,
  CASE WHEN n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
    THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
      (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)) * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))), 6)
  END AS assortativity
FROM sums""",

      // Per-label cohesion to the label's min-vec_id anchor: per-pair
      // sims rounded to 4 digits then summed as DECIMAL, so the avg
      // divides identical operands in both engines.
      "sim_label_cohesion" ->
        s"""WITH anchors AS (
  SELECT label AS a_label, min(vec_id) AS a_id FROM ${T("embeddings")} GROUP BY 1),
aemb AS (SELECT a_label, a_id, e.embedding AS a_emb
  FROM anchors JOIN ${T("embeddings")} e ON e.vec_id = a_id),
sims AS (
  SELECT e.label,
    CAST(round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(a.a_emb AS DOUBLE[])), 4)
      AS DECIMAL(10,4)) AS sim
  FROM ${T("embeddings")} e JOIN aemb a ON e.label = a.a_label AND e.vec_id <> a.a_id)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_members,
  round(CAST(sum(sim) AS DOUBLE) / count(*), 6) AS avg_cos,
  round(CAST(min(sim) AS DOUBLE), 4) AS min_cos,
  round(CAST(max(sim) AS DOUBLE), 4) AS max_cos
FROM sims GROUP BY 1 ORDER BY label""",

      // Okapi BM25 (k1=1.2, b=0.75) against the fixed 3-term query
      // {spark, join, stream}: tf/df/dl/N all exact integers, the
      // float tree written term-by-term identically to the Spark side.
      "text_bm25_score" ->
        s"""WITH dt AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM ${T("documents")}),
t AS (SELECT doc_id, len(toks) AS dl,
  len(list_filter(toks, w -> w = 'spark')) AS tf1,
  len(list_filter(toks, w -> w = 'join')) AS tf2,
  len(list_filter(toks, w -> w = 'stream')) AS tf3 FROM dt),
g AS (SELECT count(*) AS n, sum(dl) AS tot,
  sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
  sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
  sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3 FROM t)
SELECT doc_id, round(
  ln((n - df1 + 0.5)/(df1 + 0.5) + 1.0) * (tf1 * 2.2)/(tf1 + 1.2*(0.25 + 0.75*dl/(CAST(tot AS DOUBLE)/n))) +
  ln((n - df2 + 0.5)/(df2 + 0.5) + 1.0) * (tf2 * 2.2)/(tf2 + 1.2*(0.25 + 0.75*dl/(CAST(tot AS DOUBLE)/n))) +
  ln((n - df3 + 0.5)/(df3 + 0.5) + 1.0) * (tf3 * 2.2)/(tf3 + 1.2*(0.25 + 0.75*dl/(CAST(tot AS DOUBLE)/n))), 4) AS bm25
FROM t, g WHERE tf1 + tf2 + tf3 > 0 ORDER BY doc_id""",

      // Unigram-LM quality scoring: mean token log-prob under the
      // corpus unigram distribution; ln computed once per vocab row,
      // rounded at 6, DECIMAL-summed per doc (identical operands).
      "pipeline_unigram_logprob" ->
        s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")}),
freq AS (SELECT w, count(*) AS cnt FROM tok GROUP BY 1),
n AS (SELECT sum(cnt) AS n_tok FROM freq),
lp AS (SELECT w, CAST(floor(ln(CAST(cnt AS DOUBLE) / n_tok) * 1e6) AS BIGINT) AS lp6
  FROM freq, n)
SELECT doc_id, count(*) AS n_tokens,
  round(CAST(sum(lp6) AS BIGINT) / CAST(count(*) AS DOUBLE) / 1e6, 4) AS avg_logprob
FROM tok JOIN lp USING (w)
GROUP BY doc_id ORDER BY doc_id""",

      // Zipf rank-frequency OLS over the vocab relation: power sums
      // exact decimals of rounded lns, closed form in one double tree.
      "pipeline_zipf_fit" ->
        s"""WITH freq AS (SELECT w, count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM ${T("documents")})
  GROUP BY 1),
ranked AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS r FROM freq),
xy AS (SELECT CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
  CAST(round(ln(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y FROM ranked),
sums AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
  sum(x*y) AS sxy, sum(x*x) AS sxx FROM xy)
SELECT CAST(n AS BIGINT) AS n_words,
  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS slope,
  round((CAST(sy AS DOUBLE) -
         ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) *
         CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS intercept
FROM sums""",

      // Boilerplate detection: top-20 3-gram shingles by document
      // frequency (distinct per doc), tie-broken by the shingle text.
      "pipeline_boilerplate_ngrams" ->
        s"""WITH sp AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
  unnest(string_split(text,' ')) AS w FROM ${T("documents")}),
sh AS (SELECT DISTINCT a.doc_id, concat(a.w,' ',b.w,' ',c.w) AS g
  FROM sp a JOIN sp b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
            JOIN sp c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
n AS (SELECT count(*) AS n_docs FROM ${T("documents")})
SELECT g, count(*) AS df,
  round(CAST(count(*) AS DOUBLE)/n_docs, 6) AS doc_share
FROM sh, n GROUP BY g, n_docs ORDER BY df DESC, g LIMIT 20""",

      // N-gram novelty: per-doc share of corpus-unique 3-gram
      // shingles; same shingle construction as the dedup family.
      "pipeline_ngram_novelty" ->
        s"""WITH sp AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
  unnest(string_split(text,' ')) AS w FROM ${T("documents")}),
sh AS (SELECT DISTINCT a.doc_id, concat(a.w,' ',b.w,' ',c.w) AS g
  FROM sp a JOIN sp b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
            JOIN sp c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
df AS (SELECT g, count(*) AS df FROM sh GROUP BY 1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
  round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(count(*) AS DOUBLE), 6) AS novelty
FROM sh JOIN df USING (g)
GROUP BY doc_id ORDER BY doc_id""",

      // Split-half centroid drift: cosine of the even/odd-half
      // component-SUM vectors (cosine is scale-invariant, so no mean
      // division); components rounded at 7 then DECIMAL-summed.
      "sim_label_centroid_drift" ->
        s"""WITH c AS (SELECT label, vec_id % 2 AS half,
  generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
  FROM ${T("embeddings")}),
s AS (SELECT label, half, pos,
  CAST(sum(CAST(round(CAST(v AS DOUBLE), 7) AS DECIMAL(18,7))) AS DECIMAL(12,7)) AS sv
  FROM c GROUP BY 1, 2, 3),
p AS (SELECT e.label, e.sv AS se, o.sv AS so
  FROM s e JOIN s o ON o.label = e.label AND o.pos = e.pos
    AND e.half = 0 AND o.half = 1),
d AS (SELECT label, sum(se*so) AS dot, sum(se*se) AS ne, sum(so*so) AS no
  FROM p GROUP BY 1)
SELECT CAST(label AS BIGINT) AS label,
  round(CAST(dot AS DOUBLE) / (sqrt(CAST(ne AS DOUBLE)) * sqrt(CAST(no AS DOUBLE))), 4) AS centroid_cos
FROM d ORDER BY label""",

      // Stopword-insensitive exact dedup: hash the stopword-stripped
      // token stream.
      "dedup_exact_normalized" ->
        s"""SELECT md5(array_to_string(list_filter(string_split(text, ' '),
    w -> w NOT IN ('the', 'a')), ' ')) AS h,
  min(doc_id) AS canonical_id, CAST(count(*) AS BIGINT) AS copies
FROM ${T("documents")}
GROUP BY 1
ORDER BY h LIMIT 200""",

      // Corpus length histogram: integer 64-char buckets per language.
      "pipeline_len_histogram" ->
        s"""SELECT lang, n_chars // 64 AS bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(n_chars) AS BIGINT) AS min_chars,
  CAST(max(n_chars) AS BIGINT) AS max_chars,
  round(CAST(CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE)
    / count(*), 4) AS avg_tokens
FROM ${T("documents")}
GROUP BY 1, 2
ORDER BY lang, bucket""",

      // FILTER-clause aggregates: several differently-filtered
      // aggregates of one scan in one pass.
      "agg_filtered" ->
        s"""SELECT o_orderstatus,
  CAST(count(*) AS BIGINT) AS n_all,
  CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
    FILTER (WHERE o_totalprice > 200000.0) AS DOUBLE), 2) AS big_rev,
  CAST(count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00') AS BIGINT) AS n_recent
FROM ${T("orders")}
GROUP BY o_orderstatus
ORDER BY o_orderstatus""",

      // As-of with tolerance: independent range-join formulation (the
      // Spark side is the linear union + running-last window).
      "join_asof_tolerance" ->
        s"""WITH p AS (
  SELECT event_id AS p_id, user_id, ts FROM ${T("events")} WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM ${T("events")} WHERE event_type = 'click')
SELECT p.p_id, p.user_id, p.ts, max(c.ts) AS click_ts
FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
  AND epoch_us(p.ts) - epoch_us(c.ts) <= 1800000000
GROUP BY 1, 2, 3
ORDER BY p_id""",

      // Calendar heatmap: DuckDB dow is 0-based Sunday; +1 matches
      // Spark's 1-7 Sunday-based dayofweek.
      "ts_calendar_heatmap" ->
        s"""SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
  CAST(extract(hour FROM ts) AS BIGINT) AS hour,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS value_sum
FROM ${T("events")}
GROUP BY 1, 2
ORDER BY dow, hour""",

      // Last-touch attribution: purchases credited to the most recent
      // prior click's k-bucket via an IGNORE NULLS carry-forward
      // window (frame ends at 1 PRECEDING so clicks never self-credit).
      "ts_attribution_last_touch" ->
        s"""WITH l AS (SELECT event_type, value,
  last_value(CASE WHEN event_type = 'click'
      THEN CAST(json_extract_string(props, '$$.k') AS BIGINT) END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_k
  FROM ${T("events")} WHERE user_id IS NOT NULL)
SELECT attr_k, CAST(count(*) AS BIGINT) AS n_purchases,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM l WHERE event_type = 'purchase' AND value IS NOT NULL
GROUP BY attr_k ORDER BY attr_k NULLS FIRST""",

      // First-order Markov transition matrix over each user's event
      // stream; probabilities divide two exact BIGINTs.
      "ts_markov_transitions" ->
        s"""WITH p AS (SELECT event_type AS from_type,
  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM ${T("events")} WHERE user_id IS NOT NULL),
c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS prob
FROM c ORDER BY 1, 2""",

      // Per-user OLS trend slope: x re-anchored to the user's first
      // event-µs so all power sums stay exact decimals within width
      // 38; closed form on double casts, scaled to value/hour. The
      // variance filter runs on the DOUBLE numerator — exact, since
      // the numerator is an integer (>= 1 whenever positive).
      "ts_trend_slope" ->
        s"""WITH f AS (SELECT user_id, epoch_us(ts) AS us,
  CAST(value AS DECIMAL(18,2)) AS y
  FROM ${T("events")} WHERE user_id < 50 AND value IS NOT NULL),
b AS (SELECT user_id,
  -- 19 digits forces int128 decimal storage; 14 would square in int64
  -- and overflow (values are identical exact integers either way)
  CAST(us - min(us) OVER (PARTITION BY user_id) AS DECIMAL(19,0)) AS x, y
  FROM f),
sums AS (SELECT user_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
  sum(x*y) AS sxy, sum(x*x) AS sxx FROM b GROUP BY 1)
SELECT user_id, CAST(n AS BIGINT) AS n,
  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        CAST(3600000000 AS DOUBLE), 6) AS slope_per_hour
FROM sums
WHERE n >= 2 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
ORDER BY user_id""",

      // Trailing-5 renormalized EWMA (alpha=0.5): 4 lags over the
      // (ts, event_id)-totalized per-user frame; weights are powers of
      // two (exact in double AND decimal) and the num/den trees are
      // written in one fixed chain in both engines.
      "ts_ewma" ->
        s"""WITH f AS (SELECT event_id, user_id, ts, value FROM ${T("events")}
  WHERE user_id < 20 AND value IS NOT NULL),
l AS (SELECT event_id, user_id, value,
  lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
  lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4
  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, round(value, 2) AS value,
  round((value
    + CASE WHEN l1 IS NOT NULL THEN l1 * CAST(0.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    + CASE WHEN l2 IS NOT NULL THEN l2 * CAST(0.25 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    + CASE WHEN l3 IS NOT NULL THEN l3 * CAST(0.125 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    + CASE WHEN l4 IS NOT NULL THEN l4 * CAST(0.0625 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) /
  (CAST(1.0 AS DOUBLE)
    + CASE WHEN l1 IS NOT NULL THEN CAST(0.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    + CASE WHEN l2 IS NOT NULL THEN CAST(0.25 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    + CASE WHEN l3 IS NOT NULL THEN CAST(0.125 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    + CASE WHEN l4 IS NOT NULL THEN CAST(0.0625 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 4) AS ewma
FROM l ORDER BY event_id""",

      // Trailing-24h rolling correlation from exact power sums: every
      // product is kept <= DECIMAL(38,_) wide in both engines (n as
      // INT, window sums re-narrowed) so the corr formula's operands
      // are bit-identical doubles.
      "ts_rolling_corr" ->
        s"""WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
    CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(18,2)) AS x,
    count(*) FILTER (WHERE event_type = 'click') AS y,
    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hs
  FROM ${T("events")} GROUP BY 1),
win AS (
  SELECT h,
    CAST(count(*) OVER w AS INTEGER) AS n,
    CAST(sum(x) OVER w AS DECIMAL(18,2)) AS sx,
    sum(y) OVER w AS sy,
    CAST(sum(CAST(x * y AS DECIMAL(18,2))) OVER w AS DECIMAL(18,2)) AS sxy,
    CAST(sum(CAST(x * x AS DECIMAL(20,4))) OVER w AS DECIMAL(20,4)) AS sx2,
    sum(y * y) OVER w AS sy2
  FROM hourly
  WINDOW w AS (ORDER BY hs RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW))
SELECT h, CAST(n AS BIGINT) AS n_hours,
  CASE WHEN n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
    THEN round(CAST(n * sxy - sx * CAST(sy AS DECIMAL(12,0)) AS DOUBLE) /
      (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)) * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))), 4)
  END AS corr_xy
FROM win ORDER BY h""",

      // Inter-arrival quantiles: gaps in exact integral microseconds;
      // lag order totalized by (ts, event_id).
      "ts_interarrival_quantiles" ->
        s"""WITH g AS (
  SELECT user_id,
    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM ${T("events")} WHERE user_id IS NOT NULL)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
  CAST(min(gap_us) AS BIGINT) AS min_gap_us,
  round(quantile_cont(gap_us, 0.5), 2) AS p50_gap_us,
  round(quantile_cont(gap_us, 0.9), 2) AS p90_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY 1 ORDER BY user_id""",

      // Cohort retention: window-min first activity at DAY grain (the
      // corpus spans one month), exact integer day difference.
      "ts_cohort_retention" ->
        s"""WITH e AS (
  SELECT user_id,
    CAST(min(ts) OVER (PARTITION BY user_id) AS DATE) AS cohort,
    CAST(ts AS DATE) AS d_act
  FROM ${T("events")} WHERE user_id IS NOT NULL)
SELECT cohort AS cohort_day,
  CAST(date_diff('day', cohort, d_act) AS BIGINT) AS days_since,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY 1, 2 ORDER BY cohort_day, days_since""",

      "pipeline_dedup_rate_by_source" ->
        s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_uniq,
  round(1 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
FROM ${T("documents")} GROUP BY 1 ORDER BY source""",

      "pipeline_vocab_growth" ->
        s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM ${T("documents")})
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(count(DISTINCT w) AS BIGINT) AS n_types,
  round(CAST(count(DISTINCT w) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS ttr
FROM t WHERE w <> '' GROUP BY 1 ORDER BY source""",

      // TPC-H completion (round 6): the 11 remaining query shapes over
      // the reduced schema. "Late" (shipdate > orderdate + N days)
      // stands in for the missing commit/receipt dates; region names
      // stand in for shipmode / phone country codes; lineitem-derived
      // supplier-part volumes stand in for partsupp. Threshold
      // comparisons that would knife-edge in float are cross-multiplied
      // in DECIMAL (q11, q22) so both engines decide identically.
      "tpch_q4_shape" ->
        s"""SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM ${T("orders")} o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM ${T("lineitem")} l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1 ORDER BY 1""",

      "tpch_q6_shape" ->
        s"""SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM ${T("lineitem")}
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

      "tpch_q9_shape" ->
        s"""SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
    - CAST(0.6 AS DECIMAL(18,2)) * CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS profit
FROM ${T("lineitem")} l
JOIN ${T("part")} p ON l.l_partkey = p.p_partkey
JOIN ${T("supplier")} s ON l.l_suppkey = s.s_suppkey
JOIN ${T("nation")} n ON s.s_nationkey = n.n_nationkey
JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2 ORDER BY n_name, o_year""",

      "tpch_q11_shape" ->
        s"""WITH val AS (
  SELECT l.l_partkey, sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS v
  FROM ${T("lineitem")} l
  JOIN ${T("supplier")} s ON l.l_suppkey = s.s_suppkey
  JOIN ${T("nation")} n ON s.s_nationkey = n.n_nationkey
  JOIN ${T("region")} r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE' GROUP BY 1)
SELECT l_partkey, round(CAST(v AS DOUBLE), 2) AS value
FROM val WHERE v * (SELECT count(*) * 2 FROM val) > (SELECT sum(v) * 3 FROM val)
ORDER BY value DESC, l_partkey""",

      "tpch_q12_shape" ->
        s"""SELECT l.l_returnflag,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM ${T("lineitem")} l JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1""",

      "tpch_q13_shape" ->
        s"""WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS cc
  FROM ${T("customer")} c
  LEFT JOIN ${T("orders")} o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1)
SELECT CAST(cc AS BIGINT) AS c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",

      "tpch_q16_shape" ->
        s"""SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ${T("lineitem")} l JOIN ${T("part")} p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1,2,3,4,5,10,15,20)
  AND l.l_suppkey NOT IN (
    SELECT s.s_suppkey FROM ${T("supplier")} s
    JOIN ${T("nation")} n ON s.s_nationkey = n.n_nationkey
    JOIN ${T("region")} r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AFRICA')
GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

      "tpch_q17_shape" ->
        s"""SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM ${T("lineitem")} l
JOIN ${T("part")} p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM ${T("lineitem")} l2
                      WHERE l2.l_partkey = l.l_partkey)""",

      "tpch_q20_shape" ->
        s"""SELECT s.s_name, n.n_name
FROM ${T("supplier")} s JOIN ${T("nation")} n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey FROM ${T("lineitem")} l
  JOIN ${T("part")} p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%widget%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(l.l_quantity) > 75)
ORDER BY s_name""",

      "tpch_q21_shape" ->
        s"""SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM ${T("supplier")} s
JOIN ${T("lineitem")} l1 ON s.s_suppkey = l1.l_suppkey
JOIN ${T("orders")} o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM ${T("lineitem")} l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM ${T("lineitem")} l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1 ORDER BY numwait DESC, s_name""",

      "tpch_q22_shape" ->
        s"""WITH pos AS (
  SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM ${T("customer")} WHERE c_acctbal > 0),
rich AS (
  SELECT r.r_name AS cntrygrp, c.c_custkey, c.c_acctbal
  FROM ${T("customer")} c
  JOIN ${T("nation")} n ON c.c_nationkey = n.n_nationkey
  JOIN ${T("region")} r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name IN ('ASIA','EUROPE','AFRICA')
    AND CAST(c.c_acctbal AS DECIMAL(18,2)) * (SELECT count(*) FROM pos) > (SELECT sum(bal) FROM pos))
SELECT cntrygrp, CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
FROM rich
WHERE NOT EXISTS (SELECT 1 FROM ${T("orders")} o
                  WHERE o.o_custkey = rich.c_custkey AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1 ORDER BY cntrygrp""",

      // base64 roundtrip: both engines emit unwrapped RFC-4648.
      "fn_base64_roundtrip" ->
        s"""SELECT s_suppkey,
  to_base64(encode(s_name)) AS b64,
  decode(from_base64(to_base64(encode(s_name)))) = s_name AS roundtrip_ok,
  CAST(length(to_base64(encode(s_name))) AS BIGINT) AS b64_len
FROM ${T("supplier")}
ORDER BY s_suppkey""",

      // ---- round 7 ----

      // Benford: digit extracted in EXACT arithmetic (DECIMAL*100 ->
      // BIGINT -> first char); float log10-of-value or double->BIGINT
      // casts would diverge between engines (round vs truncate).
      "agg_benford_first_digit" ->
        s"""WITH li AS (
  SELECT CAST(substr(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM ${T("lineitem")} WHERE l_extendedprice > 0),
tot AS (SELECT count(*) AS n_tot FROM li)
SELECT digit, CAST(count(*) AS BIGINT) AS n,
  round(CAST(count(*) AS DOUBLE) / n_tot, 6) AS share,
  round(log10(1.0 + 1.0 / digit), 6) AS benford_expect
FROM li, tot GROUP BY digit, n_tot ORDER BY digit""",

      // Degree octaves via pure integer CASE thresholds (no float
      // log2 whose exact-power boundaries could round differently).
      "graph_degree_distribution" ->
        s"""$E,
deg AS (SELECT s AS v, count(*) AS deg FROM ud GROUP BY 1),
oct AS (SELECT v, deg,
  (CASE ${(20 to 1 by -1).map(b => s"WHEN deg >= ${1L << b} THEN $b").mkString(" ")} ELSE 0 END) AS octave
  FROM deg)
SELECT octave, CAST(count(*) AS BIGINT) AS n_nodes,
  CAST(min(deg) AS BIGINT) AS min_deg, CAST(max(deg) AS BIGINT) AS max_deg
FROM oct GROUP BY 1 ORDER BY octave""",

      // Sweep-line session concurrency: starts before ends at the
      // same instant; tie order inside an equal (t, kind) group is
      // irrelevant (same-sign deltas -> group extremum is order-free).
      "ts_peak_concurrency" ->
        s"""WITH ev AS (SELECT user_id, ts, event_id FROM ${T("events")} WHERE user_id IS NOT NULL),
m AS (SELECT user_id, ts, event_id,
  CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
       THEN 1 ELSE 0 END AS new_s
  FROM ev),
sid AS (SELECT user_id, ts,
  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM m),
sess AS (SELECT user_id, sid, min(ts) AS s_ts, max(ts) AS e_ts FROM sid GROUP BY 1, 2),
points AS (
  SELECT s_ts AS t, 0 AS kind, 1 AS delta FROM sess
  UNION ALL
  SELECT e_ts AS t, 1 AS kind, -1 AS delta FROM sess),
sweep AS (SELECT t, kind,
  sum(delta) OVER (ORDER BY t, kind ROWS UNBOUNDED PRECEDING) AS running
  FROM points)
SELECT CAST(t AS DATE) AS day,
  CAST(max(running) AS BIGINT) AS peak_concurrency,
  CAST(sum(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS BIGINT) AS sessions_started
FROM sweep GROUP BY 1 ORDER BY day""",

      // Trailing 10-min RANGE frame on epoch micros (peers at the
      // boundary included identically), reduced to the per-user max.
      "ts_burst_10min" ->
        s"""WITH ev AS (SELECT user_id, ts FROM ${T("events")} WHERE user_id IS NOT NULL),
b AS (SELECT user_id,
  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS burst
  FROM ev)
SELECT user_id, CAST(max(burst) AS BIGINT) AS peak_burst_10min,
  CAST(count(*) AS BIGINT) AS n_events
FROM b GROUP BY 1 ORDER BY user_id""",

      // Bigram MLE LM: c12/c1 both exact counts over the same bigram
      // relation; per-bigram logprobs quantized by floor(lp*1e6) to
      // BIGINT before the per-doc sum — exact integer arithmetic,
      // order-insensitive and engine-independent (round(x,6) diverged
      // at the sf0.1 knife edge in round 6; see Pipelines scaladoc).
      "pipeline_bigram_logprob" ->
        s"""WITH pos AS (
  SELECT doc_id, l, generate_subscripts(l, 1) AS i
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM ${T("documents")})),
big AS (SELECT doc_id, l[i] AS w1, l[i + 1] AS w2 FROM pos WHERE i < len(l)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
lp AS (SELECT w1, w2,
  CAST(floor(ln(CAST(c12 AS DOUBLE) / c1) * 1e6) AS BIGINT) AS lp6
  FROM c12 JOIN c1 USING (w1))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
  round(CAST(sum(lp6) AS BIGINT) / CAST(count(*) AS DOUBLE) / 1e6, 4) AS avg_logprob
FROM big JOIN lp USING (w1, w2)
GROUP BY doc_id ORDER BY doc_id""",

      // Adjacent-pair embedding QA: per-pair cosine floor-quantized
      // to BIGINT q = floor(sim*1e4) (floor of the same double is
      // engine-independent; round(x,4) is not); bucket and average
      // derive from exact integers in the same double op order.
      "sim_adjacent_cosine" ->
        s"""WITH pairs AS (
  SELECT CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 1e4) AS BIGINT) AS q
  FROM ${T("embeddings")} a JOIN ${T("embeddings")} b ON b.vec_id = a.vec_id + 1)
SELECT CAST(floor(q / 1000.0) AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(q) AS DOUBLE) / count(*) / 1e4 AS avg_sim
FROM pairs GROUP BY 1 ORDER BY bucket""",

      // HHI = sum(n_i^2)/N^2 — both terms exact BIGINTs, ONE double
      // division on identical operands (no per-share rounding).
      "agg_hhi" ->
        s"""WITH seg AS (
  SELECT n.n_name, c.c_mktsegment, count(*) AS n
  FROM ${T("customer")} c JOIN ${T("nation")} n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2)
SELECT n_name, CAST(sum(n) AS BIGINT) AS n_customers,
  CAST(count(*) AS BIGINT) AS n_segments,
  round(CAST(sum(n * n) AS DOUBLE) / CAST(sum(n) * sum(n) AS DOUBLE), 6) AS hhi
FROM seg GROUP BY 1 ORDER BY n_name""",

      // Char-level Shannon entropy: exact per-char counts; each
      // c*ln(c) term rounded to DECIMAL(18,6) before the
      // order-insensitive sum (alphabets are larger than
      // agg_entropy's 5 groups, so raw double sums are not trusted).
      "text_char_entropy" ->
        s"""WITH c AS (
  SELECT doc_id, ch, count(*) AS n
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM ${T("documents")} WHERE doc_id % 11 = 0)
  GROUP BY 1, 2)
SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
  CAST(count(*) AS BIGINT) AS n_distinct_chars,
  round(ln(CAST(sum(n) AS DOUBLE)) -
    CAST(sum(CAST(round(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6))) AS DOUBLE) /
      CAST(sum(n) AS DOUBLE), 4) AS char_entropy
FROM c GROUP BY 1 ORDER BY doc_id""",

      // Same marker/vote construction as pipeline_lang_id; margin is a
      // BIGINT subtraction of the top-2 hit counts.
      "pipeline_lang_margin" ->
        s"""WITH tok AS (
  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")}),
tk AS (SELECT doc_id, lang, w FROM tok WHERE w <> ''),
freq AS (SELECT lang, w, count(*) AS df FROM tk GROUP BY 1, 2),
markers AS (
  SELECT lang AS mlang, w FROM (
    SELECT lang, w, row_number() OVER (PARTITION BY lang ORDER BY df DESC, w) AS rn
    FROM freq) WHERE rn <= 5),
votes AS (
  SELECT tk.doc_id, m.mlang, count(*) AS hits
  FROM tk JOIN markers m ON tk.w = m.w
  GROUP BY 1, 2),
ranked AS (
  SELECT doc_id, hits,
    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, mlang) AS rn
  FROM votes)
SELECT doc_id,
  CAST(max(CASE WHEN rn = 1 THEN hits END) AS BIGINT) AS best_hits,
  CAST(coalesce(max(CASE WHEN rn = 2 THEN hits END), 0) AS BIGINT) AS second_hits,
  CAST(max(CASE WHEN rn = 1 THEN hits END) -
       coalesce(max(CASE WHEN rn = 2 THEN hits END), 0) AS BIGINT) AS margin
FROM ranked WHERE rn <= 2 AND doc_id % 3 = 0
GROUP BY doc_id ORDER BY doc_id""",

      // DAU / trailing-7d WAU / stickiness: WAU is a DISTINCT over the
      // window (computed via a day-grid range join at day grain), not
      // a sum of dailies.
      "ts_active_users_rolling" ->
        s"""WITH pairs AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
  FROM ${T("events")} WHERE user_id IS NOT NULL),
dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY 1),
wau AS (
  SELECT g.day AS g_day, count(DISTINCT p.user_id) AS wau
  FROM (SELECT day FROM dau) g JOIN pairs p
    ON p.day <= g.day AND p.day >= g.day - 6
  GROUP BY 1)
SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
  round(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 4) AS stickiness
FROM dau d JOIN wau w ON d.day = w.g_day
ORDER BY d.day""",

      // Daily purchase revenue + day-over-day percent change; revenue
      // is an exact DECIMAL sum cast once, growth runs on those
      // identical operands (first day NULL).
      "ts_daily_revenue_growth" ->
        s"""WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
    sum(CAST(value AS DECIMAL(18,2))) AS rev_d, count(*) AS n
  FROM ${T("events")}
  WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1)
SELECT day, CAST(n AS BIGINT) AS n_purchases,
  round(CAST(rev_d AS DOUBLE), 2) AS revenue,
  round((CAST(rev_d AS DOUBLE) - CAST(lag(rev_d) OVER (ORDER BY day) AS DOUBLE)) /
    CAST(lag(rev_d) OVER (ORDER BY day) AS DOUBLE) * 100, 4) AS growth_pct
FROM daily ORDER BY day""",

      // Strong-edge multiplicity histogram; share divides exact counts.
      "graph_edge_weight_distribution" ->
        s"""$E,
tot AS (SELECT count(*) AS tot_edges FROM e)
SELECT CAST(w AS BIGINT) AS weight, CAST(count(*) AS BIGINT) AS n_edges,
  round(CAST(count(*) AS DOUBLE) / tot_edges, 6) AS share
FROM e, tot GROUP BY w, tot_edges ORDER BY weight""",

      // Tukey fences rounded at 2 BEFORE comparison (2-dp prices vs
      // 2-dp bounds — no interpolated-ulp knife edge).
      "agg_iqr_outliers" ->
        s"""WITH f AS (
  SELECT o_orderstatus AS f_status,
    round(quantile_cont(o_totalprice, 0.25), 2) AS q1,
    round(quantile_cont(o_totalprice, 0.75), 2) AS q3
  FROM ${T("orders")} GROUP BY 1),
f2 AS (SELECT f_status, q1, q3, round(q3 - q1, 2) AS iqr,
  round(q1 - (q3 - q1) * 1.5, 2) AS lo,
  round(q3 + (q3 - q1) * 1.5, 2) AS hi FROM f)
SELECT o.o_orderstatus, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN o.o_totalprice < f2.lo OR o.o_totalprice > f2.hi
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  round(min(f2.q1), 2) AS q1, round(min(f2.q3), 2) AS q3,
  round(min(f2.iqr), 2) AS iqr
FROM ${T("orders")} o JOIN f2 ON o.o_orderstatus = f2.f_status
GROUP BY 1 ORDER BY 1""",

      // Per-source length percentiles: exact int counts, interpolated
      // identically (quantile_cont == percentile).
      "pipeline_length_percentiles" ->
        s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  round(quantile_cont(len, 0.5), 2) AS p50_tokens,
  round(quantile_cont(len, 0.95), 2) AS p95_tokens,
  CAST(min(len) AS BIGINT) AS min_tokens,
  CAST(max(len) AS BIGINT) AS max_tokens
FROM (SELECT source, len(string_split(text, ' ')) AS len FROM ${T("documents")})
GROUP BY source ORDER BY source""",

      // L2-norm audit: per-row sequential fold over the same 64 floats
      // in both engines, floor-quantized to BIGINT micro-norms
      // floor(norm*1e6); every statistic derives from exact integers
      // (the unit-band test is pure integer arithmetic).
      "sim_norm_audit" ->
        s"""WITH nrm AS (
  SELECT CAST(floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(embedding AS DOUBLE[]))) * 1e6) AS BIGINT) AS q
  FROM ${T("embeddings")})
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
  CAST(min(q) AS DOUBLE) / 1e6 AS min_norm, CAST(max(q) AS DOUBLE) / 1e6 AS max_norm,
  CAST(sum(q) AS DOUBLE) / count(*) / 1e6 AS avg_norm,
  CAST(sum(CASE WHEN abs(q - 1000000) > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonunit
FROM nrm""",

      // Same sessionization CTE as ts_peak_concurrency; durations are
      // exact integral µs.
      "ts_session_duration_stats" ->
        s"""WITH ev AS (SELECT user_id, ts, event_id FROM ${T("events")} WHERE user_id IS NOT NULL),
m AS (SELECT user_id, ts, event_id,
  CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
       THEN 1 ELSE 0 END AS new_s
  FROM ev),
sid AS (SELECT user_id, ts,
  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM m),
sess AS (SELECT user_id, sid, min(ts) AS s_ts,
  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
  FROM sid GROUP BY 1, 2)
SELECT CAST(s_ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_sessions,
  round(CAST(sum(dur_us) AS DOUBLE) / count(*) / 1e6, 3) AS avg_duration_sec,
  round(CAST(max(dur_us) AS DOUBLE) / 1e6, 3) AS max_duration_sec,
  round(CAST(sum(CASE WHEN dur_us = 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS singleton_share
FROM sess GROUP BY 1 ORDER BY day""",

      // Roundtrip contract: oracle computes from the ORIGINAL table
      // (like the csv/json/orc roundtrips) — the engine's partitioned
      // write+read must be an identity.
      "src_partitioned_roundtrip" ->
        s"""SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
  round(cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM ${T("events")} WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY day""",

      // Burn alert decided by exact integer cross-multiplication — no
      // float enters the boolean.
      "ts_error_rate_hourly" ->
        s"""WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n_all,
    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
  FROM ${T("events")} GROUP BY 1),
tot AS (SELECT sum(n_all) AS t_all, sum(n_err) AS t_err FROM hourly)
SELECT h, CAST(n_all AS BIGINT) AS n_all, CAST(n_err AS BIGINT) AS n_err,
  round(CAST(n_err AS DOUBLE) / n_all, 6) AS err_rate,
  (n_err * t_all > n_all * t_err * 2) AS burn_alert
FROM hourly, tot ORDER BY h""",

      // Forward-looking conditional min over the FOLLOWING frame:
      // seconds from each click to the user's next purchase.
      "ts_time_to_purchase" ->
        s"""WITH f AS (
  SELECT event_id, user_id, ts, event_type,
    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p_us
  FROM ${T("events")} WHERE user_id < 20 AND user_id IS NOT NULL)
SELECT event_id, user_id,
  round(CAST(next_p_us - epoch_us(ts) AS DOUBLE) / 1e6, 3) AS sec_to_purchase
FROM f WHERE event_type = 'click' ORDER BY event_id""",

      // Vocab Jaccard per language pair: ONE self-join of the distinct
      // (lang, token) relation; unions by inclusion-exclusion of exact
      // counts.
      "pipeline_vocab_overlap" ->
        s"""WITH lw AS (
  SELECT DISTINCT lang, w FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS w FROM ${T("documents")})
  WHERE w <> ''),
sizes AS (SELECT lang, count(*) AS sz FROM lw GROUP BY 1),
inter AS (
  SELECT a.lang AS l1, b.lang AS l2, count(*) AS inter
  FROM lw a JOIN lw b ON a.w = b.w AND a.lang < b.lang
  GROUP BY 1, 2)
SELECT l1, l2, CAST(inter AS BIGINT) AS common_tokens,
  round(CAST(inter AS DOUBLE) / CAST(s1.sz + s2.sz - inter AS DOUBLE), 6) AS vocab_jaccard
FROM inter JOIN sizes s1 ON s1.lang = inter.l1 JOIN sizes s2 ON s2.lang = inter.l2
ORDER BY l1, l2""",

      // ntile order totalized by the key; money through DECIMAL.
      "agg_decile_table" ->
        s"""WITH t AS (
  SELECT c_custkey, c_acctbal,
    ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
  FROM ${T("customer")})
SELECT decile, CAST(count(*) AS BIGINT) AS n,
  round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi,
  round(cast(sum(cast(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS balance
FROM t GROUP BY decile ORDER BY decile""",

      // The verified LSH pair set grouped by (source, source) endpoints.
      "pipeline_dedup_cross_source" ->
        s"""WITH ${minhashCtes(dir)},
vp AS (SELECT d1, d2
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE cast(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5),
lab AS (
  SELECT least(a.source, b.source) AS src_a, greatest(a.source, b.source) AS src_b
  FROM vp JOIN ${T("documents")} a ON a.doc_id = vp.d1
         JOIN ${T("documents")} b ON b.doc_id = vp.d2),
tot AS (SELECT count(*) AS tot_pairs FROM lab)
SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs,
  (src_a <> src_b) AS cross_source,
  round(CAST(count(*) AS DOUBLE) / tot_pairs, 4) AS share
FROM lab, tot GROUP BY src_a, src_b, tot_pairs ORDER BY src_a, src_b""",

      // ---- §2.18 (round 8) ----

      // Weekly seasonality: dow is DuckDB's 0=Sunday; share divides
      // exact counts once; revenue through the DECIMAL sum.
      "ts_dow_profile" ->
        s"""WITH b AS (SELECT dayofweek(ts) AS dow, count(*) AS n_events,
  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch,
  sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS rev
  FROM ${T("events")} GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM ${T("events")})
SELECT CAST(dow AS BIGINT) AS dow, CAST(n_events AS BIGINT) AS n_events,
  CAST(n_purch AS BIGINT) AS n_purchases,
  round(CAST(rev AS DOUBLE), 2) AS purchase_revenue,
  round(CAST(n_events AS DOUBLE) / n_total, 6) AS share
FROM b, tot ORDER BY dow""",

      "ts_day_hour_heatmap" ->
        s"""SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS h,
  count(*) AS n,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS v_sum
FROM ${T("events")} GROUP BY 1, 2 ORDER BY dow, h""",

      // DAU/MAU: both distinct counts exact; the two divisions run
      // left-to-right on identical operands.
      "ts_mau_stickiness" ->
        s"""WITH d AS (SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1),
pm AS (SELECT date_trunc('month', day) AS month,
  CAST(sum(dau) AS BIGINT) AS sum_dau, count(*) AS n_days FROM d GROUP BY 1),
m AS (SELECT date_trunc('month', CAST(ts AS DATE)) AS month,
  count(DISTINCT user_id) AS mau
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1)
SELECT pm.month, CAST(mau AS BIGINT) AS mau, CAST(n_days AS BIGINT) AS n_days,
  round(CAST(sum_dau AS DOUBLE) / n_days, 2) AS avg_dau,
  round(CAST(sum_dau AS DOUBLE) / n_days / mau, 6) AS stickiness
FROM pm JOIN m USING (month) ORDER BY month""",

      // Lag-1 pairs via day+1 equi-join (missing days break pairs in
      // both engines); Pearson r on exact DECIMAL power sums cast once
      // into one fixed double tree (ts_rolling_corr discipline).
      "ts_autocorr_lag1" ->
        s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
  sum(CAST(value AS DECIMAL(18,2))) AS rev
  FROM ${T("events")} WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1),
p AS (SELECT a.rev AS x, b.rev AS y FROM daily a JOIN daily b ON a.day = b.day + 1),
s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
  sum(CAST(x * y AS DECIMAL(38,4))) AS sxy,
  sum(CAST(x * x AS DECIMAL(38,4))) AS sxx,
  sum(CAST(y * y AS DECIMAL(38,4))) AS syy FROM p)
SELECT CAST(n AS BIGINT) AS n_pairs,
  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
    (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
     sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
    AS autocorr_lag1
FROM s""",

      // Robust anomaly fences: two-pass median/MAD (agg_mad recipe) on
      // the 2dp-rounded daily revenue; single fused constant 4.4478.
      "ts_anomaly_mad" ->
        s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev
  FROM ${T("events")} WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1),
m AS (SELECT median(rev) AS med FROM daily),
md AS (SELECT max(med) AS med, median(abs(rev - med)) AS mad FROM daily, m)
SELECT day, rev AS revenue,
  CAST(abs(CAST(rev AS DECIMAL(18,3)) - CAST(med AS DECIMAL(18,3))) AS DOUBLE)
    AS abs_dev,
  (abs(rev - med) > mad * 4.4478) AS is_anomaly
FROM daily, md ORDER BY day""",

      "ts_user_lifecycle" ->
        s"""SELECT user_id, min(CAST(ts AS DATE)) AS first_day,
  max(CAST(ts AS DATE)) AS last_day,
  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
  count(*) AS n_events,
  CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS BIGINT)
    AS span_days
FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1 ORDER BY user_id""",

      // p99 threshold interpolates on identical 2dp doubles (the
      // agg_iqr contract); the share divides two DECIMAL-exact sums.
      "agg_top1pct_share" ->
        s"""WITH rev AS (SELECT o_custkey,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev
  FROM ${T("orders")} GROUP BY 1),
t AS (SELECT quantile_cont(rev, 0.99) AS thr FROM rev)
SELECT count(*) AS n_customers,
  CAST(sum(CASE WHEN rev >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
  round(CAST(sum(CASE WHEN rev >= thr THEN CAST(rev AS DECIMAL(18,2)) END) AS DOUBLE) /
    CAST(sum(CAST(rev AS DECIMAL(18,2))) AS DOUBLE), 6) AS top_share
FROM rev, t""",

      // Bucket ids from exact/identical arithmetic before floor.
      "agg_hist2d" ->
        s"""SELECT CAST(floor((l_quantity - 1) / 10) AS BIGINT) AS q_band,
  CAST(floor(l_extendedprice / 20000) AS BIGINT) AS p_band,
  count(*) AS n,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM ${T("lineitem")} GROUP BY 1, 2 ORDER BY q_band, p_band""",

      "agg_null_profile" ->
        s"""SELECT 'event_type' AS col_name, count(*) AS n_rows,
  CAST(count(*) - count(event_type) AS BIGINT) AS n_null,
  CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct FROM ${T("events")}
UNION ALL
SELECT 'user_id', count(*), CAST(count(*) - count(user_id) AS BIGINT),
  CAST(count(DISTINCT user_id) AS BIGINT) FROM ${T("events")}
UNION ALL
SELECT 'value', count(*), CAST(count(*) - count(value) AS BIGINT),
  CAST(count(DISTINCT value) AS BIGINT) FROM ${T("events")}
ORDER BY col_name""",

      "agg_dup_key_audit" ->
        s"""WITH k AS (SELECT o_custkey, o_orderdate, count(*) AS k
  FROM ${T("orders")} GROUP BY 1, 2)
SELECT count(*) AS n_keys,
  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
  CAST(sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT) AS dup_rows,
  CAST(max(k) AS BIGINT) AS max_multiplicity
FROM k""",

      // price x quantity products stay exact DECIMAL on BOTH sides
      // (decimal x double would silently go double and order-sensitive).
      "agg_weighted_avg" ->
        s"""SELECT l_returnflag,
  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) /
    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS wavg_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)
    AS avg_price,
  count(*) AS n
FROM ${T("lineitem")} GROUP BY 1 ORDER BY l_returnflag""",

      // bool_and/bool_or skip NULL inputs identically in both engines.
      "agg_bool_logic" ->
        s"""SELECT event_type, bool_and(value > 0.0) AS every_pos,
  bool_or(value > 90.0) AS some_high,
  CAST(sum(CASE WHEN value > 90.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
  CAST(count(value) AS BIGINT) AS n_valued
FROM ${T("events")} GROUP BY 1 ORDER BY event_type""",

      // Forward as-of: the oracle runs the portable range-join +
      // re-aggregate form (min over qualifying purchases); the engine
      // runs the linear min-over-following window.
      "join_asof_forward" ->
        s"""WITH c AS (SELECT event_id, user_id, ts FROM ${T("events")}
  WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL),
p AS (SELECT user_id, ts FROM ${T("events")}
  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL)
SELECT c.event_id, c.user_id, min(p.ts) AS next_purchase_ts
FROM c JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts
GROUP BY 1, 2 ORDER BY event_id""",

      // Rolling mean/sigma from exact DECIMAL frame power sums; n=1
      // rows yield NULL sd/flag via an explicit guard in both engines.
      "win_rolling_band" ->
        s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
  sum(CAST(value AS DECIMAL(18,2))) AS rev
  FROM ${T("events")} WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1),
s AS (SELECT day, rev, count(*) OVER w AS n, sum(rev) OVER w AS sx,
  sum(CAST(rev * rev AS DECIMAL(38,4))) OVER w AS sxx
  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT day, round(CAST(rev AS DOUBLE), 2) AS revenue, CAST(n AS BIGINT) AS n_days,
  round(CAST(sx AS DOUBLE) / n, 2) AS mean7,
  CASE WHEN n > 1 THEN round(sqrt((n * CAST(sxx AS DOUBLE) -
    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (n * (n - 1))), 4) END AS sd7,
  CASE WHEN n > 1 THEN CAST(rev AS DOUBLE) > CAST(sx AS DOUBLE) / n +
    sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
      (n * (n - 1))) * 2 END AS breakout_hi
FROM s ORDER BY day""",

      // Bucket is pure integer arithmetic — no float round on a
      // boundary (see Pipelines.pipelineTtr scaladoc).
      "pipeline_ttr" ->
        s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")}),
pd AS (SELECT doc_id, count(*) AS n_tok, count(DISTINCT w) AS n_distinct
  FROM t GROUP BY 1)
SELECT (10 * n_distinct) // n_tok AS bucket, count(*) AS n_docs,
  round(CAST(sum(n_tok) AS DOUBLE) / count(*), 2) AS avg_tokens
FROM pd GROUP BY 1 ORDER BY bucket""",

      // H(w2|w1) = (S1 - S12)/N; each c*ln(c) term floor-quantized to
      // BIGINT before the order-insensitive integer sum.
      "pipeline_bigram_cond_entropy" ->
        s"""WITH pos AS (SELECT doc_id, l, generate_subscripts(l, 1) AS i
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM ${T("documents")})),
big AS (SELECT l[i] AS w1, l[i + 1] AS w2 FROM pos WHERE i < len(l)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
s12 AS (SELECT CAST(sum(CAST(floor(CAST(c12 AS DOUBLE) * ln(CAST(c12 AS DOUBLE)) * 1e6)
    AS BIGINT)) AS BIGINT) AS s12,
  CAST(sum(c12) AS BIGINT) AS n, count(*) AS n_types FROM c12),
s1 AS (SELECT CAST(sum(CAST(floor(CAST(c1 AS DOUBLE) * ln(CAST(c1 AS DOUBLE)) * 1e6)
    AS BIGINT)) AS BIGINT) AS s1, count(*) AS n_contexts FROM c1)
SELECT n AS n_bigrams, CAST(n_types AS BIGINT) AS n_bigram_types,
  CAST(n_contexts AS BIGINT) AS n_contexts,
  round(CAST(s1 - s12 AS DOUBLE) / 1e6 / n, 6) AS cond_entropy
FROM s12, s1""",

      // Verified-pair degree histogram over the shared LSH pair set.
      "pipeline_dup_degree_distribution" ->
        s"""WITH ${minhashCtes(dir)},
vp AS (SELECT d1, d2
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE cast(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5),
ud AS (SELECT d1 FROM vp UNION ALL SELECT d2 FROM vp),
deg AS (SELECT d1, count(*) AS degree FROM ud GROUP BY 1)
SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_docs
FROM deg GROUP BY 1 ORDER BY degree""",

      // PMI over the top-40 df tokens (ties lexicographic); counts
      // exact, one double tree rounded at 4.
      "pipeline_pmi_top" ->
        s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")}),
td AS (SELECT DISTINCT doc_id, w FROM t),
df AS (SELECT w, count(*) AS df FROM td GROUP BY 1),
top AS (SELECT w, df FROM df ORDER BY df DESC, w LIMIT 40),
n AS (SELECT count(*) AS n_docs FROM ${T("documents")}),
tt AS (SELECT td.doc_id, td.w, top.df FROM td JOIN top USING (w)),
p AS (SELECT a.w AS w1, b.w AS w2, count(*) AS c_ab,
  max(a.df) AS df_a, max(b.df) AS df_b
  FROM tt a JOIN tt b ON a.doc_id = b.doc_id AND a.w < b.w GROUP BY 1, 2)
SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab, CAST(df_a AS BIGINT) AS df_a,
  CAST(df_b AS BIGINT) AS df_b,
  round(ln(CAST(n_docs * c_ab AS DOUBLE) / (df_a * df_b)), 4) AS pmi
FROM p, n ORDER BY w1, w2""",

      "text_word_len_histogram" ->
        s"""WITH w0 AS (SELECT unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")}),
w2 AS (SELECT w FROM w0 WHERE w <> ''),
tot AS (SELECT count(*) AS n_total FROM w2)
SELECT CAST(length(w) AS BIGINT) AS len, count(*) AS n,
  CAST(count(DISTINCT w) AS BIGINT) AS n_types,
  round(CAST(count(*) AS DOUBLE) / n_total, 6) AS share
FROM w2, tot GROUP BY len, n_total ORDER BY len""",

      // Canonical s<t<u triangles, each contributing its 3 corners.
      "graph_triangle_participation" ->
        s"""$E,
tri AS (SELECT e1.s AS a, e1.t AS b, e2.t AS c
  FROM e e1 JOIN e e2 ON e2.s = e1.t JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t),
nodes AS (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri),
deg AS (SELECT v, count(*) AS n_tri FROM nodes GROUP BY 1)
SELECT CAST(n_tri AS BIGINT) AS n_triangles, count(*) AS n_nodes
FROM deg GROUP BY 1 ORDER BY n_triangles""",

      // Cardinalities only — Spark's set ops and DuckDB's list kernels
      // make different order promises; both sides dedup before len.
      "fn_array_setops" ->
        s"""SELECT vec_id,
  CAST(len(list_distinct(list_intersect(embedding[1:8], embedding[57:64])))
    AS BIGINT) AS n_inter,
  CAST(len(list_distinct(list_filter(embedding[1:8],
    x -> NOT list_contains(embedding[57:64], x)))) AS BIGINT) AS n_except,
  CAST(len(list_distinct(list_concat(embedding[1:8], embedding[57:64])))
    AS BIGINT) AS n_union,
  list_has_any(embedding[1:8], embedding[57:64]) AS overlap
FROM ${T("embeddings")} WHERE vec_id < 400 ORDER BY vec_id""",

      "fn_math2" ->
        s"""SELECT l_orderkey, l_linenumber,
  round(log2(l_extendedprice), 6) AS lg2,
  round(log10(l_extendedprice), 6) AS lg10,
  round(cbrt(l_quantity), 6) AS cbrt_q,
  CAST(sign(l_extendedprice - 50000.0) AS BIGINT) AS sgn,
  round(degrees(l_discount), 6) AS deg
FROM ${T("lineitem")} WHERE l_orderkey <= 800 ORDER BY l_orderkey, l_linenumber""",

      // ---- §2.18b (round 8, second batch) ----

      "agg_sequence_gaps" ->
        s"""SELECT CAST(min(o_orderkey) AS BIGINT) AS lo,
  CAST(max(o_orderkey) AS BIGINT) AS hi, count(*) AS n_rows,
  CAST(max(o_orderkey) - min(o_orderkey) + 1 - count(*) AS BIGINT) AS n_missing
FROM ${T("orders")}""",

      // Two-level rollup share: both sums exact DECIMAL, one division.
      "agg_share_of_parent" ->
        s"""WITH rev AS (
  SELECT r_name, n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM ${T("orders")} o
  JOIN ${T("customer")} c ON o.o_custkey = c.c_custkey
  JOIN ${T("nation")} n ON c.c_nationkey = n.n_nationkey
  JOIN ${T("region")} r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2),
p AS (SELECT r_name, sum(rev) AS r_rev FROM rev GROUP BY 1)
SELECT rev.r_name, n_name, round(CAST(rev AS DOUBLE), 2) AS revenue,
  round(CAST(rev AS DOUBLE) / CAST(r_rev AS DOUBLE), 6) AS share_of_region
FROM rev JOIN p ON rev.r_name = p.r_name ORDER BY rev.r_name, n_name""",

      "ts_new_vs_returning" ->
        s"""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1),
du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
  FROM ${T("events")} WHERE user_id IS NOT NULL)
SELECT day, count(*) AS n_active,
  CAST(sum(CASE WHEN first_day = day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
  CAST(count(*) - sum(CASE WHEN first_day = day THEN 1 ELSE 0 END) AS BIGINT)
    AS n_returning
FROM du JOIN f USING (user_id) GROUP BY 1 ORDER BY day""",

      // rank/dense_rank deterministic under ties by definition;
      // row_number totalized with the key columns.
      "win_rank_variants" ->
        s"""SELECT l_orderkey, l_linenumber, l_returnflag,
  CAST(l_quantity AS BIGINT) AS qty,
  CAST(rank() OVER wt AS BIGINT) AS rnk,
  CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
  CAST(row_number() OVER wo AS BIGINT) AS rn
FROM ${T("lineitem")} WHERE l_orderkey <= 300
WINDOW wt AS (PARTITION BY l_returnflag ORDER BY l_quantity),
  wo AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)
ORDER BY l_orderkey, l_linenumber""",

      // Running and total are both exact DECIMAL window sums; the
      // share divides identical operands.
      "win_group_cumshare" ->
        s"""SELECT o_orderkey, o_orderstatus, o_totalprice,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wr AS DOUBLE) /
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wa AS DOUBLE), 6)
    AS cum_share
FROM ${T("orders")} WHERE o_orderkey <= 5000
WINDOW wr AS (PARTITION BY o_orderstatus
    ORDER BY o_totalprice DESC, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  wa AS (PARTITION BY o_orderstatus
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_orderkey""",

      "pipeline_hapax_ratio" ->
        s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")}),
f AS (SELECT source, w, count(*) AS cnt FROM t GROUP BY 1, 2)
SELECT source, count(*) AS vocab,
  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
  CAST(sum(cnt) AS BIGINT) AS n_tokens,
  round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
    AS hapax_ratio
FROM f GROUP BY 1 ORDER BY source""",

      "fn_string3" ->
        s"""SELECT p_partkey,
  translate(p_name, 'aeiou', 'AEIOU') AS tr,
  CAST(ascii(substr(p_brand, 1, 1)) AS BIGINT) AS asc1,
  chr(CAST(p_partkey % 26 + 97 AS INTEGER)) AS key_chr,
  ends_with(p_name, 'e') AS ends_e
FROM ${T("part")} WHERE p_partkey <= 400 ORDER BY p_partkey""",

      // ---- §2.18c (round 8, third batch) ----

      // Gaps-islands on the distinct (user, day) relation: day minus
      // row_number is constant within a consecutive run. All exact.
      "ts_streak_longest" ->
        s"""WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM ${T("events")} WHERE user_id IS NOT NULL),
r AS (SELECT user_id, day,
  row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM du),
g AS (SELECT user_id, day - CAST(rn AS INTEGER) AS grp FROM r),
st AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
  CAST(max(len) AS BIGINT) AS longest_streak, count(*) AS n_streaks
FROM st GROUP BY 1 ORDER BY user_id""",

      // Slopes divide the exact-DECIMAL revenue diff (cast to DOUBLE)
      // by the integer day gap; the median is the exact interpolated
      // percentile over the calendar-bounded pair set.
      "ts_theil_sen" ->
        s"""WITH dl AS (SELECT CAST(o_orderdate AS DATE) AS day,
  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM ${T("orders")} WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    AND o_orderdate < TIMESTAMP '1999-01-01' GROUP BY 1),
p AS (SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.day - a.day) AS slope
  FROM dl a JOIN dl b ON b.day > a.day)
SELECT CAST((SELECT count(*) FROM dl) AS BIGINT) AS n_days,
  count(*) AS n_pairs, round(median(slope), 6) AS ts_slope FROM p""",

      // Exact DECIMAL month sums; pct change divides identical doubles.
      "ts_mom_growth" ->
        s"""WITH m AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
  o_orderpriority AS pri, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM ${T("orders")} GROUP BY 1, 2),
l AS (SELECT CAST(mon AS DATE) AS mon, pri, rev,
  lag(rev) OVER (PARTITION BY pri ORDER BY mon) AS prev FROM m)
SELECT mon, pri, round(CAST(rev AS DOUBLE), 2) AS rev,
  round(CAST(prev AS DOUBLE), 2) AS prev_rev,
  round((CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE)) / CAST(prev AS DOUBLE), 6)
    AS mom
FROM l ORDER BY pri, mon""",

      // Per-cell (O-E)^2/E terms floor-quantized to BIGINT before the
      // cross-cell sum (the bigram_logprob recipe); dow 0=Sunday.
      "agg_chi2_dow" ->
        s"""WITH c AS (SELECT event_type, dayofweek(ts) AS dow, count(*) AS o
  FROM ${T("events")} GROUP BY 1, 2),
tot AS (SELECT sum(o) AS n FROM c),
rt AS (SELECT event_type, sum(o) AS r FROM c GROUP BY 1),
ct AS (SELECT dow, sum(o) AS cl FROM c GROUP BY 1),
cells AS (SELECT c.o,
    CAST(rt.r AS DOUBLE) * CAST(ct.cl AS DOUBLE) / CAST(tot.n AS DOUBLE) AS e
  FROM c JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tot),
terms AS (SELECT CAST(floor((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
    / e * 1000000) AS BIGINT) AS t6 FROM cells)
SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n,
  (SELECT count(*) FROM rt) AS n_types, (SELECT count(*) FROM ct) AS n_dows,
  CAST(sum(t6) AS BIGINT) AS chi2_q6,
  round(sqrt(CAST(sum(t6) AS DOUBLE) / 1e6 /
    ((SELECT CAST(n AS DOUBLE) FROM tot) *
     least((SELECT count(*) FROM rt) - 1, (SELECT count(*) FROM ct) - 1))), 6)
    AS cramers_v
FROM terms""",

      // Counts exact; lift is one double tree on identical operands.
      "agg_basket_pairs" ->
        s"""WITH ob AS (SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
  FROM ${T("lineitem")} l JOIN ${T("part")} p ON l.l_partkey = p.p_partkey),
n AS (SELECT b, count(*) AS nb FROM ob GROUP BY 1),
tot AS (SELECT count(DISTINCT o) AS n_orders FROM ob),
pairs AS (SELECT a.b AS b1, c.b AS b2, count(*) AS n_pair
  FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b GROUP BY 1, 2)
SELECT b1, b2, CAST(n_pair AS BIGINT) AS n_pair,
  round(CAST(n_pair AS DOUBLE) * CAST(tot.n_orders AS DOUBLE) /
        (CAST(x.nb AS DOUBLE) * CAST(y.nb AS DOUBLE)), 6) AS lift
FROM pairs JOIN n x ON x.b = pairs.b1 JOIN n y ON y.b = pairs.b2 CROSS JOIN tot
WHERE n_pair >= 5 ORDER BY b1, b2""",

      // ntile(5) totalized by custkey on each RFM axis (identical
      // first-groups-get-the-remainder definition in both engines);
      // the Spark side routes all three through GlobalRank.
      "agg_rfm_segments" ->
        s"""WITH m AS (SELECT o_custkey AS c, max(CAST(o_orderdate AS DATE)) AS last_day,
  count(*) AS freq, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
  FROM ${T("orders")} GROUP BY 1),
mx AS (SELECT max(last_day) AS anchor FROM m),
b AS (SELECT c, (SELECT anchor FROM mx) - last_day AS rec_days, freq, mon FROM m),
q AS (SELECT c, mon,
  ntile(5) OVER (ORDER BY rec_days, c) AS r_q,
  ntile(5) OVER (ORDER BY freq DESC, c) AS f_q,
  ntile(5) OVER (ORDER BY mon DESC, c) AS m_q FROM b)
SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
  CAST(m_q AS BIGINT) AS m_q, count(*) AS n_customers,
  floor(CAST(sum(mon) AS DOUBLE) / count(*) * 100) / 100 AS avg_monetary
FROM q GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""",

      // Running purchase extremum behind and ahead of every click in
      // the (ts, is_p, event_id)-totalized per-user frame; gap in
      // exact integer microseconds (no division semantics to match).
      "join_asof_nearest" ->
        s"""WITH u AS (
  SELECT user_id, ts, event_id, 0 AS is_p FROM ${T("events")}
    WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL
  UNION ALL
  SELECT user_id, ts, event_id, 1 FROM ${T("events")}
    WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL),
w AS (SELECT user_id, ts, event_id, is_p,
  max(CASE WHEN is_p = 1 THEN ts END) OVER (PARTITION BY user_id
    ORDER BY ts, is_p, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
  min(CASE WHEN is_p = 1 THEN ts END) OVER (PARTITION BY user_id
    ORDER BY ts, is_p, event_id
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
  FROM u)
SELECT event_id, user_id, ts,
  CASE WHEN prev_p IS NULL THEN next_p
       WHEN next_p IS NULL THEN prev_p
       WHEN epoch_us(ts) - epoch_us(prev_p) <= epoch_us(next_p) - epoch_us(ts)
         THEN prev_p ELSE next_p END AS nearest_purchase,
  CASE WHEN prev_p IS NULL THEN epoch_us(next_p) - epoch_us(ts)
       WHEN next_p IS NULL THEN epoch_us(ts) - epoch_us(prev_p)
       ELSE least(epoch_us(ts) - epoch_us(prev_p),
                  epoch_us(next_p) - epoch_us(ts)) END AS gap_us
FROM w WHERE is_p = 0 ORDER BY event_id""",

      // Peak and gap are exact DECIMAL window arithmetic.
      "win_drawdown" ->
        s"""WITH dl AS (SELECT CAST(o_orderdate AS DATE) AS day,
  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM ${T("orders")} GROUP BY 1),
w AS (SELECT day, rev, max(rev) OVER (ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak FROM dl)
SELECT day, round(CAST(rev AS DOUBLE), 2) AS rev,
  round(CAST(peak AS DOUBLE), 2) AS peak,
  round(CAST(peak - rev AS DOUBLE), 2) AS drawdown
FROM w ORDER BY day""",

      // rank() <= 3 keeps boundary ties (ANSI WITH TIES); ranked on
      // price bucketed to the nearest 1,000 so ties genuinely occur.
      "win_top_with_ties" ->
        s"""WITH r AS (SELECT o_orderstatus, o_orderkey,
  CAST(o_totalprice AS DECIMAL(18,2)) AS price,
  rank() OVER (PARTITION BY o_orderstatus ORDER BY
    CAST(round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) / 1000, 0)
      AS BIGINT) DESC) AS rnk
  FROM ${T("orders")})
SELECT o_orderstatus, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
  round(CAST(price AS DOUBLE), 2) AS price
FROM r WHERE rnk <= 3 ORDER BY o_orderstatus, rnk, o_orderkey""",

      // Per-token JSD terms floor-quantized to BIGINT at 1e12 before
      // the cross-token sum; the pair grid is sources^2 x vocab.
      "pipeline_js_divergence" ->
        s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")}),
f AS (SELECT source, w, count(*) AS c FROM t GROUP BY 1, 2),
tt AS (SELECT source, sum(c) AS n FROM f GROUP BY 1),
p AS (SELECT f.source, w, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p
  FROM f JOIN tt USING (source)),
pairs AS (SELECT a.source AS s1, b.source AS s2
  FROM tt a JOIN tt b ON a.source < b.source),
vocab AS (SELECT DISTINCT w FROM f),
grid AS (SELECT s1, s2, w FROM pairs CROSS JOIN vocab),
pr AS (SELECT grid.s1, grid.s2, coalesce(pa.p, 0) AS pa, coalesce(pb.p, 0) AS pb
  FROM grid LEFT JOIN p pa ON pa.source = grid.s1 AND pa.w = grid.w
            LEFT JOIN p pb ON pb.source = grid.s2 AND pb.w = grid.w),
terms AS (SELECT s1, s2,
  CAST(floor((CASE WHEN pa > 0 THEN 0.5*pa*ln(pa/((pa+pb)/2)) ELSE 0 END +
              CASE WHEN pb > 0 THEN 0.5*pb*ln(pb/((pa+pb)/2)) ELSE 0 END)
    * 1e12) AS BIGINT) AS t12
  FROM pr)
SELECT s1, s2, CAST(sum(t12) AS BIGINT) AS jsd_q12,
  round(CAST(sum(t12) AS DOUBLE) / 1e12, 6) AS jsd
FROM terms GROUP BY 1, 2 ORDER BY s1, s2""",

      // Counts exact; coverage divides identical doubles; the rank
      // runs over the vocab-bounded relation.
      "pipeline_top_token_coverage" ->
        s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")}),
f AS (SELECT w, count(*) AS c FROM t GROUP BY 1),
tot AS (SELECT sum(c) AS n FROM f),
r AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM f),
ks AS (SELECT unnest([1, 5, 10, 20, 50]) AS k)
SELECT CAST(k AS BIGINT) AS k,
  CAST(sum(CASE WHEN rk <= k THEN c ELSE 0 END) AS BIGINT) AS covered,
  round(CAST(sum(CASE WHEN rk <= k THEN c ELSE 0 END) AS DOUBLE) /
    (SELECT CAST(n AS DOUBLE) FROM tot), 6) AS coverage
FROM r CROSS JOIN ks GROUP BY k ORDER BY k""",

      // Both engines truncate weeks to Monday and number weeks
      // ISO-style; outputs normalized to DATE/BIGINT.
      "fn_date3" ->
        s"""SELECT o_orderkey, CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
  CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS wk,
  CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS qstart,
  last_day(CAST(o_orderdate AS DATE)) AS eom,
  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
  CAST(weekofyear(o_orderdate) AS BIGINT) AS woy
FROM ${T("orders")} WHERE o_orderkey <= 300 ORDER BY o_orderkey""",

      // ---- §2.18d (round 8, fourth batch) ----

      // Per-hour c*ln c terms floor-quantized to BIGINT before the
      // <=24-term per-user sum.
      "ts_activity_entropy" ->
        s"""WITH c AS (SELECT user_id, hour(ts) AS h, count(*) AS n
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1, 2),
a AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events, count(*) AS n_hours,
  CAST(sum(CAST(floor(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) * 1e6)
    AS BIGINT)) AS BIGINT) AS q
  FROM c GROUP BY 1)
SELECT user_id, n_events, n_hours,
  round(ln(CAST(n_events AS DOUBLE)) -
    CAST(q AS DOUBLE) / 1e6 / CAST(n_events AS DOUBLE), 6) AS hour_entropy
FROM a ORDER BY user_id""",

      // n1/n2/R exact integers feeding one double tree for z.
      "ts_runs_test" ->
        s"""WITH dl AS (SELECT CAST(o_orderdate AS DATE) AS day,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM ${T("orders")} GROUP BY 1),
md AS (SELECT median(rev) AS med FROM dl),
sg AS (SELECT day, rev > (SELECT med FROM md) AS above FROM dl),
ch AS (SELECT day, above,
  CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
         OR lag(above) OVER (ORDER BY day) <> above THEN 1 ELSE 0 END AS chg
  FROM sg),
ag AS (SELECT count(*) AS n_days,
  CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
  CAST(sum(CASE WHEN NOT above THEN 1 ELSE 0 END) AS BIGINT) AS n2,
  CAST(sum(chg) AS BIGINT) AS r FROM ch)
SELECT n_days, n1 AS n_above, n2 AS n_below, r AS n_runs,
  round((CAST(r AS DOUBLE) - (2.0*n1*n2/(n1+n2) + 1)) /
    sqrt((2.0*n1*n2*(2.0*n1*n2 - n1 - n2)) /
      ((CAST(n1+n2 AS DOUBLE))*(n1+n2)*(n1+n2-1))), 6) AS z
FROM ag""",

      // Exact interpolated per-group percentiles on identical doubles.
      "agg_group_quantiles" ->
        s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
  round(quantile_cont(value, 0.10), 6) AS p10,
  round(quantile_cont(value, 0.25), 6) AS p25,
  round(quantile_cont(value, 0.50), 6) AS p50,
  round(quantile_cont(value, 0.75), 6) AS p75,
  round(quantile_cont(value, 0.90), 6) AS p90
FROM ${T("events")} WHERE value IS NOT NULL GROUP BY 1 ORDER BY event_type""",

      // Clamped values floor-quantized to BIGINT cents before summing;
      // means and thresholds floor-quantized at the output.
      "agg_winsorized_mean" ->
        s"""WITH th AS (
  SELECT quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 0.05) AS p05,
         quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 0.95) AS p95
  FROM ${T("orders")}),
w AS (SELECT CAST(floor(least(greatest(
      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), th.p05), th.p95)
    * 100) AS BIGINT) AS wc,
  CAST(o_totalprice AS DECIMAL(18,2)) AS pd, th.p05, th.p95
  FROM ${T("orders")} CROSS JOIN th)
SELECT count(*) AS n, floor(p05*100)/100 AS p05, floor(p95*100)/100 AS p95,
  floor(CAST(sum(wc) AS DOUBLE)/100/count(*)*1e4)/1e4 AS winsorized_mean,
  floor(CAST(sum(pd) AS DOUBLE)/count(*)*1e4)/1e4 AS plain_mean
FROM w GROUP BY p05, p95""",

      // ntile(10) totalized by custkey (GlobalRank on the Spark side);
      // per-decile DECIMAL sums, bounded running share.
      "agg_lorenz_points" ->
        s"""WITH m AS (SELECT o_custkey AS c, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM ${T("orders")} GROUP BY 1),
q AS (SELECT c, rev, ntile(10) OVER (ORDER BY rev, c) AS decile FROM m),
bd AS (SELECT decile, count(*) AS n_customers, sum(rev) AS drev FROM q GROUP BY 1),
tt AS (SELECT sum(drev) AS trev FROM bd),
w AS (SELECT decile, n_customers, drev,
  sum(drev) OVER (ORDER BY decile
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM bd)
SELECT CAST(decile AS BIGINT) AS decile, n_customers,
  round(CAST(drev AS DOUBLE), 2) AS decile_rev,
  round(CAST(cum AS DOUBLE) / (SELECT CAST(trev AS DOUBLE) FROM tt), 6)
    AS cum_share
FROM w ORDER BY decile""",

      // Position normalized to 0-on-missing; sorted/sliced outputs
      // rendered as scalars.
      "fn_array3" ->
        s"""WITH a AS (SELECT doc_id, string_split(text, ' ') AS arr
  FROM ${T("documents")} WHERE doc_id % 7 = 0)
SELECT doc_id,
  CAST(coalesce(list_position(arr, 'the'), 0) AS BIGINT) AS pos_the,
  array_to_string(list_slice(arr, 1, 5), ' ') AS head5,
  list_sort(arr)[1] AS min_w,
  list_sort(arr)[-1] AS max_w,
  list_reverse(arr)[1] AS last_w,
  CAST(length(list_distinct(list_slice(arr, 1, 20))) AS BIGINT) AS d20
FROM a ORDER BY doc_id""",

      // deg(s) constant within a k-group: the statistic reduces to
      // exact integer sums and one division.
      "graph_avg_neighbor_degree" ->
        s"""${edgesWith(dir)},
deg AS (SELECT s AS v, count(*) AS deg FROM ud GROUP BY 1),
j AS (SELECT ud.s, ds.deg AS deg_s, dt.deg AS deg_t
  FROM ud JOIN deg ds ON ds.v = ud.s JOIN deg dt ON dt.v = ud.t)
SELECT CAST(deg_s AS BIGINT) AS k, CAST(count(DISTINCT s) AS BIGINT) AS n_nodes,
  round(CAST(sum(deg_t) AS DOUBLE) / (count(DISTINCT s) * deg_s), 6)
    AS avg_nbr_deg
FROM j GROUP BY deg_s ORDER BY k""",

      // ---- §2.18e (round 8, fifth batch) ----
      // Two-sample ECDFs share one distinct-value relation; every
      // ECDF value is a single integer/integer IEEE division.
      "agg_ks_test" ->
        s"""WITH g AS (SELECT value AS v,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM ${T("events")}
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1),
c AS (SELECT v,
  CAST(sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
  CAST(sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
  FROM g),
t AS (SELECT max(cum1) AS n1, max(cum2) AS n2 FROM c),
dd AS (SELECT v, n1, n2,
  abs(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2) AS dv FROM c, t),
m AS (SELECT max(dv) AS ks FROM dd)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  min(v) AS ks_at, round(ks, 6) AS ks
FROM dd, m WHERE dv = ks GROUP BY n1, n2, ks""",

      // 2R1 is a pure integer (average tie ranks x2); one double tree.
      "agg_mann_whitney" ->
        s"""WITH g AS (SELECT value AS v,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM ${T("events")}
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1),
c AS (SELECT v, c1, c2,
  CAST(sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
  CAST(sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
  FROM g),
t AS (SELECT
  CAST(sum(c1 * (2 * (cum1 + cum2 - c1 - c2) + (c1 + c2) + 1)) AS BIGINT) AS r1x2,
  CAST(sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS BIGINT) AS ties,
  max(cum1) AS n1, max(cum2) AS n2 FROM c)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  round(CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0, 1) AS u,
  round((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 -
         CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) /
    sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
      (((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0) -
       CAST(ties AS DOUBLE) /
        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) *
         ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0)))), 6) AS z
FROM t""",

      // Cell/margin c*ln terms floor-quantized at 1e9 pre-sum.
      "agg_mutual_information" ->
        s"""WITH cells AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
  count(*) AS c FROM ${T("orders")} GROUP BY 1, 2),
r AS (SELECT pri, CAST(sum(c) AS BIGINT) AS mr FROM cells GROUP BY 1),
cm AS (SELECT st, CAST(sum(c) AS BIGINT) AS cs FROM cells GROUP BY 1),
t AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS n_cells FROM cells),
mi AS (SELECT CAST(sum(CAST(floor(CAST(c AS DOUBLE) *
    ln((CAST(n AS DOUBLE) * CAST(c AS DOUBLE)) /
       (CAST(mr AS DOUBLE) * CAST(cs AS DOUBLE))) * 1e9) AS BIGINT)) AS BIGINT) AS qmi
  FROM cells JOIN r USING (pri) JOIN cm USING (st), t),
hr AS (SELECT CAST(sum(CAST(floor(CAST(mr AS DOUBLE) *
    ln(CAST(mr AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS qhr
  FROM r, t),
hc AS (SELECT CAST(sum(CAST(floor(CAST(cs AS DOUBLE) *
    ln(CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS qhc
  FROM cm, t)
SELECT n, CAST(n_cells AS BIGINT) AS n_cells,
  round(CAST(qmi AS DOUBLE) / 1e9 / n, 6) AS mi,
  round((CAST(qmi AS DOUBLE) / 1e9 / n) /
    least((-CAST(qhr AS DOUBLE)) / 1e9 / n, (-CAST(qhc AS DOUBLE)) / 1e9 / n), 6) AS nmi
FROM mi, hr, hc, t""",

      // First-power sums exact DECIMAL (scaled int < 2^53 → identical
      // double cast); product terms floor-quantized to BIGINT at
      // per-pair scales and summed into HUGEINT (Spark: DECIMAL(38,0))
      // — exact at any SF — then ONE scale-0 int→double conversion
      // (a scaled DECIMAL would double-round past 2^53: int128→double
      // then /10^s; a scale-0 integer converts in one rounded step).
      "agg_cov_matrix" -> {
        val vars = Seq("q" -> "l_quantity", "p" -> "l_extendedprice",
          "dc" -> "l_discount")
        val names = Map("q" -> "quantity", "p" -> "extendedprice",
          "dc" -> "discount")
        def qs(x: String, y: String): Long =
          if (x == "p" && y == "p") 100L
          else if (x == "p" || y == "p") 10000L
          else 100000000L
        def key(a: String, b: String) =
          if (a <= b) s"s_${a}_$b" else s"s_${b}_$a"
        val sums = vars.map { case (n, c) =>
          s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) AS s_$n"
        } ++ (for ((nx, cx) <- vars; (ny, cy) <- vars if nx <= ny)
          yield s"CAST(sum(CAST(floor(CAST($cx AS DECIMAL(18,2)) * CAST($cy AS DECIMAL(18,2)) * ${qs(nx, ny)}) AS BIGINT)) AS DOUBLE) AS s_${nx}_$ny")
        def cov(x: String, y: String) = {
          val (a, b) = if (x <= y) (x, y) else (y, x)
          s"(${key(x, y)} / ${qs(a, b)}.0 - s_$x * s_$y / nd) / nd"
        }
        val rows = for ((nx, _) <- vars; (ny, _) <- vars if nx <= ny) yield
          s"""SELECT '${names(nx)}' AS var_x, '${names(ny)}' AS var_y,
  CAST(n AS BIGINT) AS n, round(${cov(nx, ny)}, 6) AS cov,
  round(${cov(nx, ny)} / sqrt(${cov(nx, nx)} * ${cov(ny, ny)}), 6) AS corr
FROM a"""
        s"""WITH a AS (SELECT count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
  ${sums.mkString(",\n  ")}
  FROM ${T("lineitem")})
${rows.mkString("\nUNION ALL\n")}
ORDER BY var_x, var_y"""
      },

      // Per-row first/second-power terms are exact integers at 1e2 /
      // 1e4 (2dp value grid), summed into HUGEINT (Spark:
      // DECIMAL(38,0)); doubles enter via scale-0-int→double + /10^s
      // in the same order on both engines. Per-group (Sv)^2/n terms
      // floor-quantized at 1e6 pre-sum on those identical doubles.
      "agg_anova_f" ->
        s"""WITH g AS (SELECT event_type, count(*) AS ng,
  sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS qsg,
  sum(CAST(floor(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) * 10000) AS BIGINT)) AS qssqg
  FROM ${T("events")} WHERE value IS NOT NULL GROUP BY 1),
t AS (SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n,
  CAST(sum(qsg) AS DOUBLE) / 1e2 AS stot, CAST(sum(qssqg) AS DOUBLE) / 1e4 AS ssqtot,
  CAST(sum(CAST(floor((CAST(qsg AS DOUBLE) / 1e2) * (CAST(qsg AS DOUBLE) / 1e2) /
    CAST(ng AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS qbd
  FROM g)
SELECT CAST(k AS BIGINT) AS k, n,
  round(qbd - stot * stot / CAST(n AS DOUBLE), 4) AS ssb,
  round((ssqtot - stot * stot / CAST(n AS DOUBLE)) -
        (qbd - stot * stot / CAST(n AS DOUBLE)), 4) AS ssw,
  round(((qbd - stot * stot / CAST(n AS DOUBLE)) /
          (CAST(k AS DOUBLE) - 1.0)) /
        (((ssqtot - stot * stot / CAST(n AS DOUBLE)) -
          (qbd - stot * stot / CAST(n AS DOUBLE))) /
          (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f
FROM t""",

      // Deferred mean division: exact DECIMAL run/total, one tree/row.
      "ts_cusum" ->
        s"""WITH dl AS (SELECT CAST(o_orderdate AS DATE) AS day,
  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM ${T("orders")} GROUP BY 1),
t AS (SELECT count(*) AS nd, sum(rev) AS trev FROM dl),
r AS (SELECT day, rev,
  sum(rev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS run,
  row_number() OVER (ORDER BY day) AS k FROM dl)
SELECT day, round(CAST(rev AS DOUBLE), 2) AS rev,
  round((CAST(nd AS DOUBLE) * CAST(run AS DOUBLE) -
         CAST(k AS DOUBLE) * CAST(trev AS DOUBLE)) / CAST(nd AS DOUBLE), 4) AS cusum
FROM r, t ORDER BY day""",

      // Exact integer date lags; integer-floor week buckets.
      "ts_order_to_ship_lag" ->
        s"""WITH lg AS (SELECT
  date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS lag
  FROM ${T("lineitem")} l JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey
  WHERE date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) >= 0),
t AS (SELECT count(*) AS n_total FROM lg)
SELECT CAST(lag - lag % 7 AS BIGINT) AS bucket_lo, CAST(count(*) AS BIGINT) AS n,
  round(CAST(count(*) AS DOUBLE) / n_total, 6) AS share
FROM lg, t GROUP BY 1, n_total ORDER BY 1""",

      // Exact integer microsecond recency (truncating div of nonneg
      // longs) vs one broadcast corpus-end scalar.
      "ts_dormancy_buckets" ->
        s"""WITH ld AS (SELECT user_id, max(ts) AS last_ts
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1),
e AS (SELECT max(last_ts) AS corpus_end FROM ld),
t AS (SELECT count(*) AS n_users_total FROM ld),
b AS (SELECT
  CASE WHEN hrs < 6 THEN 0 WHEN hrs < 24 THEN 6
       WHEN hrs < 72 THEN 24 ELSE 72 END AS bucket_lo,
  CASE WHEN hrs < 6 THEN '0-6h' WHEN hrs < 24 THEN '6-24h'
       WHEN hrs < 72 THEN '24-72h' ELSE '72h+' END AS bucket
  FROM (SELECT (epoch_us(corpus_end) - epoch_us(last_ts)) // 3600000000 AS hrs
        FROM ld, e))
SELECT CAST(bucket_lo AS BIGINT) AS bucket_lo, bucket,
  CAST(count(*) AS BIGINT) AS n_users,
  round(CAST(count(*) AS DOUBLE) / n_users_total, 6) AS share
FROM b, t GROUP BY 1, 2, n_users_total ORDER BY 1""",

      // est k/16 is an exact binary double; per-pair err/jac floored
      // at 1e6 pre-mean (identical doubles -> identical floors).
      "pipeline_minhash_calibration" -> {
        val eqs = (0 until 16)
          .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
          .mkString(" +\n    ")
        s"""WITH ${minhashCtes(dir)},
pr AS (SELECT d1, d2, round(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 4) AS jaccard
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5),
mm AS (SELECT pr.jaccard,
  ($eqs) AS matches
  FROM pr JOIN wide a ON a.doc_id = pr.d1 JOIN wide b ON b.doc_id = pr.d2),
q AS (SELECT matches,
  CAST(floor(abs(CAST(matches AS DOUBLE) / 16.0 - jaccard) * 1e6) AS BIGINT) AS qerr,
  CAST(floor(jaccard * 1e6) AS BIGINT) AS qjac FROM mm)
SELECT CAST(matches AS BIGINT) AS matches, CAST(count(*) AS BIGINT) AS n_pairs,
  round(CAST(matches AS DOUBLE) / 16.0, 6) AS est_jaccard,
  round(CAST(sum(qjac) AS DOUBLE) / 1e6 / count(*), 6) AS mean_exact_jaccard,
  round(CAST(sum(qerr) AS DOUBLE) / 1e6 / count(*), 6) AS mean_abs_err
FROM q GROUP BY matches ORDER BY matches"""
      },

      // Integer power sums over per-doc counts; one tree per token.
      "pipeline_burstiness" ->
        s"""WITH tc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM ${T("documents")}),
cnt AS (SELECT doc_id, w, count(*) AS c FROM tc GROUP BY 1, 2),
st AS (SELECT w, count(*) AS df, CAST(sum(c) AS BIGINT) AS tf,
  CAST(sum(c * c) AS BIGINT) AS tf2 FROM cnt GROUP BY 1),
top AS (SELECT * FROM st ORDER BY df DESC, w LIMIT 20),
nd AS (SELECT count(*) AS n_docs FROM ${T("documents")})
SELECT w, CAST(df AS BIGINT) AS df, tf,
  round(CAST(tf AS DOUBLE) / n_docs, 6) AS mean_tf,
  round((CAST(tf2 AS DOUBLE) / n_docs -
         (CAST(tf AS DOUBLE) / n_docs) * (CAST(tf AS DOUBLE) / n_docs)) /
        (CAST(tf AS DOUBLE) / n_docs), 6) AS fano
FROM top, nd ORDER BY df DESC, w""",

      // Histogrammed degree relations; exact counts, one div per k.
      "graph_rich_club" ->
        s"""$E,
deg AS (SELECT s AS v, count(*) AS deg FROM ud GROUP BY 1),
dh AS (SELECT deg, count(*) AS nv FROM deg GROUP BY 1),
mh AS (SELECT least(d1.deg, d2.deg) AS mindeg, count(*) AS ne
  FROM e JOIN deg d1 ON d1.v = e.s JOIN deg d2 ON d2.v = e.t GROUP BY 1),
ks AS (SELECT unnest([2, 3, 4, 5]) AS k),
nk AS (SELECT k, CAST(sum(CASE WHEN deg >= k THEN nv ELSE 0 END) AS BIGINT) AS n_nodes
  FROM dh, ks GROUP BY 1),
ek AS (SELECT k, CAST(sum(CASE WHEN mindeg >= k THEN ne ELSE 0 END) AS BIGINT) AS n_edges
  FROM mh, ks GROUP BY 1)
SELECT CAST(nk.k AS BIGINT) AS k, n_nodes, n_edges,
  round(2.0 * n_edges / (CAST(n_nodes AS DOUBLE) * (CAST(n_nodes AS DOUBLE) - 1.0)), 6) AS phi
FROM nk JOIN ek ON ek.k = nk.k ORDER BY 1""",

      // ---- §2.18f (round 8, sixth batch) ----
      // DuckDB map extraction yields a 1-element list -> [1] unwraps;
      // key order is insertion order in both engines.
      "fn_map" ->
        s"""SELECT o_orderkey,
  m['status'][1] AS status_v,
  m['pri'][1] AS pri_v,
  m['missing'][1] AS missing_v,
  CAST(cardinality(m) AS BIGINT) AS n_keys,
  array_to_string(map_keys(m), ',') AS keys_csv,
  map_concat(m, map(['extra'], [upper(o_orderstatus)]))['extra'][1] AS concat_v
FROM (SELECT o_orderkey, o_orderstatus,
        map(['status', 'pri'], [o_orderstatus, o_orderpriority]) AS m
      FROM ${T("orders")} WHERE o_orderkey % 101 = 0)
ORDER BY o_orderkey""",

      // Exact DECIMAL power sums (magnitudes far under 2^53 scaled);
      // slope/intercept one fixed double tree.
      "agg_discount_elasticity" ->
        s"""WITH b AS (SELECT l_discount AS discount, count(*) AS n,
  sum(CAST(l_discount AS DECIMAL(18,2))) AS sx,
  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sy,
  sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS sxx,
  sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxy
  FROM ${T("lineitem")} GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(sx) AS DOUBLE) AS tsx,
  CAST(sum(sy) AS DOUBLE) AS tsy, CAST(sum(sxx) AS DOUBLE) AS tsxx,
  CAST(sum(sxy) AS DOUBLE) AS tsxy FROM b)
SELECT discount, CAST(n AS BIGINT) AS n,
  round(CAST(sy AS DOUBLE) / n, 6) AS avg_qty,
  round((CAST(tn AS DOUBLE) * tsxy - tsx * tsy) /
        (CAST(tn AS DOUBLE) * tsxx - tsx * tsx), 6) AS slope,
  round((tsy - (CAST(tn AS DOUBLE) * tsxy - tsx * tsy) /
               (CAST(tn AS DOUBLE) * tsxx - tsx * tsx) * tsx) /
        CAST(tn AS DOUBLE), 6) AS intercept
FROM b, t ORDER BY discount""",

      // Exact integer deltas; running sum over the bounded day grid.
      "ts_order_backlog" ->
        s"""WITH cl AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS close_day
  FROM ${T("lineitem")} GROUP BY 1),
sp AS (SELECT CAST(o.o_orderdate AS DATE) AS open_day, cl.close_day
  FROM ${T("orders")} o JOIN cl ON o.o_orderkey = cl.l_orderkey),
dl AS (SELECT open_day AS day, 1 AS delta, 1 AS opened FROM sp
  UNION ALL SELECT close_day + 1, -1, 0 FROM sp),
g AS (SELECT day, CAST(sum(delta) AS BIGINT) AS net,
  CAST(sum(opened) AS BIGINT) AS opened FROM dl GROUP BY 1)
SELECT day, opened, net,
  CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_orders
FROM g ORDER BY day""",

      // Daily revenues scaled to millions (F is scale-invariant);
      // per-day and per-group terms floor-quantized at 1e6.
      "ts_weekday_anova" ->
        s"""WITH dl AS (SELECT CAST(o_orderdate AS DATE) AS day,
  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM ${T("orders")} GROUP BY 1),
dm AS (SELECT dayofweek(day) AS dow, CAST(rev AS DOUBLE) / 1e6 AS rev_m FROM dl),
g AS (SELECT dow, count(*) AS ng,
  CAST(sum(CAST(floor(rev_m * 1e6) AS BIGINT)) AS BIGINT) AS qsg,
  CAST(sum(CAST(floor(rev_m * rev_m * 1e6) AS BIGINT)) AS BIGINT) AS qssqg
  FROM dm GROUP BY 1),
t AS (SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n,
  CAST(sum(qsg) AS BIGINT) AS qstot, CAST(sum(qssqg) AS BIGINT) AS qssqtot,
  CAST(sum(CAST(floor((CAST(qsg AS DOUBLE) / 1e6) * (CAST(qsg AS DOUBLE) / 1e6) /
    CAST(ng AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS qbd
  FROM g)
SELECT CAST(k AS BIGINT) AS k, n AS n_days,
  round(qbd -
    (CAST(qstot AS DOUBLE) / 1e6) * (CAST(qstot AS DOUBLE) / 1e6) /
      CAST(n AS DOUBLE), 6) AS ssb,
  round((CAST(qssqtot AS DOUBLE) / 1e6 -
    (CAST(qstot AS DOUBLE) / 1e6) * (CAST(qstot AS DOUBLE) / 1e6) /
      CAST(n AS DOUBLE)) -
    (qbd -
     (CAST(qstot AS DOUBLE) / 1e6) * (CAST(qstot AS DOUBLE) / 1e6) /
       CAST(n AS DOUBLE)), 6) AS ssw,
  round(((qbd -
          (CAST(qstot AS DOUBLE) / 1e6) * (CAST(qstot AS DOUBLE) / 1e6) /
            CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)) /
        (((CAST(qssqtot AS DOUBLE) / 1e6 -
           (CAST(qstot AS DOUBLE) / 1e6) * (CAST(qstot AS DOUBLE) / 1e6) /
             CAST(n AS DOUBLE)) -
          (qbd -
           (CAST(qstot AS DOUBLE) / 1e6) * (CAST(qstot AS DOUBLE) / 1e6) /
             CAST(n AS DOUBLE))) /
         (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f
FROM t""",

      // Per-occurrence relpos and its square floor-quantized pre-sum.
      "pipeline_token_positions" ->
        s"""WITH toks AS (SELECT doc_id,
  generate_subscripts(string_split(text, ' '), 1) AS pos1,
  unnest(string_split(text, ' ')) AS w FROM ${T("documents")}),
lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
dfr AS (SELECT w, count(*) AS df
  FROM (SELECT DISTINCT doc_id, w FROM toks) GROUP BY 1),
top AS (SELECT w, df FROM dfr ORDER BY df DESC, w LIMIT 10),
rel AS (SELECT t.w, top.df, CAST(t.pos1 AS DOUBLE) / l.len AS rp
  FROM toks t JOIN top ON top.w = t.w JOIN lens l ON l.doc_id = t.doc_id),
q AS (SELECT w, df, count(*) AS tf,
  CAST(sum(CAST(floor(rp * 1e6) AS BIGINT)) AS BIGINT) AS q1,
  CAST(sum(CAST(floor(rp * rp * 1e10) AS BIGINT)) AS BIGINT) AS q2
  FROM rel GROUP BY 1, 2)
SELECT w, CAST(df AS BIGINT) AS df, CAST(tf AS BIGINT) AS tf,
  round(CAST(q1 AS DOUBLE) / 1e6 / tf, 6) AS mean_relpos,
  round(sqrt(CAST(q2 AS DOUBLE) / 1e10 / tf -
    (CAST(q1 AS DOUBLE) / 1e6 / tf) * (CAST(q1 AS DOUBLE) / 1e6 / tf)), 6)
    AS std_relpos
FROM q ORDER BY df DESC, w""",

      // The bucket floor IS the quantization; identical cosine doubles
      // (codegen expression vs DOUBLE[] kernel) floor identically.
      "sim_cosine_histogram" ->
        s"""WITH e AS (SELECT vec_id, embedding FROM ${T("embeddings")} WHERE vec_id % 4 = 0),
p AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
  list_cosine_similarity(cast(a.embedding AS DOUBLE[]), cast(b.embedding AS DOUBLE[])) AS cs
  FROM e a JOIN e b ON a.vec_id < b.vec_id),
t AS (SELECT count(*) AS n_total FROM p)
SELECT CAST(floor(cs * 10) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_pairs,
  round(CAST(count(*) AS DOUBLE) / n_total, 6) AS share
FROM p, t GROUP BY 1, n_total ORDER BY 1""",

      // Four independent fixed-round peels (the kcore3 chain x 4).
      "graph_core_decomposition" -> {
        val peels = (2 to 5).map { k =>
          s"""k${k}_1 AS (SELECT s FROM ud GROUP BY s HAVING count(*) >= $k),
u${k}_1 AS (SELECT ud.s, ud.t FROM ud JOIN k${k}_1 a ON ud.s = a.s JOIN k${k}_1 b ON ud.t = b.s),
k${k}_2 AS (SELECT s FROM u${k}_1 GROUP BY s HAVING count(*) >= $k),
u${k}_2 AS (SELECT u${k}_1.s, u${k}_1.t FROM u${k}_1 JOIN k${k}_2 a ON u${k}_1.s = a.s JOIN k${k}_2 b ON u${k}_1.t = b.s),
k${k}_3 AS (SELECT s FROM u${k}_2 GROUP BY s HAVING count(*) >= $k),
u${k}_3 AS (SELECT u${k}_2.s, u${k}_2.t FROM u${k}_2 JOIN k${k}_3 a ON u${k}_2.s = a.s JOIN k${k}_3 b ON u${k}_2.t = b.s),
d$k AS (SELECT s, count(*) AS dg FROM u${k}_3 GROUP BY s)"""
        }.mkString(",\n")
        val rows = (2 to 5).map { k =>
          s"""SELECT CAST($k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_nodes,
  CAST(coalesce(sum(dg), 0) // 2 AS BIGINT) AS n_edges,
  CAST(coalesce(min(dg), 0) AS BIGINT) AS min_residual_deg FROM d$k"""
        }.mkString("\nUNION ALL\n")
        s"""$E,
$peels
SELECT * FROM (
$rows
) ORDER BY k"""
      },

      // ---- §2.18g (round 8, seventh batch) ----
      // Rank selection over the total order: no interpolation, no
      // floats; probe ranks are exact integer arithmetic.
      "agg_quantiles_disc" ->
        s"""WITH r AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v,
  row_number() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS rn
  FROM ${T("orders")}),
n AS (SELECT count(*) AS total FROM r),
ps AS (SELECT unnest([1, 5, 25, 50, 75, 95, 99]) AS p)
SELECT CAST(p AS BIGINT) AS p,
  CAST((p * total + 99) // 100 AS BIGINT) AS rank_sel,
  round(CAST(v AS DOUBLE), 2) AS value
FROM r, n, ps WHERE rn = (p * total + 99) // 100 ORDER BY p""",

      // Digit count of an exact integer: log-scale bins without a
      // transcendental (floor(log10) is a cross-engine knife edge).
      "agg_magnitude_histogram" ->
        s"""WITH t AS (SELECT count(*) AS n_total FROM ${T("orders")}),
b AS (SELECT length(CAST(CAST(floor(CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT) AS VARCHAR)) AS digits,
  CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM ${T("orders")})
SELECT CAST(digits AS BIGINT) AS digits, CAST(count(*) AS BIGINT) AS n,
  round(CAST(count(*) AS DOUBLE) / n_total, 6) AS share,
  round(CAST(min(v) AS DOUBLE), 2) AS min_value,
  round(CAST(max(v) AS DOUBLE), 2) AS max_value
FROM b, t GROUP BY 1, n_total ORDER BY 1""",

      // All-integer counts; one division.
      "graph_transitivity" ->
        s"""$E,
degs AS (SELECT s, count(*) AS dg FROM ud GROUP BY 1),
w AS (SELECT count(*) AS n_nodes,
  CAST(sum(dg * (dg - 1) // 2) AS BIGINT) AS wedges FROM degs),
tr AS (SELECT count(*) AS triangles FROM e e1
  JOIN e e2 ON e2.s = e1.t JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t),
ne AS (SELECT count(*) AS n_edges FROM e)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes, CAST(n_edges AS BIGINT) AS n_edges,
  wedges, CAST(triangles AS BIGINT) AS triangles,
  round(3.0 * triangles / CAST(wedges AS DOUBLE), 6) AS transitivity
FROM w, tr, ne""",

      // Identical rate doubles -> identical integer thresholds; the
      // md5 16-bit bucket decides the kept SET reproducibly.
      "sample_rebalance" ->
        s"""WITH bs AS (SELECT source, count(*) AS n_docs,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM ${T("documents")} GROUP BY 1),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot, count(*) AS n_src FROM bs),
rt AS (SELECT source, n_docs,
  least(1.0, (CAST(tot AS DOUBLE) / n_src) / CAST(n_tokens AS DOUBLE)) AS rate
  FROM bs, t),
rr AS (SELECT source, n_docs, rate,
  CAST(floor(rate * 65536) AS BIGINT) AS thr FROM rt),
k AS (SELECT d.source, rr.n_docs, rr.rate,
  CASE WHEN ('0x' || substr(md5(cast(d.doc_id AS VARCHAR)), 1, 4))::BIGINT < rr.thr
       THEN 1 ELSE 0 END AS keep
  FROM ${T("documents")} d JOIN rr ON rr.source = d.source)
SELECT source, CAST(max(n_docs) AS BIGINT) AS n_docs,
  CAST(sum(keep) AS BIGINT) AS n_kept,
  round(max(rate), 6) AS target_rate,
  round(CAST(sum(keep) AS DOUBLE) / max(n_docs), 6) AS achieved_rate
FROM k GROUP BY source ORDER BY source""",

      // Char-grain fingerprint; in-row position explode, exact counts.
      "pipeline_char_trigrams" ->
        s"""WITH gg AS (SELECT substr(text, CAST(i AS INT), 3) AS g
  FROM (SELECT text, unnest(generate_series(1, len(text) - 2)) AS i
        FROM ${T("documents")} WHERE len(text) >= 3)),
c AS (SELECT g, count(*) AS n FROM gg GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c),
top AS (SELECT g, n FROM c ORDER BY n DESC, g LIMIT 15)
SELECT g, CAST(n AS BIGINT) AS n,
  round(CAST(n AS DOUBLE) / n_total, 6) AS share
FROM top, t ORDER BY n DESC, g""",

      // Exact DECIMAL side totals; means and the ratio one double tree.
      "ts_weekend_effect" ->
        s"""WITH dl AS (SELECT CAST(o_orderdate AS DATE) AS day,
  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM ${T("orders")} GROUP BY 1),
sd AS (SELECT (dayofweek(day) = 0 OR dayofweek(day) = 6) AS is_weekend, rev FROM dl),
g AS (SELECT is_weekend, count(*) AS n_days, sum(rev) AS trev FROM sd GROUP BY 1),
r AS (SELECT max(CASE WHEN is_weekend THEN CAST(trev AS DOUBLE) / n_days END) /
             max(CASE WHEN NOT is_weekend THEN CAST(trev AS DOUBLE) / n_days END)
        AS wknd_over_wkday FROM g)
SELECT is_weekend, CAST(n_days AS BIGINT) AS n_days,
  round(CAST(trev AS DOUBLE), 2) AS total_rev,
  round(CAST(trev AS DOUBLE) / n_days, 4) AS avg_daily_rev,
  round(wknd_over_wkday, 6) AS wknd_over_wkday
FROM g, r ORDER BY is_weekend""",

      // ---- §2.18k (round 8, eleventh batch) ----
      // KM with administrative censoring; per-day ln(1 - d/n) terms
      // floor-quantized at 1e12; the absorbed tail emits NULL.
      "ts_survival_km" ->
        s"""WITH cl AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS ship
  FROM ${T("lineitem")} GROUP BY 1),
od AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM ${T("orders")}),
ct AS (SELECT max(od) - 30 AS cutoff FROM od),
obs AS (SELECT
  least(date_diff('day', od.od, cl.ship), date_diff('day', od.od, ct.cutoff)) AS t,
  date_diff('day', od.od, cl.ship) <= date_diff('day', od.od, ct.cutoff) AS event
  FROM od JOIN cl ON od.o_orderkey = cl.l_orderkey, ct
  WHERE od.od <= ct.cutoff),
tt AS (SELECT count(*) AS n_total FROM obs),
bt AS (SELECT t,
  CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
  CAST(sum(CASE WHEN NOT event THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM obs GROUP BY 1),
rk AS (SELECT t, d, c,
  CAST(n_total - coalesce(sum(d + c) OVER (ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM bt, tt),
ql AS (SELECT t, d, c, n_risk,
  CASE WHEN d < n_risk THEN CAST(floor(
    ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1e12) AS BIGINT) END AS qln,
  CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead FROM rk),
cm AS (SELECT t, d, c, n_risk,
  sum(qln) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS qcum,
  max(dead) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS absorbed FROM ql)
SELECT CAST(t AS BIGINT) AS t, n_risk, d, c,
  round(CAST(d AS DOUBLE) / n_risk, 6) AS hazard,
  CASE WHEN absorbed = 0
    THEN round(CAST(qcum AS DOUBLE) / 1e12, 6) END AS log_survival
FROM cm ORDER BY t""",

      // ---- §2.18j (round 8, tenth batch) ----
      // Monday-start weeks in both engines; exact DECIMAL revenue;
      // cumulative window partitioned by cohort.
      "ts_cohort_ltv" ->
        s"""WITH ch AS (SELECT user_id,
  CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1),
sz AS (SELECT cohort, count(*) AS cohort_size FROM ch GROUP BY 1),
ac AS (SELECT ch.cohort,
  date_diff('day', ch.cohort, CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS age_weeks,
  count(DISTINCT e.user_id) AS active_users,
  coalesce(sum(CASE WHEN e.event_type = 'purchase'
    THEN CAST(e.value AS DECIMAL(18,2)) END), CAST(0 AS DECIMAL(18,2))) AS rev
  FROM ${T("events")} e JOIN ch ON ch.user_id = e.user_id
  WHERE e.user_id IS NOT NULL GROUP BY 1, 2),
cm AS (SELECT cohort, age_weeks, active_users, rev,
  sum(rev) OVER (PARTITION BY cohort ORDER BY age_weeks
    ROWS UNBOUNDED PRECEDING) AS cum_rev FROM ac)
SELECT cm.cohort, CAST(age_weeks AS BIGINT) AS age_weeks,
  CAST(cohort_size AS BIGINT) AS cohort_size,
  CAST(active_users AS BIGINT) AS active_users,
  round(CAST(rev AS DOUBLE), 2) AS rev,
  round(CAST(cum_rev AS DOUBLE), 2) AS cum_rev,
  round(CAST(cum_rev AS DOUBLE) / cohort_size, 4) AS ltv
FROM cm JOIN sz ON sz.cohort = cm.cohort
ORDER BY cm.cohort, age_weeks""",

      // Exact DECIMAL year sums; one division vs the abs-delta total.
      "ts_revenue_bridge" ->
        s"""WITH b AS (SELECT o_orderpriority AS pri,
  coalesce(sum(CASE WHEN year(o_orderdate) = 1997
    THEN CAST(o_totalprice AS DECIMAL(18,2)) END), CAST(0 AS DECIMAL(18,2))) AS r97,
  coalesce(sum(CASE WHEN year(o_orderdate) = 1998
    THEN CAST(o_totalprice AS DECIMAL(18,2)) END), CAST(0 AS DECIMAL(18,2))) AS r98
  FROM ${T("orders")} WHERE year(o_orderdate) IN (1997, 1998) GROUP BY 1),
d AS (SELECT pri, r97, r98, r98 - r97 AS delta FROM b),
t AS (SELECT sum(abs(delta)) AS tabs FROM d)
SELECT pri, round(CAST(r97 AS DOUBLE), 2) AS rev_1997,
  round(CAST(r98 AS DOUBLE), 2) AS rev_1998,
  round(CAST(delta AS DOUBLE), 2) AS delta,
  round(CAST(delta AS DOUBLE) / CAST(tabs AS DOUBLE), 6) AS share_of_abs_delta
FROM d, t ORDER BY pri""",

      // ---- §2.18i (round 8, ninth batch) ----
      // Pareto front via the two-step group-max / exclusive-prefix-max
      // reduction; exact DECIMAL/date comparisons only.
      "join_skyline" ->
        s"""WITH o AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
  CAST(o_orderdate AS DATE) AS dt FROM ${T("orders")}),
g AS (SELECT p, max(dt) AS gmax FROM o GROUP BY p),
m AS (SELECT p, gmax,
  max(gmax) OVER (ORDER BY p DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
  FROM g)
SELECT o.o_orderkey, round(CAST(o.p AS DOUBLE), 2) AS price, o.dt AS order_date
FROM o JOIN m ON m.p = o.p
WHERE o.dt = m.gmax AND (m.m1 IS NULL OR o.dt > m.m1)
ORDER BY price DESC, o.o_orderkey""",

      // Result == plain EXISTS; the engine-side prefilter is a plan
      // property the oracle doesn't need to model.
      "join_semi_prefilter" ->
        s"""SELECT o_orderkey, o_orderstatus,
  round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS total
FROM ${T("orders")} o
WHERE EXISTS (SELECT 1 FROM ${T("lineitem")} l
  WHERE l.l_orderkey = o.o_orderkey
    AND CAST(l.l_quantity AS DECIMAL(18,2)) >= 45)
ORDER BY o_orderkey""",

      // ---- §2.18h (round 8, eighth batch) ----
      // Per-month (O-E)^2/E terms floor-quantized at 1e6.
      "ts_priority_mix_shift" ->
        s"""WITH cells AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS mon,
  o_orderpriority AS pri, count(*) AS c FROM ${T("orders")} GROUP BY 1, 2),
m AS (SELECT mon, CAST(sum(c) AS BIGINT) AS mtot FROM cells GROUP BY 1),
p AS (SELECT pri, CAST(sum(c) AS BIGINT) AS ptot FROM cells GROUP BY 1),
t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
SELECT mon, CAST(max(mtot) AS BIGINT) AS n_orders,
  round(CAST(CAST(sum(CAST(floor(
    (CAST(c AS DOUBLE) - CAST(mtot AS DOUBLE) * CAST(ptot AS DOUBLE) / CAST(n AS DOUBLE)) *
    (CAST(c AS DOUBLE) - CAST(mtot AS DOUBLE) * CAST(ptot AS DOUBLE) / CAST(n AS DOUBLE)) /
    (CAST(mtot AS DOUBLE) * CAST(ptot AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT))
    AS BIGINT) AS DOUBLE) / 1e6, 6) AS chi2,
  round(CAST(max(c) AS DOUBLE) / max(mtot), 6) AS max_share
FROM cells JOIN m USING (mon) JOIN p USING (pri), t
GROUP BY mon ORDER BY mon""",

      // Exact edge/degree counts; brand a_b^2 terms floored at 1e12.
      "graph_brand_homophily" ->
        s"""$E,
br AS (SELECT p_partkey, p_brand FROM ${T("part")}),
wb AS (SELECT b1.p_brand AS b1, b2.p_brand AS b2
  FROM e JOIN br b1 ON e.s = b1.p_partkey JOIN br b2 ON e.t = b2.p_partkey),
obs AS (SELECT count(*) AS n_edges,
  CAST(sum(CASE WHEN b1 = b2 THEN 1 ELSE 0 END) AS BIGINT) AS same FROM wb),
degb AS (SELECT br.p_brand AS b, count(*) AS db
  FROM ud JOIN br ON ud.s = br.p_partkey GROUP BY 1),
td AS (SELECT CAST(sum(db) AS BIGINT) AS m2 FROM degb),
ex AS (SELECT CAST(sum(CAST(floor(CAST(db AS DOUBLE) / m2 *
  (CAST(db AS DOUBLE) / m2) * 1e12) AS BIGINT)) AS BIGINT) AS qexp FROM degb, td)
SELECT CAST(n_edges AS BIGINT) AS n_edges, same AS same_brand_edges,
  round(CAST(same AS DOUBLE) / n_edges, 6) AS observed_share,
  round(CAST(qexp AS DOUBLE) / 1e12, 6) AS expected_share,
  round((CAST(same AS DOUBLE) / n_edges - CAST(qexp AS DOUBLE) / 1e12) /
        (1.0 - CAST(qexp AS DOUBLE) / 1e12), 6) AS assortativity_q
FROM obs, ex""",

      // Pure-integer power sums; one double tree for r.
      "pipeline_len_vocab_corr" ->
        s"""WITH pd AS (SELECT doc_id, count(*) AS x, count(DISTINCT w) AS y
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM ${T("documents")})
  GROUP BY 1),
t AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
  CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * y) AS BIGINT) AS sxy FROM pd)
SELECT CAST(n AS BIGINT) AS n_docs,
  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_tokens,
  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_vocab,
  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
    sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
         (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS pearson_r
FROM t""",

      // Bounded |labels|^2 pair relation; the sim-family cosine contract.
      "sim_anchor_separation" ->
        s"""WITH a AS (SELECT label, min(vec_id) AS aid FROM ${T("embeddings")} GROUP BY 1),
an AS (SELECT a.label AS l, e.embedding AS em
  FROM a JOIN ${T("embeddings")} e ON e.vec_id = a.aid)
SELECT CAST(x.l AS BIGINT) AS label1, CAST(y.l AS BIGINT) AS label2,
  round(list_cosine_similarity(cast(x.em AS DOUBLE[]), cast(y.em AS DOUBLE[])), 4) AS anchor_cos
FROM an x JOIN an y ON x.l < y.l ORDER BY 1, 2""",

      // Generator family: exact integer sizes/sums only.
      "fn_sequence" ->
        s"""SELECT o_orderkey, CAST(o_orderkey % 10 + 1 AS BIGINT) AS n,
  CAST(len(generate_series(1, o_orderkey % 10 + 1)) AS BIGINT) AS seq_sz,
  CAST(list_sum(generate_series(1, o_orderkey % 10 + 1)) AS BIGINT) AS seq_sum,
  CAST(len(list_filter(generate_series(1, o_orderkey % 10 + 1),
    x -> x % 2 = 0)) AS BIGINT) AS n_even,
  CAST(len(generate_series(CAST(o_orderdate AS DATE),
    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 10 + 1 AS INTEGER),
    INTERVAL 1 DAY)) AS BIGINT) AS dseq_sz
FROM ${T("orders")} WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""",

      // ---- §2.19 (round 9) ----

      // Tie-averaged ranks carried as the exact INTEGER 2*rank
      // (2*cum_before + cnt + 1); all five power sums exact
      // (HUGEINT / Spark DECIMAL(38,0)); rho in one double tree of
      // scale-0 conversions.
      "agg_spearman_corr" ->
        s"""WITH xr AS (SELECT v, 2*sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c + 1 AS ar2
  FROM (SELECT CAST(l_quantity AS DECIMAL(18,2)) AS v, count(*) AS c FROM ${T("lineitem")} GROUP BY 1)),
yr AS (SELECT v, 2*sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c + 1 AS ar2
  FROM (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v, count(*) AS c FROM ${T("lineitem")} GROUP BY 1)),
j AS (SELECT x.ar2 AS ax, y.ar2 AS ay
  FROM ${T("lineitem")} l
  JOIN xr x ON x.v = CAST(l.l_quantity AS DECIMAL(18,2))
  JOIN yr y ON y.v = CAST(l.l_extendedprice AS DECIMAL(18,2))),
t AS (SELECT count(*) AS n, sum(ax) AS sx, sum(ay) AS sy,
  sum(ax*ay) AS sxy, sum(ax*ax) AS sxx, sum(ay*ay) AS syy FROM j)
SELECT CAST(n AS BIGINT) AS n,
  round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
    sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
         (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS spearman_rho
FROM t""",

      // Every verdict on exact DECIMALS; the 1%-band is integer
      // cross-multiplication; mean abs rel err floor-quantized at 1e6.
      "agg_order_total_audit" ->
        s"""WITH li AS (SELECT l_orderkey,
  sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
      (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS net
  FROM ${T("lineitem")} GROUP BY 1),
j AS (SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS tot, net
  FROM ${T("orders")} o LEFT JOIN li ON li.l_orderkey = o.o_orderkey)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN net IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,
  CAST(sum(CASE WHEN net IS NOT NULL AND abs(tot - net) * 100 <= tot THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
  CAST(sum(CASE WHEN net IS NOT NULL AND net > tot THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
  CAST(sum(CASE WHEN net IS NOT NULL AND net < tot THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
  CAST(sum(CASE WHEN net IS NOT NULL THEN
    CAST(floor(CAST(abs(tot - net) AS DOUBLE) / CAST(tot AS DOUBLE) * 1e6) AS BIGINT)
    ELSE 0 END) AS DOUBLE) / sum(CASE WHEN net IS NOT NULL THEN 1 ELSE 0 END) / 1e6 AS avg_abs_rel_err
FROM j GROUP BY 1 ORDER BY o_orderstatus""",

      // Argmax decided on exact HUGEINT |nd*run - k*total| (Spark:
      // DECIMAL(38,0)); ties to the earliest day; means divide exact
      // integers in the same double order.
      "ts_changepoint" ->
        s"""WITH dl AS (SELECT CAST(o_orderdate AS DATE) AS day,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM ${T("orders")} GROUP BY 1),
r AS (SELECT day, cents,
  sum(cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS run,
  row_number() OVER (ORDER BY day) AS k FROM dl),
t AS (SELECT max(run) AS total, count(*) AS nd FROM r),
scored AS (SELECT day, k, run, total, nd,
  abs(CAST(nd AS HUGEINT)*run - CAST(k AS HUGEINT)*total) AS dev FROM r, t),
mx AS (SELECT max(dev) AS mxdev FROM scored)
SELECT day AS split_day, CAST(k AS BIGINT) AS n_days_before,
  CAST(nd - k AS BIGINT) AS n_days_after,
  round(CAST(run AS DOUBLE) / CAST(k AS DOUBLE) / 1e2, 2) AS mean_before,
  round(CAST(total - run AS DOUBLE) / CAST(nd - k AS DOUBLE) / 1e2, 2) AS mean_after,
  round((CAST(total - run AS DOUBLE) / CAST(nd - k AS DOUBLE) -
         CAST(run AS DOUBLE) / CAST(k AS DOUBLE)) / 1e2, 2) AS mean_shift
FROM scored, mx WHERE dev = mxdev ORDER BY day LIMIT 1""",

      // Centered 7-day MA (complete windows), weekday index of the
      // detrended series; d7 = 7*cents - S7 keeps everything integer
      // until the final identical double trees.
      "ts_seasonal_decompose" ->
        s"""WITH dl AS (SELECT CAST(o_orderdate AS DATE) AS day,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM ${T("orders")} GROUP BY 1),
t7 AS (SELECT day, cents,
  sum(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
  count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
  FROM dl),
f AS (SELECT day, dayofweek(day) AS dow, cents, s7, 7*cents - s7 AS d7
  FROM t7 WHERE n7 = 7),
g AS (SELECT dow, sum(d7) AS sd7, count(*) AS nd FROM f GROUP BY 1)
SELECT day, round(CAST(cents AS DOUBLE) / 1e2, 2) AS rev,
  round(CAST(s7 AS DOUBLE) / 7.0 / 1e2, 4) AS trend,
  round(CAST(sd7 AS DOUBLE) / CAST(nd AS DOUBLE) / 7.0 / 1e2, 4) AS seasonal,
  round((CAST(d7 AS DOUBLE) - CAST(sd7 AS DOUBLE) / CAST(nd AS DOUBLE)) / 7.0 / 1e2, 4) AS residual
FROM f JOIN g USING (dow) ORDER BY day""",

      // Zero-hours enter through the observed-hour spine; F from
      // exact integer sums in one double tree.
      "ts_fano_factor" ->
        s"""WITH ch AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
  FROM ${T("events")} GROUP BY 1, 2),
spine AS (SELECT DISTINCT date_trunc('hour', ts) AS h FROM ${T("events")}),
types AS (SELECT DISTINCT event_type FROM ${T("events")}),
fl AS (SELECT ty.event_type, coalesce(c.c, 0) AS c
  FROM types ty CROSS JOIN spine s
  LEFT JOIN ch c ON c.event_type = ty.event_type AND c.h = s.h),
g AS (SELECT event_type, count(*) AS n_hours, sum(c) AS sc, sum(c*c) AS scc
  FROM fl GROUP BY 1)
SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours, CAST(sc AS BIGINT) AS n_events,
  round(CAST(sc AS DOUBLE) / CAST(n_hours AS DOUBLE), 4) AS mean_per_hour,
  round((CAST(n_hours AS DOUBLE) * CAST(scc AS DOUBLE) -
         CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) /
        (CAST(n_hours AS DOUBLE) * CAST(sc AS DOUBLE)), 6) AS fano
FROM g ORDER BY event_type""",

      // Lanes floor-quantized to BIGINT micro-units (1e7); mean /
      // variance / extremes from exact integer sums.
      "sim_dim_variance" ->
        s"""WITH raw AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
  unnest(embedding) AS x FROM ${T("embeddings")}),
lanes AS (SELECT dim, CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT) AS q FROM raw),
g AS (SELECT dim, count(*) AS n, sum(q) AS sq, sum(q*q) AS sqq,
  min(q) AS mn, max(q) AS mx FROM lanes GROUP BY 1)
SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
  round(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1e7, 6) AS mean,
  round((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) -
         CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e14, 8) AS variance,
  CAST(mn AS DOUBLE) / 1e7 AS min_val, CAST(mx AS DOUBLE) / 1e7 AS max_val
FROM g ORDER BY dim""",

      // Quantized cosine is a pure integer-sums double tree (lanes
      // floor(x*10) are small ints, exact in double at any fold
      // order); the reference cosine is the explicit dot/sqrt(na*nb)
      // mirror of the Spark helper; degenerate pairs counted.
      "sim_quantization_error" ->
        s"""WITH p AS (SELECT CAST(a.embedding AS DOUBLE[]) AS e1, CAST(b.embedding AS DOUBLE[]) AS e2
  FROM ${T("embeddings")} a JOIN ${T("embeddings")} b ON b.vec_id = a.vec_id + 1),
q AS (SELECT
  list_transform(e1, x -> CAST(floor(x * 10) AS BIGINT)) AS qa,
  list_transform(e2, x -> CAST(floor(x * 10) AS BIGINT)) AS qb,
  list_dot_product(e1, e2) / sqrt(list_dot_product(e1, e1) * list_dot_product(e2, e2)) AS cose
  FROM p),
s AS (SELECT
  list_dot_product(qa, qa) AS nqa, list_dot_product(qb, qb) AS nqb,
  list_dot_product(qa, qb) / sqrt(CAST(list_dot_product(qa, qa) AS DOUBLE) * CAST(list_dot_product(qb, qb) AS DOUBLE)) AS cosq,
  cose FROM q),
e AS (SELECT (nqa = 0 OR nqb = 0) AS degenerate,
  CASE WHEN nqa = 0 OR nqb = 0 THEN 0
       ELSE CAST(floor(abs(cosq - cose) * 1e6) AS BIGINT) END AS err6
  FROM s)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(CASE WHEN degenerate THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate,
  CAST(sum(CASE WHEN NOT degenerate THEN err6 ELSE 0 END) AS DOUBLE) /
    sum(CASE WHEN NOT degenerate THEN 1 ELSE 0 END) / 1e6 AS avg_abs_err,
  CAST(max(CASE WHEN NOT degenerate THEN err6 END) AS DOUBLE) / 1e6 AS max_abs_err,
  CAST(sum(CASE WHEN NOT degenerate AND err6 > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_err_gt_1pct
FROM e""",

      // Verified LSH pair set -> flagged doc set; counts and token
      // sums exact BIGINTs, shares/averages divide them once.
      "pipeline_dup_length_bias" ->
        s"""WITH ${minhashCtes(dir)},
pairs AS (SELECT d1, d2
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE cast(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5),
dup AS (SELECT DISTINCT doc_id FROM
  (SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)),
docs AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM ${T("documents")}),
tot AS (SELECT count(*) AS nd_total, sum(n_tok) AS tok_total FROM docs),
g AS (SELECT (dup.doc_id IS NOT NULL) AS is_dup, count(*) AS n_docs,
  sum(n_tok) AS n_tokens, min(n_tok) AS mn, max(n_tok) AS mx
  FROM docs LEFT JOIN dup ON dup.doc_id = docs.doc_id GROUP BY 1)
SELECT is_dup, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
  round(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 4) AS avg_tokens,
  CAST(mn AS BIGINT) AS min_tokens, CAST(mx AS BIGINT) AS max_tokens,
  round(CAST(n_docs AS DOUBLE) / CAST(nd_total AS DOUBLE), 6) AS doc_share,
  round(CAST(n_tokens AS DOUBLE) / CAST(tok_total AS DOUBLE), 6) AS token_share
FROM g, tot ORDER BY is_dup""",

      // graph_pagerank3's discipline with weight-proportional spread:
      // contributions pr*w/str cast to DECIMAL(28,15) pre-sum;
      // strength is an exact integer sum.
      "graph_weighted_pagerank3" ->
        s"""$E
, udw AS (SELECT s, t, w FROM e UNION ALL SELECT t AS s, s AS t, w FROM e),
n0 AS (SELECT DISTINCT s AS v FROM udw),
str AS (SELECT s AS v, sum(w) AS str FROM udw GROUP BY s),
nn AS (SELECT count(*) AS cnt FROM n0),
p0 AS (SELECT v, cast(1.0 AS DOUBLE) / (SELECT cnt FROM nn) AS pr FROM n0),
p1 AS (SELECT n0.v,
         0.15 / (SELECT cnt FROM nn)
         + 0.85 * cast(coalesce(sum(cast(p0.pr * u.w / str.str AS DECIMAL(28,15))), 0) AS DOUBLE) AS pr
       FROM n0 LEFT JOIN udw u ON u.t = n0.v
       LEFT JOIN p0 ON p0.v = u.s LEFT JOIN str ON str.v = u.s
       GROUP BY n0.v),
p2 AS (SELECT n0.v,
         0.15 / (SELECT cnt FROM nn)
         + 0.85 * cast(coalesce(sum(cast(p1.pr * u.w / str.str AS DECIMAL(28,15))), 0) AS DOUBLE) AS pr
       FROM n0 LEFT JOIN udw u ON u.t = n0.v
       LEFT JOIN p1 ON p1.v = u.s LEFT JOIN str ON str.v = u.s
       GROUP BY n0.v),
p3 AS (SELECT n0.v,
         0.15 / (SELECT cnt FROM nn)
         + 0.85 * cast(coalesce(sum(cast(p2.pr * u.w / str.str AS DECIMAL(28,15))), 0) AS DOUBLE) AS pr
       FROM n0 LEFT JOIN udw u ON u.t = n0.v
       LEFT JOIN p2 ON p2.v = u.s LEFT JOIN str ON str.v = u.s
       GROUP BY n0.v)
SELECT v AS node, round(pr, 8) AS pagerank
FROM p3 ORDER BY pagerank DESC, node LIMIT 30""",

      // ---- §2.20 (round 9, second batch) ----

      // Strict-consecutive pattern occurrences counted with pure
      // string arithmetic (len diff / pattern len) — non-overlapping
      // left-to-right in both engines, no regex engine in the loop.
      "win_pattern_match" ->
        s"""WITH j AS (SELECT user_id,
    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS j
  FROM ${T("events")} GROUP BY user_id),
p AS (SELECT unnest(['vcp','cp','ee','sv']) AS pattern),
m AS (SELECT p.pattern,
    CAST((len(j.j) - len(replace(j.j, p.pattern, ''))) / len(p.pattern) AS BIGINT) AS matches
  FROM j, p)
SELECT pattern,
  CAST(sum(CASE WHEN matches > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users_matched,
  CAST(sum(matches) AS BIGINT) AS total_matches,
  CAST(max(matches) AS BIGINT) AS max_per_user
FROM m GROUP BY pattern ORDER BY pattern""",

      // 30-min-gap sessionization (stream_sessionize's recipe), path =
      // first-8 event codes in (ts, event_id) order; integer-exact
      // until the two display divisions.
      "win_session_path_topk" ->
        s"""WITH f AS (SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS c,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
  FROM ${T("events")} WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
se AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS sid FROM f),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn FROM se),
p AS (SELECT user_id, sid, string_agg(c, '' ORDER BY ts, event_id) AS path,
    count(*) AS plen
  FROM r WHERE rn <= 8 GROUP BY 1, 2),
tot AS (SELECT count(*) AS nt FROM p)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
  round(CAST(sum(plen) AS DOUBLE) / count(*), 4) AS avg_len,
  round(CAST(count(*) AS DOUBLE) / nt, 6) AS share
FROM p, tot GROUP BY path, nt ORDER BY n_sessions DESC, path LIMIT 10""",

      // Exact integer cross-multiplication keep rule — no float
      // probability anywhere; sums exact, divisions at display.
      "sample_weighted_bernoulli" ->
        s"""WITH mx AS (SELECT max(n_chars) AS wmax FROM ${T("documents")}),
f AS (SELECT source, n_chars, wmax,
    (('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT * wmax
       < 65536 * n_chars) AS keep
  FROM ${T("documents")}, mx),
g AS (SELECT source, count(*) AS n_docs,
    sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
    sum(n_chars) AS chars_all,
    sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS chars_kept,
    max(wmax) AS wmax
  FROM f GROUP BY source)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_kept AS BIGINT) AS n_kept,
  round(CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS achieved_rate,
  round(CAST(chars_all AS DOUBLE) / CAST(n_docs * wmax AS DOUBLE), 6) AS expected_rate,
  round(CAST(chars_kept AS DOUBLE) / CAST(chars_all AS DOUBLE), 6) AS char_share_kept
FROM g ORDER BY source""",

      // Same fingerprint construction as dedup_simhash; per-bit set
      // shares from exact integer counts.
      "pipeline_simhash_bit_balance" ->
        s"""WITH sp AS (SELECT doc_id, lang, generate_subscripts(string_split(text,' '),1) AS pos,
         unnest(string_split(text,' ')) AS w FROM ${T("documents")}),
sh AS (SELECT DISTINCT a.doc_id, a.lang, concat(a.w,' ',b.w,' ',c.w) AS g
  FROM sp a JOIN sp b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
            JOIN sp c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
bits AS (SELECT doc_id, lang, bitpos,
    CASE WHEN substr(md5(g), bitpos, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END AS delta
  FROM sh, (SELECT unnest(range(1, 33)) AS bitpos)),
fp AS (SELECT doc_id, lang,
    cast(sum(CASE WHEN sd > 0 THEN (cast(1 AS BIGINT) << (bitpos - 1)) ELSE 0 END) AS BIGINT) AS fp
  FROM (SELECT doc_id, lang, bitpos, sum(delta) AS sd FROM bits GROUP BY 1,2,3)
  GROUP BY 1, 2),
n AS (SELECT count(*) AS n_docs FROM fp),
bb AS (SELECT b.bit, sum((fp >> CAST(b.bit AS INTEGER)) & 1) AS n_set
  FROM fp, (SELECT unnest(range(0, 32)) AS bit) b GROUP BY 1)
SELECT CAST(bit AS BIGINT) AS bit, CAST(n_set AS BIGINT) AS n_set,
  round(CAST(n_set AS DOUBLE) / n_docs, 6) AS share,
  round(abs(CAST(n_set AS DOUBLE) / n_docs - 0.5), 6) AS dev
FROM bb, n ORDER BY bit""",

      // Harmonic centrality within radius 3; the rational sum carried
      // as the exact integer 6·n1+3·n2+2·n3.
      "graph_closeness_3hop" ->
        s"""$E
, l1 AS (SELECT DISTINCT s AS root, t AS v FROM ud),
l2 AS (SELECT DISTINCT l1.root, ud.t AS v FROM l1 JOIN ud ON ud.s = l1.v),
l3 AS (SELECT DISTINCT l2.root, ud.t AS v FROM l2 JOIN ud ON ud.s = l2.v),
lv AS (SELECT root, v, min(depth) AS depth FROM (
    SELECT root, v, 1 AS depth FROM l1
    UNION ALL SELECT root, v, 2 FROM l2
    UNION ALL SELECT root, v, 3 FROM l3) u
  WHERE v <> root GROUP BY 1, 2)
SELECT root AS node, CAST(count(*) AS BIGINT) AS n_reached,
  round(CAST(sum(CASE depth WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END) AS DOUBLE) / 6.0, 6) AS harmonic
FROM lv GROUP BY root ORDER BY harmonic DESC, node LIMIT 30""",

      // Bounded Bellman-Ford, edge length 10000 // w; state packed as
      // cost·4+hops so the min-reduce is lexicographic and integer.
      "graph_weighted_sssp" ->
        s"""$E
, udw AS (SELECT s, t, 10000 // w AS len FROM e
  UNION ALL SELECT t AS s, s AS t, 10000 // w FROM e),
start_node AS (SELECT s AS v FROM ud GROUP BY s ORDER BY count(*) DESC, s LIMIT 1),
d0 AS (SELECT v, CAST(0 AS BIGINT) AS cost, CAST(0 AS BIGINT) AS hops FROM start_node),
d1 AS (SELECT v, (k - k % 4) // 4 AS cost, k % 4 AS hops FROM (
  SELECT v, min(cost*4 + hops) AS k FROM (
    SELECT v, cost, hops FROM d0
    UNION ALL SELECT u.t AS v, d0.cost + u.len AS cost, d0.hops + 1 AS hops
    FROM d0 JOIN udw u ON u.s = d0.v) x GROUP BY v) y),
d2 AS (SELECT v, (k - k % 4) // 4 AS cost, k % 4 AS hops FROM (
  SELECT v, min(cost*4 + hops) AS k FROM (
    SELECT v, cost, hops FROM d1
    UNION ALL SELECT u.t AS v, d1.cost + u.len AS cost, d1.hops + 1 AS hops
    FROM d1 JOIN udw u ON u.s = d1.v) x GROUP BY v) y),
d3 AS (SELECT v, (k - k % 4) // 4 AS cost, k % 4 AS hops FROM (
  SELECT v, min(cost*4 + hops) AS k FROM (
    SELECT v, cost, hops FROM d2
    UNION ALL SELECT u.t AS v, d2.cost + u.len AS cost, d2.hops + 1 AS hops
    FROM d2 JOIN udw u ON u.s = d2.v) x GROUP BY v) y)
SELECT v AS node, CAST(cost AS BIGINT) AS cost, CAST(hops AS BIGINT) AS hops
FROM d3 ORDER BY cost, node""",

      // Recall@5 of the IVF index (ann_ivf_topk's exact CTEs) against
      // the brute-force top-5 on the same 10 probes; both rankings use
      // the identical rounded-cosine + id tiebreak.
      "sim_ann_recall" ->
        s"""WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM ${T("embeddings")} WHERE vec_id < 8),
asg AS (SELECT vec_id, cid FROM (
  SELECT e.vec_id, c.cid,
    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      round(list_cosine_similarity(cast(e.embedding AS DOUBLE[]), cast(c.ce AS DOUBLE[])), 6) DESC, c.cid) AS rn
  FROM ${T("embeddings")} e CROSS JOIN cent c) WHERE rn = 1),
probes AS (SELECT vec_id AS pid, embedding AS pe FROM ${T("embeddings")} WHERE vec_id >= 10 AND vec_id < 20),
pb AS (SELECT pid, cid FROM (
  SELECT p.pid, c.cid,
    row_number() OVER (PARTITION BY p.pid ORDER BY
      round(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(c.ce AS DOUBLE[])), 6) DESC, c.cid) AS rn
  FROM probes p CROSS JOIN cent c) WHERE rn <= 2),
icand AS (SELECT DISTINCT pb.pid, a.vec_id AS cand FROM pb JOIN asg a ON a.cid = pb.cid),
iscored AS (SELECT c.pid, c.cand,
    round(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[])), 4) AS sim
  FROM icand c JOIN probes p ON p.pid = c.pid JOIN ${T("embeddings")} e ON e.vec_id = c.cand
  WHERE c.cand <> c.pid),
ivf AS (SELECT pid, cand FROM (
  SELECT pid, cand, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, cand) AS rk
  FROM iscored) WHERE rk <= 5),
ex AS (SELECT p.pid, e.vec_id AS cand,
    round(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[])), 4) AS sim
  FROM probes p CROSS JOIN ${T("embeddings")} e WHERE e.vec_id <> p.pid),
ext AS (SELECT pid, cand FROM (
  SELECT pid, cand, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, cand) AS rk
  FROM ex) WHERE rk <= 5),
hits AS (SELECT ext.pid, count(*) AS n_hits FROM ext
  WHERE EXISTS (SELECT 1 FROM ivf WHERE ivf.pid = ext.pid AND ivf.cand = ext.cand)
  GROUP BY ext.pid)
SELECT p.pid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5.0, 2) AS recall_at_5
FROM probes p LEFT JOIN hits h ON h.pid = p.pid ORDER BY p.pid""",

      // One Lloyd iteration on 1e7-quantized lanes: every squared
      // distance is an exact integer, means floor via one <2^53 double
      // division, outputs exact integer quotients (// = floor for the
      // nonnegative sums) — no >2^53 decimal->double cast anywhere.
      "sim_kmeans_inertia" ->
        s"""WITH q AS (SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS ql
  FROM ${T("embeddings")}),
lanes0 AS (SELECT vec_id, generate_subscripts(ql, 1) AS dim, unnest(ql) AS qv FROM q),
cl AS (SELECT vec_id AS cid, dim, qv AS qc FROM lanes0 WHERE vec_id < 8),
dist AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qc) * (l.qv - c.qc)) AS d2
  FROM lanes0 l JOIN cl c ON c.dim = l.dim GROUP BY 1, 2),
asg AS (SELECT vec_id, cid, d2 FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dist)
  WHERE rn = 1),
al AS (SELECT a.cid, l.dim, l.qv FROM asg a JOIN lanes0 l ON l.vec_id = a.vec_id),
means AS (SELECT cid, dim, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS qm
  FROM al GROUP BY 1, 2),
bef AS (SELECT cid, count(*) AS n_assigned, sum(d2) AS ib FROM asg GROUP BY cid),
aft AS (SELECT al.cid, sum((qv - qm) * (qv - qm)) AS ia
  FROM al JOIN means m ON m.cid = al.cid AND m.dim = al.dim GROUP BY al.cid),
shf AS (SELECT c.cid, sum((c.qc - m.qm) * (c.qc - m.qm)) AS sh
  FROM cl c JOIN means m ON m.cid = c.cid AND m.dim = c.dim GROUP BY c.cid)
SELECT CAST(b.cid AS BIGINT) AS cid, CAST(b.n_assigned AS BIGINT) AS n_assigned,
  CAST(b.ib // 10000000000 AS BIGINT) AS inertia_before_q4,
  CAST(a.ia // 10000000000 AS BIGINT) AS inertia_after_q4,
  CAST(s.sh // 100000000 AS BIGINT) AS centroid_shift_q6
FROM bef b JOIN aft a ON a.cid = b.cid JOIN shf s ON s.cid = b.cid
ORDER BY cid""",

      // Next-Lloyd-iteration assignment drift: same quantized-lane CTEs
      // as sim_kmeans_inertia, then distance of every vector to every
      // recomputed mean (lane join) and the (d2, cid) nearest tiebreak.
      "sim_kmeans_reassign" ->
        s"""WITH q AS (SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e7) AS BIGINT)) AS ql
  FROM ${T("embeddings")}),
lanes0 AS (SELECT vec_id, generate_subscripts(ql, 1) AS dim, unnest(ql) AS qv FROM q),
cl AS (SELECT vec_id AS cid, dim, qv AS qc FROM lanes0 WHERE vec_id < 8),
dist AS (SELECT l.vec_id, c.cid, sum((l.qv - c.qc) * (l.qv - c.qc)) AS d2
  FROM lanes0 l JOIN cl c ON c.dim = l.dim GROUP BY 1, 2),
asg AS (SELECT vec_id, cid FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dist)
  WHERE rn = 1),
al AS (SELECT a.cid, l.vec_id, l.dim, l.qv FROM asg a JOIN lanes0 l ON l.vec_id = a.vec_id),
means AS (SELECT cid, dim, CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS qm
  FROM al GROUP BY 1, 2),
d2m AS (SELECT l.vec_id, m.cid AS mcid, sum((l.qv - m.qm) * (l.qv - m.qm)) AS d2m
  FROM lanes0 l JOIN means m ON m.dim = l.dim GROUP BY 1, 2),
near AS (SELECT vec_id, mcid FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2m, mcid) AS rn FROM d2m)
  WHERE rn = 1)
SELECT CAST(a.cid AS BIGINT) AS cid, CAST(count(*) AS BIGINT) AS n_assigned,
  CAST(sum(CASE WHEN n.mcid <> a.cid THEN 1 ELSE 0 END) AS BIGINT) AS n_switch,
  round(CAST(sum(CASE WHEN n.mcid <> a.cid THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS switch_share
FROM asg a JOIN near n USING (vec_id) GROUP BY a.cid ORDER BY cid""",

      // Per-doc duplicated-shingle coverage deciles per source; the
      // decile is a pure integer quotient ((10*dup) // total).
      "pipeline_dup_ngram_coverage" ->
        s"""WITH sp AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
         unnest(string_split(text,' ')) AS w FROM ${T("documents")}),
sh AS (SELECT DISTINCT a.doc_id, concat(a.w,' ',b.w,' ',c.w) AS g
  FROM sp a JOIN sp b ON b.doc_id=a.doc_id AND b.pos=a.pos+1
            JOIN sp c ON c.doc_id=a.doc_id AND c.pos=a.pos+2),
df AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
per AS (SELECT doc_id, count(*) AS total,
    sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS dup
  FROM sh JOIN df USING (g) GROUP BY doc_id)
SELECT d.source, CAST((10 * per.dup) // per.total AS BIGINT) AS cov_decile,
  CAST(count(*) AS BIGINT) AS n_docs
FROM per JOIN ${T("documents")} d USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2""",

      // Dedup keep policy: LSH pairs -> 4-round min-label clusters
      // (dedup_clusters' CTEs) -> canonical per cluster (longest
      // n_chars, then lowest doc_id) -> per-source drop counts.
      "pipeline_dedup_keep_policy" ->
        s"""WITH ${minhashCtes(dir)},
pairs AS (SELECT d1, d2
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE cast(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5),
pud AS (SELECT d1 AS s, d2 AS t FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
pn0 AS (SELECT DISTINCT s AS v FROM pud),
pud2 AS (SELECT s, t FROM pud UNION ALL SELECT v, v FROM pn0),
pl0 AS (SELECT v, v AS lbl FROM pn0),
pl1 AS (SELECT pud2.s AS v, min(pl0.lbl) AS lbl FROM pud2 JOIN pl0 ON pl0.v = pud2.t GROUP BY pud2.s),
pl2 AS (SELECT pud2.s AS v, min(pl1.lbl) AS lbl FROM pud2 JOIN pl1 ON pl1.v = pud2.t GROUP BY pud2.s),
pl3 AS (SELECT pud2.s AS v, min(pl2.lbl) AS lbl FROM pud2 JOIN pl2 ON pl2.v = pud2.t GROUP BY pud2.s),
pl4 AS (SELECT pud2.s AS v, min(pl3.lbl) AS lbl FROM pud2 JOIN pl3 ON pl3.v = pud2.t GROUP BY pud2.s),
mem AS (SELECT pl4.v AS doc_id,
  row_number() OVER (PARTITION BY pl4.lbl ORDER BY dd.n_chars DESC, pl4.v) AS rn
  FROM pl4 JOIN ${T("documents")} dd ON dd.doc_id = pl4.v)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN m.rn IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
  CAST(sum(CASE WHEN m.rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
  round(CAST(count(*) - sum(CASE WHEN m.rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS kept_share
FROM ${T("documents")} d LEFT JOIN mem m ON m.doc_id = d.doc_id
GROUP BY 1 ORDER BY 1""",

      // 32-way md5 hash-shard balance; the skew factor divides once.
      "pipeline_shard_balance" ->
        s"""WITH per AS (SELECT
    ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT % 32 AS shard,
    count(*) AS n_docs, sum(len(string_split(text,' '))) AS toks
  FROM ${T("documents")} GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_shards,
  CAST(min(n_docs) AS BIGINT) AS min_docs, CAST(max(n_docs) AS BIGINT) AS max_docs,
  CAST(min(toks) AS BIGINT) AS min_tokens, CAST(max(toks) AS BIGINT) AS max_tokens,
  CAST(sum(toks) AS BIGINT) AS total_tokens,
  round(CAST(max(toks) * count(*) AS DOUBLE) / CAST(sum(toks) AS DOUBLE), 4) AS skew
FROM per""",

      // Pack-then-chunk layout audit: running token offsets in doc_id
      // order, 512-token chunks, boundary-straddling doc count; all
      // boundary tests are integer // arithmetic.
      "pipeline_chunk_packing" ->
        s"""WITH dd AS (SELECT doc_id,
    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok FROM ${T("documents")}),
c AS (SELECT doc_id, n_tok,
    sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM dd),
a AS (SELECT sum(n_tok) AS total, count(*) AS n_docs,
  sum(CASE WHEN (cum - n_tok) // 512 <> (cum - 1) // 512 THEN 1 ELSE 0 END) AS boundary_docs
  FROM c)
SELECT CAST(total AS BIGINT) AS total_tokens, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(boundary_docs AS BIGINT) AS boundary_docs,
  CAST((total + 511) // 512 AS BIGINT) AS n_chunks,
  round(CAST(total AS DOUBLE) / CAST(((total + 511) // 512) * 512 AS DOUBLE), 4) AS fill_share
FROM a""",

      // Naive-seasonal (lag-7-day) forecast of daily order revenue,
      // scored per month: WAPE + signed bias, DECIMAL sums end to end.
      "ts_forecast_wape" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM ${T("orders")} GROUP BY 1)
SELECT CAST(date_trunc('month', a.day) AS DATE) AS month,
  CAST(count(*) AS BIGINT) AS n_days,
  round(CAST(sum(abs(a.rev - f.rev)) AS DOUBLE) / CAST(sum(a.rev) AS DOUBLE), 4) AS wape,
  round(CAST(sum(a.rev - f.rev) AS DOUBLE) / CAST(sum(a.rev) AS DOUBLE), 4) AS bias
FROM daily a JOIN daily f ON f.day = a.day - INTERVAL 7 DAY
GROUP BY 1 ORDER BY 1""",

      // Relational division: customers covering every priority level,
      // per nation. count(distinct) == |divisor|, no double negation.
      "set_division" ->
        s"""WITH np AS (SELECT count(DISTINCT o_orderpriority) AS np FROM ${T("orders")}),
cov AS (SELECT o_custkey, count(DISTINCT o_orderpriority) AS k
  FROM ${T("orders")} GROUP BY 1)
SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_customers,
  CAST(sum(CASE WHEN cov.k = np.np THEN 1 ELSE 0 END) AS BIGINT) AS n_full_coverage,
  round(CAST(sum(CASE WHEN cov.k = np.np THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS coverage_share
FROM ${T("customer")} c
JOIN ${T("nation")} n ON n.n_nationkey = c.c_nationkey
JOIN cov ON cov.o_custkey = c.c_custkey
CROSS JOIN np
GROUP BY 1 ORDER BY 1""",

      // Ego-network density of the top-10 degree hubs over EDGES.
      "graph_ego_density" ->
        s"""${edgesWith(dir)},
deg AS (SELECT s AS v, count(*) AS d FROM ud GROUP BY 1),
hubs AS (SELECT v, d FROM deg ORDER BY d DESC, v LIMIT 10),
nbr AS (SELECT h.v, h.d, ud.t AS n FROM hubs h JOIN ud ON ud.s = h.v),
ego AS (SELECT a.v, count(*) AS ego_edges
  FROM nbr a JOIN nbr b ON b.v = a.v AND b.n > a.n
  JOIN e ON e.s = a.n AND e.t = b.n
  GROUP BY 1)
SELECT CAST(h.v AS BIGINT) AS v, CAST(h.d AS BIGINT) AS deg,
  CAST(coalesce(ego.ego_edges, 0) AS BIGINT) AS ego_edges,
  round(2.0 * coalesce(ego.ego_edges, 0) / (h.d * (h.d - 1.0)), 4) AS density
FROM hubs h LEFT JOIN ego ON ego.v = h.v
ORDER BY h.d DESC, h.v""",

      // Embedding-space dedup clusters: 4-round min-label CC over the
      // exact cosine near-dup pairs (sim_cosine_neardup's pair set).
      "dedup_semantic_clusters" ->
        s"""WITH e0 AS (SELECT vec_id, embedding FROM ${T("embeddings")} WHERE vec_id % 2 = 0),
p AS (SELECT a.vec_id AS d1, b.vec_id AS d2
  FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(cast(a.embedding AS DOUBLE[]), cast(b.embedding AS DOUBLE[])) >= 0.35),
pud AS (SELECT d1 AS s, d2 AS t FROM p UNION ALL SELECT d2, d1 FROM p),
pn0 AS (SELECT DISTINCT s AS v FROM pud),
pud2 AS (SELECT s, t FROM pud UNION ALL SELECT v, v FROM pn0),
pl0 AS (SELECT v, v AS lbl FROM pn0),
pl1 AS (SELECT pud2.s AS v, min(pl0.lbl) AS lbl FROM pud2 JOIN pl0 ON pl0.v = pud2.t GROUP BY pud2.s),
pl2 AS (SELECT pud2.s AS v, min(pl1.lbl) AS lbl FROM pud2 JOIN pl1 ON pl1.v = pud2.t GROUP BY pud2.s),
pl3 AS (SELECT pud2.s AS v, min(pl2.lbl) AS lbl FROM pud2 JOIN pl2 ON pl2.v = pud2.t GROUP BY pud2.s),
pl4 AS (SELECT pud2.s AS v, min(pl3.lbl) AS lbl FROM pud2 JOIN pl3 ON pl3.v = pud2.t GROUP BY pud2.s)
SELECT CAST(lbl AS BIGINT) AS canonical_id, CAST(count(*) AS BIGINT) AS cluster_size
FROM pl4 GROUP BY lbl ORDER BY canonical_id""",

      // Interval merge: 30-day service windows per order, merged into
      // maximal per-customer episodes (exclusive prefix-max frame,
      // totalized order), episode-count histogram.
      "win_interval_merge" ->
        s"""WITH iv AS (SELECT o_custkey AS c, o_orderkey AS k,
    CAST(o_orderdate AS DATE) AS s, CAST(o_orderdate AS DATE) + 29 AS e
  FROM ${T("orders")}),
m AS (SELECT c, s, e, k,
    max(e) OVER (PARTITION BY c ORDER BY s, e, k
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM iv),
isl AS (SELECT c, s, e, sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
    OVER (PARTITION BY c ORDER BY s, e, k ROWS UNBOUNDED PRECEDING) AS ep FROM m),
eps AS (SELECT c, ep, min(s) AS es, max(e) AS ee FROM isl GROUP BY 1, 2),
per AS (SELECT c, count(*) AS n_episodes, sum(ee - es + 1) AS covered FROM eps GROUP BY 1)
SELECT CAST(n_episodes AS BIGINT) AS n_episodes,
  CAST(count(*) AS BIGINT) AS n_customers,
  CAST(sum(covered) AS BIGINT) AS covered_days,
  round(CAST(sum(covered) AS DOUBLE) / count(*), 2) AS avg_covered_days
FROM per GROUP BY 1 ORDER BY 1""",

      // Difference-in-differences: high-priority segment vs rest,
      // pre/post 1998-01-01; DiD from the unrounded cell means.
      "ts_did_lift" ->
        s"""WITH cells AS (SELECT
    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'treat' ELSE 'control' END AS grp,
    CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1998-01-01' THEN 'post' ELSE 'pre' END AS period,
    CAST(o_orderdate AS DATE) AS day, CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM ${T("orders")}),
agg AS (SELECT grp, period, sum(p) AS rev, count(DISTINCT day) AS days FROM cells GROUP BY 1, 2),
mm AS (SELECT
  max(CASE WHEN grp = 'treat' AND period = 'pre' THEN CAST(rev AS DOUBLE) / days END) AS tp,
  max(CASE WHEN grp = 'treat' AND period = 'post' THEN CAST(rev AS DOUBLE) / days END) AS tq,
  max(CASE WHEN grp = 'control' AND period = 'pre' THEN CAST(rev AS DOUBLE) / days END) AS cp,
  max(CASE WHEN grp = 'control' AND period = 'post' THEN CAST(rev AS DOUBLE) / days END) AS cq
  FROM agg)
SELECT round(tp, 2) AS treat_pre, round(tq, 2) AS treat_post,
  round(cp, 2) AS control_pre, round(cq, 2) AS control_post,
  round((tq - tp) - (cq - cp), 2) AS did
FROM mm""",

      // Monthly seasonal index: exact cross-product ratio
      // (mrev*tdays)/(mdays*trev), one division at output.
      "ts_seasonal_index" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM ${T("orders")} GROUP BY 1),
m AS (SELECT month(day) AS mo, sum(rev) AS mrev, count(*) AS mdays FROM daily GROUP BY 1),
tot AS (SELECT sum(rev) AS trev, count(*) AS tdays FROM daily)
SELECT CAST(mo AS BIGINT) AS mo, CAST(mdays AS BIGINT) AS n_days,
  round(CAST(mrev * tdays AS DOUBLE) / CAST(mdays * trev AS DOUBLE), 4) AS seasonal_index
FROM m CROSS JOIN tot ORDER BY mo""",

      // MMR greedy selection on floor-quantized integer sims: every
      // score is the exact BIGINT 7*rel - 3*maxsim, ties on cand id.
      "sim_mmr_topk" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
probes AS (SELECT vec_id pid, embedding pe FROM emb WHERE vec_id < 10),
scored AS (SELECT p.pid, e.vec_id cand,
    CAST(floor(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) reli
  FROM probes p CROSS JOIN emb e WHERE e.vec_id <> p.pid),
pool AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY reli DESC, cand) rk FROM scored) t WHERE rk <= 10),
pp AS (SELECT a.pid, a.cand c1, b.cand c2,
    CAST(floor(list_cosine_similarity(cast(e1.embedding AS DOUBLE[]), cast(e2.embedding AS DOUBLE[]))*10000) AS BIGINT) s
  FROM pool a JOIN pool b ON a.pid = b.pid AND a.cand <> b.cand
  JOIN emb e1 ON e1.vec_id = a.cand JOIN emb e2 ON e2.vec_id = b.cand),
sel1 AS (SELECT pid, cand, reli, CAST(NULL AS BIGINT) ms FROM pool WHERE rk = 1),
m2 AS (SELECT p.pid, p.cand, p.reli, pp.s ms FROM pool p JOIN sel1 s1 ON s1.pid = p.pid
  JOIN pp ON pp.pid = p.pid AND pp.c1 = p.cand AND pp.c2 = s1.cand),
sel2 AS (SELECT pid, cand, reli, ms FROM (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY 7*reli-3*ms DESC, cand) r FROM m2) t WHERE r = 1),
m3 AS (SELECT m.pid, m.cand, m.reli, greatest(m.ms, pp.s) ms FROM m2 m JOIN sel2 s ON s.pid = m.pid AND m.cand <> s.cand
  JOIN pp ON pp.pid = m.pid AND pp.c1 = m.cand AND pp.c2 = s.cand),
sel3 AS (SELECT pid, cand, reli, ms FROM (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY 7*reli-3*ms DESC, cand) r FROM m3) t WHERE r = 1),
m4 AS (SELECT m.pid, m.cand, m.reli, greatest(m.ms, pp.s) ms FROM m3 m JOIN sel3 s ON s.pid = m.pid AND m.cand <> s.cand
  JOIN pp ON pp.pid = m.pid AND pp.c1 = m.cand AND pp.c2 = s.cand),
sel4 AS (SELECT pid, cand, reli, ms FROM (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY 7*reli-3*ms DESC, cand) r FROM m4) t WHERE r = 1),
m5 AS (SELECT m.pid, m.cand, m.reli, greatest(m.ms, pp.s) ms FROM m4 m JOIN sel4 s ON s.pid = m.pid AND m.cand <> s.cand
  JOIN pp ON pp.pid = m.pid AND pp.c1 = m.cand AND pp.c2 = s.cand),
sel5 AS (SELECT pid, cand, reli, ms FROM (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY 7*reli-3*ms DESC, cand) r FROM m5) t WHERE r = 1),
sel AS (SELECT pid, 1 step, cand, reli, ms FROM sel1 UNION ALL SELECT pid, 2, cand, reli, ms FROM sel2
  UNION ALL SELECT pid, 3, cand, reli, ms FROM sel3 UNION ALL SELECT pid, 4, cand, reli, ms FROM sel4
  UNION ALL SELECT pid, 5, cand, reli, ms FROM sel5)
SELECT pid, CAST(step AS BIGINT) AS step, cand, round(reli/10000.0, 4) AS rel,
  round((7*reli - 3*coalesce(ms, 0))/100000.0, 5) AS mmr
FROM sel ORDER BY pid, step""",

      // Leave-one-out 5-NN accuracy on the fixed 50-probe panel.
      "sim_knn_accuracy" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
probes AS (SELECT vec_id pid, embedding pe, label tl FROM emb WHERE vec_id % 10 = 3 AND vec_id < 500),
scored AS (SELECT p.pid, p.tl, e.label AS cl, e.vec_id cand,
    CAST(floor(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) reli
  FROM probes p CROSS JOIN emb e WHERE e.vec_id <> p.pid),
nn AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY reli DESC, cand) rk FROM scored) t WHERE rk <= 5),
votes AS (SELECT pid, tl, cl, count(*) v FROM nn GROUP BY 1, 2, 3),
pred AS (SELECT pid, tl, cl pl FROM (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY v DESC, cl) r FROM votes) t WHERE r = 1)
SELECT CAST(tl AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_probes,
  CAST(sum(CASE WHEN pl = tl THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
  round(sum(CASE WHEN pl = tl THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS accuracy
FROM pred GROUP BY 1 ORDER BY 1""",

      // Integer-exact centroid-distance 2-sigma cut: d2q and the
      // variance test never leave HUGEINT/DECIMAL.
      "sim_centroid_outliers" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
qd AS (SELECT vec_id, label, generate_subscripts(embedding, 1) pos,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE)*1000) AS BIGINT) qx FROM emb),
cent AS (SELECT label, pos, sum(qx) S, count(*) n FROM qd GROUP BY 1, 2),
d2 AS (SELECT qd.vec_id, qd.label, sum((c.n*qd.qx - c.S)*(c.n*qd.qx - c.S)) d2q
  FROM qd JOIN cent c ON c.label = qd.label AND c.pos = qd.pos GROUP BY 1, 2),
stats AS (SELECT label, count(*) cnt, sum(CAST(d2q AS HUGEINT)) sd,
    sum(CAST(d2q AS HUGEINT)*d2q) ssq FROM d2 GROUP BY 1)
SELECT CAST(d.label AS BIGINT) AS label, d.vec_id,
  round(CAST(d2q AS DOUBLE)/(s.cnt*s.cnt*1000000.0), 6) AS dist2
FROM d2 d JOIN stats s ON s.label = d.label
WHERE s.cnt*CAST(d2q AS HUGEINT) - sd > 0
  AND (s.cnt*CAST(d2q AS HUGEINT) - sd)*(s.cnt*CAST(d2q AS HUGEINT) - sd) > 4*(s.cnt*ssq - sd*sd)
ORDER BY label, vec_id""",

      // IDF-weighted vs plain Jaccard on the verified LSH pairs;
      // idf = floor(ln(N/df)*1e6) so both ratios are integer sums.
      "dedup_idf_jaccard" ->
        s"""WITH ${minhashCtes(dir)},
pairs AS (SELECT d1, d2
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE cast(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5),
nd AS (SELECT count(*) n FROM ${T("documents")}),
idf AS (SELECT g, CAST(floor(ln(CAST((SELECT n FROM nd) AS DOUBLE)/count(*))*1000000) AS BIGINT) wi
  FROM sh GROUP BY g),
wdoc AS (SELECT doc_id, sum(wi) W, count(*) sz FROM sh JOIN idf USING(g) GROUP BY 1),
winter AS (SELECT p.d1, p.d2, sum(i.wi) WI, count(*) ic
  FROM pairs p JOIN sh a ON a.doc_id = p.d1 JOIN sh b ON b.doc_id = p.d2 AND b.g = a.g
  JOIN idf i ON i.g = a.g GROUP BY 1, 2)
SELECT d1, d2,
  round(CAST(WI AS DOUBLE)/(w1.W + w2.W - WI), 4) AS wjac,
  round(CAST(ic AS DOUBLE)/(w1.sz + w2.sz - ic), 4) AS jac
FROM winter JOIN wdoc w1 ON w1.doc_id = d1 JOIN wdoc w2 ON w2.doc_id = d2
ORDER BY d1, d2""",

      // Voronoi assignment on a deterministic integer grid: d2 is
      // BIGINT end to end, argmin ties break on anchor id.
      "geo_nearest_anchor" ->
        s"""WITH a(aid, ax, ay) AS (VALUES (1, 100, 100), (2, 800, 200),
  (3, 500, 500), (4, 200, 850), (5, 900, 900)),
c AS (SELECT c_custkey, (c_custkey*37) % 1000 x, (c_custkey*91) % 1000 y
  FROM ${T("customer")}),
dst AS (SELECT c_custkey, aid, (x-ax)*(x-ax) + (y-ay)*(y-ay) d2
  FROM c CROSS JOIN a),
b AS (SELECT c_custkey, d2, aid FROM (SELECT *,
    row_number() OVER (PARTITION BY c_custkey ORDER BY d2, aid) r FROM dst) t
  WHERE r = 1)
SELECT CAST(aid AS BIGINT) AS anchor_id, CAST(count(*) AS BIGINT) AS n_customers,
  round(CAST(sum(d2) AS DOUBLE)/count(*), 4) AS avg_d2,
  CAST(max(d2) AS BIGINT) AS max_d2
FROM b GROUP BY 1 ORDER BY 1""",

      // Jackknife LOO SE of mean daily revenue: the per-day term is
      // one exact decimal difference cast once to double and
      // floor-quantized to BIGINT before squaring.
      "agg_jackknife_loo" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dy,
    sum(CAST(o_totalprice AS DECIMAL(18,2))) rev
  FROM ${T("orders")} GROUP BY 1),
tot AS (SELECT sum(rev) S, count(*) n FROM daily),
q AS (SELECT CAST(floor(CAST(t.S - t.n*d.rev AS DOUBLE)/100000) AS BIGINT) qv,
    t.S, t.n FROM daily d CROSS JOIN tot t)
SELECT CAST(max(n) AS BIGINT) AS n_days,
  round(CAST(max(S) AS DOUBLE)/max(n), 2) AS mean_daily,
  round(sqrt(CAST(sum(qv*qv) AS DOUBLE)*1e10 /
    CAST(max(n)*max(n)*max(n)*(max(n)-1) AS DOUBLE)), 2) AS jk_se
FROM q""",

      // Kendall tau-b over the month-grain series: all pair decisions
      // on BIGINT cents cross-products.
      "agg_kendall_tau" ->
        s"""WITH m AS (SELECT date_trunc('month', o_orderdate) mo, count(*) x,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) sp
  FROM ${T("orders")} GROUP BY 1),
p AS (SELECT (a.x - b.x) dx, (a.sp*b.x - b.sp*a.x) dy
  FROM m a JOIN m b ON a.mo < b.mo),
cd AS (SELECT CASE WHEN dx = 0 OR dy = 0 THEN 0
    WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0) THEN 1 ELSE -1 END c,
  CASE WHEN dx = 0 THEN 1 ELSE 0 END tx,
  CASE WHEN dy = 0 THEN 1 ELSE 0 END ty FROM p)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
  CAST(sum(CASE WHEN c = -1 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
  CAST(sum(tx) AS BIGINT) AS ties_x, CAST(sum(ty) AS BIGINT) AS ties_y,
  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) -
      sum(CASE WHEN c = -1 THEN 1 ELSE 0 END) AS DOUBLE) /
    sqrt(CAST((count(*) - sum(tx))*(count(*) - sum(ty)) AS DOUBLE)), 4) AS tau_b
FROM cd""",

      // TWAP: each event's price held until the next event; both
      // averages rounded half-up at 4dp in INTEGER arithmetic
      // ((200*num + den) // (2*den)) on BIGINT cents — no
      // round(double) knife edge.
      "win_time_weighted_avg" ->
        s"""WITH li AS (SELECT l_partkey, CAST(l_shipdate AS DATE) sd,
    l_orderkey, l_linenumber,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) pc
  FROM ${T("lineitem")} WHERE l_partkey % 25 = 0),
dw AS (SELECT *, lead(sd) OVER (PARTITION BY l_partkey
    ORDER BY sd, l_orderkey, l_linenumber) nxt FROM li),
ww AS (SELECT l_partkey, pc, CASE WHEN nxt IS NULL THEN 1
    ELSE greatest(date_diff('day', sd, nxt), 1) END wdays FROM dw),
g AS (SELECT l_partkey, count(*) ne, sum(wdays) den,
    sum(pc*wdays) numc, sum(pc) spc FROM ww GROUP BY 1)
SELECT l_partkey AS partkey, CAST(ne AS BIGINT) AS n_events,
  CAST(den AS BIGINT) AS total_days,
  CAST((200*numc + den) // (2*den) AS DOUBLE)/10000.0 AS twap,
  CAST((200*spc + ne) // (2*ne) AS DOUBLE)/10000.0 AS simple_avg
FROM g ORDER BY 1""",

      // Simplified silhouette: integer-quantized lane distances, the
      // b-argmin and every sign decision on BIGINT.
      "sim_silhouette_simplified" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
qd AS (SELECT vec_id, label, generate_subscripts(embedding, 1) pos,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE)*1000) AS BIGINT) qx FROM emb),
cent AS (SELECT label cl, pos cp, sum(qx) cs, count(*) cn FROM qd GROUP BY 1, 2),
dist AS (SELECT vec_id, label, cl,
    CAST(floor(CAST(sum((c.cn*qd.qx - c.cs)*(c.cn*qd.qx - c.cs)) AS DOUBLE) /
      CAST(max(c.cn)*max(c.cn) AS DOUBLE)) AS BIGINT) dq
  FROM qd JOIN cent c ON c.cp = qd.pos GROUP BY 1, 2, 3),
ab AS (SELECT vec_id, label,
    max(CASE WHEN cl = label THEN dq END) a,
    min(CASE WHEN cl <> label THEN dq END) b FROM dist GROUP BY 1, 2),
sil AS (SELECT label, CASE WHEN greatest(a, b) = 0 THEN 0
    ELSE CAST(floor(CAST(b - a AS DOUBLE)/CAST(greatest(a, b) AS DOUBLE)*1e6)
      AS BIGINT) END sq FROM ab)
SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
  round(CAST(sum(sq) AS DOUBLE)/(count(*)*1000000.0), 4) AS mean_sil,
  CAST(sum(CASE WHEN sq < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
FROM sil GROUP BY 1 ORDER BY 1""",

      // MERGE-apply audit: snapshot (<1996) full-outer delta (1996),
      // per-action counts and post-merge totals.
      "cdc_merge_apply" ->
        s"""WITH snap AS (SELECT o_custkey ck, count(*) n,
    sum(CAST(o_totalprice AS DECIMAL(18,2))) sp
  FROM ${T("orders")} WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1),
delta AS (SELECT o_custkey ck, count(*) n,
    sum(CAST(o_totalprice AS DECIMAL(18,2))) sp
  FROM ${T("orders")} WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
merged AS (SELECT CASE WHEN s.ck IS NULL THEN 'insert'
    WHEN d.ck IS NULL THEN 'unchanged' ELSE 'update' END act,
  coalesce(s.n, 0) + coalesce(d.n, 0) n,
  coalesce(s.sp, 0) + coalesce(d.sp, 0) sp
  FROM snap s FULL OUTER JOIN delta d ON s.ck = d.ck)
SELECT act AS "action", CAST(count(*) AS BIGINT) AS n_customers,
  CAST(sum(n) AS BIGINT) AS orders_after,
  round(CAST(sum(sp) AS DOUBLE), 2) AS spend_after
FROM merged GROUP BY 1 ORDER BY 1""",

      // Hodges-Lehmann pseudo-median: median ranks select VALUES of
      // the sorted Walsh-sum multiset — tie-order-invariant; outputs
      // are single divisions of exact integers, no rounding at all.
      "agg_hodges_lehmann" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dy,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) c
  FROM ${T("orders")} GROUP BY 1),
p AS (SELECT a.c + b.c w2 FROM daily a JOIN daily b ON a.dy <= b.dy),
m AS (SELECT count(*) mm FROM p),
r AS (SELECT w2, row_number() OVER (ORDER BY w2) rn FROM p),
sel AS (SELECT w2 FROM r CROSS JOIN m WHERE rn IN ((mm+1)//2, mm//2 + 1)),
tot AS (SELECT sum(c) sc, count(*) n FROM daily)
SELECT CAST(max(n) AS BIGINT) AS n_days, CAST(max(mm) AS BIGINT) AS n_pairs,
  CAST(sum(w2) AS DOUBLE)/(count(*)*200.0) AS hl_estimate,
  CAST(max(sc) AS DOUBLE)/(max(n)*100.0) AS mean_daily
FROM sel CROSS JOIN m CROSS JOIN tot""",

      // Dyadic recency decay: weight = 1 << (10 - age div 60 capped),
      // BIGINT score sums; the only float op is the final quantized
      // normalization.
      "agg_recency_decay" ->
        s"""WITH sc AS (SELECT o_custkey,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) *
      (CAST(1 AS BIGINT) << CAST(10 - least(CAST(floor(
        date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-09-01')/60)
        AS BIGINT), 10) AS INT))) score
  FROM ${T("orders")} GROUP BY 1)
SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
  floor(CAST(sum(score) AS DOUBLE)/(count(*)*102400.0)*1e4)/1e4
    AS avg_decayed_value
FROM sc JOIN ${T("customer")} cu ON cu.c_custkey = sc.o_custkey
  JOIN ${T("nation")} na ON na.n_nationkey = cu.c_nationkey
GROUP BY 1 ORDER BY 1""",

      // Decision-stump split search: exact integer histogram, the
      // impurity evaluated in double from identical exact counts and
      // floor-quantized for the argmin.
      "agg_best_split_gini" ->
        s"""WITH b AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)
      // 5000000 bk,
    count(*) nb,
    sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) pb
  FROM ${T("orders")} GROUP BY 1),
th AS (SELECT k FROM generate_series(1, 10) t(k)),
tot AS (SELECT sum(nb) n, sum(pb) p FROM b),
cum AS (SELECT k, coalesce(sum(nb), 0) nl, coalesce(sum(pb), 0) pl
  FROM th LEFT JOIN b ON b.bk < th.k GROUP BY 1),
sc AS (SELECT k, nl, pl, n, p,
    CASE WHEN nl = 0 OR nl = n THEN
      2.0*(CAST(p AS DOUBLE)/CAST(n AS DOUBLE))*
        (1.0 - CAST(p AS DOUBLE)/CAST(n AS DOUBLE))*CAST(n AS DOUBLE)
    ELSE
      (CAST(nl AS DOUBLE) - (CAST(pl AS DOUBLE)*CAST(pl AS DOUBLE) +
        (CAST(nl AS DOUBLE)-CAST(pl AS DOUBLE))*(CAST(nl AS DOUBLE)-CAST(pl AS DOUBLE)))/CAST(nl AS DOUBLE)) +
      (CAST(n-nl AS DOUBLE) - (CAST(p-pl AS DOUBLE)*CAST(p-pl AS DOUBLE) +
        (CAST(n-nl AS DOUBLE)-CAST(p-pl AS DOUBLE))*(CAST(n-nl AS DOUBLE)-CAST(p-pl AS DOUBLE)))/CAST(n-nl AS DOUBLE))
    END impd
  FROM cum CROSS JOIN tot),
sq AS (SELECT k, nl, pl, CAST(floor(impd*1e6) AS BIGINT) impq FROM sc),
bt AS (SELECT k bk FROM sq ORDER BY impq, k LIMIT 1)
SELECT CAST(k*50000 AS BIGINT) AS threshold, CAST(nl AS BIGINT) AS n_left,
  CAST(pl AS BIGINT) AS pos_left, CAST(impq AS DOUBLE)/1e6 AS weighted_gini,
  (k = (SELECT bk FROM bt)) AS is_best
FROM sq ORDER BY 1""",

      // Kaufman efficiency ratio per month: BIGINT cents moves, one
      // quantized division; single-day months yield NULL er.
      "ts_efficiency_ratio" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dy,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) c
  FROM ${T("orders")} GROUP BY 1),
dd AS (SELECT date_trunc('month', dy) mo, dy, c,
    lag(c) OVER (PARTITION BY date_trunc('month', dy) ORDER BY dy) prev
  FROM daily),
g AS (SELECT mo, count(*) nd, arg_min(c, dy) fc, arg_max(c, dy) lc,
    sum(abs(c - prev)) vol FROM dd GROUP BY 1)
SELECT strftime(mo, '%Y-%m') AS month, CAST(nd AS BIGINT) AS n_days,
  CAST(abs(lc - fc) AS DOUBLE)/100 AS net_move,
  CAST(vol AS DOUBLE)/100 AS total_move,
  CASE WHEN vol > 0 THEN
    floor(CAST(abs(lc - fc) AS DOUBLE)/CAST(vol AS DOUBLE)*1e4)/1e4 END AS er
FROM g ORDER BY 1""",

      // Neyman allocation with largest-remainder integerization; the
      // stratum weight floor-quantizes to BIGINT so the weight total
      // has no float fold order.
      "sample_neyman_allocation" ->
        s"""WITH st AS (SELECT source, count(*) nh, sum(n_chars) sx,
    sum(n_chars*n_chars) sxx FROM ${T("documents")} GROUP BY 1),
w AS (SELECT source, nh,
    CAST(floor(sqrt(CAST(nh*sxx - sx*sx AS DOUBLE))) AS BIGINT) w FROM st),
tot AS (SELECT sum(w) tw FROM w),
q AS (SELECT source, nh, CAST(10000*w AS DOUBLE)/tw quota
  FROM w CROSS JOIN tot),
q2 AS (SELECT source, nh, quota, CAST(floor(quota) AS BIGINT) base FROM q),
lv AS (SELECT 10000 - sum(base) leftover FROM q2),
r AS (SELECT *, row_number() OVER (ORDER BY quota - base DESC, source) rr FROM q2)
SELECT source, CAST(nh AS BIGINT) AS n_docs,
  CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc,
  floor(quota*1e4)/1e4 AS quota_frac
FROM r CROSS JOIN lv ORDER BY source""",

      // Winnowing fingerprints: rolling-window minima of md5 shingle
      // hashes (lexicographic string minima — engine-identical);
      // candidate pairs share >= 3 rare fingerprints.
      "dedup_winnowing" ->
        s"""WITH sp AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) pos,
    unnest(string_split(text,' ')) w FROM ${T("documents")}),
sh AS (SELECT a.doc_id, a.pos, md5(concat(a.w,' ',b.w,' ',c.w)) h
  FROM sp a JOIN sp b ON b.doc_id = a.doc_id AND b.pos = a.pos+1
            JOIN sp c ON c.doc_id = a.doc_id AND c.pos = a.pos+2),
fp AS (SELECT DISTINCT doc_id, mh FROM (
  SELECT doc_id,
    min(h) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) mh,
    count(*) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) win
  FROM sh) t WHERE win = 4),
rare AS (SELECT mh FROM fp GROUP BY mh HAVING count(*) BETWEEN 2 AND 10),
f2 AS (SELECT doc_id, mh FROM fp JOIN rare USING (mh)),
p AS (SELECT a.doc_id d1, b.doc_id d2, count(*) ns
  FROM f2 a JOIN f2 b ON a.mh = b.mh AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT d1, d2, CAST(ns AS BIGINT) AS n_shared FROM p WHERE ns >= 3
ORDER BY 1, 2""",

      // Nested struct-array collection: per-order lineitem structs,
      // deterministically ordered, first/last fields extracted.
      "fn_nested_collect" ->
        s"""WITH li AS (SELECT l_orderkey,
    list(struct_pack(sd := CAST(l_shipdate AS DATE),
        ln := CAST(l_linenumber AS BIGINT),
        pc := CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT))
      ORDER BY CAST(l_shipdate AS DATE), l_linenumber) arr
  FROM ${T("lineitem")} WHERE l_orderkey % 100 = 0 GROUP BY 1)
SELECT l_orderkey AS orderkey, CAST(len(arr) AS BIGINT) AS n_lines,
  arr[1].sd AS first_ship, CAST(arr[1].pc AS DOUBLE)/100 AS first_price,
  arr[-1].sd AS last_ship
FROM li ORDER BY 1""",

      // Two-proportion z-test on the user_id%2 split; z quantized,
      // significance decided on the quantized integer.
      "agg_ab_proportions_ztest" ->
        s"""WITH u AS (SELECT user_id % 2 variant, user_id,
    max(CASE WHEN event_type = 'purchase' AND value >= 100 THEN 1 ELSE 0 END) conv
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1, 2),
g AS (SELECT variant, count(*) n, sum(conv) c FROM u GROUP BY 1),
w AS (SELECT max(CASE WHEN variant = 0 THEN n END) n0,
    max(CASE WHEN variant = 0 THEN c END) c0,
    max(CASE WHEN variant = 1 THEN n END) n1,
    max(CASE WHEN variant = 1 THEN c END) c1 FROM g),
z AS (SELECT *,
    CASE WHEN c0+c1 > 0 AND c0+c1 < n0+n1 THEN
    (CAST(c0 AS DOUBLE)/CAST(n0 AS DOUBLE) - CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE)) /
    sqrt((CAST(c0+c1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE)) *
      (1.0 - CAST(c0+c1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE)) *
      (1.0/CAST(n0 AS DOUBLE) + 1.0/CAST(n1 AS DOUBLE))) END zz
  FROM w)
SELECT CAST(n0 AS BIGINT) AS n_a, CAST(c0 AS BIGINT) AS conv_a,
  CAST(n1 AS BIGINT) AS n_b, CAST(c1 AS BIGINT) AS conv_b,
  floor(CAST(c0 AS DOUBLE)/CAST(n0 AS DOUBLE)*1e6)/1e6 AS rate_a,
  floor(CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE)*1e6)/1e6 AS rate_b,
  floor(zz*1e4)/1e4 AS z, floor(abs(zz)*1e4) > 19600 AS significant_95
FROM z""",

      // ECE with a fully integer core: bin = exact hundredth of the
      // discount, per-bin gap |b*n - 10*pos| BIGINT, one division.
      "agg_calibration_error" ->
        s"""WITH b AS (SELECT CAST(CAST(l_discount AS DECIMAL(4,2))*100 AS BIGINT) bin,
    count(*) nb, sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) pos
  FROM ${T("lineitem")} GROUP BY 1),
tot AS (SELECT sum(nb) n, sum(abs(bin*nb - 10*pos)) sgap FROM b)
SELECT bin, CAST(nb AS BIGINT) AS n, CAST(bin AS DOUBLE)/10 AS confidence,
  floor(CAST(pos AS DOUBLE)/nb*1e4)/1e4 AS observed_rate,
  CAST(abs(bin*nb - 10*pos) AS DOUBLE)/(10.0*nb) AS bin_gap,
  CAST(sgap AS DOUBLE)/(10.0*n) AS ece
FROM b CROSS JOIN tot ORDER BY bin""",

      // Referential-integrity audit: anti-join orphans both ways plus
      // the temporal ship-before-order violation count.
      "agg_fk_violations" ->
        s"""WITH li AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) sd FROM ${T("lineitem")}),
o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) od FROM ${T("orders")}),
-- NOT EXISTS, not NOT IN: with any NULL key NOT IN evaluates UNKNOWN
-- (one NULL o_orderkey would empty the orphan count), while Spark's
-- left_anti counts NULL-key rows as orphans — NOT EXISTS matches the
-- anti-join semantics exactly (advice r9)
orphans AS (SELECT count(*) orphan_lines FROM li
  WHERE NOT EXISTS (SELECT 1 FROM o WHERE o.o_orderkey = li.l_orderkey)),
childless AS (SELECT count(*) childless_orders FROM o
  WHERE NOT EXISTS (SELECT 1 FROM li WHERE li.l_orderkey = o.o_orderkey)),
early AS (SELECT sum(CASE WHEN sd < od THEN 1 ELSE 0 END) ship_before_order,
    count(*) joined_lines
  FROM li JOIN o ON o_orderkey = l_orderkey)
SELECT CAST(joined_lines AS BIGINT) AS joined_lines,
  CAST(orphan_lines AS BIGINT) AS orphan_lines,
  CAST(childless_orders AS BIGINT) AS childless_orders,
  CAST(ship_before_order AS BIGINT) AS ship_before_order
FROM early CROSS JOIN orphans CROSS JOIN childless""",

      // Schema evolution: the oracle simulates the evolved nulls from
      // the original table (pre-1996 rows lack priority, 1996+ lack
      // totalprice) — one damaged value fails the hash.
      "src_schema_evolution" ->
        s"""WITH ev AS (SELECT o_orderkey, o_orderstatus,
    CASE WHEN o_orderdate < TIMESTAMP '1996-01-01' THEN o_totalprice END price,
    CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' THEN o_orderpriority END prio
  FROM ${T("orders")})
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN price IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
  CAST(sum(CASE WHEN prio IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_priority,
  round(CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2) AS price_sum
FROM ev GROUP BY 1 ORDER BY 1""",

      // Dunning G^2 collocations: integer contingency cells, each
      // log-term an exact-integer ratio, floor-quantized ranking key.
      "text_collocation_llr" ->
        s"""WITH sp AS (SELECT doc_id, generate_subscripts(string_split(text,' '),1) pos,
    unnest(string_split(text,' ')) w FROM ${T("documents")}),
bg AS (SELECT a.w w1, b.w w2, count(*) k11
  FROM sp a JOIN sp b ON b.doc_id = a.doc_id AND b.pos = a.pos+1 GROUP BY 1, 2),
r AS (SELECT w1 rw, sum(k11) row_n FROM bg GROUP BY 1),
c AS (SELECT w2 cw, sum(k11) col_n FROM bg GROUP BY 1),
tot AS (SELECT sum(k11) nn FROM bg),
j AS (SELECT w1, w2, k11, row_n, col_n, nn,
    row_n - k11 k12, col_n - k11 k21, nn - row_n - col_n + k11 k22
  FROM bg JOIN r ON w1 = rw JOIN c ON w2 = cw CROSS JOIN tot
  WHERE k11 >= 5),
g AS (SELECT w1, w2, k11,
    CAST(floor(2.0 * (
      (CASE WHEN k11 > 0 THEN CAST(k11 AS DOUBLE)*ln(CAST(k11*nn AS DOUBLE)/CAST(row_n*col_n AS DOUBLE)) ELSE 0.0 END) +
      (CASE WHEN k12 > 0 THEN CAST(k12 AS DOUBLE)*ln(CAST(k12*nn AS DOUBLE)/CAST(row_n*(nn-col_n) AS DOUBLE)) ELSE 0.0 END) +
      (CASE WHEN k21 > 0 THEN CAST(k21 AS DOUBLE)*ln(CAST(k21*nn AS DOUBLE)/CAST((nn-row_n)*col_n AS DOUBLE)) ELSE 0.0 END) +
      (CASE WHEN k22 > 0 THEN CAST(k22 AS DOUBLE)*ln(CAST(k22*nn AS DOUBLE)/CAST((nn-row_n)*(nn-col_n) AS DOUBLE)) ELSE 0.0 END)
    ) * 1e3) AS BIGINT) llr_q
  FROM j)
SELECT w1, w2, CAST(k11 AS BIGINT) AS n_pair, CAST(llr_q AS DOUBLE)/1e3 AS llr
FROM g ORDER BY llr_q DESC, w1, w2 LIMIT 20""",

      // Horvitz-Thompson: pi known exactly from the keep rule
      // (c = ceil(65536*w/wmax) accepted buckets); each kept
      // contribution is the integer division (w*65536*1e4) // c.
      "sample_ht_estimate" ->
        s"""WITH mx AS (SELECT max(n_chars) AS wmax FROM ${T("documents")}),
f AS (SELECT source, n_chars,
    (('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT * wmax
       < 65536 * n_chars) AS keep,
    (n_chars * 65536 + wmax - 1) // wmax AS c
  FROM ${T("documents")}, mx),
g AS (SELECT source, count(*) n_docs,
    sum(CASE WHEN keep THEN 1 ELSE 0 END) n_kept,
    sum(n_chars) truth,
    sum(CASE WHEN keep THEN (n_chars * 65536 * 10000) // c ELSE 0 END) htq
  FROM f GROUP BY 1)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_kept AS BIGINT) AS n_kept,
  CAST(truth AS BIGINT) AS true_chars,
  CAST(floor(CAST(htq AS DOUBLE)/1e4) AS BIGINT) AS ht_estimate,
  floor((CAST(htq AS DOUBLE)/1e4 - CAST(truth AS DOUBLE))/CAST(truth AS DOUBLE)*1e4)/1e4 AS rel_err
FROM g ORDER BY source""",

      // Order-independent 56-bit content checksums: canonical
      // '|'-joined rendering (stable string forms only), BIT_XOR fold.
      "agg_table_checksum" ->
        s"""WITH oh AS (SELECT ('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
      o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
      CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)), 1, 14))::BIGINT h
  FROM ${T("orders")}),
ch AS (SELECT ('0x' || substr(md5(concat_ws('|', c_custkey, c_name, c_nationkey,
      c_mktsegment, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR))), 1, 14))::BIGINT h
  FROM ${T("customer")}),
lh AS (SELECT ('0x' || substr(md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey,
      l_suppkey, CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
      l_returnflag, CAST(CAST(l_shipdate AS DATE) AS VARCHAR))), 1, 14))::BIGINT h
  FROM ${T("lineitem")}),
u AS (SELECT 'orders' table_name, count(*) n_rows, bit_xor(h) xor56, min(h) min56, max(h) max56 FROM oh
  UNION ALL SELECT 'customer', count(*), bit_xor(h), min(h), max(h) FROM ch
  UNION ALL SELECT 'lineitem', count(*), bit_xor(h), min(h), max(h) FROM lh)
SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows, CAST(xor56 AS BIGINT) AS xor56,
  CAST(min56 AS BIGINT) AS min56, CAST(max56 AS BIGINT) AS max56
FROM u ORDER BY table_name""",

      // Bitmap audience overlap: word-wise AND popcounts, unions by
      // inclusion-exclusion from per-type totals.
      "agg_bitmap_overlap" ->
        s"""WITH words AS (SELECT event_type, user_id // 63 wi,
    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) w
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT event_type tt, sum(bit_count(w)) nt FROM words GROUP BY 1),
inter AS (SELECT a.event_type t1, b.event_type t2, sum(bit_count(a.w & b.w)) ni
  FROM words a JOIN words b ON a.wi = b.wi AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT t1, t2, CAST(ni AS BIGINT) AS n_common,
  CAST(ta.nt + tb.nt - ni AS BIGINT) AS n_union,
  floor(CAST(ni AS DOUBLE)/CAST(ta.nt + tb.nt - ni AS DOUBLE)*1e4)/1e4 AS jaccard
FROM inter JOIN tot ta ON ta.tt = t1 JOIN tot tb ON tb.tt = t2
ORDER BY t1, t2""",

      // Held-out add-1 unigram LM: per-token -ln((c+1)/(N+V)) on exact
      // integers, quantized at 1e6, BIGINT-summed; no exp anywhere.
      "pipeline_heldout_nll" ->
        s"""WITH toks AS (SELECT doc_id, lang,
    (('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10 < 8) is_train,
    unnest(string_split(text, ' ')) w
  FROM ${T("documents")}),
train AS (SELECT w tw, count(*) c FROM toks WHERE is_train GROUP BY 1),
tot AS (SELECT sum(c) nTrain, count(*) v FROM train),
test AS (SELECT lang, c FROM toks LEFT JOIN train ON w = tw
  CROSS JOIN tot WHERE NOT is_train),
q AS (SELECT lang, c, CAST(floor(-ln((coalesce(c, 0) + 1) /
    CAST((SELECT nTrain + v FROM tot) AS DOUBLE)) * 1e6) AS BIGINT) lq
  FROM test)
SELECT lang, CAST(count(*) AS BIGINT) AS n_test_tokens,
  floor(CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*)*1e4)/1e4 AS oov_rate,
  floor(CAST(sum(lq) AS DOUBLE)/count(*)/1e2)/1e4 AS avg_nll
FROM q GROUP BY 1 ORDER BY 1""",

      // Gumbel method-of-moments on monthly block maxima; shared
      // double literals for sqrt(6), pi and ln(-ln .99).
      "ts_extreme_value_moments" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dy,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) c
  FROM ${T("orders")} GROUP BY 1),
mx AS (SELECT date_trunc('month', dy) mo, max(c) m FROM daily GROUP BY 1),
st AS (SELECT count(*) n, sum(m) sx, sum(CAST(m AS HUGEINT)*m) sxx FROM mx),
mm AS (SELECT n,
    CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)/100 mean,
    sqrt(CAST(n*sxx - sx*sx AS DOUBLE)/CAST(n*(n-1) AS DOUBLE))/100 sd
  FROM st),
gg AS (SELECT n, mean, sd * 2.449489742783178 / 3.141592653589793 beta FROM mm),
g2 AS (SELECT n, mean, beta, mean - 0.5772156649015329 * beta mu FROM gg)
SELECT CAST(n AS BIGINT) AS n_months, floor(mean*100)/100 AS mean_max,
  floor(beta*100)/100 AS gumbel_beta, floor(mu*100)/100 AS gumbel_mu,
  floor((mu - beta * -4.600149226776579)*100)/100 AS p99_return_level
FROM g2""",

      // Cosine-vs-dot top-10 agreement on quantized integer scores.
      "sim_metric_agreement" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
probes AS (SELECT vec_id pid, embedding pe FROM emb WHERE vec_id < 30),
scored AS (SELECT p.pid, e.vec_id cand,
    CAST(floor(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) qc,
    CAST(floor(list_inner_product(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) qd
  FROM probes p CROSS JOIN emb e WHERE e.vec_id <> p.pid),
tc AS (SELECT pid, cand FROM (SELECT pid, cand,
    row_number() OVER (PARTITION BY pid ORDER BY qc DESC, cand) r FROM scored) t WHERE r <= 10),
td AS (SELECT pid, cand FROM (SELECT pid, cand,
    row_number() OVER (PARTITION BY pid ORDER BY qd DESC, cand) r FROM scored) t WHERE r <= 10),
ov AS (SELECT tc.pid, count(*) n FROM tc JOIN td ON tc.pid = td.pid AND tc.cand = td.cand GROUP BY 1)
SELECT p.pid, CAST(coalesce(ov.n, 0) AS BIGINT) AS overlap_at_10,
  floor(CAST(coalesce(ov.n, 0) AS DOUBLE)/CAST(20 - coalesce(ov.n, 0) AS DOUBLE)*1e4)/1e4 AS jaccard_at_10
FROM probes p LEFT JOIN ov ON ov.pid = p.pid ORDER BY p.pid""",

      // Mann-Kendall: S and the tie correction are BIGINT arithmetic
      // over calendar-bounded pairs; z quantized; decision on the
      // quantized integer.
      "ts_mann_kendall" ->
        s"""WITH m AS (SELECT date_trunc('month', o_orderdate) mo,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) c
  FROM ${T("orders")} GROUP BY 1),
sp AS (SELECT sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) sStat
  FROM m a JOIN m b ON a.mo < b.mo),
ties AS (SELECT coalesce(sum(CASE WHEN t > 1 THEN t*(t-1)*(2*t+5) END), 0) tsum
  FROM (SELECT c, count(*) t FROM m GROUP BY 1)),
nr AS (SELECT count(*) n FROM m),
z AS (SELECT sStat, n, tsum,
    CAST(n*(n-1)*(2*n+5) - tsum AS DOUBLE)/18.0 varS FROM sp, nr, ties),
zz AS (SELECT *, CASE WHEN sStat > 0 THEN CAST(sStat - 1 AS DOUBLE)/sqrt(varS)
    WHEN sStat < 0 THEN CAST(sStat + 1 AS DOUBLE)/sqrt(varS) ELSE 0.0 END zv
  FROM z)
SELECT CAST(n AS BIGINT) AS n_months, CAST(sStat AS BIGINT) AS s_stat,
  floor(varS*100)/100 AS var_s, floor(zv*1e4)/1e4 AS z,
  CASE WHEN floor(abs(zv)*1e4) > 19600 THEN
    CASE WHEN sStat > 0 THEN 'increasing' ELSE 'decreasing' END
  ELSE 'none' END AS trend_95
FROM zz""",

      // Price indices on floor-cent unit prices ((100*Sum ext) // Sum
      // qty): every index component a BIGINT sum, one division each.
      "agg_price_index" ->
        s"""WITH y0 AS (SELECT l_partkey pk0,
    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) //
      sum(CAST(l_quantity AS BIGINT)) p0,
    sum(CAST(l_quantity AS BIGINT)) q0
  FROM ${T("lineitem")} WHERE year(l_shipdate) = 1995 GROUP BY 1),
y1 AS (SELECT l_partkey pk1,
    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) //
      sum(CAST(l_quantity AS BIGINT)) p1,
    sum(CAST(l_quantity AS BIGINT)) q1
  FROM ${T("lineitem")} WHERE year(l_shipdate) = 2000 GROUP BY 1),
j AS (SELECT count(*) n_parts,
    sum(p1*q0) l_num, sum(p0*q0) l_den, sum(p1*q1) p_num, sum(p0*q1) p_den
  FROM y0 JOIN y1 ON pk0 = pk1)
SELECT CAST(n_parts AS BIGINT) AS n_parts,
  floor(CAST(l_num AS DOUBLE)/CAST(l_den AS DOUBLE)*1e4)/1e4 AS laspeyres,
  floor(CAST(p_num AS DOUBLE)/CAST(p_den AS DOUBLE)*1e4)/1e4 AS paasche,
  floor(sqrt((CAST(l_num AS DOUBLE)/CAST(l_den AS DOUBLE)) *
    (CAST(p_num AS DOUBLE)/CAST(p_den AS DOUBLE)))*1e4)/1e4 AS fisher
FROM j""",

      // Hubness: k-occurrence counts on the quantized panel kNN,
      // integer power sums, quantized skewness.
      "sim_hubness_skew" ->
        s"""WITH panel AS (SELECT vec_id, embedding FROM ${T("embeddings")} WHERE vec_id < 200),
scored AS (SELECT a.vec_id pid, b.vec_id cand,
    CAST(floor(list_cosine_similarity(cast(a.embedding AS DOUBLE[]), cast(b.embedding AS DOUBLE[]))*10000) AS BIGINT) q
  FROM panel a JOIN panel b ON a.vec_id <> b.vec_id),
nn AS (SELECT cand FROM (SELECT pid, cand,
    row_number() OVER (PARTITION BY pid ORDER BY q DESC, cand) r FROM scored) t
  WHERE r <= 10),
occ AS (SELECT cand, count(*) k FROM nn GROUP BY 1),
ko AS (SELECT coalesce(k, 0) k FROM panel LEFT JOIN occ ON cand = vec_id),
st AS (SELECT count(*) n, sum(k) s1, sum(k*k) s2, sum(k*k*k) s3, max(k) kmax,
    sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) zeros,
    sum(CASE WHEN k >= 20 THEN 1 ELSE 0 END) hubs FROM ko)
SELECT CAST(n AS BIGINT) AS n_panel, CAST(kmax AS BIGINT) AS max_occ,
  CAST(zeros AS BIGINT) AS n_anti_hubs, CAST(hubs AS BIGINT) AS n_hubs_2k,
  floor((CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)
      - 3 * (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)) * (CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))
      + 2 * (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)))
    / sqrt((CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)))
         * (CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)))
         * (CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) - (CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))))
    * 1e4)/1e4 AS skewness
FROM st""",

      // Gopher rules: every rule decided in integer arithmetic (no
      // mean-word-length division — 3n <= letters <= 5n); one final
      // pass_rate division. regexp_replace needs the 'g' flag here
      // (DuckDB replaces first match by default; Spark replaces all).
      "pipeline_gopher_quality" ->
        s"""WITH f AS (SELECT source,
    len(string_split(text, ' ')) nt,
    len(list_filter(string_split(text, ' '),
      w -> w IN ('the', 'a', 'table', 'value', 'query'))) nstop,
    length(replace(text, ' ', '')) letters,
    length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) syms
  FROM ${T("documents")}),
r AS (SELECT source,
    CASE WHEN nt < 20 OR nt > 1000 THEN 1 ELSE 0 END fwc,
    CASE WHEN letters < 3*nt OR letters > 5*nt THEN 1 ELSE 0 END fmwl,
    CASE WHEN nstop < 2 THEN 1 ELSE 0 END fstop,
    CASE WHEN 10*syms > nt THEN 1 ELSE 0 END fsym
  FROM f)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(fwc) AS BIGINT) AS fail_word_count,
  CAST(sum(fmwl) AS BIGINT) AS fail_mean_word_len,
  CAST(sum(fstop) AS BIGINT) AS fail_stopwords,
  CAST(sum(fsym) AS BIGINT) AS fail_symbol_ratio,
  CAST(sum(CASE WHEN fwc + fmwl + fstop + fsym = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
  round(CAST(sum(CASE WHEN fwc + fmwl + fstop + fsym = 0 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE), 4) AS pass_rate
FROM r GROUP BY 1 ORDER BY 1""",

      // DSIR: add-1 smoothed target/corpus unigram log-ratios on exact
      // integer cross-products, quantized at 1e6 before the per-doc
      // sum; top-200 by (score, doc_id); 5-row lang rollup.
      "pipeline_dsir_selection" ->
        s"""WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) w
  FROM ${T("documents")}),
corpus AS (SELECT w, count(*) cc FROM tok GROUP BY 1),
target AS (SELECT w, count(*) ct FROM tok WHERE lang = 'de' GROUP BY 1),
tots AS (SELECT sum(cc) nc, count(*) v FROM corpus),
tt AS (SELECT coalesce(sum(ct), 0) nt FROM target),
weights AS (SELECT c.w,
    CAST(floor(ln(CAST((coalesce(t.ct, 0) + 1) * (nc + v) AS DOUBLE) /
                  CAST((c.cc + 1) * (nt + v) AS DOUBLE)) * 1e6) AS BIGINT) lr6
  FROM corpus c LEFT JOIN target t ON c.w = t.w, tots, tt),
scored AS (SELECT doc_id, lang, sum(lr6) s6
  FROM tok JOIN weights USING (w) GROUP BY 1, 2),
sel AS (SELECT * FROM scored ORDER BY s6 DESC, doc_id LIMIT 200),
bylang AS (SELECT lang, count(*) ns, sum(s6) ss FROM sel GROUP BY 1)
SELECT l.lang, CAST(coalesce(ns, 0) AS BIGINT) AS n_selected,
  CAST(coalesce(ss, 0) AS BIGINT) AS sum_score_q6,
  round(CAST(coalesce(ns, 0) AS DOUBLE) / 200.0, 4) AS share
FROM (SELECT DISTINCT lang FROM ${T("documents")}) l
LEFT JOIN bylang USING (lang) ORDER BY 1""",

      // NDCG@10: the 10 discount weights floor(1e6/log2(i+1)) and
      // their prefix sums are INLINED as integer literals in both
      // engines — no runtime log2; DCG/IDCG are BIGINT sums.
      "sim_ndcg_at10" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
probes AS (SELECT vec_id pid, embedding pe, label plab FROM emb WHERE vec_id < 30),
corpus AS (SELECT * FROM emb WHERE vec_id >= 30),
scored AS (SELECT p.pid, e.vec_id cand,
    CAST(floor(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) q,
    CASE WHEN e.label = p.plab THEN 1 ELSE 0 END rel
  FROM probes p CROSS JOIN corpus e),
top AS (SELECT pid, rel, r FROM (SELECT pid, rel,
    row_number() OVER (PARTITION BY pid ORDER BY q DESC, cand) r FROM scored) t
  WHERE r <= 10),
dcg AS (SELECT pid, sum(rel * CASE r WHEN 1 THEN 1000000 WHEN 2 THEN 630929
    WHEN 3 THEN 500000 WHEN 4 THEN 430676 WHEN 5 THEN 386852 WHEN 6 THEN 356207
    WHEN 7 THEN 333333 WHEN 8 THEN 315464 WHEN 9 THEN 301029 ELSE 289064 END) dcg_q6
  FROM top GROUP BY 1),
reltot AS (SELECT label, count(*) n_rel FROM corpus GROUP BY 1)
SELECT p.pid, CAST(rt.n_rel AS BIGINT) AS n_rel,
  CAST(d.dcg_q6 AS BIGINT) AS dcg_q6,
  CAST(CASE least(rt.n_rel, 10) WHEN 0 THEN 0 WHEN 1 THEN 1000000
    WHEN 2 THEN 1630929 WHEN 3 THEN 2130929 WHEN 4 THEN 2561605
    WHEN 5 THEN 2948457 WHEN 6 THEN 3304664 WHEN 7 THEN 3637997
    WHEN 8 THEN 3953461 WHEN 9 THEN 4254490 ELSE 4543554 END AS BIGINT) AS idcg_q6,
  round(CAST(d.dcg_q6 AS DOUBLE) / CAST(CASE least(rt.n_rel, 10) WHEN 0 THEN 0
    WHEN 1 THEN 1000000 WHEN 2 THEN 1630929 WHEN 3 THEN 2130929
    WHEN 4 THEN 2561605 WHEN 5 THEN 2948457 WHEN 6 THEN 3304664
    WHEN 7 THEN 3637997 WHEN 8 THEN 3953461 WHEN 9 THEN 4254490
    ELSE 4543554 END AS DOUBLE), 6) AS ndcg
FROM probes p JOIN reltot rt ON rt.label = p.plab JOIN dcg d ON d.pid = p.pid
ORDER BY p.pid""",

      // Cramer's V: cell chi2 terms square in HUGEINT (O*n reaches
      // 2.25e10 at sf0.1 — BIGINT would wrap), one double division,
      // quantized at 1e6 before the sum; V quantized at 1e4.
      "agg_cramers_v" ->
        s"""WITH o AS (SELECT o_orderstatus st, o_orderpriority pr,
    year(o_orderdate) yr FROM ${T("orders")}),
c1 AS (SELECT st a, pr b, count(*) o FROM o GROUP BY 1, 2),
c2 AS (SELECT st a, CAST(yr AS VARCHAR) b, count(*) o FROM o GROUP BY 1, 2),
c3 AS (SELECT pr a, CAST(yr AS VARCHAR) b, count(*) o FROM o GROUP BY 1, 2),
u AS (SELECT 'status_priority' pair, * FROM c1
  UNION ALL SELECT 'status_year', * FROM c2
  UNION ALL SELECT 'priority_year', * FROM c3),
rt AS (SELECT pair, a, sum(o) rt FROM u GROUP BY 1, 2),
ct AS (SELECT pair, b, sum(o) ct FROM u GROUP BY 1, 2),
dims AS (SELECT pair, sum(o) n, count(DISTINCT a) r, count(DISTINCT b) c
  FROM u GROUP BY 1),
x AS (SELECT u.pair,
    sum(CAST(floor(CAST(CAST(u.o*dims.n - rt.rt*ct.ct AS HUGEINT) *
          CAST(u.o*dims.n - rt.rt*ct.ct AS HUGEINT) AS DOUBLE) /
        CAST(rt.rt*ct.ct*dims.n AS DOUBLE) * 1e6) AS BIGINT)) chi2_q6,
    first(dims.n) n, first(dims.r) r, first(dims.c) c
  FROM u JOIN rt ON rt.pair = u.pair AND rt.a = u.a
    JOIN ct ON ct.pair = u.pair AND ct.b = u.b
    JOIN dims ON dims.pair = u.pair
  GROUP BY 1)
SELECT pair, CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS levels_a,
  CAST(c AS BIGINT) AS levels_b, CAST(chi2_q6 AS BIGINT) AS chi2_q6,
  floor(sqrt(CAST(chi2_q6 AS DOUBLE) / 1e6 /
    CAST(n * (least(r, c) - 1) AS DOUBLE)) * 1e4) / 1e4 AS cramers_v
FROM x ORDER BY pair""",

      // PSI: fixed 50k-wide price bins on the stored doubles (both
      // engines divide the same doubles), add-1 smoothing on the
      // static 0-9 spine, per-bin term quantized at 1e8.
      "agg_psi_drift" ->
        s"""WITH o AS (SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) bin,
    year(o_orderdate) y FROM ${T("orders")}),
a AS (SELECT bin, count(*) ca FROM o WHERE y = 1995 GROUP BY 1),
b AS (SELECT bin, count(*) cb FROM o WHERE y = 1998 GROUP BY 1),
spine AS (SELECT range bin FROM range(0, 10)),
j AS (SELECT s.bin, coalesce(ca, 0) ca, coalesce(cb, 0) cb
  FROM spine s LEFT JOIN a ON a.bin = s.bin LEFT JOIN b ON b.bin = s.bin),
t AS (SELECT sum(ca) + 10 na, sum(cb) + 10 nb FROM j)
SELECT bin, CAST(ca AS BIGINT) AS n_1995, CAST(cb AS BIGINT) AS n_1998,
  CAST(floor((CAST(ca + 1 AS DOUBLE) / CAST(na AS DOUBLE)
      - CAST(cb + 1 AS DOUBLE) / CAST(nb AS DOUBLE)) *
    ln(CAST((ca + 1) * nb AS DOUBLE) / CAST((cb + 1) * na AS DOUBLE)) * 1e8)
    AS BIGINT) AS psi_term_q8
FROM j, t ORDER BY bin""",

      // Systematic sampling: every 50th row in md5-of-key order —
      // the md5 hex and the (md5, key) total order are identical in
      // both engines. Price as BIGINT cents (suite rule §5.3: no bare
      // DECIMAL in oracle-checked output — round-10's only hash
      // mismatch was this column, value-identical in both engines).
      "sample_systematic" ->
        s"""WITH r AS (SELECT o_orderkey,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) price_cents,
    row_number() OVER (ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) rn
  FROM ${T("orders")})
SELECT CAST(rn AS BIGINT) AS rn, o_orderkey, price_cents
FROM r WHERE rn % 50 = 1 ORDER BY rn""",

      // Welch: n/Sum/Sumsq in BIGINT-cents / HUGEINT; one shared IEEE
      // tree for means, variances, t and the Satterthwaite df;
      // decisions on the quantized integers.
      "agg_welch_ttest" ->
        s"""WITH seg AS (SELECT o_custkey % 2 seg, count(*) n,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) sx,
    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) *
        CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) AS HUGEINT)) sxx
  FROM ${T("orders")} GROUP BY 1),
w AS (SELECT max(CASE WHEN seg = 0 THEN n END) n0,
    max(CASE WHEN seg = 0 THEN sx END) s0, max(CASE WHEN seg = 0 THEN sxx END) q0,
    max(CASE WHEN seg = 1 THEN n END) n1,
    max(CASE WHEN seg = 1 THEN sx END) s1, max(CASE WHEN seg = 1 THEN sxx END) q1
  FROM seg),
x AS (SELECT n0, n1,
    CAST(s0 AS DOUBLE)/CAST(n0 AS DOUBLE)/100.0 m0,
    CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE)/100.0 m1,
    CAST(n0*q0 - CAST(s0 AS HUGEINT)*CAST(s0 AS HUGEINT) AS DOUBLE)
      / CAST(n0*(n0-1) AS DOUBLE) / 10000.0 / CAST(n0 AS DOUBLE) se0,
    CAST(n1*q1 - CAST(s1 AS HUGEINT)*CAST(s1 AS HUGEINT) AS DOUBLE)
      / CAST(n1*(n1-1) AS DOUBLE) / 10000.0 / CAST(n1 AS DOUBLE) se1
  FROM w),
z AS (SELECT n0, n1, m0, m1, (m0 - m1)/sqrt(se0 + se1) t,
    (se0 + se1)*(se0 + se1) /
      (se0*se0/CAST(n0 - 1 AS DOUBLE) + se1*se1/CAST(n1 - 1 AS DOUBLE)) df
  FROM x)
SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
  floor(m0*100)/100 AS mean_a, floor(m1*100)/100 AS mean_b,
  floor(t*1e4)/1e4 AS t_welch, floor(df*100)/100 AS df_welch,
  floor(abs(t)*1e4) > 19600 AS significant_95_normal_approx
FROM z""",

      // McNemar: discordant cells b/c are exact integers; continuity-
      // corrected chi2 is one division; decision vs the inlined
      // critical integer 38414 (= 1e4-quantized 3.8414).
      "agg_mcnemar_paired" ->
        s"""WITH u AS (SELECT user_id,
    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) ck,
    max(CASE WHEN event_type = 'purchase' AND value >= 100 THEN 1 ELSE 0 END) pu
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1),
t AS (SELECT count(*) n_users,
    sum(CASE WHEN ck = 1 AND pu = 1 THEN 1 ELSE 0 END) nboth,
    sum(CASE WHEN ck = 0 AND pu = 0 THEN 1 ELSE 0 END) nneither,
    sum(CASE WHEN ck = 1 AND pu = 0 THEN 1 ELSE 0 END) b,
    sum(CASE WHEN ck = 0 AND pu = 1 THEN 1 ELSE 0 END) c
  FROM u),
z AS (SELECT *, CASE WHEN b + c > 0 THEN
    CAST((abs(b - c) - 1)*(abs(b - c) - 1) AS DOUBLE)/CAST(b + c AS DOUBLE)
  END chi2 FROM t)
SELECT CAST(n_users AS BIGINT) AS n_users, CAST(nboth AS BIGINT) AS n_both,
  CAST(nneither AS BIGINT) AS n_neither, CAST(b AS BIGINT) AS click_only,
  CAST(c AS BIGINT) AS purchase_only,
  floor(chi2*1e4)/1e4 AS chi2_cc, floor(chi2*1e4) > 38414 AS significant_95
FROM z""",

      // Power analysis: the two z constants are inlined literals; p
      // divides exact integers; MDE quantized at 1e6.
      "agg_power_mde" ->
        s"""WITH u AS (SELECT user_id % 2 variant, user_id,
    max(CASE WHEN event_type = 'purchase' AND value >= 100 THEN 1 ELSE 0 END) conv
  FROM ${T("events")} WHERE user_id IS NOT NULL GROUP BY 1, 2),
v AS (SELECT variant, count(*) n, sum(conv) c FROM u GROUP BY 1),
w AS (SELECT max(CASE WHEN variant = 0 THEN n END) n0,
    max(CASE WHEN variant = 0 THEN c END) c0,
    max(CASE WHEN variant = 1 THEN n END) n1,
    max(CASE WHEN variant = 1 THEN c END) c1 FROM v),
x AS (SELECT n0, n1, c0 + c1 conv,
    CAST(c0 + c1 AS DOUBLE)/CAST(n0 + n1 AS DOUBLE) p FROM w),
z AS (SELECT *, (1.959964 + 0.841621) *
    sqrt(p*(1.0 - p)*(1.0/CAST(n0 AS DOUBLE) + 1.0/CAST(n1 AS DOUBLE))) mde
  FROM x)
SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
  CAST(conv AS BIGINT) AS conversions,
  floor(p*1e6)/1e6 AS baseline_rate,
  floor(mde*1e6)/1e6 AS mde_abs, floor(mde/p*1e6)/1e6 AS mde_rel
FROM z""",

      // Subsequence support: min_pos(a) < max_pos(b) per user decides
      // a-before-b (and a = b as two occurrences); 5x5 spine keeps
      // zero-support pairs.
      "funnel_seq2_support" ->
        s"""WITH pos AS (SELECT user_id, event_type,
    min(p) minp, max(p) maxp FROM (SELECT user_id, event_type,
      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) p
    FROM ${T("events")} WHERE user_id IS NOT NULL) t GROUP BY 1, 2),
nu AS (SELECT count(DISTINCT user_id) n FROM pos),
sup AS (SELECT a.event_type a, b.event_type b, count(*) n
  FROM pos a JOIN pos b ON a.user_id = b.user_id AND a.minp < b.maxp
  GROUP BY 1, 2),
ty AS (SELECT DISTINCT event_type FROM pos)
SELECT t1.event_type || '->' || t2.event_type AS pattern,
  CAST(coalesce(sup.n, 0) AS BIGINT) AS n_users,
  round(CAST(coalesce(sup.n, 0) AS DOUBLE)/CAST(nu.n AS DOUBLE), 4) AS support
FROM ty t1 CROSS JOIN ty t2
LEFT JOIN sup ON sup.a = t1.event_type AND sup.b = t2.event_type, nu
ORDER BY pattern""",

      // Monroe log-odds: every ln/division on exact integers, z
      // quantized at 1e4 with word ties; top-20 by |z| is a total
      // order.
      "text_log_odds" ->
        s"""WITH f AS (SELECT w,
    sum(CASE WHEN g THEN 1 ELSE 0 END) y1,
    sum(CASE WHEN g THEN 0 ELSE 1 END) y2
  FROM (SELECT lang = 'en' g, unnest(string_split(text, ' ')) w
    FROM ${T("documents")}) t GROUP BY 1),
tot AS (SELECT sum(y1) n1, sum(y2) n2, count(*) v FROM f),
z AS (SELECT w, y1, y2, CAST(floor(
    (ln(CAST(y1 + 1 AS DOUBLE)/CAST(n1 + v - y1 - 1 AS DOUBLE))
     - ln(CAST(y2 + 1 AS DOUBLE)/CAST(n2 + v - y2 - 1 AS DOUBLE)))
    / sqrt(1.0/CAST(y1 + 1 AS DOUBLE) + 1.0/CAST(y2 + 1 AS DOUBLE)) * 1e4)
    AS BIGINT) zq
  FROM f, tot)
SELECT w, CAST(y1 AS BIGINT) AS count_en, CAST(y2 AS BIGINT) AS count_rest,
  CAST(zq AS DOUBLE)/1e4 AS z_log_odds
FROM z ORDER BY abs(zq) DESC, w LIMIT 20""",

      // Katz-3: walk counts are BIGINT through 3 frontier joins; with
      // alpha = 0.1 the truncated score IS the integer
      // w1*100 + w2*10 + w3 — no float until display.
      "graph_katz_3" ->
        s"""$E
, w1 AS (SELECT t v, count(*) w FROM ud GROUP BY 1),
w2 AS (SELECT ud.t v, sum(w1.w) w FROM ud JOIN w1 ON w1.v = ud.s GROUP BY 1),
w3 AS (SELECT ud.t v, sum(w2.w) w FROM ud JOIN w2 ON w2.v = ud.s GROUP BY 1),
k AS (SELECT w1.v node,
    w1.w*100 + coalesce(w2.w, 0)*10 + coalesce(w3.w, 0) katz_q3
  FROM w1 LEFT JOIN w2 ON w2.v = w1.v LEFT JOIN w3 ON w3.v = w1.v)
SELECT node, CAST(katz_q3 AS BIGINT) AS katz_q3,
  CAST(katz_q3 AS DOUBLE)/1e3 AS katz
FROM k ORDER BY katz_q3 DESC, node LIMIT 20""",

      // Bloom prefilter: both engines build the IDENTICAL 4096-bit
      // filter from md5 hex integers (63-bit words, the bitmap_overlap
      // convention); the audit counts FPs against the exact semi-join.
      "join_bloom_prefilter" ->
        s"""WITH keys AS (SELECT c_custkey k FROM ${T("customer")} WHERE c_acctbal >= 9000),
bits AS (SELECT ('0x' || substr(md5(cast(k AS VARCHAR) || 'A'), 1, 3))::BIGINT bt FROM keys
  UNION ALL
  SELECT ('0x' || substr(md5(cast(k AS VARCHAR) || 'B'), 1, 3))::BIGINT FROM keys),
bloom AS (SELECT bt // 63 wi, bit_or(1::BIGINT << CAST(bt % 63 AS INT)) w
  FROM bits GROUP BY 1),
probes AS (SELECT o_custkey,
    ('0x' || substr(md5(cast(o_custkey AS VARCHAR) || 'A'), 1, 3))::BIGINT h1,
    ('0x' || substr(md5(cast(o_custkey AS VARCHAR) || 'B'), 1, 3))::BIGINT h2
  FROM ${T("orders")}),
f AS (SELECT (b1.w IS NOT NULL AND (b1.w & (1::BIGINT << CAST(p.h1 % 63 AS INT))) != 0
       AND b2.w IS NOT NULL AND (b2.w & (1::BIGINT << CAST(p.h2 % 63 AS INT))) != 0) pass
  FROM probes p LEFT JOIN bloom b1 ON b1.wi = p.h1 // 63
    LEFT JOIN bloom b2 ON b2.wi = p.h2 // 63),
ex AS (SELECT count(*) n_true FROM ${T("orders")} o
  WHERE EXISTS (SELECT 1 FROM keys WHERE k = o.o_custkey))
SELECT CAST(count(*) AS BIGINT) AS n_probes,
  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
  CAST(ex.n_true AS BIGINT) AS n_true_matches,
  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) - ex.n_true AS BIGINT) AS n_false_positives,
  floor(CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) - ex.n_true AS DOUBLE) /
    CAST(count(*) - ex.n_true AS DOUBLE) * 1e6) / 1e6 AS fp_rate
FROM f, ex GROUP BY ex.n_true""",

      // Corrupt-tolerant scan: the corruption rule is key mod 7, so
      // the oracle simulates the quarantine from the original table.
      "src_corrupt_tolerant_scan" ->
        s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
  CAST(sum(CASE WHEN o_orderkey % 7 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
  round(CAST(sum(CASE WHEN o_orderkey % 7 != 0
    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS parsed_price_sum
FROM ${T("orders")}""",

      // Poisson bootstrap: md5-bucket weights vs inlined CDF integers;
      // replicate means floor to cents BEFORE the rank; percentile =
      // total-order selection on the 100-row relation.
      "sample_bootstrap_ci" ->
        s"""WITH o AS (SELECT o_orderkey,
    CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) cents FROM ${T("orders")}),
reps AS (SELECT bs.b, cents,
    ('0x' || substr(md5(cast(o_orderkey AS VARCHAR) || '#' || cast(bs.b AS VARCHAR)), 1, 4))::BIGINT u
  FROM o CROSS JOIN (SELECT range b FROM range(0, 100)) bs),
w AS (SELECT b, cents,
    CASE WHEN u < 24109 THEN 0 WHEN u < 48218 THEN 1 WHEN u < 60273 THEN 2 ELSE 3 END w
  FROM reps),
means AS (SELECT b,
    CAST(floor(CAST(sum(w*cents) AS DOUBLE)/CAST(sum(w) AS DOUBLE)) AS BIGINT) mq
  FROM w GROUP BY 1),
r AS (SELECT mq, row_number() OVER (ORDER BY mq, b) r FROM means),
ci AS (SELECT max(CASE WHEN r = 3 THEN mq END) lo,
    max(CASE WHEN r = 98 THEN mq END) hi FROM r),
fl AS (SELECT count(*) n, sum(cents) sc FROM o)
SELECT CAST(fl.n AS BIGINT) AS n_rows, CAST(100 AS BIGINT) AS n_replicates,
  floor(CAST(sc AS DOUBLE)/CAST(n AS DOUBLE))/100 AS mean_full,
  CAST(lo AS DOUBLE)/100 AS ci_lo_95, CAST(hi AS DOUBLE)/100 AS ci_hi_95
FROM fl, ci""",

      // Triplet margins: hardest pos/neg are min/max over quantized
      // BIGINTs; the margin is the integer 500; verdict on integers.
      "sim_triplet_violations" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
probes AS (SELECT vec_id pid, embedding pe, label plab FROM emb WHERE vec_id < 30),
corpus AS (SELECT * FROM emb WHERE vec_id >= 30),
sc AS (SELECT p.pid, (e.label = p.plab) pos,
    CAST(floor(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) q
  FROM probes p CROSS JOIN corpus e)
SELECT pid, CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
  CAST(min(CASE WHEN pos THEN q END) AS BIGINT) AS hardest_pos_q,
  CAST(max(CASE WHEN NOT pos THEN q END) AS BIGINT) AS hardest_neg_q,
  max(CASE WHEN NOT pos THEN q END) + 500 > min(CASE WHEN pos THEN q END)
    AS violated_margin_005
FROM sc GROUP BY pid ORDER BY pid""",

      // Holt: the recursive CTE executes the SAME double recurrence as
      // Spark's aggregate-HOF lambda (identical expression tree,
      // CAST(0.2 AS DOUBLE) constants both sides) — deterministic IEEE
      // arithmetic on identical inputs, identical state every step.
      "ts_holt_linear" ->
        s"""WITH RECURSIVE m AS (SELECT date_trunc('month', o_orderdate) mo,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) c
  FROM ${T("orders")} GROUP BY 1),
r AS (SELECT CAST(c AS DOUBLE) x, row_number() OVER (ORDER BY mo) rn FROM m),
n AS (SELECT count(*) nm FROM r),
rec AS (
  SELECT 1 AS t,
    (SELECT x FROM r WHERE rn = 1) AS l,
    (SELECT x FROM r WHERE rn = 2) - (SELECT x FROM r WHERE rn = 1) AS b
  UNION ALL
  SELECT t + 1,
    CAST(0.2 AS DOUBLE)*r.x + CAST(0.8 AS DOUBLE)*(rec.l + rec.b),
    CAST(0.1 AS DOUBLE)*((CAST(0.2 AS DOUBLE)*r.x + CAST(0.8 AS DOUBLE)*(rec.l + rec.b)) - rec.l)
      + CAST(0.9 AS DOUBLE)*rec.b
  FROM rec JOIN r ON r.rn = rec.t + 1, n WHERE rec.t + 1 <= n.nm)
SELECT CAST(n.nm AS BIGINT) AS n_months, floor(l)/100 AS level,
  floor(b)/100 AS trend, floor(l + b)/100 AS forecast_next
FROM rec, n WHERE t = n.nm""",

      // PPR: pagerank3's decimal-stabilized rounds with restart mass
      // concentrated on the deterministic seed (min node id).
      "graph_ppr_seed" ->
        s"""$E
, n0 AS (SELECT s AS v FROM ud UNION SELECT t FROM ud),
deg AS (SELECT s AS v, count(*) AS d FROM ud GROUP BY s),
sd AS (SELECT min(v) sv FROM n0),
p0 AS (SELECT v, CASE WHEN v = (SELECT sv FROM sd) THEN CAST(1.0 AS DOUBLE)
    ELSE CAST(0.0 AS DOUBLE) END AS pr FROM n0),
p1 AS (SELECT n0.v,
         CASE WHEN n0.v = (SELECT sv FROM sd) THEN CAST(0.15 AS DOUBLE)
           ELSE CAST(0.0 AS DOUBLE) END
         + 0.85 * cast(coalesce(sum(cast(p0.pr / deg.d AS DECIMAL(28,15))), 0) AS DOUBLE) AS pr
       FROM n0 LEFT JOIN ud ON ud.t = n0.v
       LEFT JOIN p0 ON p0.v = ud.s LEFT JOIN deg ON deg.v = ud.s
       GROUP BY n0.v),
p2 AS (SELECT n0.v,
         CASE WHEN n0.v = (SELECT sv FROM sd) THEN CAST(0.15 AS DOUBLE)
           ELSE CAST(0.0 AS DOUBLE) END
         + 0.85 * cast(coalesce(sum(cast(p1.pr / deg.d AS DECIMAL(28,15))), 0) AS DOUBLE) AS pr
       FROM n0 LEFT JOIN ud ON ud.t = n0.v
       LEFT JOIN p1 ON p1.v = ud.s LEFT JOIN deg ON deg.v = ud.s
       GROUP BY n0.v),
p3 AS (SELECT n0.v,
         CASE WHEN n0.v = (SELECT sv FROM sd) THEN CAST(0.15 AS DOUBLE)
           ELSE CAST(0.0 AS DOUBLE) END
         + 0.85 * cast(coalesce(sum(cast(p2.pr / deg.d AS DECIMAL(28,15))), 0) AS DOUBLE) AS pr
       FROM n0 LEFT JOIN ud ON ud.t = n0.v
       LEFT JOIN p2 ON p2.v = ud.s LEFT JOIN deg ON deg.v = ud.s
       GROUP BY n0.v)
SELECT v AS node, round(pr, 8) AS ppr FROM p3 WHERE pr > 0
ORDER BY ppr DESC, node LIMIT 20""",

      // Growth accounting: months as the integer index y*12+m (no date
      // arithmetic to diverge); states are (u, mi) membership joins;
      // churn attributed to the month after last activity.
      "agg_growth_accounting" ->
        s"""WITH um AS (SELECT DISTINCT o_custkey u,
    year(o_orderdate)*12 + month(o_orderdate) mi FROM ${T("orders")}),
f AS (SELECT u, min(mi) fmi FROM um GROUP BY 1),
st AS (SELECT um.mi,
    sum(CASE WHEN um.mi = f.fmi THEN 1 ELSE 0 END) n_new,
    sum(CASE WHEN um.mi != f.fmi AND p.u IS NOT NULL THEN 1 ELSE 0 END) n_retained,
    sum(CASE WHEN um.mi != f.fmi AND p.u IS NULL THEN 1 ELSE 0 END) n_resurrected
  FROM um JOIN f ON f.u = um.u
  LEFT JOIN um p ON p.u = um.u AND p.mi = um.mi - 1
  GROUP BY 1),
mx AS (SELECT max(mi) m FROM um),
ch AS (SELECT a.mi + 1 mi, count(*) n_churned
  FROM um a LEFT JOIN um b ON b.u = a.u AND b.mi = a.mi + 1, mx
  WHERE b.u IS NULL AND a.mi + 1 <= mx.m GROUP BY 1)
SELECT CAST((st.mi - 1) // 12 AS BIGINT) AS year,
  CAST(st.mi - ((st.mi - 1) // 12) * 12 AS BIGINT) AS month,
  CAST(n_new AS BIGINT) AS n_new, CAST(n_retained AS BIGINT) AS n_retained,
  CAST(n_resurrected AS BIGINT) AS n_resurrected,
  CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
FROM st LEFT JOIN ch ON ch.mi = st.mi ORDER BY 1, 2""",

      // Acquisition curve: per-customer first day, cumulative over the
      // calendar-bounded day grain.
      "agg_distinct_growth_curve" ->
        s"""WITH f AS (SELECT min(CAST(o_orderdate AS DATE)) dy
  FROM ${T("orders")} GROUP BY o_custkey),
d AS (SELECT dy, count(*) n_new FROM f GROUP BY 1)
SELECT dy AS day, CAST(n_new AS BIGINT) AS n_new,
  CAST(sum(n_new) OVER (ORDER BY dy ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS cum_customers
FROM d ORDER BY dy""",

      // Reorder cadence: lead over the customer-bounded window, then
      // lower median / p90 over the day-grain gap histogram.
      "agg_inter_purchase_gap" ->
        s"""WITH o AS (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) dy
  FROM ${T("orders")}),
g AS (SELECT datediff('day', dy,
    lead(dy) OVER (PARTITION BY o_custkey ORDER BY dy, o_orderkey)) gap FROM o),
gg AS (SELECT gap FROM g WHERE gap IS NOT NULL),
h AS (SELECT gap, count(*) c FROM gg GROUP BY 1),
cum AS (SELECT gap, sum(c) OVER (ORDER BY gap ROWS UNBOUNDED PRECEDING) cum FROM h),
n AS (SELECT count(*) n FROM gg)
SELECT CAST(n.n AS BIGINT) AS n_gaps,
  CAST(min(CASE WHEN cum*2 >= n.n THEN gap END) AS BIGINT) AS median_gap_days,
  CAST(min(CASE WHEN cum*10 >= n.n*9 THEN gap END) AS BIGINT) AS p90_gap_days,
  CAST(max(gap) AS BIGINT) AS max_gap_days
FROM cum, n GROUP BY n.n""",

      // Bounce rate: the stream_sessionize gap rule, rolled up by
      // session-start day.
      "ts_bounce_rate_daily" ->
        s"""WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
  FROM ${T("events")} WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged),
ps AS (SELECT user_id, sid, count(*) cnt, min(ts) AS start
  FROM sess GROUP BY 1, 2)
SELECT CAST(start AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
  floor(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(count(*) AS DOUBLE) * 1e4) / 1e4 AS bounce_rate
FROM ps GROUP BY 1 ORDER BY 1""",

      // Abandoned carts: same sessions, click/purchase flags folded in
      // the per-session aggregate; rate over clicked sessions only.
      "ts_abandoned_cart_daily" ->
        s"""WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS ns
  FROM ${T("events")} WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, event_type,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged),
ps AS (SELECT user_id, sid, min(ts) AS start,
    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) ck,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) pu
  FROM sess GROUP BY 1, 2)
SELECT CAST(start AS DATE) AS day,
  CAST(count(*) AS BIGINT) AS n_click_sessions,
  CAST(sum(CASE WHEN pu = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
  floor(CAST(sum(CASE WHEN pu = 0 THEN 1 ELSE 0 END) AS DOUBLE) /
    CAST(count(*) AS DOUBLE) * 1e4) / 1e4 AS abandon_rate
FROM ps WHERE ck = 1 GROUP BY 1 ORDER BY 1""",

      // Current streak: gaps-islands anchor per user; the island
      // holding the user's max day is picked by an integer max over
      // (last_day, len); top-20 total-order.
      "win_streak_current" ->
        s"""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) dy
  FROM ${T("events")} WHERE user_id IS NOT NULL),
isl AS (SELECT user_id,
    dy - CAST(row_number() OVER (PARTITION BY user_id ORDER BY dy) AS INT) grp,
    dy FROM days),
g AS (SELECT user_id, grp, count(*) len, max(dy) last_day
  FROM isl GROUP BY 1, 2),
cur AS (SELECT user_id, max(struct_pack(last_day := last_day, len := len)) c
  FROM g GROUP BY 1)
SELECT user_id, CAST((c).len AS BIGINT) AS current_streak,
  (c).last_day AS last_active_day
FROM cur
ORDER BY current_streak DESC, last_active_day DESC, user_id LIMIT 20""",

      // Duplicate payments: exact BIGINT-cent equality join, integer
      // day residual, canonical pair order.
      "agg_duplicate_payment_audit" ->
        s"""WITH o AS (SELECT o_custkey ck,
    CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) cents,
    o_orderkey ok, CAST(o_orderdate AS DATE) dy FROM ${T("orders")}),
p AS (SELECT a.ck, a.cents FROM o a JOIN o b
  ON a.ck = b.ck AND a.cents = b.cents AND a.ok < b.ok
  AND abs(datediff('day', a.dy, b.dy)) <= 7)
SELECT CAST(count(*) AS BIGINT) AS n_suspect_pairs,
  CAST(count(DISTINCT ck) AS BIGINT) AS n_customers,
  CAST(coalesce(sum(cents), 0) AS BIGINT) AS cents_at_risk
FROM p""",

      // Round numbers: pure modular arithmetic; bias ratio = observed
      // share / uniform expectation, floor 1e4.
      "agg_round_number_bias" ->
        s"""WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) cents
  FROM ${T("orders")})
SELECT CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_whole_dollar,
  CAST(sum(CASE WHEN cents % 10000 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_whole_hundred,
  floor(CAST(sum(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) * 100 * 1e4) / 1e4 AS dollar_bias_ratio,
  floor(CAST(sum(CASE WHEN cents % 10000 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) * 10000 * 1e4) / 1e4 AS hundred_bias_ratio
FROM o""",

      // Structuring: (customer, day) aggregate, >=2 orders summing
      // >= $200k in cents.
      "agg_split_transaction_detect" ->
        s"""WITH g AS (SELECT o_custkey, CAST(o_orderdate AS DATE) dy, count(*) n,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) cents
  FROM ${T("orders")} GROUP BY 1, 2
  HAVING count(*) >= 2
    AND sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) >= 20000000)
SELECT CAST(count(*) AS BIGINT) AS n_cust_days,
  CAST(coalesce(sum(n), 0) AS BIGINT) AS n_orders_involved,
  CAST(coalesce(sum(cents), 0) AS BIGINT) AS cents_total
FROM g""",

      // Gap outliers: per-customer lower median via the sorted in-row
      // gap list; latest gap via max_by; integer flag and excess.
      "win_order_gap_outliers" ->
        s"""WITH o AS (SELECT o_custkey ck, o_orderkey ok, CAST(o_orderdate AS DATE) dy
  FROM ${T("orders")}),
g AS (SELECT ck, dy, ok, datediff('day', dy,
    lead(dy) OVER (PARTITION BY ck ORDER BY dy, ok)) gap FROM o),
gg AS (SELECT ck, dy, ok, gap FROM g WHERE gap IS NOT NULL),
pc AS (SELECT ck, count(*) n_gaps,
    list_sort(list(gap))[CAST((count(*) + 1) // 2 AS INT)] med,
    (max(struct_pack(dy := dy, ok := ok, gap := gap))).gap latest
  FROM gg GROUP BY 1)
SELECT ck AS custkey, CAST(n_gaps AS BIGINT) AS n_gaps,
  CAST(med AS BIGINT) AS median_gap_days,
  CAST(latest AS BIGINT) AS latest_gap_days,
  CAST(latest - med*3 AS BIGINT) AS excess_days
FROM pc WHERE n_gaps >= 4 AND latest > med*3
ORDER BY excess_days DESC, custkey LIMIT 20""",

      // RBO: finite-decimal weight literals (0.1*0.9^(d-1)) cast to
      // DOUBLE, the 1/d division in the shared expression, per-depth
      // terms quantized 1e8 before the sum.
      "sim_rbo_rankings" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
probes AS (SELECT vec_id pid, embedding pe FROM emb WHERE vec_id < 30),
scored AS (SELECT p.pid, e.vec_id cand,
    CAST(floor(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) qc,
    CAST(floor(list_inner_product(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) qd
  FROM probes p CROSS JOIN emb e WHERE e.vec_id <> p.pid),
tc AS (SELECT pid, cand, r rc FROM (SELECT pid, cand,
    row_number() OVER (PARTITION BY pid ORDER BY qc DESC, cand) r FROM scored) t WHERE r <= 10),
td AS (SELECT pid, cand, r rd FROM (SELECT pid, cand,
    row_number() OVER (PARTITION BY pid ORDER BY qd DESC, cand) r FROM scored) t WHERE r <= 10),
m AS (SELECT tc.pid, greatest(rc, rd) m, count(*) cnt
  FROM tc JOIN td ON tc.pid = td.pid AND tc.cand = td.cand GROUP BY 1, 2),
dep AS (SELECT range + 1 dep FROM range(0, 10)),
terms AS (SELECT m.pid, dep.dep, sum(cnt) ov FROM m JOIN dep ON m.m <= dep.dep
  GROUP BY 1, 2),
tq AS (SELECT pid, CAST(floor(CASE dep
    WHEN 1 THEN CAST(0.1 AS DOUBLE) * ov / 1
    WHEN 2 THEN CAST(0.09 AS DOUBLE) * ov / 2
    WHEN 3 THEN CAST(0.081 AS DOUBLE) * ov / 3
    WHEN 4 THEN CAST(0.0729 AS DOUBLE) * ov / 4
    WHEN 5 THEN CAST(0.06561 AS DOUBLE) * ov / 5
    WHEN 6 THEN CAST(0.059049 AS DOUBLE) * ov / 6
    WHEN 7 THEN CAST(0.0531441 AS DOUBLE) * ov / 7
    WHEN 8 THEN CAST(0.04782969 AS DOUBLE) * ov / 8
    WHEN 9 THEN CAST(0.043046721 AS DOUBLE) * ov / 9
    ELSE CAST(0.0387420489 AS DOUBLE) * ov / 10 END * 1e8) AS BIGINT) tq
  FROM terms),
rbo AS (SELECT pid, sum(tq) rbo_q8 FROM tq GROUP BY 1)
SELECT p.pid, CAST(coalesce(rbo_q8, 0) AS BIGINT) AS rbo_q8,
  round(CAST(coalesce(rbo_q8, 0) AS DOUBLE)/1e8, 6) AS rbo
FROM probes p LEFT JOIN rbo ON rbo.pid = p.pid ORDER BY p.pid""",

      // Dim ablation: full-64 vs first-32 cosine top-10 overlap, both
      // rankings quantized with cand ties.
      "sim_dim_ablation_overlap" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
probes AS (SELECT vec_id pid, embedding pe FROM emb WHERE vec_id < 30),
scored AS (SELECT p.pid, e.vec_id cand,
    CAST(floor(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) qf,
    CAST(floor(list_cosine_similarity(cast(p.pe[1:32] AS DOUBLE[]), cast(e.embedding[1:32] AS DOUBLE[]))*10000) AS BIGINT) qh
  FROM probes p CROSS JOIN emb e WHERE e.vec_id <> p.pid),
tf AS (SELECT pid, cand FROM (SELECT pid, cand,
    row_number() OVER (PARTITION BY pid ORDER BY qf DESC, cand) r FROM scored) t WHERE r <= 10),
th AS (SELECT pid, cand FROM (SELECT pid, cand,
    row_number() OVER (PARTITION BY pid ORDER BY qh DESC, cand) r FROM scored) t WHERE r <= 10),
ov AS (SELECT tf.pid, count(*) n FROM tf JOIN th ON tf.pid = th.pid AND tf.cand = th.cand GROUP BY 1)
SELECT p.pid, CAST(coalesce(ov.n, 0) AS BIGINT) AS overlap_at_10,
  round(CAST(coalesce(ov.n, 0) AS DOUBLE)/10.0, 2) AS stability
FROM probes p LEFT JOIN ov ON ov.pid = p.pid ORDER BY p.pid""",

      // QQ: exact interpolated quantile LISTS, 10-point grid aligned
      // by ordinality (Spark posexplode is 0-based, these subscripts
      // 1-based — pct formulas compensate).
      "agg_qq_price_segments" ->
        s"""WITH a AS (SELECT quantile_cont(o_totalprice,
    [0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65, 0.75, 0.85, 0.95]) qs
  FROM ${T("orders")} WHERE o_custkey % 2 = 0),
b AS (SELECT quantile_cont(o_totalprice,
    [0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65, 0.75, 0.85, 0.95]) qs
  FROM ${T("orders")} WHERE o_custkey % 2 = 1),
ax AS (SELECT generate_subscripts(qs, 1) AS i, unnest(qs) AS q FROM a),
bx AS (SELECT generate_subscripts(qs, 1) AS i, unnest(qs) AS q FROM b)
SELECT CAST(5 + (ax.i - 1)*10 AS BIGINT) AS pct,
  round(ax.q, 4) AS q_seg_a, round(bx.q, 4) AS q_seg_b,
  round(ax.q / bx.q, 6) AS qq_ratio
FROM ax JOIN bx ON ax.i = bx.i ORDER BY pct""",

      // Equi-depth histogram: p0..p100 boundaries from one quantile
      // list; adjacent pairs by lead over the 11-row relation.
      "agg_equi_depth_histogram" ->
        s"""WITH b AS (SELECT count(*) n, quantile_cont(o_totalprice,
    [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]) qs
  FROM ${T("orders")}),
x AS (SELECT n, generate_subscripts(qs, 1) AS i, unnest(qs) AS lo FROM b),
y AS (SELECT n, i, lo, lead(lo) OVER (ORDER BY i) AS hi FROM x)
SELECT CAST(i AS BIGINT) AS bucket, round(lo, 4) AS lower_bound,
  round(hi, 4) AS upper_bound, CAST(n AS BIGINT) AS n_total
FROM y WHERE hi IS NOT NULL ORDER BY bucket""",

      // Trimmed mean: exact p10/p90 bounds, inclusive BETWEEN on the
      // stored doubles, DECIMAL-cent kept sum.
      "agg_trimmed_mean" ->
        s"""WITH bd AS (SELECT quantile_cont(o_totalprice, 0.10) lo,
    quantile_cont(o_totalprice, 0.90) hi FROM ${T("orders")})
SELECT CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN o_totalprice BETWEEN lo AND hi THEN 1 ELSE 0 END) AS BIGINT)
    AS n_kept,
  round(CAST(sum(CASE WHEN o_totalprice BETWEEN lo AND hi
      THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) /
    CAST(sum(CASE WHEN o_totalprice BETWEEN lo AND hi THEN 1 ELSE 0 END) AS DOUBLE), 2)
    AS trimmed_mean,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) /
    CAST(count(*) AS DOUBLE), 2) AS plain_mean
FROM ${T("orders")}, bd""",

      // Multi-lag ACF: the lag-1 recipe per lag, unioned with labels.
      "ts_acf_weekly" ->
        s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
  sum(CAST(value AS DECIMAL(18,2))) AS rev
  FROM ${T("events")} WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1),
lagacf AS (
  SELECT lg, count(*) n, sum(x) sx, sum(y) sy,
    sum(CAST(x * y AS DECIMAL(38,4))) sxy,
    sum(CAST(x * x AS DECIMAL(38,4))) sxx,
    sum(CAST(y * y AS DECIMAL(38,4))) syy
  FROM (
    SELECT 1 lg, a.rev x, b.rev y FROM daily a JOIN daily b ON a.day = b.day + 1
    UNION ALL
    SELECT 7, a.rev, b.rev FROM daily a JOIN daily b ON a.day = b.day + 7
    UNION ALL
    SELECT 14, a.rev, b.rev FROM daily a JOIN daily b ON a.day = b.day + 14
    UNION ALL
    SELECT 28, a.rev, b.rev FROM daily a JOIN daily b ON a.day = b.day + 28) t
  GROUP BY 1)
SELECT CAST(lg AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
    (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
     sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
    AS acf
FROM lagacf ORDER BY lag""",

      // Doc-length Gini: exact rank formula on integer lengths, Sum i*x
      // in HUGEINT.
      "pipeline_doclen_gini" ->
        s"""WITH r AS (SELECT source, n_chars,
    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) i
  FROM ${T("documents")}),
g AS (SELECT source, count(*) n, sum(n_chars) sx,
    sum(CAST(i AS HUGEINT) * n_chars) six FROM r GROUP BY 1)
SELECT source, CAST(n AS BIGINT) AS n_docs,
  round(CAST(2*six - CAST((n + 1) * sx AS HUGEINT) AS DOUBLE) /
    CAST(n * sx AS DOUBLE), 4) AS len_gini
FROM g ORDER BY source""",

      // Allocation comparison: both allocations integerize by the same
      // largest-remainder rule; per-stratum variance terms floor to
      // BIGINT before the cross-stratum sum (fold-order-proof).
      "sample_allocation_compare" ->
        s"""WITH st AS (SELECT source, count(*) nh, sum(n_chars) sx,
    sum(CAST(n_chars AS HUGEINT) * n_chars) sxx FROM ${T("documents")} GROUP BY 1),
w AS (SELECT source, nh,
    CAST(floor(sqrt(CAST(nh*sxx - sx*sx AS DOUBLE))) AS BIGINT) w,
    CAST(nh*sxx - sx*sx AS DOUBLE) / CAST(nh*(nh - 1) AS DOUBLE) sh2
  FROM st),
t AS (SELECT sum(w) tw, sum(nh) tn FROM w),
bn AS (SELECT source, nh, sh2, q,
    CAST(floor(q) AS BIGINT) base FROM (SELECT w.*,
      CAST(10000*w AS DOUBLE)/CAST(tw AS DOUBLE) q FROM w, t)),
lv AS (SELECT 10000 - sum(base) leftover FROM bn),
an AS (SELECT source, nh, sh2, base + CASE WHEN
      row_number() OVER (ORDER BY q - base DESC, source) <= lv.leftover
    THEN 1 ELSE 0 END a_ney FROM bn, lv),
bp AS (SELECT source, q, CAST(floor(q) AS BIGINT) base FROM (SELECT w.source,
      CAST(10000*nh AS DOUBLE)/CAST(tn AS DOUBLE) q FROM w, t)),
lp AS (SELECT 10000 - sum(base) leftover FROM bp),
ap AS (SELECT source, base + CASE WHEN
      row_number() OVER (ORDER BY q - base DESC, source) <= lp.leftover
    THEN 1 ELSE 0 END a_prop FROM bp, lp),
j AS (SELECT an.nh, an.sh2, an.a_ney, ap.a_prop
  FROM an JOIN ap ON ap.source = an.source
  WHERE a_ney > 0 AND a_prop > 0)
SELECT CAST(count(*) AS BIGINT) AS n_strata,
  CAST(sum(CAST(floor(CAST(nh*nh AS DOUBLE) * sh2 / CAST(a_ney AS DOUBLE)) AS BIGINT)) AS BIGINT)
    AS var_neyman_q0,
  CAST(sum(CAST(floor(CAST(nh*nh AS DOUBLE) * sh2 / CAST(a_prop AS DOUBLE)) AS BIGINT)) AS BIGINT)
    AS var_proportional_q0,
  floor(CAST(sum(CAST(floor(CAST(nh*nh AS DOUBLE) * sh2 / CAST(a_prop AS DOUBLE)) AS BIGINT)) AS DOUBLE) /
    CAST(sum(CAST(floor(CAST(nh*nh AS DOUBLE) * sh2 / CAST(a_ney AS DOUBLE)) AS BIGINT)) AS DOUBLE) * 1e4) / 1e4
    AS efficiency_ratio
FROM j""",

      // ---- §2.35 (round 11): sequential testing, conformal
      // prediction, tokenizer economics, CUSUM drift ----

      // SPRT: cumulative conversion counts in md5 arrival order at
      // 100-row checkpoints; the two log-likelihood factors are the
      // SAME inlined double literals as the Spark side (ln(.35/.25),
      // ln(.65/.75)), LLR floor-quantized 1e6, decision on the
      // quantized integer vs the quantized ln(19) boundaries.
      "agg_sprt_decision" ->
        s"""WITH r AS (SELECT
    CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) > 15000000
      THEN 1 ELSE 0 END conv,
    row_number() OVER (ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) rn
  FROM ${T("orders")}),
c AS (SELECT rn, sum(conv) OVER (ORDER BY rn) x FROM r)
SELECT CAST(rn AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
  CAST(floor((CAST(x AS DOUBLE) * 0.3364722366212129 +
    CAST(rn - x AS DOUBLE) * -0.1431008436406733) * 1e6) AS BIGINT) AS llr_q6,
  CASE WHEN CAST(floor((CAST(x AS DOUBLE) * 0.3364722366212129 +
      CAST(rn - x AS DOUBLE) * -0.1431008436406733) * 1e6) AS BIGINT) >= 2944438
    THEN 'reject_h0'
    WHEN CAST(floor((CAST(x AS DOUBLE) * 0.3364722366212129 +
      CAST(rn - x AS DOUBLE) * -0.1431008436406733) * 1e6) AS BIGINT) <= -2944439
    THEN 'accept_h0' ELSE 'continue' END AS decision
FROM c WHERE rn % 100 = 0 ORDER BY n""",

      // e-process summary: sup of the same quantized LLR stream =
      // -ln(always-valid p); first boundary crossing; one row.
      "agg_eprocess_summary" ->
        s"""WITH r AS (SELECT
    CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) > 15000000
      THEN 1 ELSE 0 END conv,
    row_number() OVER (ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) rn
  FROM ${T("orders")}),
c AS (SELECT rn, sum(conv) OVER (ORDER BY rn) x FROM r),
k AS (SELECT rn AS n,
    CAST(floor((CAST(x AS DOUBLE) * 0.3364722366212129 +
      CAST(rn - x AS DOUBLE) * -0.1431008436406733) * 1e6) AS BIGINT) llr
  FROM c WHERE rn % 100 = 0)
SELECT CAST(count(*) AS BIGINT) AS n_checkpoints,
  CAST(max(llr) AS BIGINT) AS sup_llr_q6,
  CAST(greatest(max(llr), 0) AS BIGINT) AS neg_ln_p_q6,
  CAST(coalesce(min(CASE WHEN llr >= 2944438 THEN n END), -1) AS BIGINT)
    AS first_reject_n
FROM k""",

      // split conformal: per-segment train-mean prediction (floor
      // integer cents), calibration residual order statistic at
      // ceil(9(n+1)/10) clamped to n — everything BIGINT.
      "sample_conformal_interval" ->
        s"""WITH o AS (SELECT o_orderkey, o_custkey % 4 seg,
    CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) cents,
    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT b
  FROM ${T("orders")}),
s AS (SELECT *, CASE WHEN b < 21845 THEN 'train'
    WHEN b < 43690 THEN 'calib' ELSE 'test' END split FROM o),
p AS (SELECT seg, CAST(floor(CAST(sum(cents) AS DOUBLE)/CAST(count(*) AS DOUBLE)) AS BIGINT) pred_cents
  FROM s WHERE split = 'train' GROUP BY seg),
cal AS (SELECT s.seg, abs(s.cents - p.pred_cents) resid, s.o_orderkey,
    p.pred_cents FROM s JOIN p ON p.seg = s.seg WHERE s.split = 'calib'),
rk AS (SELECT seg, resid, pred_cents,
    row_number() OVER (PARTITION BY seg ORDER BY resid, o_orderkey) rn,
    count(*) OVER (PARTITION BY seg) n_calib
  FROM cal)
SELECT CAST(seg AS BIGINT) AS seg, CAST(n_calib AS BIGINT) AS n_calib,
  pred_cents, resid AS q_cents,
  pred_cents - resid AS lo_cents, pred_cents + resid AS hi_cents
FROM rk WHERE rn = least((9*(n_calib+1)+9)//10, n_calib) ORDER BY seg""",

      // conformal coverage on the test split: covered/n as a 1e6
      // integer division — the >= 90% validity check.
      "sample_conformal_coverage" ->
        s"""WITH o AS (SELECT o_orderkey, o_custkey % 4 seg,
    CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) cents,
    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT b
  FROM ${T("orders")}),
s AS (SELECT *, CASE WHEN b < 21845 THEN 'train'
    WHEN b < 43690 THEN 'calib' ELSE 'test' END split FROM o),
p AS (SELECT seg, CAST(floor(CAST(sum(cents) AS DOUBLE)/CAST(count(*) AS DOUBLE)) AS BIGINT) pred_cents
  FROM s WHERE split = 'train' GROUP BY seg),
cal AS (SELECT s.seg, abs(s.cents - p.pred_cents) resid, s.o_orderkey
  FROM s JOIN p ON p.seg = s.seg WHERE s.split = 'calib'),
rk AS (SELECT seg, resid,
    row_number() OVER (PARTITION BY seg ORDER BY resid, o_orderkey) rn,
    count(*) OVER (PARTITION BY seg) n_calib
  FROM cal),
q AS (SELECT seg, resid q_cents FROM rk
  WHERE rn = least((9*(n_calib+1)+9)//10, n_calib))
SELECT CAST(s.seg AS BIGINT) AS seg, CAST(count(*) AS BIGINT) AS n_test,
  CAST(sum(CASE WHEN abs(s.cents - p.pred_cents) <= q.q_cents
    THEN 1 ELSE 0 END) AS BIGINT) AS covered,
  CAST((sum(CASE WHEN abs(s.cents - p.pred_cents) <= q.q_cents
    THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS coverage_q6
FROM s JOIN p ON p.seg = s.seg JOIN q ON q.seg = s.seg
WHERE s.split = 'test' GROUP BY s.seg ORDER BY seg""",

      // fertility: the token_count regex aggregated per lang; ratios
      // as 1e6/1e8 integer divisions of exact BIGINT sums.
      "pipeline_bpe_fertility" ->
        s"""WITH t AS (SELECT lang,
    CAST(len(string_split(text, ' ')) AS BIGINT) ws,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) bpe,
    n_chars
  FROM ${T("documents")})
SELECT lang, CAST(count(*) AS BIGINT) AS docs,
  CAST(sum(ws) AS BIGINT) AS ws_tokens,
  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
  CAST((sum(bpe) * 1000000) // sum(ws) AS BIGINT) AS tok_per_word_q6,
  CAST((sum(bpe) * 100000000) // sum(n_chars) AS BIGINT) AS tok_per_100chars_q6
FROM t GROUP BY lang ORDER BY lang""",

      // CUSUM: Page's recursion over calendar-ordered daily counts —
      // exact BIGINT arithmetic (mu = integer mean, k = 1), the Holt
      // recursive-CTE twin of the Spark aggregate-HOF fold; top-20
      // drift days.
      "ts_cusum_top" ->
        s"""WITH RECURSIVE dd AS (SELECT CAST(o_orderdate AS DATE) dt, count(*) x
  FROM ${T("orders")} GROUP BY 1),
p AS (SELECT dt, x, row_number() OVER (ORDER BY dt) rn FROM dd),
t AS (SELECT CAST(sum(x) // count(*) AS BIGINT) mu FROM dd),
rec AS (
  SELECT rn, greatest(CAST(0 AS BIGINT),
      CAST(x AS BIGINT) - (SELECT mu FROM t) - 1) s
  FROM p WHERE rn = 1
  UNION ALL
  SELECT p.rn, greatest(CAST(0 AS BIGINT),
      rec.s + CAST(p.x AS BIGINT) - (SELECT mu FROM t) - 1)
  FROM rec JOIN p ON p.rn = rec.rn + 1)
SELECT p.dt, CAST(p.x AS BIGINT) AS x, CAST(rec.s AS BIGINT) AS cusum_s
FROM rec JOIN p ON p.rn = rec.rn
ORDER BY cusum_s DESC, dt LIMIT 20""",

      // ---- §2.36 (round 11): experimentation & sequence reads ----

      // CUPED: pooled theta from exact HUGEINT moments; one shared
      // IEEE tree for theta / adjusted means / rho^2.
      "agg_cuped_adjust" ->
        s"""WITH u AS (SELECT o_custkey, o_custkey % 2 arm,
    sum(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN
      CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) ELSE 0 END) pre,
    sum(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN
      CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) ELSE 0 END) post
  FROM ${T("orders")} GROUP BY 1, 2),
p AS (SELECT count(*) n, sum(pre) sx, sum(post) sy,
    sum(CAST(pre AS HUGEINT)*pre) sxx, sum(CAST(post AS HUGEINT)*post) syy,
    sum(CAST(pre AS HUGEINT)*post) sxy FROM u),
a AS (SELECT arm, count(*) na, sum(pre) sxa, sum(post) sya FROM u GROUP BY 1),
k AS (SELECT a.arm, a.na, a.sxa, a.sya, p.n, p.sx, p.sy,
    CAST(CAST(p.n AS HUGEINT)*p.sxy - CAST(p.sx AS HUGEINT)*p.sy AS DOUBLE) covn,
    CAST(CAST(p.n AS HUGEINT)*p.sxx - CAST(p.sx AS HUGEINT)*p.sx AS DOUBLE) varxn,
    CAST(CAST(p.n AS HUGEINT)*p.syy - CAST(p.sy AS HUGEINT)*p.sy AS DOUBLE) varyn
  FROM a, p)
SELECT CAST(arm AS BIGINT) AS arm, CAST(na AS BIGINT) AS n_cust,
  floor(CAST(sya AS DOUBLE)/CAST(na AS DOUBLE)/100.0 * 1e4)/1e4 AS mean_post,
  floor((CAST(sya AS DOUBLE)/CAST(na AS DOUBLE) -
    (covn/varxn) * (CAST(sxa AS DOUBLE)/CAST(na AS DOUBLE)
      - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)))/100.0 * 1e4)/1e4 AS mean_adjusted,
  floor(covn/varxn * 1e6)/1e6 AS theta_q6,
  floor(covn*covn/(varxn*varyn) * 1e6)/1e6 AS var_reduction_q6
FROM k ORDER BY arm""",

      // SRM: chi^2_1 for a 50/50 design = (n0-n1)^2/(n0+n1), exact
      // 1e4-quantized integer division, verdict on the integer.
      "agg_srm_check" ->
        s"""WITH c AS (SELECT DISTINCT o_custkey FROM ${T("orders")}),
n AS (SELECT sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END) n_a,
    sum(CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END) n_b FROM c)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  CAST(((n_a - n_b) * (n_a - n_b) * 10000) // (n_a + n_b) AS BIGINT)
    AS chi2_q4,
  CASE WHEN ((n_a - n_b) * (n_a - n_b) * 10000) // (n_a + n_b) > 38415
    THEN 'mismatch' ELSE 'ok' END AS srm_verdict
FROM n""",

      // AUC with average-rank ties, exactly in integers: doubled
      // rank-sum per score group = pos*(2*C_lower + cnt + 1).
      "agg_auc_reorder" ->
        s"""WITH pc AS (SELECT o_custkey,
    sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) score,
    max(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) lbl
  FROM ${T("orders")} GROUP BY 1),
bs AS (SELECT score, count(*) cnt, sum(lbl) pos
  FROM pc WHERE score > 0 GROUP BY 1),
rk AS (SELECT score, cnt, pos,
    coalesce(sum(cnt) OVER (ORDER BY score
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) c_lower
  FROM bs),
g AS (SELECT sum(pos * (2*c_lower + cnt + 1)) r2, sum(pos) n_pos,
    sum(cnt - pos) n_neg FROM rk)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
  CAST(r2 - n_pos*(n_pos+1) AS BIGINT) AS u2,
  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
    CAST(floor(CAST(r2 - n_pos*(n_pos+1) AS DOUBLE) /
      (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) * 1e6) AS BIGINT)
    END AS auc_q6,
  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
    CAST(floor((CAST(r2 - n_pos*(n_pos+1) AS DOUBLE) /
      (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) * 2.0 - 1.0) * 1e6)
      AS BIGINT) END AS gini_q6
FROM g""",

      // delta-method ratio CI: customer-unit revenue per order; exact
      // HUGEINT moments, one IEEE tree (welch discipline).
      "agg_ratio_delta_ci" ->
        s"""WITH u AS (SELECT o_custkey, o_custkey % 2 arm,
    sum(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN
      CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) ELSE 0 END) post,
    sum(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) np
  FROM ${T("orders")} GROUP BY 1, 2),
a AS (SELECT arm, count(*) n, sum(post) sy, sum(np) sn,
    sum(CAST(post AS HUGEINT)*post) syy, sum(CAST(np AS HUGEINT)*np) snn,
    sum(CAST(post AS HUGEINT)*np) syn
  FROM u WHERE np > 0 GROUP BY 1),
k AS (SELECT arm, n, sy, sn,
    CAST(sy AS DOUBLE)/CAST(sn AS DOUBLE) r,
    CAST(CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS DOUBLE)
      / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0)) vy,
    CAST(CAST(n AS HUGEINT)*snn - CAST(sn AS HUGEINT)*sn AS DOUBLE)
      / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0)) vn,
    CAST(CAST(n AS HUGEINT)*syn - CAST(sy AS HUGEINT)*sn AS DOUBLE)
      / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1.0)) vyn,
    CAST(sn AS DOUBLE)/CAST(n AS DOUBLE) mn
  FROM a)
SELECT CAST(arm AS BIGINT) AS arm, CAST(n AS BIGINT) AS n_cust,
  floor(r/100.0 * 1e4)/1e4 AS rev_per_order,
  floor(sqrt((vy - 2.0*r*vyn + r*r*vn) / CAST(n AS DOUBLE)) / mn / 100.0 * 1e6)/1e6
    AS se_q6,
  floor((r - 1.96 * (sqrt((vy - 2.0*r*vyn + r*r*vn) / CAST(n AS DOUBLE)) / mn))
    / 100.0 * 1e4)/1e4 AS ci_lo_95,
  floor((r + 1.96 * (sqrt((vy - 2.0*r*vyn + r*r*vn) / CAST(n AS DOUBLE)) / mn))
    / 100.0 * 1e4)/1e4 AS ci_hi_95
FROM k ORDER BY arm""",

      // retention half-life: dense week spine so gap weeks count as
      // 0% retention; integer 2*retained < size test.
      "ts_retention_half_life" ->
        s"""WITH e AS (SELECT user_id,
    CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS DATE) cohort_wk,
    CAST(date_trunc('week', ts) AS DATE) wk_d
  FROM ${T("events")} WHERE user_id IS NOT NULL),
act AS (SELECT DISTINCT user_id, cohort_wk,
    date_diff('day', cohort_wk, wk_d) // 7 wk FROM e),
sz AS (SELECT cohort_wk, count(*) cohort_size FROM act WHERE wk = 0 GROUP BY 1),
ret AS (SELECT cohort_wk, wk, count(*) retained FROM act WHERE wk > 0 GROUP BY 1, 2),
lastw AS (SELECT cohort_wk, max(wk) last_wk FROM act GROUP BY 1),
spine AS (SELECT sz.cohort_wk, sz.cohort_size, gs.wk
  FROM sz JOIN lastw ON lastw.cohort_wk = sz.cohort_wk,
    LATERAL (SELECT unnest(range(1, CAST(greatest(lastw.last_wk, 1) AS BIGINT) + 1)) wk) gs),
hl AS (SELECT s.cohort_wk,
    min(CASE WHEN coalesce(r.retained, 0) * 2 < s.cohort_size THEN s.wk END) hl
  FROM spine s LEFT JOIN ret r ON r.cohort_wk = s.cohort_wk AND r.wk = s.wk
  GROUP BY 1)
SELECT sz.cohort_wk AS cohort_wk, CAST(sz.cohort_size AS BIGINT) AS cohort_size,
  CAST(lastw.last_wk AS BIGINT) AS weeks_observed,
  CAST(coalesce(hl.hl, -1) AS BIGINT) AS half_life_weeks
FROM sz LEFT JOIN hl ON hl.cohort_wk = sz.cohort_wk
JOIN lastw ON lastw.cohort_wk = sz.cohort_wk
ORDER BY sz.cohort_wk""",

      // conditional entropy of the event chain: per-cell
      // n_ij*ln(n_i/n_ij) floor-quantized 1e6 BEFORE summing; the
      // per-state entropy is then an exact integer division.
      "ts_conditional_entropy" ->
        s"""WITH s AS (SELECT user_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) nxt
  FROM ${T("events")} WHERE user_id IS NOT NULL),
pairs AS (SELECT event_type from_type, nxt to_type, count(*) nij
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, sum(nij) ni FROM pairs GROUP BY 1),
t AS (SELECT p.from_type, t2.ni,
    CAST(floor(CAST(p.nij AS DOUBLE) *
      ln(CAST(t2.ni AS DOUBLE) / CAST(p.nij AS DOUBLE)) * 1e6) AS BIGINT) t6
  FROM pairs p JOIN tot t2 ON t2.from_type = p.from_type)
SELECT from_type, CAST(max(ni) AS BIGINT) AS n_transitions,
  CAST(count(*) AS BIGINT) AS n_successors,
  CAST(sum(t6) // max(ni) AS BIGINT) AS h_nats_q6
FROM t GROUP BY from_type ORDER BY from_type""",

      // ---- §2.37 (round 11): forecasting, guardrails, concentration ----

      // Holt-Winters additive m=7: the recursive CTE carries l, b and
      // the rotating s1..s7 — identical IEEE recurrence to the Spark
      // fold (the ts_holt_linear equivalence, now with array state).
      "ts_holt_winters" ->
        s"""WITH RECURSIVE dd AS (SELECT CAST(o_orderdate AS DATE) dt,
    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS DOUBLE) x
  FROM ${T("orders")} GROUP BY 1),
p AS (SELECT x, row_number() OVER (ORDER BY dt) rn FROM dd),
n AS (SELECT count(*) nd FROM dd),
i AS (SELECT
    (max(CASE WHEN rn=1 THEN x END) + max(CASE WHEN rn=2 THEN x END)
     + max(CASE WHEN rn=3 THEN x END) + max(CASE WHEN rn=4 THEN x END)
     + max(CASE WHEN rn=5 THEN x END) + max(CASE WHEN rn=6 THEN x END)
     + max(CASE WHEN rn=7 THEN x END)) / CAST(7 AS DOUBLE) l0,
    max(CASE WHEN rn=1 THEN x END) x1, max(CASE WHEN rn=2 THEN x END) x2,
    max(CASE WHEN rn=3 THEN x END) x3, max(CASE WHEN rn=4 THEN x END) x4,
    max(CASE WHEN rn=5 THEN x END) x5, max(CASE WHEN rn=6 THEN x END) x6,
    max(CASE WHEN rn=7 THEN x END) x7
  FROM p WHERE rn <= 7),
rec AS (
  SELECT 7 AS t, l0 AS l, CAST(0 AS DOUBLE) AS b,
    x1 - l0 AS s1, x2 - l0 AS s2, x3 - l0 AS s3, x4 - l0 AS s4,
    x5 - l0 AS s5, x6 - l0 AS s6, x7 - l0 AS s7
  FROM i
  UNION ALL
  SELECT rec.t + 1,
    CAST(0.2 AS DOUBLE) * (p.x - rec.s1) + CAST(0.8 AS DOUBLE) * (rec.l + rec.b),
    CAST(0.05 AS DOUBLE) * ((CAST(0.2 AS DOUBLE) * (p.x - rec.s1)
        + CAST(0.8 AS DOUBLE) * (rec.l + rec.b)) - rec.l)
      + CAST(0.95 AS DOUBLE) * rec.b,
    rec.s2, rec.s3, rec.s4, rec.s5, rec.s6, rec.s7,
    CAST(0.1 AS DOUBLE) * (p.x - (CAST(0.2 AS DOUBLE) * (p.x - rec.s1)
        + CAST(0.8 AS DOUBLE) * (rec.l + rec.b)))
      + CAST(0.9 AS DOUBLE) * rec.s1
  FROM rec JOIN p ON p.rn = rec.t + 1, n WHERE rec.t + 1 <= n.nd),
fin AS (SELECT rec.l, rec.b, rec.s1, rec.s2, rec.s3, rec.s4, rec.s5,
    rec.s6, rec.s7 FROM rec, n WHERE rec.t = n.nd),
h AS (SELECT unnest(range(1, 8)) hh)
SELECT CAST(hh AS BIGINT) AS h,
  floor(l + CAST(hh AS DOUBLE) * b +
    CASE hh WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3 WHEN 4 THEN s4
      WHEN 5 THEN s5 WHEN 6 THEN s6 ELSE s7 END) / 100.0 AS forecast
FROM fin, h ORDER BY h""",

      // two-sample Poisson rate z on exact counts, 365-day exposures.
      "agg_poisson_rate_test" ->
        s"""WITH c AS (SELECT
    sum(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) n1,
    sum(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) n2
  FROM ${T("orders")})
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  floor(CAST(n1 AS DOUBLE)/365.0 * 1e4)/1e4 AS rate_1995,
  floor(CAST(n2 AS DOUBLE)/365.0 * 1e4)/1e4 AS rate_1997,
  CAST(floor((CAST(n1 AS DOUBLE)/365.0 - CAST(n2 AS DOUBLE)/365.0) /
    sqrt(CAST(n1 AS DOUBLE)/(365.0*365.0) + CAST(n2 AS DOUBLE)/(365.0*365.0))
    * 1e4) AS BIGINT) AS z_q4,
  abs(CAST(floor((CAST(n1 AS DOUBLE)/365.0 - CAST(n2 AS DOUBLE)/365.0) /
    sqrt(CAST(n1 AS DOUBLE)/(365.0*365.0) + CAST(n2 AS DOUBLE)/(365.0*365.0))
    * 1e4) AS BIGINT)) > 19600 AS significant_95
FROM c""",

      // SMD covariate balance: welch-discipline moments, one tree.
      "agg_covariate_balance" ->
        s"""WITH u AS (SELECT o_custkey, o_custkey % 2 arm,
    sum(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN
      CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) ELSE 0 END) pre
  FROM ${T("orders")} GROUP BY 1, 2),
a AS (SELECT arm, count(*) n, sum(pre) sx, sum(CAST(pre AS HUGEINT)*pre) sxx
  FROM u GROUP BY 1),
w AS (SELECT max(CASE WHEN arm = 0 THEN n END) n0,
    max(CASE WHEN arm = 0 THEN sx END) s0, max(CASE WHEN arm = 0 THEN sxx END) q0,
    max(CASE WHEN arm = 1 THEN n END) n1,
    max(CASE WHEN arm = 1 THEN sx END) s1, max(CASE WHEN arm = 1 THEN sxx END) q1
  FROM a),
k AS (SELECT n0, n1,
    CAST(s0 AS DOUBLE)/CAST(n0 AS DOUBLE) m0,
    CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) m1,
    CAST(n0*q0 - CAST(s0 AS HUGEINT)*s0 AS DOUBLE)/CAST(n0*(n0-1) AS DOUBLE) v0,
    CAST(n1*q1 - CAST(s1 AS HUGEINT)*s1 AS DOUBLE)/CAST(n1*(n1-1) AS DOUBLE) v1
  FROM w)
SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
  floor(m0/100.0 * 100)/100 AS mean_pre_a,
  floor(m1/100.0 * 100)/100 AS mean_pre_b,
  CAST(floor((m0 - m1)/sqrt((v0 + v1)/2.0) * 1e6) AS BIGINT) AS smd_q6,
  abs(CAST(floor((m0 - m1)/sqrt((v0 + v1)/2.0) * 1e6) AS BIGINT)) < 100000
    AS balanced_01
FROM k""",

      // class-balanced downsample: per-class k smallest md5 ranks,
      // k = minority class size.
      "sample_class_balance" ->
        s"""WITH r AS (SELECT lang, doc_id,
    CAST(row_number() OVER (PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) rk
  FROM ${T("documents")}),
k AS (SELECT min(cs) k FROM (SELECT count(*) cs FROM r GROUP BY lang))
SELECT lang, CAST(count(*) AS BIGINT) AS class_size,
  CAST(sum(CASE WHEN rk <= k.k THEN 1 ELSE 0 END) AS BIGINT) AS kept,
  CAST(min(CASE WHEN rk <= k.k THEN doc_id END) AS BIGINT) AS min_kept_id,
  CAST(max(CASE WHEN rk <= k.k THEN doc_id END) AS BIGINT) AS max_kept_id
FROM r, k GROUP BY lang, k.k ORDER BY lang""",

      // Chapman capture-recapture: pure integer estimator vs truth.
      "agg_capture_recapture" ->
        s"""WITH u AS (SELECT o_custkey,
    max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) in1,
    max(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) in2
  FROM ${T("orders")} GROUP BY 1),
g AS (SELECT sum(in1) n1, sum(in2) n2, sum(in1*in2) m, count(*) n_true FROM u)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  CAST(m AS BIGINT) AS m, CAST(n_true AS BIGINT) AS n_true,
  CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT) AS n_chapman,
  CAST(((((n1 + 1) * (n2 + 1)) // (m + 1) - 1) * 10000) // n_true AS BIGINT)
    AS est_over_true_q4
FROM g""",

      // HHI revenue concentration: exact HUGEINT square sum over one
      // double division, 1e8-floored; effective customers = 1/HHI.
      "agg_hhi_concentration" ->
        s"""WITH pc AS (SELECT o_custkey,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) r
  FROM ${T("orders")} GROUP BY 1),
g AS (SELECT count(*) n_cust, sum(r) tot, sum(CAST(r AS HUGEINT)*r) sq FROM pc)
SELECT CAST(n_cust AS BIGINT) AS n_cust,
  CAST(floor(CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE)*CAST(tot AS DOUBLE))
    * 1e8) AS BIGINT) AS hhi_q8,
  floor(1.0 / (CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE)*CAST(tot AS DOUBLE)))
    * 100)/100 AS effective_customers
FROM g""",

      // ---- §2.38 (round 11): targeting, retention KPI, vocab sizing,
      // boilerplate, dominance, k-fold ----

      // decile lift: NTILE over pre-spend desc, integer rates/lifts.
      "agg_decile_lift" ->
        s"""WITH u AS (SELECT o_custkey,
    sum(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN
      CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) ELSE 0 END) pre,
    max(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) conv
  FROM ${T("orders")} GROUP BY 1),
r AS (SELECT *, ntile(10) OVER (ORDER BY pre DESC, o_custkey) decile FROM u),
b AS (SELECT decile, count(*) n_cust, sum(conv) converted FROM r GROUP BY 1),
t AS (SELECT sum(n_cust) nt, sum(converted) ct FROM b)
SELECT CAST(decile AS BIGINT) AS decile, CAST(n_cust AS BIGINT) AS n_cust,
  CAST(converted AS BIGINT) AS converted,
  CAST((converted * 1000000) // n_cust AS BIGINT) AS rate_q6,
  CASE WHEN ct > 0 THEN
    CAST((converted * nt * 1000000) // (n_cust * ct) AS BIGINT) END AS lift_q6
FROM b, t ORDER BY decile""",

      // repeat rate by acquisition-year cohort: integer membership.
      "agg_repeat_purchase_rate" ->
        s"""WITH u AS (SELECT o_custkey, min(year(o_orderdate)) y0
  FROM ${T("orders")} GROUP BY 1),
yr AS (SELECT DISTINCT o_custkey, year(o_orderdate) y FROM ${T("orders")}),
c AS (SELECT u.y0, count(*) n_cust,
    sum(CASE WHEN yr.y IS NOT NULL THEN 1 ELSE 0 END) n_repeat
  FROM u LEFT JOIN yr ON yr.o_custkey = u.o_custkey AND yr.y = u.y0 + 1
  GROUP BY 1)
SELECT CAST(y0 AS BIGINT) AS cohort_year, CAST(n_cust AS BIGINT) AS n_cust,
  CAST(n_repeat AS BIGINT) AS n_repeat,
  CAST((n_repeat * 1000000) // n_cust AS BIGINT) AS repeat_rate_q6
FROM c ORDER BY cohort_year""",

      // vocab coverage points: cumulative mass over (freq desc, token),
      // min rank reaching each mass threshold.
      "pipeline_vocab_coverage_points" ->
        s"""WITH v AS (SELECT w, count(*) f
  FROM (SELECT unnest(string_split(text, ' ')) w FROM ${T("documents")})
  GROUP BY 1),
t AS (SELECT sum(f) tot FROM v),
c AS (SELECT w, f,
    sum(f) OVER (ORDER BY f DESC, w) cum,
    row_number() OVER (ORDER BY f DESC, w) rnk
  FROM v),
pts AS (SELECT unnest([50, 90, 99]) pct),
k AS (SELECT pts.pct, min(c.rnk) n_tokens
  FROM pts, c, t WHERE c.cum * 100 >= pts.pct * t.tot GROUP BY 1)
SELECT CAST(k.pct AS BIGINT) AS pct, CAST(k.n_tokens AS BIGINT) AS n_tokens,
  CAST((c.cum * 1000000) // t.tot AS BIGINT) AS share_q6
FROM k JOIN c ON c.rnk = k.n_tokens, t ORDER BY pct""",

      // prefix boilerplate clusters: identical first-5-word prefixes.
      "dedup_prefix_cluster" ->
        s"""SELECT array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
    AS prefix,
  CAST(count(*) AS BIGINT) AS n_docs, CAST(min(doc_id) AS BIGINT) AS min_doc
FROM ${T("documents")}
GROUP BY 1 HAVING count(*) >= 2
ORDER BY n_docs DESC, min_doc LIMIT 20""",

      // per-segment top-2 revenue dominance: integer cents, total-order
      // rank (rev desc, custkey).
      "win_revenue_dominance" ->
        s"""WITH pc AS (SELECT o_custkey,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) rev,
    o_custkey % 10 seg
  FROM ${T("orders")} GROUP BY 1, 3),
r AS (SELECT *, row_number() OVER (PARTITION BY seg
    ORDER BY rev DESC, o_custkey) rk FROM pc),
g AS (SELECT seg,
    max(CASE WHEN rk = 1 THEN o_custkey END) top_cust,
    max(CASE WHEN rk = 1 THEN rev END) top_rev_cents,
    max(CASE WHEN rk = 2 THEN rev END) second_rev_cents
  FROM r WHERE rk <= 2 GROUP BY 1)
SELECT CAST(seg AS BIGINT) AS seg, CAST(top_cust AS BIGINT) AS top_cust,
  CAST(top_rev_cents AS BIGINT) AS top_rev_cents,
  CAST(second_rev_cents AS BIGINT) AS second_rev_cents,
  CAST(top_rev_cents - second_rev_cents AS BIGINT) AS gap_cents,
  CAST((top_rev_cents * 1000000) // (top_rev_cents + second_rev_cents)
    AS BIGINT) AS dominance_q6
FROM g ORDER BY seg""",

      // deterministic 5-fold assignment: md5-bucket % 5 census.
      "sample_kfold_assign" ->
        s"""WITH f AS (SELECT doc_id,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 5 fold
  FROM ${T("documents")}),
b AS (SELECT fold, count(*) n, min(doc_id) min_id, max(doc_id) max_id
  FROM f GROUP BY 1),
t AS (SELECT sum(n) nt FROM b)
SELECT CAST(fold AS BIGINT) AS fold, CAST(n AS BIGINT) AS n_docs,
  CAST(min_id AS BIGINT) AS min_id, CAST(max_id AS BIGINT) AS max_id,
  CAST((n * 1000000) // nt AS BIGINT) AS share_q6
FROM b, t ORDER BY fold""",

      // ---- round 12 (§2.39): substring-level duplicate spans ----
      // Maximal verbatim ≥12-token spans between doc pairs: positioned
      // 8-gram md5 shingles (1-based pos), occurrence-capped [2,20],
      // pair join, gaps-and-islands on (d1,d2,pos-diff).
      "dedup_substring_spans" ->
        s"""${spanCtes(dir)},
agg AS (SELECT d1, d2, count(*) n_spans, sum(tok) dup_tokens
  FROM spans GROUP BY 1, 2),
best AS (SELECT d1, d2, s1, s2, tok,
    row_number() OVER (PARTITION BY d1, d2 ORDER BY tok DESC, s1, s2) rn
  FROM spans)
SELECT a.d1 AS d1, a.d2 AS d2, CAST(a.n_spans AS BIGINT) AS n_spans,
  CAST(a.dup_tokens AS BIGINT) AS dup_tokens,
  CAST(b.tok AS BIGINT) AS span_tokens,
  CAST(b.s1 AS BIGINT) AS span_start1, CAST(b.s2 AS BIGINT) AS span_start2,
  array_to_string(list_slice(string_split(dd.text, ' '),
    b.s1, b.s1 + b.tok - 1), ' ') AS span_text
FROM agg a JOIN best b ON b.d1 = a.d1 AND b.d2 = a.d2 AND b.rn = 1
JOIN ${T("documents")} dd ON dd.doc_id = a.d1
ORDER BY 1, 2""",

      // per-source share of token mass inside cross-doc verbatim spans
      // (both sides of every span, position-deduplicated per doc).
      "pipeline_dup_span_coverage" ->
        s"""${spanCtes(dir)},
cov0 AS (
  SELECT d1 AS doc_id, unnest(generate_series(s1, s1 + tok - 1)) AS p
  FROM spans
  UNION ALL
  SELECT d2, unnest(generate_series(s2, s2 + tok - 1)) FROM spans),
cnt AS (SELECT doc_id, count(*) AS cov
  FROM (SELECT DISTINCT doc_id, p FROM cov0) GROUP BY 1),
docs AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_toks
  FROM ${T("documents")})
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN c.cov IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS docs_with_dup,
  CAST(sum(d.n_toks) AS BIGINT) AS total_tokens,
  CAST(sum(coalesce(c.cov, 0)) AS BIGINT) AS dup_tokens,
  CAST((sum(coalesce(c.cov, 0)) * 1000000) // sum(d.n_toks) AS BIGINT)
    AS coverage_q6
FROM docs d LEFT JOIN cnt c USING (doc_id)
GROUP BY 1 ORDER BY 1""",

      // reciprocal-rank fusion of the BM25 and vector rankings: top-50
      // per leg by (4dp score desc, id), RRF(60) as exact 1e6-quantized
      // integer division, top-20 fused.
      "sim_rrf_fusion" ->
        s"""WITH dt AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM ${T("documents")}),
t AS (SELECT doc_id, len(toks) AS dl,
  len(list_filter(toks, w -> w = 'spark')) AS tf1,
  len(list_filter(toks, w -> w = 'join')) AS tf2,
  len(list_filter(toks, w -> w = 'stream')) AS tf3 FROM dt),
g AS (SELECT count(*) AS n, sum(dl) AS tot,
  sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
  sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
  sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3 FROM t),
bs AS (SELECT doc_id, round(
  ln((n - df1 + 0.5)/(df1 + 0.5) + 1.0) * (tf1 * 2.2)/(tf1 + 1.2*(0.25 + 0.75*dl/(CAST(tot AS DOUBLE)/n))) +
  ln((n - df2 + 0.5)/(df2 + 0.5) + 1.0) * (tf2 * 2.2)/(tf2 + 1.2*(0.25 + 0.75*dl/(CAST(tot AS DOUBLE)/n))) +
  ln((n - df3 + 0.5)/(df3 + 0.5) + 1.0) * (tf3 * 2.2)/(tf3 + 1.2*(0.25 + 0.75*dl/(CAST(tot AS DOUBLE)/n))), 4) AS bm25
  FROM t, g WHERE tf1 + tf2 + tf3 > 0),
tt AS (SELECT doc_id, bm25 FROM bs ORDER BY bm25 DESC, doc_id LIMIT 50),
tr AS (SELECT doc_id,
    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS text_rank FROM tt),
vs AS (SELECT e.vec_id AS doc_id,
    round(list_cosine_similarity(cast(p.embedding AS DOUBLE[]),
      cast(e.embedding AS DOUBLE[])), 4) AS vsim
  FROM ${T("embeddings")} e,
    (SELECT embedding FROM ${T("embeddings")} WHERE vec_id = 0) p
  WHERE e.vec_id <> 0),
vt AS (SELECT doc_id, vsim FROM vs ORDER BY vsim DESC, doc_id LIMIT 50),
vr AS (SELECT doc_id,
    row_number() OVER (ORDER BY vsim DESC, doc_id) AS vec_rank FROM vt),
f AS (SELECT coalesce(tr.doc_id, vr.doc_id) AS doc_id, text_rank, vec_rank,
    coalesce(1000000 // (60 + text_rank), 0) +
      coalesce(1000000 // (60 + vec_rank), 0) AS rrf
  FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id),
top AS (SELECT * FROM f ORDER BY rrf DESC, doc_id LIMIT 20)
SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
    AS fused_rank,
  doc_id, CAST(text_rank AS BIGINT) AS text_rank,
  CAST(vec_rank AS BIGINT) AS vec_rank, CAST(rrf AS BIGINT) AS rrf_q6
FROM top ORDER BY fused_rank""",

      // ---- round 12 (§2.40): eval & aggregation-bias batch ----
      // Cohen's kappa of the lang-id classifier, off the SAME
      // confusion construction as pipeline_lang_id.
      "agg_cohens_kappa" ->
        s"""WITH toks AS (SELECT DISTINCT doc_id, lang, unnest(string_split(text,' ')) AS w FROM ${T("documents")}),
tk AS (SELECT * FROM toks WHERE w <> ''),
freq AS (SELECT lang, w, count(*) AS df FROM tk GROUP BY 1, 2),
markers AS (SELECT lang AS mlang, w FROM (
  SELECT lang, w, row_number() OVER (PARTITION BY lang ORDER BY df DESC, w) AS rn FROM freq) WHERE rn <= 5),
votes AS (SELECT t.doc_id, m.mlang, count(*) AS hits
  FROM tk t JOIN markers m ON t.w = m.w GROUP BY 1, 2),
pred AS (SELECT doc_id, mlang AS predicted FROM (
  SELECT doc_id, mlang, row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, mlang) AS rn FROM votes) WHERE rn = 1),
conf AS (SELECT d.lang AS actual, coalesce(p.predicted, 'unknown') AS predicted, count(*) AS docs
  FROM ${T("documents")} d LEFT JOIN pred p ON d.doc_id = p.doc_id GROUP BY 1, 2),
nn AS (SELECT sum(docs) AS n,
    sum(CASE WHEN actual = predicted THEN docs ELSE 0 END) AS agree FROM conf),
r AS (SELECT actual AS k, sum(docs) AS rc FROM conf GROUP BY 1),
c AS (SELECT predicted AS k, sum(docs) AS cc FROM conf GROUP BY 1),
pe AS (SELECT sum(CAST(rc AS HUGEINT) * cc) AS pe_num FROM r JOIN c USING (k))
SELECT CAST(n AS BIGINT) AS n_docs, CAST(agree AS BIGINT) AS n_agree,
  CAST(floor(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS po_q6,
  CAST(floor(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n) * 1e6) AS BIGINT) AS pe_q6,
  CAST(floor((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) -
      CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n)) /
    (1 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n)) * 1e6) AS BIGINT)
    AS kappa_q6
FROM nn, pe""",

      // Simpson's-paradox slope check: per-segment vs pooled OLS slope
      // of line price on quantity; flip flagged on exact numerator signs.
      "agg_simpson_slope_flip" ->
        s"""WITH li AS (SELECT l_returnflag AS seg, CAST(l_quantity AS BIGINT) AS x,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM ${T("lineitem")}),
bs AS (SELECT seg, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM li GROUP BY 1),
p AS (SELECT count(*) AS pn, sum(x) AS psx, sum(y) AS psy,
    sum(CAST(x AS HUGEINT) * x) AS psxx, sum(CAST(x AS HUGEINT) * y) AS psxy
  FROM li)
SELECT seg, CAST(n AS BIGINT) AS n_lines,
  CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
    CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) * 1e6) AS BIGINT)
    AS slope_q6,
  CAST(floor(CAST(pn * psxy - CAST(psx AS HUGEINT) * psy AS DOUBLE) /
    CAST(pn * psxx - CAST(psx AS HUGEINT) * psx AS DOUBLE) * 1e6) AS BIGINT)
    AS pooled_slope_q6,
  (sign(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)) <>
    sign(CAST(pn * psxy - CAST(psx AS HUGEINT) * psy AS DOUBLE)))
    AS sign_flipped
FROM bs, p ORDER BY seg""",

      // Hill tail-index on the top-101 order values: quantized ln
      // terms of exact integer ratios, pure-integer alpha.
      "agg_tail_index_hill" ->
        s"""WITH top AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
    o_orderkey AS okey
  FROM ${T("orders")} ORDER BY v DESC, okey LIMIT 101),
r AS (SELECT v, row_number() OVER (ORDER BY v DESC, okey) AS rn FROM top),
xr AS (SELECT v AS x_ref FROM r WHERE rn = 101),
t AS (SELECT CAST(floor(ln(CAST(v AS DOUBLE) / CAST(x_ref AS DOUBLE)) * 1e6)
      AS BIGINT) AS lq, x_ref
  FROM r, xr WHERE rn <= 100)
SELECT CAST(count(*) AS BIGINT) AS k, CAST(x_ref AS BIGINT) AS x_ref_cents,
  CAST(sum(lq) AS BIGINT) AS sum_ln_q6,
  CAST((count(*) * 1000000000000) // sum(lq) AS BIGINT) AS alpha_q6
FROM t GROUP BY x_ref""",

      // MRR@10 on the shared 30-probe protocol: first-relevant rank is
      // an exact integer; rr_q6 = floor(1e6 / rank).
      "sim_mrr_at10" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
probes AS (SELECT vec_id pid, embedding pe, label plab FROM emb WHERE vec_id < 30),
corpus AS (SELECT * FROM emb WHERE vec_id >= 30),
scored AS (SELECT p.pid, e.vec_id cand,
    CAST(floor(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) q,
    CASE WHEN e.label = p.plab THEN 1 ELSE 0 END rel
  FROM probes p CROSS JOIN corpus e),
top AS (SELECT pid, rel, r FROM (SELECT pid, rel,
    row_number() OVER (PARTITION BY pid ORDER BY q DESC, cand) r FROM scored) t
  WHERE r <= 10),
fr AS (SELECT pid, min(r) r1 FROM top WHERE rel = 1 GROUP BY 1)
SELECT p.pid, CAST(coalesce(fr.r1, 0) AS BIGINT) AS first_rel_rank,
  CAST(coalesce(floor(1000000.0 / fr.r1), 0) AS BIGINT) AS rr_q6
FROM probes p LEFT JOIN fr ON fr.pid = p.pid ORDER BY p.pid""",

      // MAP@10, same protocol: precision terms 1e6*cumrel/i floored on
      // identical doubles; AP denominator min(n_rel, 10).
      "sim_map_at10" ->
        s"""WITH emb AS (SELECT * FROM ${T("embeddings")}),
probes AS (SELECT vec_id pid, embedding pe, label plab FROM emb WHERE vec_id < 30),
corpus AS (SELECT * FROM emb WHERE vec_id >= 30),
scored AS (SELECT p.pid, e.vec_id cand,
    CAST(floor(list_cosine_similarity(cast(p.pe AS DOUBLE[]), cast(e.embedding AS DOUBLE[]))*10000) AS BIGINT) q,
    CASE WHEN e.label = p.plab THEN 1 ELSE 0 END rel
  FROM probes p CROSS JOIN corpus e),
top AS (SELECT pid, rel, r,
    sum(rel) OVER (PARTITION BY pid ORDER BY r) cumrel
  FROM (SELECT pid, rel,
      row_number() OVER (PARTITION BY pid ORDER BY q DESC, cand) r FROM scored) t
  WHERE r <= 10),
ap AS (SELECT pid,
    sum(CAST(floor(CAST(1000000 * cumrel AS DOUBLE) / CAST(r AS DOUBLE)) AS BIGINT)) sum_prec_q6,
    count(*) rel_in_top10
  FROM top WHERE rel = 1 GROUP BY 1),
reltot AS (SELECT label, count(*) n_rel FROM corpus GROUP BY 1)
SELECT p.pid, CAST(least(rt.n_rel, 10) AS BIGINT) AS ap_denom,
  CAST(coalesce(a.rel_in_top10, 0) AS BIGINT) AS rel_in_top10,
  CAST(coalesce(floor(CAST(a.sum_prec_q6 AS DOUBLE) / least(rt.n_rel, 10)), 0) AS BIGINT) AS ap_q6
FROM probes p JOIN reltot rt ON rt.label = p.plab
LEFT JOIN ap a ON a.pid = p.pid ORDER BY p.pid""",

      // Interpolated Kneser-Ney bigram heldout NLL: d = 3/4 keeps every
      // probability an exact integer rational; identical -ln quantize.
      "pipeline_kneser_ney_nll" ->
        s"""WITH toks AS (SELECT doc_id, lang,
    (('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10 < 8) is_train,
    string_split(text, ' ') l
  FROM ${T("documents")}),
big AS (SELECT lang, is_train, l[i] w1, l[i+1] w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) i)),
c12 AS (SELECT w1, w2, count(*) c12 FROM big WHERE is_train GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12) c1, count(*) n1f FROM c12 GROUP BY 1),
nb AS (SELECT w2, count(*) n1b FROM c12 GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM c12) ntypes,
  (SELECT count(DISTINCT w) FROM (SELECT w1 w FROM big WHERE is_train
    UNION SELECT w2 FROM big WHERE is_train)) v),
test AS (SELECT b.lang, c12.c12, c1.c1, c1.n1f, nb.n1b,
    tot.ntypes + tot.v + 1 contden,
    coalesce(nb.n1b, 0) + 1 contnum
  FROM big b LEFT JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
  LEFT JOIN c1 ON c1.w1 = b.w1
  LEFT JOIN nb ON nb.w2 = b.w2
  CROSS JOIN tot WHERE NOT b.is_train),
q AS (SELECT lang, c1 IS NULL unseen,
    CAST(floor(-ln(
      CAST(CASE WHEN c1 IS NOT NULL
        THEN greatest(4 * coalesce(c12, 0) - 3, 0) * contden + 3 * n1f * contnum
        ELSE contnum END AS DOUBLE) /
      CAST(CASE WHEN c1 IS NOT NULL THEN 4 * c1 * contden
        ELSE contden END AS DOUBLE)) * 1e6) AS BIGINT) lq
  FROM test)
SELECT lang, CAST(count(*) AS BIGINT) AS n_test_bigrams,
  floor(CAST(sum(CASE WHEN unseen THEN 1 ELSE 0 END) AS DOUBLE)/count(*)*1e4)/1e4
    AS unseen_ctx_rate,
  floor(CAST(sum(lq) AS DOUBLE)/count(*)/1e2)/1e4 AS avg_nll
FROM q GROUP BY 1 ORDER BY 1""",

      // Greedy token-budget mixture: pure BIGINT fills over the
      // |sources|-bounded relation; budget = 40% of corpus tokens.
      "pipeline_token_budget_mix" ->
        s"""WITH src AS (SELECT source, count(*) n_docs,
    sum(len(string_split(text, ' '))) toks,
    count(DISTINCT md5(text)) uniq
  FROM ${T("documents")} GROUP BY 1),
s2 AS (SELECT source, n_docs, toks,
    ((n_docs - uniq) * 1000000) // n_docs dup_rate_q6 FROM src),
tot AS (SELECT (sum(toks) * 2) // 5 budget FROM s2),
rk AS (SELECT *, row_number() OVER (ORDER BY dup_rate_q6, source) quality_rank,
    coalesce(sum(toks) OVER (ORDER BY dup_rate_q6, source
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_before
  FROM s2 CROSS JOIN tot)
SELECT source, CAST(quality_rank AS BIGINT) AS quality_rank,
  CAST(dup_rate_q6 AS BIGINT) AS dup_rate_q6,
  CAST(toks AS BIGINT) AS n_tokens,
  CAST(greatest(least(budget - cum_before, toks), 0) AS BIGINT) AS take_tokens,
  CAST((greatest(least(budget - cum_before, toks), 0) * 1000000) // budget
    AS BIGINT) AS share_ppm
FROM rk ORDER BY quality_rank""",

      // Two-way ANOVA, proportional cell-means decomposition; S²/n
      // terms floored to integer dollars-sq per bounded group before the exact sum.
      "agg_anova_two_way" ->
        s"""WITH o AS (SELECT c.c_mktsegment seg, o.o_orderpriority prio,
    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) y
  FROM ${T("orders")} o JOIN ${T("customer")} c ON o.o_custkey = c.c_custkey),
cells AS (SELECT seg, prio, count(*) n, sum(CAST(y AS HUGEINT)) sc,
    sum(CAST(y AS HUGEINT) * y) ssq FROM o GROUP BY 1, 2),
bycell AS (SELECT count(*) kc, sum(n) nn, sum(sc) stot, sum(ssq) ssqtot,
    sum(CAST(floor((CAST(sc AS DOUBLE)/1e2) * (CAST(sc AS DOUBLE)/1e2) /
      CAST(n AS DOUBLE)) AS HUGEINT)) qcell
  FROM cells),
bya AS (SELECT count(*) ka, sum(CAST(floor((CAST(sa AS DOUBLE)/1e2) *
      (CAST(sa AS DOUBLE)/1e2) / CAST(na AS DOUBLE)) AS HUGEINT)) qa
  FROM (SELECT seg, sum(sc) sa, sum(n) na FROM cells GROUP BY 1)),
byb AS (SELECT count(*) kb, sum(CAST(floor((CAST(sb AS DOUBLE)/1e2) *
      (CAST(sb AS DOUBLE)/1e2) / CAST(nb AS DOUBLE)) AS HUGEINT)) qb
  FROM (SELECT prio, sum(sc) sb, sum(n) nb FROM cells GROUP BY 1)),
f AS (SELECT nn, ka, kb, kc,
    (CAST(stot AS DOUBLE)/1e2) * (CAST(stot AS DOUBLE)/1e2) /
      CAST(nn AS DOUBLE) grand,
    CAST(qcell AS DOUBLE) qc, CAST(qa AS DOUBLE) qad,
    CAST(qb AS DOUBLE) qbd, CAST(ssqtot AS DOUBLE)/1e4 sst0
  FROM bycell, bya, byb),
g AS (SELECT nn, ka, kb, kc,
    qc - grand sscells, qad - grand ssa, qbd - grand ssb,
    (qc - grand) - (qad - grand) - (qbd - grand) ssab,
    (sst0 - grand) - (qc - grand) ssw,
    CAST(ka AS DOUBLE) - 1 dfa, CAST(kb AS DOUBLE) - 1 dfb,
    (CAST(ka AS DOUBLE) - 1) * (CAST(kb AS DOUBLE) - 1) dfab,
    CAST(nn AS DOUBLE) - CAST(kc AS DOUBLE) dfw
  FROM f)
SELECT CAST(nn AS BIGINT) AS n, CAST(ka AS BIGINT) AS k_seg,
  CAST(kb AS BIGINT) AS k_prio, CAST(kc AS BIGINT) AS k_cells,
  CAST(floor(ssa) AS BIGINT) AS ss_seg, CAST(floor(ssb) AS BIGINT) AS ss_prio,
  CAST(floor(ssab) AS BIGINT) AS ss_inter,
  CAST(floor(ssw) AS BIGINT) AS ss_within,
  CAST(floor(ssa / dfa / (ssw / dfw) * 1e6) AS BIGINT) AS f_seg_q6,
  CAST(floor(ssb / dfb / (ssw / dfw) * 1e6) AS BIGINT) AS f_prio_q6,
  CAST(floor(ssab / dfab / (ssw / dfw) * 1e6) AS BIGINT) AS f_inter_q6
FROM g""",

      // Lead-lag cross-correlation: day sums exact, cross/square sums
      // HUGEINT, one double tree per lag floored at 1e6.
      "ts_xcorr_lags" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) rev,
    count(*) cnt
  FROM ${T("orders")} GROUP BY 1),
lags AS (SELECT unnest(generate_series(-7, 7)) lag),
st AS (SELECT l.lag, count(*) n, sum(a.rev) sx, sum(b.cnt) sy,
    sum(CAST(a.rev AS HUGEINT) * b.cnt) sxy,
    sum(CAST(a.rev AS HUGEINT) * a.rev) sxx,
    sum(CAST(b.cnt AS HUGEINT) * b.cnt) syy
  FROM lags l CROSS JOIN daily a
  JOIN daily b ON b.dt = a.dt + to_days(CAST(l.lag AS INTEGER))
  GROUP BY 1)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
  CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * 1e6) AS BIGINT) AS r_q6
FROM st ORDER BY lag""",

      // Epoch-folding periodogram: integer phase assignment, the anova
      // recipe per period — no trig on the cross-engine path.
      "ts_dominant_period" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt, count(*) x
  FROM ${T("orders")} GROUP BY 1),
base AS (SELECT min(dt) d0, count(*) dd, sum(x) t,
    sum(CAST(x AS HUGEINT) * x) sxx FROM daily),
folded AS (SELECT p.p, b.dd, b.t, b.sxx,
    (dt - b.d0) % p.p ph, x
  FROM daily, base b, (SELECT unnest(generate_series(2, 30)) p) p),
byphase AS (SELECT p, dd, t, sxx, ph, count(*) nph, sum(x) sph
  FROM folded GROUP BY 1, 2, 3, 4, 5),
byp AS (SELECT p, dd, t, sxx, count(*) nphases,
    sum(CAST(floor(CAST(sph AS DOUBLE) * CAST(sph AS DOUBLE) /
      CAST(nph AS DOUBLE) * 1e6) AS BIGINT)) qb
  FROM byphase GROUP BY 1, 2, 3, 4),
fin AS (SELECT p, nphases,
    CAST(qb AS DOUBLE)/1e6 -
      CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(dd AS DOUBLE) ssb,
    CAST(sxx AS DOUBLE) -
      CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(dd AS DOUBLE) sst
  FROM byp)
SELECT CAST(p AS BIGINT) AS period, CAST(nphases AS BIGINT) AS n_phases,
  CAST(floor(ssb) AS BIGINT) AS ss_between_floor,
  CAST(floor(ssb / sst * 1e6) AS BIGINT) AS var_explained_q6
FROM fin ORDER BY period""",

      // Kadane via prefix extrema: (P, date) struct min/max carries the
      // earliest-start tie rule; virtual P0=0 sentinel competes.
      "ts_hot_streak_kadane" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) y
  FROM ${T("orders")} GROUP BY 1),
tot AS (SELECT count(*) dd, sum(CAST(y AS HUGEINT)) t, min(dt) d0 FROM daily),
px AS (SELECT dt, dd, d0,
    sum(CAST(y AS HUGEINT) * dd - t) OVER (ORDER BY dt) pf
  FROM daily, tot),
px2 AS (SELECT dt, dd, d0, pf,
    min({'p': pf, 'sd': dt}) OVER (ORDER BY dt
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) minb,
    max({'p': pf, 'sd': dt}) OVER (ORDER BY dt
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) maxb
  FROM px),
rows_ AS (SELECT dt, dd,
    pf - (CASE WHEN minb IS NULL OR minb.p >= 0 THEN 0 ELSE minb.p END) gain,
    CASE WHEN minb IS NULL OR minb.p >= 0 THEN d0 - 1 ELSE minb.sd END gstart0,
    pf - (CASE WHEN maxb IS NULL OR maxb.p <= 0 THEN 0 ELSE maxb.p END) loss,
    CASE WHEN maxb IS NULL OR maxb.p <= 0 THEN d0 - 1 ELSE maxb.sd END lstart0
  FROM px2),
bg AS (SELECT max(gain) bg, min(loss) wl, max(dd) dd FROM rows_),
best AS (SELECT bg.bg, bg.dd, min({'e': r.dt, 'st': r.gstart0}) b
  FROM rows_ r, bg WHERE r.gain = bg.bg GROUP BY 1, 2),
worst AS (SELECT bg.wl, min({'e': r.dt, 'st': r.lstart0}) w
  FROM rows_ r, bg WHERE r.loss = bg.wl GROUP BY 1)
SELECT CAST(best.dd AS BIGINT) AS n_days,
  best.b.st + 1 AS best_start, best.b.e AS best_end,
  CAST(floor(CAST(best.bg AS DOUBLE) / CAST(best.dd AS DOUBLE)) AS BIGINT)
    AS best_excess_cents,
  worst.w.st + 1 AS worst_start, worst.w.e AS worst_end,
  CAST(floor(CAST(worst.wl AS DOUBLE) / CAST(best.dd AS DOUBLE)) AS BIGINT)
    AS worst_excess_cents
FROM best, worst""",

      // PPS systematic: shifted-positive BIGINT interval counts; HT
      // estimate n_pts * skip per segment.
      "sample_pps_systematic" ->
        s"""WITH cust AS (SELECT o.o_custkey ck, c.c_mktsegment seg,
    sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) rev
  FROM ${T("orders")} o JOIN ${T("customer")} c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
run AS (SELECT ck, seg, rev, sum(rev) OVER (ORDER BY ck) hi FROM cust),
tot AS (SELECT max(hi) t, max(hi) // 100 skp,
    (max(hi) // 100) // 2 strt FROM run),
pts AS (SELECT seg, rev, skp,
    (hi - strt + skp) // skp - (hi - rev - strt + skp) // skp npts
  FROM run, tot)
SELECT seg, CAST(count(*) AS BIGINT) AS n_cust,
  CAST(sum(rev) AS BIGINT) AS true_cents,
  CAST(sum(npts) AS BIGINT) AS n_points,
  CAST(sum(npts * skp) AS BIGINT) AS ht_est_cents,
  CAST(floor((CAST(sum(npts * skp) AS DOUBLE) - CAST(sum(rev) AS DOUBLE)) /
    CAST(sum(rev) AS DOUBLE) * 1e4) AS BIGINT) AS err_bp
FROM pts GROUP BY 1 ORDER BY 1""",

      // Quantile treatment effects: type-1 per-arm deciles at rank
      // (q*n+9) div 10, exact integers end to end.
      "agg_quantile_treatment_effect" ->
        s"""WITH arms AS (SELECT
    ('0x' || substr(md5(cast(o_orderkey AS VARCHAR)), 1, 4))::BIGINT % 2 arm,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) y,
    o_orderkey okey
  FROM ${T("orders")}),
r AS (SELECT arm, y,
    row_number() OVER (PARTITION BY arm ORDER BY y, okey) prank FROM arms),
sizes AS (SELECT arm, count(*) na FROM arms GROUP BY 1),
targets AS (SELECT s.arm t_arm, q.q, (q.q * s.na + 9) // 10 trank
  FROM sizes s, (SELECT unnest(generate_series(1, 9)) q) q),
picked AS (SELECT t.q, r.arm, r.y FROM r
  JOIN targets t ON r.arm = t.t_arm AND r.prank = t.trank)
SELECT CAST(q AS BIGINT) AS decile,
  CAST(max(CASE WHEN arm = 0 THEN y END) AS BIGINT) AS ctrl_cents,
  CAST(max(CASE WHEN arm = 1 THEN y END) AS BIGINT) AS treat_cents,
  CAST(max(CASE WHEN arm = 1 THEN y END) -
    max(CASE WHEN arm = 0 THEN y END) AS BIGINT) AS qte_cents
FROM picked GROUP BY 1 ORDER BY 1""",

      // Two exact HITS iterations on the distinct customer-supplier
      // purchase graph; top-20 authorities.
      "graph_hits_bipartite" ->
        s"""WITH edges AS (SELECT DISTINCT o.o_custkey c, l.l_suppkey sup
  FROM ${T("lineitem")} l JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey),
a1 AS (SELECT sup, count(*) a1 FROM edges GROUP BY 1),
h1 AS (SELECT e.c, sum(a1.a1) h1 FROM edges e JOIN a1 ON a1.sup = e.sup
  GROUP BY 1),
a2 AS (SELECT e.sup, sum(h1.h1) a2 FROM edges e JOIN h1 ON h1.c = e.c
  GROUP BY 1)
SELECT a1.sup AS supplier, CAST(a1.a1 AS BIGINT) AS authority1,
  CAST(a2.a2 AS BIGINT) AS authority2
FROM a1 JOIN a2 ON a1.sup = a2.sup
ORDER BY a2.a2 DESC, a1.sup LIMIT 20""",

      // Text-sink/source roundtrip: the oracle fingerprints the
      // ORIGINAL parquet; the Spark side reads through TSV lines.
      "src_text_roundtrip" ->
        s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS chars,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
  CAST(min(doc_id) AS BIGINT) AS lo_id,
  CAST(max(doc_id) AS BIGINT) AS hi_id
FROM ${T("documents")} GROUP BY 1 ORDER BY source""",

      // Two-sample log-rank: integer risk tables on the bounded gap
      // grid; E/V terms floored at 1e6/1e8 per event time.
      "ts_logrank_segments" ->
        s"""WITH ft AS (SELECT o.o_custkey ck, c.c_mktsegment seg,
    CAST(o.o_orderdate AS DATE) odt,
    row_number() OVER (PARTITION BY o.o_custkey ORDER BY
      CAST(o.o_orderdate AS DATE)) rn
  FROM ${T("orders")} o JOIN ${T("customer")} c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
endd AS (SELECT max(CAST(o_orderdate AS DATE)) e FROM ${T("orders")}),
subj AS (SELECT seg,
    CASE WHEN sec IS NOT NULL THEN sec - f ELSE (SELECT e FROM endd) - f END t,
    CASE WHEN sec IS NOT NULL THEN 1 ELSE 0 END ev
  FROM (SELECT ck, seg, min(odt) f,
      max(CASE WHEN rn = 2 THEN odt END) sec
    FROM ft WHERE rn <= 2 GROUP BY 1, 2)),
full_ AS (SELECT t,
    sum(CASE WHEN seg = 'BUILDING' THEN ev ELSE 0 END) ev1,
    sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) arr1,
    sum(CASE WHEN seg = 'MACHINERY' THEN ev ELSE 0 END) ev2,
    sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) arr2
  FROM subj GROUP BY 1),
risk AS (SELECT *,
    sum(arr1) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) n1,
    sum(arr2) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) n2
  FROM full_),
ev AS (SELECT * FROM risk WHERE ev1 + ev2 > 0),
terms AS (SELECT ev1, ev2, n1, n2,
    CAST(floor(CAST(n1 AS DOUBLE) * CAST(ev1 + ev2 AS DOUBLE) /
      CAST(n1 + n2 AS DOUBLE) * 1e6) AS BIGINT) eterm,
    CASE WHEN n1 + n2 > 1 THEN CAST(floor(CAST(n1 AS DOUBLE) *
      CAST(n2 AS DOUBLE) * CAST(ev1 + ev2 AS DOUBLE) *
      CAST(n1 + n2 - ev1 - ev2 AS DOUBLE) /
      (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE) *
        CAST(n1 + n2 - 1 AS DOUBLE)) * 1e8) AS BIGINT)
    ELSE 0 END vterm
  FROM ev),
agg AS (SELECT sum(ev1) o1, sum(ev2) o2, sum(eterm) e1q6, sum(vterm) vq8,
    max(n1) ns1, max(n2) ns2 FROM terms)
SELECT CAST(ns1 AS BIGINT) AS n_building, CAST(ns2 AS BIGINT) AS n_machinery,
  CAST(o1 AS BIGINT) AS events_building, CAST(o2 AS BIGINT) AS events_machinery,
  CAST(e1q6 AS BIGINT) AS e1_q6, CAST(vq8 AS BIGINT) AS v_q8,
  CAST(floor((CAST(o1 AS DOUBLE) - CAST(e1q6 AS DOUBLE)/1e6) *
    (CAST(o1 AS DOUBLE) - CAST(e1q6 AS DOUBLE)/1e6) /
    (CAST(vq8 AS DOUBLE)/1e8) * 1e4) AS BIGINT) AS chi2_q4
FROM agg""",

      // ICC(1) with the unbalanced k0 correction; S²/n terms floored
      // to integer dollars² per customer (the two-way-anova recipe).
      "agg_icc_intraclass" ->
        s"""WITH perc AS (SELECT o_custkey, count(*) ni,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) si,
    sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      AS HUGEINT) *
      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) ssqi
  FROM ${T("orders")} GROUP BY 1),
t AS (SELECT count(*) k, sum(ni) n, sum(si) st, sum(ssqi) ssqt,
    sum(CAST(floor((CAST(si AS DOUBLE)/1e2) * (CAST(si AS DOUBLE)/1e2) /
      CAST(ni AS DOUBLE)) AS HUGEINT)) qb,
    sum(CAST(ni AS HUGEINT) * ni) sn2
  FROM perc),
f AS (SELECT n, k,
    (CAST(qb AS DOUBLE) - (CAST(st AS DOUBLE)/1e2) * (CAST(st AS DOUBLE)/1e2)
      / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1) msb,
    (CAST(ssqt AS DOUBLE)/1e4 - CAST(qb AS DOUBLE)) /
      (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) msw,
    (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE)/CAST(n AS DOUBLE)) /
      (CAST(k AS DOUBLE) - 1) k0
  FROM t)
SELECT CAST(n AS BIGINT) AS n_orders, CAST(k AS BIGINT) AS k_customers,
  CAST(floor(msb) AS BIGINT) AS msb_floor,
  CAST(floor(msw) AS BIGINT) AS msw_floor,
  CAST(floor(k0 * 1e6) AS BIGINT) AS k0_q6,
  CAST(floor((msb - msw) / (msb + (k0 - 1) * msw) * 1e6) AS BIGINT) AS icc_q6
FROM f""",

      // Partial correlation from exact HUGEINT moment sums; one fixed
      // double tree, each r floored at 1e6.
      "agg_partial_corr" ->
        s"""WITH li AS (SELECT CAST(l_quantity AS BIGINT) x,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) y,
    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) z
  FROM ${T("lineitem")}),
t AS (SELECT count(*) n, sum(x) sx, sum(y) sy, sum(z) sz,
    sum(CAST(x AS HUGEINT) * x) sxx, sum(CAST(y AS HUGEINT) * y) syy,
    sum(CAST(z AS HUGEINT) * z) szz, sum(CAST(x AS HUGEINT) * y) sxy,
    sum(CAST(x AS HUGEINT) * z) sxz, sum(CAST(y AS HUGEINT) * z) syz
  FROM li),
r AS (SELECT n,
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) rxy,
    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)) /
      sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) rxz,
    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE)) /
      sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) *
        (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) ryz
  FROM t)
SELECT CAST(n AS BIGINT) AS n,
  CAST(floor(rxy * 1e6) AS BIGINT) AS r_xy_q6,
  CAST(floor(rxz * 1e6) AS BIGINT) AS r_xz_q6,
  CAST(floor(ryz * 1e6) AS BIGINT) AS r_yz_q6,
  CAST(floor((rxy - rxz * ryz) / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) * 1e6)
    AS BIGINT) AS partial_r_q6
FROM r""",

      // Burrows' Delta: ppm freqs, integer panel moments, z floored
      // 1e4 (zero-variance words contribute 0), Delta = sum div 20.
      "text_burrows_delta" ->
        s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) w
  FROM ${T("documents")}),
top AS (SELECT w tw FROM (SELECT w, count(*) cnt FROM toks GROUP BY 1
  ORDER BY cnt DESC, w LIMIT 20)),
srctot AS (SELECT source, count(*) tot FROM toks GROUP BY 1),
csw AS (SELECT source, w, count(*) c FROM toks JOIN top ON w = tw
  GROUP BY 1, 2),
grid AS (SELECT st.source src, top.tw,
    (coalesce(csw.c, 0) * 1000000) // st.tot fq
  FROM srctot st CROSS JOIN top
  LEFT JOIN csw ON csw.w = top.tw AND csw.source = st.source),
stats AS (SELECT tw, count(*) ns, sum(fq) sf,
    sum(CAST(fq AS HUGEINT) * fq) sff FROM grid GROUP BY 1),
zed AS (SELECT g.src, g.tw,
    CASE WHEN s.ns * s.sff - CAST(s.sf AS HUGEINT) * s.sf > 0 THEN
      CAST(floor((CAST(g.fq AS DOUBLE) - CAST(s.sf AS DOUBLE)/CAST(s.ns AS DOUBLE)) /
        sqrt(CAST(s.ns * s.sff - CAST(s.sf AS HUGEINT) * s.sf AS DOUBLE) /
          (CAST(s.ns AS DOUBLE) * (CAST(s.ns AS DOUBLE) - 1))) * 1e4) AS BIGINT)
    ELSE 0 END zq
  FROM grid g JOIN stats s ON s.tw = g.tw),
pairs AS (SELECT a.src s1, b.src s2, sum(abs(a.zq - b.zq)) sad, count(*) nw
  FROM zed a JOIN zed b ON a.tw = b.tw AND a.src < b.src GROUP BY 1, 2)
SELECT s1, s2, CAST(sad // nw AS BIGINT) AS delta_q4
FROM pairs ORDER BY delta_q4, s1, s2 LIMIT 10""",

      // Local bridges: per-edge common-neighbor counts over the shared
      // EDGES CTEs; top-10 by weight with the global census attached.
      "graph_local_bridges" ->
        s"""$E
, cn AS (SELECT e.s es, e.t et, count(*) tri
  FROM e JOIN ud u1 ON u1.s = e.s JOIN ud u2 ON u2.s = e.t AND u2.t = u1.t
  GROUP BY 1, 2),
deg AS (SELECT s dv, count(*) deg FROM ud GROUP BY 1),
flagged AS (SELECT e.s, e.t, e.w, coalesce(cn.tri, 0) tri
  FROM e LEFT JOIN cn ON cn.es = e.s AND cn.et = e.t),
census AS (SELECT count(*) n_edges,
    sum(CASE WHEN tri = 0 THEN 1 ELSE 0 END) n_bridges FROM flagged)
SELECT CAST(f.s AS BIGINT) AS s, CAST(f.t AS BIGINT) AS t,
  CAST(f.w AS BIGINT) AS w, CAST(d1.deg AS BIGINT) AS deg_s,
  CAST(d2.deg AS BIGINT) AS deg_t,
  CAST(c.n_edges AS BIGINT) AS n_edges_total,
  CAST(c.n_bridges AS BIGINT) AS n_bridges_total
FROM flagged f JOIN deg d1 ON d1.dv = f.s JOIN deg d2 ON d2.dv = f.t
CROSS JOIN census c
WHERE f.tri = 0 ORDER BY f.w DESC, f.s, f.t LIMIT 10""",

      // Threshold sweep over the LSH-verified pair relation (the
      // minhash CTE chain); zero-pair cuts still report via left join.
      "dedup_threshold_sweep" ->
        s"""WITH ${minhashCtes(dir)},
pairs AS (SELECT d1, d2,
    CAST(round(round(cast(i AS DOUBLE) / (s1.sz + s2.sz - i), 4) * 10000, 0)
      AS BIGINT) jq
  FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
  WHERE cast(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5),
thr AS (SELECT unnest(generate_series(50, 95, 5)) thr_pct),
hit AS (SELECT t.thr_pct, p.d1, p.d2 FROM thr t JOIN pairs p
  ON p.jq >= t.thr_pct * 100),
byp AS (SELECT thr_pct, count(*) n_pairs FROM hit GROUP BY 1),
byd AS (SELECT thr_pct, count(*) n_docs FROM (
    SELECT DISTINCT thr_pct, dd FROM (
      SELECT thr_pct, d1 dd FROM hit UNION ALL SELECT thr_pct, d2 FROM hit))
  GROUP BY 1)
SELECT CAST(t.thr_pct AS BIGINT) AS thr_pct,
  CAST(coalesce(byp.n_pairs, 0) AS BIGINT) AS n_pairs,
  CAST(coalesce(byd.n_docs, 0) AS BIGINT) AS n_docs
FROM thr t LEFT JOIN byp ON byp.thr_pct = t.thr_pct
LEFT JOIN byd ON byd.thr_pct = t.thr_pct ORDER BY t.thr_pct""",

      // Hurst R/S: W' = n·P_k − k·S exact, R/S = R'/sqrt(n·Σy²−S²),
      // per-block floor 1e6, per-size integer-div means, ln-OLS.
      "ts_hurst_exponent" ->
        s"""WITH daily AS (SELECT dt, y, row_number() OVER (ORDER BY dt) t
  FROM (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) y
  FROM ${T("orders")} GROUP BY 1)),
sizes AS (SELECT unnest([16, 32, 64, 128, 256]) bn),
blocks AS (SELECT bn, (t - 1) // bn blk, (t - 1) % bn + 1 k, y
  FROM daily, sizes),
withp AS (SELECT bn, blk, k, y,
    sum(CAST(y AS HUGEINT)) OVER (PARTITION BY bn, blk ORDER BY k) pk
  FROM blocks),
btot AS (SELECT bn b2, blk k2, sum(CAST(y AS HUGEINT)) stot,
    sum(CAST(y AS HUGEINT) * y) ssq, count(*) m2
  FROM blocks GROUP BY 1, 2),
wdev AS (SELECT w.bn, w.blk, b.stot, b.ssq,
    CAST(w.bn AS HUGEINT) * w.pk - CAST(w.k AS HUGEINT) * b.stot wk
  FROM withp w JOIN btot b ON b.b2 = w.bn AND b.k2 = w.blk
  WHERE b.m2 = w.bn),
perblock AS (SELECT bn, blk, stot, ssq, max(wk) wmax, min(wk) wmin
  FROM wdev GROUP BY 1, 2, 3, 4),
rsq AS (SELECT bn, CAST(floor(CAST(wmax - wmin AS DOUBLE) /
    sqrt(CAST(CAST(bn AS HUGEINT) * ssq - stot * stot AS DOUBLE)) * 1e6)
    AS BIGINT) rq
  FROM perblock),
bysize AS (SELECT bn, count(*) nblocks, sum(rq) // count(*) mean_rs_q6
  FROM rsq GROUP BY 1),
xy AS (SELECT CAST(floor(ln(CAST(bn AS DOUBLE)) * 1e6) AS BIGINT) lx,
    CAST(floor(ln(CAST(mean_rs_q6 AS DOUBLE) / 1e6) * 1e6) AS BIGINT) ly
  FROM bysize),
ols AS (SELECT count(*) np, sum(lx) sx, sum(ly) sy,
    sum(CAST(lx AS HUGEINT) * lx) sxx, sum(CAST(lx AS HUGEINT) * ly) sxy
  FROM xy),
h AS (SELECT CAST(floor((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) -
      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
    (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) -
      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6) AS BIGINT) hurst_q6
  FROM ols)
SELECT CAST(bn AS BIGINT) AS block_n, CAST(nblocks AS BIGINT) AS n_blocks,
  CAST(mean_rs_q6 AS BIGINT) AS mean_rs_q6, h.hurst_q6
FROM bysize, h ORDER BY block_n""",

      // Chow break at the calendar midpoint: per-segment OLS SSR from
      // exact moments, F one double tree.
      "ts_chow_break" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) y
  FROM ${T("orders")} GROUP BY 1),
bounds AS (SELECT min(dt) d0,
    min(dt) + CAST((max(dt) - min(dt)) // 2 AS INTEGER) mid
  FROM daily),
pts AS (SELECT (dt - d0 + 1) x, y, dt < mid pre FROM daily, bounds),
mo AS (SELECT count(*) n, sum(CAST(x AS HUGEINT)) sx,
    sum(CAST(y AS HUGEINT)) sy, sum(CAST(x AS HUGEINT) * x) sxx,
    sum(CAST(x AS HUGEINT) * y) sxy, sum(CAST(y AS HUGEINT) * y) syy
  FROM pts),
ma AS (SELECT count(*) n, sum(CAST(x AS HUGEINT)) sx,
    sum(CAST(y AS HUGEINT)) sy, sum(CAST(x AS HUGEINT) * x) sxx,
    sum(CAST(x AS HUGEINT) * y) sxy, sum(CAST(y AS HUGEINT) * y) syy
  FROM pts WHERE pre),
mb AS (SELECT count(*) n, sum(CAST(x AS HUGEINT)) sx,
    sum(CAST(y AS HUGEINT)) sy, sum(CAST(x AS HUGEINT) * x) sxx,
    sum(CAST(x AS HUGEINT) * y) sxy, sum(CAST(y AS HUGEINT) * y) syy
  FROM pts WHERE NOT pre),
f AS (SELECT ma.n an, mb.n bn_, mo.n pn,
    ((CAST(mo.n AS DOUBLE) * CAST(mo.syy AS DOUBLE) - CAST(mo.sy AS DOUBLE) * CAST(mo.sy AS DOUBLE)) -
     (CAST(mo.n AS DOUBLE) * CAST(mo.sxy AS DOUBLE) - CAST(mo.sx AS DOUBLE) * CAST(mo.sy AS DOUBLE)) *
     (CAST(mo.n AS DOUBLE) * CAST(mo.sxy AS DOUBLE) - CAST(mo.sx AS DOUBLE) * CAST(mo.sy AS DOUBLE)) /
     (CAST(mo.n AS DOUBLE) * CAST(mo.sxx AS DOUBLE) - CAST(mo.sx AS DOUBLE) * CAST(mo.sx AS DOUBLE)))
      / CAST(mo.n AS DOUBLE) / 1e4 * CAST(mo.n AS DOUBLE) ssrp,
    ((CAST(ma.n AS DOUBLE) * CAST(ma.syy AS DOUBLE) - CAST(ma.sy AS DOUBLE) * CAST(ma.sy AS DOUBLE)) -
     (CAST(ma.n AS DOUBLE) * CAST(ma.sxy AS DOUBLE) - CAST(ma.sx AS DOUBLE) * CAST(ma.sy AS DOUBLE)) *
     (CAST(ma.n AS DOUBLE) * CAST(ma.sxy AS DOUBLE) - CAST(ma.sx AS DOUBLE) * CAST(ma.sy AS DOUBLE)) /
     (CAST(ma.n AS DOUBLE) * CAST(ma.sxx AS DOUBLE) - CAST(ma.sx AS DOUBLE) * CAST(ma.sx AS DOUBLE)))
      / CAST(ma.n AS DOUBLE) / 1e4 * CAST(ma.n AS DOUBLE) ssra,
    ((CAST(mb.n AS DOUBLE) * CAST(mb.syy AS DOUBLE) - CAST(mb.sy AS DOUBLE) * CAST(mb.sy AS DOUBLE)) -
     (CAST(mb.n AS DOUBLE) * CAST(mb.sxy AS DOUBLE) - CAST(mb.sx AS DOUBLE) * CAST(mb.sy AS DOUBLE)) *
     (CAST(mb.n AS DOUBLE) * CAST(mb.sxy AS DOUBLE) - CAST(mb.sx AS DOUBLE) * CAST(mb.sy AS DOUBLE)) /
     (CAST(mb.n AS DOUBLE) * CAST(mb.sxx AS DOUBLE) - CAST(mb.sx AS DOUBLE) * CAST(mb.sx AS DOUBLE)))
      / CAST(mb.n AS DOUBLE) / 1e4 * CAST(mb.n AS DOUBLE) ssrb
  FROM mo, ma, mb)
SELECT CAST(an AS BIGINT) AS n_pre, CAST(bn_ AS BIGINT) AS n_post,
  CAST(floor(ssrp / 1e6) AS BIGINT) AS ssr_pooled_m,
  CAST(floor(ssra / 1e6) AS BIGINT) AS ssr_pre_m,
  CAST(floor(ssrb / 1e6) AS BIGINT) AS ssr_post_m,
  CAST(floor(((ssrp - ssra - ssrb) / 2) /
    ((ssra + ssrb) / (CAST(pn AS DOUBLE) - 4)) * 1e6) AS BIGINT) AS f_q6
FROM f""",

      // Newey-West Bartlett L=7: demeaned products scaled by D² exact,
      // per-lag gamma floored to integer dollars², one double tree.
      "ts_newey_west" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) y
  FROM ${T("orders")} GROUP BY 1),
tot AS (SELECT count(*) dd, sum(CAST(y AS HUGEINT)) t FROM daily),
lags AS (SELECT unnest(generate_series(0, 7)) lag),
gam AS (SELECT l.lag, tot.dd,
    CAST(floor(CAST(sum((CAST(a.y AS HUGEINT) * tot.dd - tot.t) *
        (CAST(b.y AS HUGEINT) * tot.dd - tot.t)) AS DOUBLE) /
      (CAST(tot.dd AS DOUBLE) * CAST(tot.dd AS DOUBLE) *
        CAST(tot.dd AS DOUBLE)) / 1e4) AS BIGINT) gamma_d2
  FROM lags l CROSS JOIN daily a
  JOIN daily b ON b.dt = a.dt + to_days(CAST(l.lag AS INTEGER))
  CROSS JOIN tot GROUP BY 1, 2),
lrv AS (SELECT dd, sum(CASE WHEN lag = 0 THEN CAST(gamma_d2 AS DOUBLE)
    ELSE 2 * (8 - lag) / 8.0 * CAST(gamma_d2 AS DOUBLE) END) lrv
  FROM gam GROUP BY 1)
SELECT CAST(g.lag AS BIGINT) AS lag,
  CAST(1000000 * (8 - g.lag) // 8 AS BIGINT) AS weight_ppm,
  CAST(g.gamma_d2 AS BIGINT) AS gamma_d2,
  CAST(floor(l.lrv) AS BIGINT) AS lrv_d2_floor,
  CAST(floor(sqrt(l.lrv / CAST(l.dd AS DOUBLE)) * 1e2) AS BIGINT)
    AS se_dollars_q2
FROM gam g, lrv l ORDER BY g.lag""",

      // Leaderboard churn: month-keyed integer top-10 sets, exact
      // overlap counts between consecutive months.
      "win_leaderboard_churn" ->
        s"""WITH monthly AS (SELECT date_trunc('month', CAST(l_shipdate AS DATE)) mo,
    l_suppkey,
    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) rev
  FROM ${T("lineitem")} GROUP BY 1, 2),
top AS (SELECT mo, l_suppkey FROM (SELECT mo, l_suppkey,
    row_number() OVER (PARTITION BY mo ORDER BY rev DESC, l_suppkey) rk
  FROM monthly) WHERE rk <= 10),
kper AS (SELECT mo, count(*) k FROM top GROUP BY 1),
ov AS (SELECT b.mo, count(*) overlap FROM top a JOIN top b
  ON b.mo = a.mo + INTERVAL 1 MONTH AND a.l_suppkey = b.l_suppkey
  GROUP BY 1)
SELECT CAST(c.mo AS DATE) AS month, CAST(p.k AS BIGINT) AS k_prev,
  CAST(c.k AS BIGINT) AS k_cur,
  CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap,
  CAST(c.k - coalesce(ov.overlap, 0) AS BIGINT) AS churn
FROM kper c JOIN kper p ON p.mo = c.mo - INTERVAL 1 MONTH
LEFT JOIN ov ON ov.mo = c.mo ORDER BY month""",

      // Cronbach's alpha over the three integer quality items; exact
      // HUGEINT moments, one double tree.
      "pipeline_cronbach_alpha" ->
        s"""WITH rows_ AS (SELECT len(toks) a,
    len(list_filter(toks, w -> w IN ('the','a','table','value','query'))) b,
    len(list_distinct(toks)) c
  FROM (SELECT string_split(text, ' ') toks FROM ${T("documents")})),
t AS (SELECT count(*) n,
    sum(CAST(a AS HUGEINT)) sa, sum(CAST(a AS HUGEINT) * a) saa,
    sum(CAST(b AS HUGEINT)) sb, sum(CAST(b AS HUGEINT) * b) sbb,
    sum(CAST(c AS HUGEINT)) sc, sum(CAST(c AS HUGEINT) * c) scc,
    sum(CAST(a + b + c AS HUGEINT)) st,
    sum(CAST(a + b + c AS HUGEINT) * (a + b + c)) stt
  FROM rows_),
v AS (SELECT n,
    (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) va,
    (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) vb,
    (CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) vc,
    (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) vt
  FROM t)
SELECT CAST(n AS BIGINT) AS n_docs,
  CAST(floor(va * 1e2) AS BIGINT) AS var_tokens_q2,
  CAST(floor(vb * 1e2) AS BIGINT) AS var_stopwords_q2,
  CAST(floor(vc * 1e2) AS BIGINT) AS var_distinct_q2,
  CAST(floor(vt * 1e2) AS BIGINT) AS var_total_q2,
  CAST(floor(1.5 * (1 - (va + vb + vc) / vt) * 1e6) AS BIGINT) AS alpha_q6
FROM v""",

      // Gzip text roundtrip: the oracle fingerprints the original
      // parquet per lang.
      "src_gzip_roundtrip" ->
        s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS chars,
  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
FROM ${T("documents")} GROUP BY 1 ORDER BY lang""",

      // 1-D Wasserstein: scaled by n1*n2 every ECDF step is exact
      // HUGEINT; one division at the end, floored 1e4.
      "agg_wasserstein_1d" ->
        s"""WITH g AS (SELECT value AS v,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM ${T("events")}
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1),
c AS (SELECT CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT) vc,
  CAST(sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
  CAST(sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
  FROM g),
t AS (SELECT max(cum1) n1, max(cum2) n2, count(*) npts FROM c),
steps AS (SELECT cum1, cum2, lead(vc) OVER (ORDER BY vc) - vc dv FROM c)
SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
  CAST(t.npts AS BIGINT) AS n_points,
  CAST(floor(CAST(sum(abs(CAST(s.cum1 AS HUGEINT) * t.n2 -
        CAST(s.cum2 AS HUGEINT) * t.n1)
      * s.dv) AS DOUBLE) /
    (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)) * 1e4) AS BIGINT)
    AS w1_cents_q4
FROM steps s, t WHERE s.dv IS NOT NULL GROUP BY t.n1, t.n2, t.npts""",

      // Bivariate Mahalanobis: exact HUGEINT moments, closed-form 2x2
      // inverse, per-row double tree floored 1e6, top-20.
      "agg_mahalanobis_outliers" ->
        s"""WITH li AS (SELECT l_orderkey, l_linenumber,
    CAST(l_quantity AS BIGINT) x,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) y
  FROM ${T("lineitem")}),
m AS (SELECT count(*) n, sum(CAST(x AS HUGEINT)) sx, sum(CAST(y AS HUGEINT)) sy,
    sum(CAST(x AS HUGEINT) * x) sxx, sum(CAST(y AS HUGEINT) * y) syy,
    sum(CAST(x AS HUGEINT) * y) sxy FROM li),
p AS (SELECT CAST(sx AS DOUBLE)/CAST(n AS DOUBLE) mx,
    CAST(sy AS DOUBLE)/CAST(n AS DOUBLE) my,
    CAST(sxx AS DOUBLE)/CAST(n AS DOUBLE) -
      (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) vx,
    CAST(syy AS DOUBLE)/CAST(n AS DOUBLE) -
      (CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) vy,
    CAST(sxy AS DOUBLE)/CAST(n AS DOUBLE) -
      (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) cv
  FROM m)
SELECT l_orderkey, l_linenumber, CAST(x AS BIGINT) AS quantity,
  CAST(y AS BIGINT) AS price_cents,
  CAST(floor(((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx) * vy
    - 2 * (CAST(x AS DOUBLE) - mx) * (CAST(y AS DOUBLE) - my) * cv
    + (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my) * vx)
    / (vx * vy - cv * cv) * 1e6) AS BIGINT) AS d2_q6
FROM li, p ORDER BY d2_q6 DESC, l_orderkey, l_linenumber LIMIT 20""",

      // Span templates: slice the d1 side of the shared span relation;
      // pure integer pair/doc counts per exact string key.
      "dedup_span_templates" ->
        s"""${spanCtes(dir)},
tpl AS (SELECT s.d1, s.d2, s.tok,
    array_to_string(list_slice(string_split(dd.text, ' '),
      s.s1, s.s1 + s.tok - 1), ' ') tpl_text
  FROM spans s JOIN ${T("documents")} dd ON dd.doc_id = s.d1),
pairs_ AS (SELECT tpl_text, tok, count(*) n_span_pairs
  FROM tpl GROUP BY 1, 2),
docs_ AS (SELECT tpl_text, count(*) n_docs FROM (
    SELECT DISTINCT tpl_text, doc FROM (
      SELECT tpl_text, d1 doc FROM tpl UNION ALL SELECT tpl_text, d2 FROM tpl))
  GROUP BY 1)
SELECT p.tpl_text AS template_text, CAST(p.tok AS BIGINT) AS span_tokens,
  CAST(p.n_span_pairs AS BIGINT) AS n_span_pairs,
  CAST(d.n_docs AS BIGINT) AS n_docs
FROM pairs_ p JOIN docs_ d ON d.tpl_text = p.tpl_text
ORDER BY p.n_span_pairs DESC, p.tpl_text LIMIT 20""",

      // PACF lag 2: both autocorrelations floored 1e6 from exact
      // moments; phi22 computed FROM the quantized integers.
      "ts_pacf_lag2" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) y
  FROM ${T("orders")} GROUP BY 1),
r1 AS (SELECT count(*) n1, CAST(floor((CAST(count(*) AS DOUBLE) *
      CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS DOUBLE) -
      CAST(sum(CAST(a.y AS HUGEINT)) AS DOUBLE) * CAST(sum(CAST(b.y AS HUGEINT)) AS DOUBLE)) /
    (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(CAST(a.y AS HUGEINT) * a.y) AS DOUBLE) -
      CAST(sum(CAST(a.y AS HUGEINT)) AS DOUBLE) * CAST(sum(CAST(a.y AS HUGEINT)) AS DOUBLE)) *
     sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(CAST(b.y AS HUGEINT) * b.y) AS DOUBLE) -
      CAST(sum(CAST(b.y AS HUGEINT)) AS DOUBLE) * CAST(sum(CAST(b.y AS HUGEINT)) AS DOUBLE))) * 1e6)
    AS BIGINT) r1_q6
  FROM daily a JOIN daily b ON b.dt = a.dt + 1),
r2 AS (SELECT count(*) n2, CAST(floor((CAST(count(*) AS DOUBLE) *
      CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS DOUBLE) -
      CAST(sum(CAST(a.y AS HUGEINT)) AS DOUBLE) * CAST(sum(CAST(b.y AS HUGEINT)) AS DOUBLE)) /
    (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(CAST(a.y AS HUGEINT) * a.y) AS DOUBLE) -
      CAST(sum(CAST(a.y AS HUGEINT)) AS DOUBLE) * CAST(sum(CAST(a.y AS HUGEINT)) AS DOUBLE)) *
     sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(CAST(b.y AS HUGEINT) * b.y) AS DOUBLE) -
      CAST(sum(CAST(b.y AS HUGEINT)) AS DOUBLE) * CAST(sum(CAST(b.y AS HUGEINT)) AS DOUBLE))) * 1e6)
    AS BIGINT) r2_q6
  FROM daily a JOIN daily b ON b.dt = a.dt + 2)
SELECT CAST(n1 AS BIGINT) AS n_pairs_lag1, CAST(n2 AS BIGINT) AS n_pairs_lag2,
  r1_q6, r2_q6,
  CAST(floor((CAST(r2_q6 AS DOUBLE)/1e6 -
      (CAST(r1_q6 AS DOUBLE)/1e6) * (CAST(r1_q6 AS DOUBLE)/1e6)) /
    (1 - (CAST(r1_q6 AS DOUBLE)/1e6) * (CAST(r1_q6 AS DOUBLE)/1e6)) * 1e6)
    AS BIGINT) AS pacf2_q6
FROM r1, r2""",

      // CEM: integer strata, per-(stratum, arm) ranks, exact pair join.
      "sample_cem_matching" ->
        s"""WITH cust AS (SELECT o_custkey ck,
    sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      ELSE 0 END) x,
    sum(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      ELSE 0 END) yy
  FROM ${T("orders")} GROUP BY 1),
cust2 AS (SELECT ck, x, yy,
    ('0x' || substr(md5(cast(ck AS VARCHAR)), 1, 4))::BIGINT % 2 arm
  FROM cust WHERE x > 0),
rng AS (SELECT min(x) x0, max(x) x1 FROM cust2),
bk AS (SELECT ck, x, yy, arm,
    least(63, ((x - x0) * 64) // (x1 - x0 + 1)) b
  FROM cust2, rng),
pr AS (SELECT b, arm, x, yy,
    row_number() OVER (PARTITION BY b, arm ORDER BY x, ck) prank FROM bk),
t AS (SELECT b, prank, x xt, yy yt FROM pr WHERE arm = 1),
c AS (SELECT b, prank, x xc, yy yc FROM pr WHERE arm = 0),
matched AS (SELECT t.b, t.xt, t.yt, c.xc, c.yc FROM t
  JOIN c ON c.b = t.b AND c.prank = t.prank),
perarm AS (SELECT b, sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) n_treated,
    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) n_control FROM bk GROUP BY 1),
att AS (SELECT b, count(*) n_matched, sum(yt - yc) dsum,
    sum(abs(xt - xc)) xgap FROM matched GROUP BY 1)
SELECT CAST(p.b AS BIGINT) AS stratum,
  CAST(p.n_treated AS BIGINT) AS n_treated,
  CAST(p.n_control AS BIGINT) AS n_control,
  CAST(coalesce(a.n_matched, 0) AS BIGINT) AS n_matched,
  CAST(coalesce(floor(CAST(a.dsum AS DOUBLE) / CAST(a.n_matched AS DOUBLE)), 0)
    AS BIGINT) AS att_cents,
  CAST(coalesce(floor(CAST(a.xgap AS DOUBLE) / CAST(a.n_matched AS DOUBLE)), 0)
    AS BIGINT) AS mean_xgap_cents
FROM perarm p LEFT JOIN att a ON a.b = p.b ORDER BY stratum""",

      // Bucketed-join roundtrip: the oracle joins the ORIGINAL tables.
      "src_bucketed_roundtrip" ->
        s"""SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
  CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
    AS BIGINT) AS revenue_cents
FROM ${T("orders")} o JOIN ${T("customer")} c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY c.c_mktsegment""",

      // ---- round 13 (§2.46): PII detection/redaction + span excision ----
      // Same literal regexes as Pipelines.piiPatterns (Java/RE2-identical
      // subset); the dirty corpus is the same doc_id-arithmetic injection.
      "pipeline_pii_profile" ->
        s"""WITH dirty AS (SELECT source, len(string_split(text, ' ')) n_toks,
    $piiDirtySql t FROM ${T("documents")}),
c AS (SELECT source, n_toks,
    len(regexp_extract_all(t, '${piiPat("email")}')) email,
    len(regexp_extract_all(t, '${piiPat("phone")}')) phone,
    len(regexp_extract_all(t, '${piiPat("ssn")}')) ssn,
    len(regexp_extract_all(t, '${piiPat("ipv4")}')) ipv4
  FROM dirty)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(email) AS BIGINT) AS emails, CAST(sum(phone) AS BIGINT) AS phones,
  CAST(sum(ssn) AS BIGINT) AS ssns, CAST(sum(ipv4) AS BIGINT) AS ipv4s,
  CAST(sum(CASE WHEN email + phone + ssn + ipv4 > 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS docs_with_pii,
  CAST(sum(email + phone + ssn + ipv4) AS BIGINT) AS pii_total,
  CAST((sum(email + phone + ssn + ipv4) * 1000000) // sum(n_toks) AS BIGINT)
    AS pii_per_mtok
FROM c GROUP BY source ORDER BY source""",

      "pipeline_pii_redact" ->
        s"""WITH d AS (SELECT doc_id, source, $piiDirtySql t
  FROM ${T("documents")} WHERE doc_id % 9 = 0),
m AS (SELECT doc_id, source, t,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
      '${piiPat("email")}', '<EMAIL>', 'g'),
      '${piiPat("phone")}', '<PHONE>', 'g'),
      '${piiPat("ssn")}', '<SSN>', 'g'),
      '${piiPat("ipv4")}', '<IP>', 'g') mt
  FROM d)
SELECT doc_id, source,
  CAST(len(regexp_extract_all(t, '${piiPat("email")}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t, '${piiPat("phone")}')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(t, '${piiPat("ssn")}')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(t, '${piiPat("ipv4")}')) AS BIGINT) AS n_ipv4,
  md5(mt) AS masked_md5,
  CAST(len(t) - len(mt) AS BIGINT) AS chars_delta
FROM m ORDER BY doc_id""",

      // find→fix closure of dedup_substring_spans: excise every span
      // position on the greater-doc side, keep the canonical occurrence,
      // rebuild and fingerprint the affected docs.
      "pipeline_span_excised_tokens" ->
        s"""${spanCtes(dir)},
exc0 AS (SELECT d2 AS doc_id, unnest(generate_series(s2, s2 + tok - 1)) p
  FROM spans),
exc AS (SELECT DISTINCT doc_id, p FROM exc0),
ecnt AS (SELECT doc_id, count(*) n_exc FROM exc GROUP BY 1),
tk AS (SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) pos,
    unnest(string_split(text, ' ')) w
  FROM ${T("documents")} WHERE doc_id IN (SELECT doc_id FROM ecnt)),
kept AS (SELECT t.doc_id, t.pos, t.w FROM tk t
  ANTI JOIN exc e ON e.doc_id = t.doc_id AND e.p = t.pos),
rebuilt AS (SELECT doc_id, md5(string_agg(w, ' ' ORDER BY pos)) fp
  FROM kept GROUP BY 1),
base AS (SELECT doc_id, source, len(string_split(text, ' ')) n_toks
  FROM ${T("documents")})
SELECT b.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN e.n_exc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS docs_excised,
  CAST(sum(b.n_toks) AS BIGINT) AS tokens_before,
  CAST(sum(coalesce(e.n_exc, 0)) AS BIGINT) AS tokens_excised,
  CAST(sum(b.n_toks) - sum(coalesce(e.n_exc, 0)) AS BIGINT) AS tokens_after,
  CAST((sum(coalesce(e.n_exc, 0)) * 1000000) // sum(b.n_toks) AS BIGINT)
    AS excised_share_q6,
  min(r.fp) AS fp_min, max(r.fp) AS fp_max
FROM base b LEFT JOIN ecnt e USING (doc_id) LEFT JOIN rebuilt r USING (doc_id)
GROUP BY 1 ORDER BY 1""",

      // ---- round 13 (§2.47): bipartite structure (shared edge build) ----
      "graph_bipartite_degree_profile" ->
        s"""WITH e AS (SELECT DISTINCT o.o_custkey c, l.l_suppkey sup
  FROM ${T("lineitem")} l JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey),
cd AS (SELECT c, count(*) degree FROM e GROUP BY 1),
sd AS (SELECT sup, count(*) degree FROM e GROUP BY 1)
SELECT 'customer' AS side, CAST(degree AS BIGINT) AS degree,
  CAST(count(*) AS BIGINT) AS n_nodes FROM cd GROUP BY 2
UNION ALL
SELECT 'supplier', CAST(degree AS BIGINT), CAST(count(*) AS BIGINT)
FROM sd GROUP BY 2
ORDER BY side, degree""",

      "graph_bipartite_assortativity" ->
        s"""WITH e AS (SELECT DISTINCT o.o_custkey c, l.l_suppkey sup
  FROM ${T("lineitem")} l JOIN ${T("orders")} o ON l.l_orderkey = o.o_orderkey),
cd AS (SELECT c, count(*) dc FROM e GROUP BY 1),
sd AS (SELECT sup, count(*) ds FROM e GROUP BY 1),
t AS (SELECT count(*) n, count(DISTINCT e.c) n_customers,
    count(DISTINCT e.sup) n_suppliers,
    sum(CAST(dc AS HUGEINT)) sx, sum(CAST(ds AS HUGEINT)) sy,
    sum(CAST(dc AS HUGEINT) * ds) sxy,
    sum(CAST(dc AS HUGEINT) * dc) sxx,
    sum(CAST(ds AS HUGEINT) * ds) syy
  FROM e JOIN cd USING (c) JOIN sd USING (sup))
SELECT CAST(n AS BIGINT) AS n_edges, CAST(n_customers AS BIGINT) AS n_customers,
  CAST(n_suppliers AS BIGINT) AS n_suppliers,
  CAST(floor(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
    sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) *
         CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)) * 1e6) AS BIGINT)
    AS assortativity_q6
FROM t""",

      "graph_cosupply_supplier_sim" ->
        s"""WITH po AS (SELECT DISTINCT l_orderkey, l_suppkey FROM ${T("lineitem")}),
p AS (SELECT a.l_suppkey s1, b.l_suppkey s2, count(*) co_orders
  FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey
    AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
n AS (SELECT l_suppkey, count(*) n_ord FROM po GROUP BY 1)
SELECT CAST(p.s1 AS BIGINT) AS s1, CAST(p.s2 AS BIGINT) AS s2,
  CAST(co_orders AS BIGINT) AS co_orders,
  CAST(n1.n_ord AS BIGINT) AS n_orders1, CAST(n2.n_ord AS BIGINT) AS n_orders2,
  CAST(floor(CAST(co_orders AS DOUBLE) /
    sqrt(CAST(n1.n_ord AS DOUBLE) * CAST(n2.n_ord AS DOUBLE)) * 1e6) AS BIGINT)
    AS cosine_q6
FROM p JOIN n n1 ON n1.l_suppkey = p.s1 JOIN n n2 ON n2.l_suppkey = p.s2
ORDER BY cosine_q6 DESC, s1, s2 LIMIT 20""",

      // ---- round 13 (§2.48): complexity, regularity & lexicon ----
      // Bandt-Pompe order-3 ordinal census: stable ranks (position
      // breaks ties), pattern = r0*100+r1*10+r2, one ln per row.
      "ts_permutation_entropy" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt, count(*) x
  FROM ${T("orders")} GROUP BY 1),
tri AS (SELECT x a, lead(x, 1) OVER (ORDER BY dt) b,
    lead(x, 2) OVER (ORDER BY dt) c FROM daily),
pat AS (SELECT
    (CASE WHEN b < a THEN 1 ELSE 0 END + CASE WHEN c < a THEN 1 ELSE 0 END)
      * 100 +
    (CASE WHEN a <= b THEN 1 ELSE 0 END + CASE WHEN c < b THEN 1 ELSE 0 END)
      * 10 +
    (CASE WHEN a <= c THEN 1 ELSE 0 END + CASE WHEN b <= c THEN 1 ELSE 0 END)
      AS pattern
  FROM tri WHERE c IS NOT NULL),
g AS (SELECT pattern, count(*) n FROM pat GROUP BY 1),
t AS (SELECT sum(n) t FROM g)
SELECT CAST(pattern AS BIGINT) AS pattern, CAST(n AS BIGINT) AS n,
  CAST((n * 1000000) // t.t AS BIGINT) AS share_q6,
  CAST(floor(CAST(n AS DOUBLE) / t.t *
    ln(CAST(t.t AS DOUBLE) / n) * 1e6) AS BIGINT) AS plogp_q6
FROM g, t ORDER BY pattern""",

      // Richman-Moorman m=2 sample entropy over daily revenue cents;
      // tolerance 0.2*sigma from exact moments, days^2 template pairs.
      "ts_sample_entropy" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) y
  FROM ${T("orders")} GROUP BY 1),
tpl AS (SELECT dt, y x0, lead(y, 1) OVER (ORDER BY dt) x1,
    lead(y, 2) OVER (ORDER BY dt) x2 FROM daily QUALIFY x2 IS NOT NULL),
mom AS (SELECT count(*) n, sum(CAST(x0 AS HUGEINT)) sx,
    sum(CAST(x0 AS HUGEINT) * x0) sxx FROM tpl),
tol AS (SELECT n, CAST(floor(0.2 *
    sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)) /
    CAST(n AS DOUBLE)) AS BIGINT) r FROM mom),
pr AS (SELECT a.x2 ax2, b.x2 bx2, tol.r, tol.n
  FROM tpl a JOIN tpl b ON a.dt < b.dt, tol
  WHERE abs(a.x0 - b.x0) <= tol.r AND abs(a.x1 - b.x1) <= tol.r)
SELECT CAST(n AS BIGINT) AS n_templates, CAST(r AS BIGINT) AS tol_cents,
  CAST(count(*) AS BIGINT) AS b_pairs,
  CAST(sum(CASE WHEN abs(ax2 - bx2) <= r THEN 1 ELSE 0 END) AS BIGINT)
    AS a_pairs,
  CAST(floor(ln(CAST(count(*) AS DOUBLE) /
    sum(CASE WHEN abs(ax2 - bx2) <= r THEN 1 ELSE 0 END)) * 1e6) AS BIGINT)
    AS sampen_q6
FROM pr GROUP BY n, r""",

      // Lo-MacKinlay VR(q) on daily-revenue q-differences, exact
      // HUGEINT moments, one double tree per q.
      "ts_variance_ratio" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) y
  FROM ${T("orders")} GROUP BY 1),
d AS (SELECT q, lead(y, q) OVER (PARTITION BY q ORDER BY dt) - y dy
  FROM daily CROSS JOIN (SELECT unnest([1, 2, 4, 8]) q)),
m AS (SELECT q, count(*) n, sum(CAST(dy AS HUGEINT)) s,
    sum(CAST(dy AS HUGEINT) * dy) ss
  FROM d WHERE dy IS NOT NULL GROUP BY 1),
v AS (SELECT q, n,
    CAST(CAST(n AS HUGEINT) * ss - s * s AS DOUBLE) /
      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) var FROM m)
SELECT CAST(v.q AS BIGINT) AS q, CAST(v.n AS BIGINT) AS n_diffs,
  CAST(floor(v.var / (v.q * b.var) * 1e6) AS BIGINT) AS vr_q6
FROM v JOIN (SELECT var FROM v WHERE q = 1) b ON TRUE
WHERE v.q > 1 ORDER BY v.q""",

      // Yule's K per language: repeat-rate from exact f^2 sums, one
      // HUGEINT integer division.
      "text_yule_k" ->
        s"""WITH tk AS (SELECT lang, unnest(string_split(text, ' ')) w
  FROM ${T("documents")}),
f AS (SELECT lang, w, count(*) f FROM tk WHERE w <> '' GROUP BY 1, 2),
g AS (SELECT lang, sum(f) nt, count(*) vocab,
    sum(CAST(f AS HUGEINT) * f) s2 FROM f GROUP BY 1)
SELECT lang, CAST(nt AS BIGINT) AS n_tokens, CAST(vocab AS BIGINT) AS vocab,
  CAST(s2 AS BIGINT) AS s2,
  CAST(((s2 - nt) * 100000000) // (CAST(nt AS HUGEINT) * nt) AS BIGINT)
    AS yule_k_q4
FROM g ORDER BY lang""",

      // MATTR-50: mean TTR over consecutive FULL 50-token chunks,
      // chunk-weighted per language, one integer division.
      "pipeline_mattr" ->
        s"""WITH tk AS (SELECT doc_id, lang,
    len(string_split(text, ' ')) nt,
    generate_subscripts(string_split(text, ' '), 1) - 1 p0,
    unnest(string_split(text, ' ')) w
  FROM ${T("documents")}),
ch AS (SELECT doc_id, lang, p0 // 50 chunk, w FROM tk
  WHERE p0 // 50 < nt // 50),
pc AS (SELECT doc_id, lang, chunk, count(DISTINCT w) ty
  FROM ch GROUP BY 1, 2, 3)
SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_chunks,
  CAST((sum(ty) * 1000000) // (50 * count(*)) AS BIGINT) AS mattr_q6
FROM pc GROUP BY 1 ORDER BY lang""",

      // ---- round 13 (§2.49): robust tests, crawl profiling, chunking ----
      // Mood's median 2x2 on the pooled lower median; exact HUGEINT
      // chi-square, one integer division.
      "agg_mood_median_test" ->
        s"""WITH e AS (SELECT event_type g,
    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) v
  FROM ${T("events")}
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
cnt AS (SELECT v, count(*) c FROM e GROUP BY 1),
cum AS (SELECT v, sum(c) OVER (ORDER BY v) cm,
    (SELECT count(*) FROM e) n FROM cnt),
med AS (SELECT min(v) m FROM cum WHERE 2 * cm >= n + (n % 2)),
t AS (SELECT g, sum(CASE WHEN v > med.m THEN 1 ELSE 0 END) ab, count(*) n_g
  FROM e, med GROUP BY 1),
x AS (SELECT
    max(CASE WHEN g = 'click' THEN ab END) a,
    max(CASE WHEN g = 'click' THEN n_g - ab END) b,
    max(CASE WHEN g = 'purchase' THEN ab END) c2,
    max(CASE WHEN g = 'purchase' THEN n_g - ab END) d2
  FROM t)
SELECT CAST((SELECT m FROM med) AS BIGINT) AS median_cents,
  CAST(a AS BIGINT) AS click_above, CAST(b AS BIGINT) AS click_le,
  CAST(c2 AS BIGINT) AS purchase_above, CAST(d2 AS BIGINT) AS purchase_le,
  CAST(((a + b + c2 + d2)
      * (CAST(a AS HUGEINT) * d2 - CAST(b AS HUGEINT) * c2)
      * (CAST(a AS HUGEINT) * d2 - CAST(b AS HUGEINT) * c2) * 1000000)
    // (CAST(a + b AS HUGEINT) * (c2 + d2) * (a + c2) * (b + d2)) AS BIGINT)
    AS chi2_q6
FROM x""",

      // Ljung-Box over daily revenue: row-lag acf from exact scaled
      // moments, Q folded from the QUANTIZED r's in pure integers.
      "ts_ljung_box" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) y
  FROM ${T("orders")} GROUP BY 1),
b AS (SELECT count(*) n, sum(CAST(y AS HUGEINT)) s FROM daily),
z AS (SELECT dt, CAST(b.n AS HUGEINT) * y - b.s zz, b.n FROM daily, b),
wl AS (SELECT k, zz, lead(zz, k) OVER (PARTITION BY k ORDER BY dt) lz, n
  FROM z CROSS JOIN (SELECT unnest(generate_series(1, 7)) k)),
den AS (SELECT sum(zz * zz) dn FROM z),
r AS (SELECT k, max(n) n,
    CAST(floor(CAST(sum(zz * lz) AS DOUBLE) /
      CAST(den.dn AS DOUBLE) * 1e6) AS BIGINT) r_q6
  FROM wl, den WHERE lz IS NOT NULL GROUP BY k, den.dn)
SELECT CAST(k AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days, r_q6,
  CAST(sum((CAST(n AS HUGEINT) * (n + 2) * (r_q6 * r_q6)) // (n - k))
    OVER (ORDER BY k) // 100000000 AS BIGINT) AS lb_q_q4
FROM r ORDER BY lag""",

      // per-source URL/domain census over the arithmetic URL fixture;
      // same regexes, capture-group host extraction.
      "pipeline_url_profile" ->
        s"""WITH dirty AS (SELECT source, doc_id, concat(text,
    CASE WHEN doc_id % 3 = 0 THEN concat(' see https://cdn', doc_id % 7,
      '.example', doc_id % 5, '.com/path', doc_id, '/item?id=', doc_id, ' ok')
      ELSE '' END,
    CASE WHEN doc_id % 7 = 0 THEN concat(' ref http://blog', doc_id % 9,
      '.sample.org/page', doc_id % 13, ' end') ELSE '' END) t
  FROM ${T("documents")}),
u AS (SELECT source, doc_id,
    regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)[^ ]*', 1) hosts,
    len(regexp_extract_all(t, 'https?://[A-Za-z0-9.-]+[^ ]*')) n_urls,
    len(regexp_extract_all(t, 'https://[A-Za-z0-9.-]+[^ ]*')) n_https
  FROM dirty),
da AS (SELECT source, count(*) n_docs,
    sum(CASE WHEN len(hosts) > 0 THEN 1 ELSE 0 END) docs_with_url,
    sum(n_urls) urls, sum(n_https) https
  FROM u GROUP BY 1),
ha AS (SELECT source, count(DISTINCT host) n_hosts, min(host) host_min,
    max(host) host_max
  FROM (SELECT source, unnest(hosts) host FROM u) GROUP BY 1)
SELECT da.source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(docs_with_url AS BIGINT) AS docs_with_url,
  CAST(urls AS BIGINT) AS n_urls, CAST(https AS BIGINT) AS n_https,
  CAST(CASE WHEN urls > 0 THEN (https * 1000000) // urls ELSE 0 END AS BIGINT)
    AS https_share_q6,
  CAST(coalesce(n_hosts, 0) AS BIGINT) AS n_hosts, host_min, host_max
FROM da LEFT JOIN ha ON ha.source = da.source ORDER BY da.source""",

      // 64-token chunks at stride 48, full windows only; md5-pinned.
      "pipeline_chunk_windows" ->
        s"""WITH t AS (SELECT source, doc_id, string_split(text, ' ') toks,
    len(string_split(text, ' ')) n FROM ${T("documents")}),
c AS (SELECT source, doc_id, unnest(generate_series(0, (n - 64) // 48)) j,
    toks FROM t WHERE n >= 64),
ch AS (SELECT source, doc_id, md5(array_to_string(
    list_slice(toks, 1 + 48 * j, 48 * j + 64), ' ')) h FROM c)
SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_chunked,
  CAST(count(*) AS BIGINT) AS n_chunks,
  CAST(count(DISTINCT h) AS BIGINT) AS distinct_chunks,
  CAST(((count(*) - count(DISTINCT h)) * 1000000) // count(*) AS BIGINT)
    AS dup_chunk_share_q6,
  min(h) AS fp_min, max(h) AS fp_max
FROM ch GROUP BY 1 ORDER BY source""",

      // ---- round 13 (§2.50): privacy census, paired test, skill ----
      "agg_k_anonymity" ->
        s"""WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) n,
    count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) l
  FROM ${T("customer")} GROUP BY 1, 2),
t AS (SELECT sum(n) tot FROM g)
SELECT CAST(n AS BIGINT) AS group_size, CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(n) AS BIGINT) AS n_customers, CAST(min(l) AS BIGINT) AS l_min,
  CAST(CASE WHEN n < 5 THEN 1 ELSE 0 END AS BIGINT) AS below_k5,
  CAST((sum(n) * 1000000) // t.tot AS BIGINT) AS share_q6
FROM g, t GROUP BY n, t.tot ORDER BY group_size""",

      // doubled average ranks are exact integers; W+ + W- = n(n+1).
      "agg_wilcoxon_signed_rank" ->
        s"""WITH daily AS (SELECT CAST(ts AS DATE) dt,
    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) c,
    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) p
  FROM ${T("events")} GROUP BY 1),
dd AS (SELECT c - p d, abs(c - p) ad FROM daily WHERE c <> p),
byv AS (SELECT ad, count(*) ce,
    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) pos FROM dd GROUP BY 1),
cum AS (SELECT ad, ce, pos, coalesce(sum(ce) OVER (ORDER BY ad
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cl FROM byv)
SELECT CAST(sum(ce) AS BIGINT) AS n_eff,
  CAST(sum(pos * (2 * cl + ce + 1)) AS BIGINT) AS w_plus_x2,
  CAST(sum((ce - pos) * (2 * cl + ce + 1)) AS BIGINT) AS w_minus_x2,
  CAST(sum(ce) * (sum(ce) + 1) AS BIGINT) AS check_sum
FROM cum""",

      "ts_seasonal_naive_skill" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt,
    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) y
  FROM ${T("orders")} GROUP BY 1),
l AS (SELECT dt, y, lag(y, 1) OVER (ORDER BY dt) y1,
    lag(y, 7) OVER (ORDER BY dt) y7 FROM daily),
s AS (SELECT * FROM l WHERE y7 IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_days_scored,
  CAST(sum(abs(y - y1)) // count(*) AS BIGINT) AS mae_naive1_cents,
  CAST(sum(abs(y - y7)) // count(*) AS BIGINT) AS mae_snaive7_cents,
  CAST((sum(abs(y - y7)) * 1000000) // sum(abs(y - y1)) AS BIGINT)
    AS skill_q6
FROM s""",

      // ---- round 14 (§2.51): crawl text hygiene ----
      // HTML extraction census over the arithmetic tagged fixture:
      // identical regexp strip chain (script/style/comment blocks,
      // then tags, then entities with &amp; LAST), identical
      // whitespace collapse; md5 pins the rewrite.
      "pipeline_html_extract" ->
        s"""WITH dirty AS (SELECT source, doc_id, concat(
    '<html><head><title>Doc ', doc_id, '</title>',
    CASE WHEN doc_id % 4 = 0 THEN concat('<style>p{color:#', doc_id % 999, '}</style>') ELSE '' END,
    '</head><body>',
    CASE WHEN doc_id % 3 = 0 THEN concat('<h1>Section ', doc_id % 50, '</h1>') ELSE '' END,
    '<p>', text, '</p>',
    CASE WHEN doc_id % 5 = 0 THEN concat('<script>var x=', doc_id, ';' || chr(10) || 'log(x)</script>') ELSE '' END,
    CASE WHEN doc_id % 7 = 0 THEN concat('<!-- crawl ', doc_id, chr(10) || 'note -->') ELSE '' END,
    '<div class="footer">&copy; site ', doc_id % 20, ' &amp; co &lt;info&gt;</div></body></html>') h
  FROM ${T("documents")}),
ext AS (SELECT source, doc_id, h, trim(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(h,
   '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
   '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
   '(?s)<!--.*?-->', ' ', 'g'),
   '<[^>]*>', ' ', 'g'),
   '&lt;', '<', 'g'),
   '&gt;', '>', 'g'),
   '&quot;', '"', 'g'),
   '&#39;', '''', 'g'),
   '&copy;', '(c)', 'g'),
   '&amp;', '&', 'g'),
   '\\s+', ' ', 'g')) t
  FROM dirty)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(length(h)) AS BIGINT) AS chars_raw,
  CAST(sum(length(t)) AS BIGINT) AS chars_text,
  CAST((sum(length(t)) * 1000000) // sum(length(h)) AS BIGINT)
    AS retained_share_q6,
  CAST(sum(len(string_split(t, ' '))) AS BIGINT) AS n_toks,
  min(md5(t)) AS fp_min, max(md5(t)) AS fp_max
FROM ext GROUP BY 1 ORDER BY source""",

      // Unicode NFC census: utf8proc's nfc_normalize vs the JDK
      // normalizer on composed/decomposed Latin fixtures — md5 pins
      // byte-identical normalized output.
      "pipeline_unicode_census" ->
        s"""WITH dirty AS (SELECT source, doc_id, concat(text,
    CASE WHEN doc_id % 4 = 0 THEN ' café touché déjà' ELSE '' END,
    CASE WHEN doc_id % 6 = 0 THEN ' café déjà vu' ELSE '' END,
    CASE WHEN doc_id % 9 = 0 THEN ' Ångström unit' ELSE '' END) t
  FROM ${T("documents")}),
n AS (SELECT source, doc_id, t, nfc_normalize(t) nt FROM dirty)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN nt <> t THEN 1 ELSE 0 END) AS BIGINT) AS docs_denorm,
  CAST(sum(length(t)) AS BIGINT) AS chars_raw,
  CAST(sum(length(nt)) AS BIGINT) AS chars_nfc,
  CAST(sum(length(t)) - sum(length(nt)) AS BIGINT) AS chars_saved,
  min(md5(nt)) AS fp_min, max(md5(nt)) AS fp_max
FROM n GROUP BY 1 ORDER BY source""",

      // Mojibake repair census: identical literal replace chain
      // (multi-byte pairs first), md5 pins the repaired text.
      "pipeline_encoding_repair" ->
        s"""WITH dirty AS (SELECT source, doc_id, concat(text,
    CASE WHEN doc_id % 5 = 0 THEN ' rÃ©sumÃ© dÃ©tail' ELSE '' END,
    CASE WHEN doc_id % 8 = 0 THEN ' itâ€™s â€œquoted andâ€¦ more' ELSE '' END,
    CASE WHEN doc_id % 12 = 0 THEN ' naÃ¯ve faÃ§ade' ELSE '' END) t
  FROM ${T("documents")}),
rep AS (SELECT source, doc_id, t,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(t,
    'â€™', '’', 'g'),
    'â€œ', '“', 'g'),
    'â€¦', '…', 'g'),
    'Ã©', 'é', 'g'),
    'Ã¨', 'è', 'g'),
    'Ã¯', 'ï', 'g'),
    'Ã§', 'ç', 'g') rt
  FROM dirty)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN rt <> t THEN 1 ELSE 0 END) AS BIGINT) AS docs_mojibake,
  CAST(sum(length(t)) - sum(length(rt)) AS BIGINT) AS chars_repaired,
  min(md5(rt)) AS fp_min, max(md5(rt)) AS fp_max
FROM rep GROUP BY 1 ORDER BY source""",

      // ---- round 14 (§2.52): URL-keyed dedup & boilerplate lines ----
      // URL canonicalization collapse census: case-folded scheme/host,
      // utm_*/ref= params stripped, survivors sorted — raw-distinct vs
      // canonical-distinct per source.
      "pipeline_url_dedup" ->
        s"""WITH dirty AS (SELECT source, doc_id, concat(text,
    CASE WHEN doc_id % 3 = 0 THEN concat(' go HTTPS://CDN', doc_id % 7, '.Example', doc_id % 5,
      '.COM/item', doc_id % 97, '?utm_source=feed&id=', doc_id % 50, '&utm_campaign=c', doc_id % 4, ' now') ELSE '' END,
    CASE WHEN doc_id % 11 = 0 THEN concat(' go https://cdn', doc_id % 7, '.example', doc_id % 5,
      '.com/item', doc_id % 97, '?id=', doc_id % 50, ' now') ELSE '' END,
    CASE WHEN doc_id % 7 = 0 THEN concat(' ref http://Blog', doc_id % 9, '.Sample.ORG/page', doc_id % 13,
      '?b=', doc_id % 8, '&ref=tw&a=', doc_id % 6, ' end') ELSE '' END) t
  FROM ${T("documents")}),
u AS (SELECT source, doc_id, unnest(regexp_extract_all(t, '[A-Za-z]+://[^ ]+')) url FROM dirty),
c AS (SELECT source, doc_id, url,
    concat(lower(regexp_extract(url, '^([A-Za-z]+)://', 1)), '://',
      lower(regexp_extract(url, '^[A-Za-z]+://([^/?]+)', 1)),
      regexp_extract(url, '^[A-Za-z]+://[^/?]+([^?]*)', 1),
      CASE WHEN length(array_to_string(list_sort(list_filter(
          string_split(regexp_extract(url, '\\?(.*)$$', 1), '&'),
          x -> x NOT LIKE 'utm\\_%' ESCAPE '\\' AND x NOT LIKE 'ref=%' AND x <> '')), '&')) > 0
        THEN concat('?', array_to_string(list_sort(list_filter(
          string_split(regexp_extract(url, '\\?(.*)$$', 1), '&'),
          x -> x NOT LIKE 'utm\\_%' ESCAPE '\\' AND x NOT LIKE 'ref=%' AND x <> '')), '&'))
        ELSE '' END) canon
  FROM u)
SELECT source, CAST(count(*) AS BIGINT) AS n_urls,
  CAST(count(DISTINCT url) AS BIGINT) AS raw_distinct,
  CAST(count(DISTINCT canon) AS BIGINT) AS canon_distinct,
  CAST(count(DISTINCT url) - count(DISTINCT canon) AS BIGINT) AS collapsed,
  CAST(((count(DISTINCT url) - count(DISTINCT canon)) * 1000000)
    // count(DISTINCT url) AS BIGINT) AS collapse_share_q6,
  min(md5(canon)) AS fp_min, max(md5(canon)) AS fp_max
FROM c GROUP BY 1 ORDER BY source""",

      // Boilerplate-line census: the C4/CCNet line-frequency screen —
      // a line is boilerplate in its source iff 10·df >= 3·n_docs.
      "pipeline_boilerplate_lines" ->
        s"""WITH dirty AS (SELECT source, doc_id, concat(text,
    CASE WHEN doc_id % 2 = 0 THEN concat(' | Copyright site', doc_id % 20, ' all rights reserved') ELSE '' END,
    CASE WHEN doc_id % 5 = 0 THEN ' | subscribe to our newsletter today' ELSE '' END,
    CASE WHEN doc_id % 7 = 0 THEN concat(' | unique footnote ', doc_id) ELSE '' END) t
  FROM ${T("documents")}),
ln AS (SELECT source, doc_id, trim(unnest(string_split(t, ' | '))) line FROM dirty),
df AS (SELECT source, line, count(DISTINCT doc_id) ndocs FROM ln GROUP BY 1, 2),
nd AS (SELECT source, count(DISTINCT doc_id) n_docs FROM ln GROUP BY 1),
j AS (SELECT l.source, l.doc_id, l.line, d.ndocs, n.n_docs,
    (d.ndocs >= 2 AND d.ndocs * 10 >= n.n_docs * 3) is_bp
  FROM ln l JOIN df d ON l.source = d.source AND l.line = d.line
  JOIN nd n ON l.source = n.source)
SELECT source, CAST(max(n_docs) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(count(DISTINCT line) AS BIGINT) AS distinct_lines,
  CAST(count(DISTINCT CASE WHEN is_bp THEN line END) AS BIGINT) AS bp_lines,
  CAST(sum(CASE WHEN is_bp THEN length(line) ELSE 0 END) AS BIGINT) AS bp_chars,
  CAST((sum(CASE WHEN is_bp THEN length(line) ELSE 0 END) * 1000000)
    // sum(length(line)) AS BIGINT) AS bp_share_q6
FROM j GROUP BY 1 ORDER BY source""",

      // ---- round 14 (§2.53): robust dispersion, randomness, raw profile ----
      // Brown–Forsythe on |x − lower-median| cents: exact HUGEINT
      // folds pivoted to ONE row so the F double tree has one
      // deterministic evaluation order in both engines.
      "agg_brown_forsythe" ->
        s"""WITH e AS (SELECT o_orderstatus g,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) v
  FROM ${T("orders")}),
cnt AS (SELECT g, v, count(*) c FROM e GROUP BY 1, 2),
cum AS (SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v) cm,
    sum(c) OVER (PARTITION BY g) n FROM cnt),
med AS (SELECT g, min(v) m FROM cum WHERE 2 * cm >= n + (n % 2) GROUP BY 1),
z AS (SELECT e.g, abs(e.v - med.m) zc FROM e JOIN med ON e.g = med.g),
grp AS (SELECT g, count(*) ng, sum(CAST(zc AS HUGEINT)) sg,
    sum(CAST(zc AS HUGEINT) * zc) qg FROM z GROUP BY 1),
one AS (SELECT
    max(CASE WHEN g = 'F' THEN ng END) ng_f,
    max(CASE WHEN g = 'F' THEN sg END) sg_f,
    max(CASE WHEN g = 'F' THEN qg END) qg_f,
    max(CASE WHEN g = 'O' THEN ng END) ng_o,
    max(CASE WHEN g = 'O' THEN sg END) sg_o,
    max(CASE WHEN g = 'O' THEN qg END) qg_o,
    max(CASE WHEN g = 'P' THEN ng END) ng_p,
    max(CASE WHEN g = 'P' THEN sg END) sg_p,
    max(CASE WHEN g = 'P' THEN qg END) qg_p
  FROM grp),
x AS (SELECT ng_f + ng_o + ng_p n,
    CAST(sg_f AS DOUBLE) * CAST(sg_f AS DOUBLE) / CAST(ng_f AS DOUBLE)
      + CAST(sg_o AS DOUBLE) * CAST(sg_o AS DOUBLE) / CAST(ng_o AS DOUBLE)
      + CAST(sg_p AS DOUBLE) * CAST(sg_p AS DOUBLE) / CAST(ng_p AS DOUBLE) a,
    CAST(sg_f + sg_o + sg_p AS DOUBLE) s,
    CAST(qg_f + qg_o + qg_p AS DOUBLE) q
  FROM one)
SELECT CAST(n AS BIGINT) AS n_rows, CAST(3 AS BIGINT) AS k_groups,
  (SELECT CAST(m AS BIGINT) FROM med WHERE g = 'F') AS med_cents_f,
  (SELECT CAST(m AS BIGINT) FROM med WHERE g = 'O') AS med_cents_o,
  (SELECT CAST(m AS BIGINT) FROM med WHERE g = 'P') AS med_cents_p,
  CAST(floor(((a - s * s / CAST(n AS DOUBLE)) / 2)
    / ((q - a) / (CAST(n AS DOUBLE) - 3)) * 1e6) AS BIGINT) AS f_q6
FROM x""",

      // turning points of daily order counts vs the i.i.d. expectation
      // 2(n−2)/3, variance (16n−29)/90; identical double tree.
      "ts_turning_points" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt, count(*) y
  FROM ${T("orders")} GROUP BY 1),
l AS (SELECT y, lag(y) OVER (ORDER BY dt) p, lead(y) OVER (ORDER BY dt) nx
  FROM daily),
t AS (SELECT count(*) n,
    sum(CASE WHEN p IS NOT NULL AND nx IS NOT NULL AND
      ((y > p AND y > nx) OR (y < p AND y < nx)) THEN 1 ELSE 0 END) tp
  FROM l)
SELECT CAST(n AS BIGINT) AS n_days, CAST(tp AS BIGINT) AS turning_points,
  CAST((2 * (n - 2) * 1000000) // 3 AS BIGINT) AS expected_q6,
  CAST(floor((CAST(tp AS DOUBLE) - 2.0 * (n - 2) / 3)
    / sqrt((16.0 * n - 29) / 90) * 1e6) AS BIGINT) AS z_q6
FROM t""",

      // raw-markup character-class profile over the §2.51 tagged
      // fixture: length-minus-stripped per class, integer shares.
      "pipeline_char_class_profile" ->
        s"""WITH dirty AS (SELECT source, doc_id, concat(
    '<html><head><title>Doc ', doc_id, '</title>',
    CASE WHEN doc_id % 4 = 0 THEN concat('<style>p{color:#', doc_id % 999, '}</style>') ELSE '' END,
    '</head><body>',
    CASE WHEN doc_id % 3 = 0 THEN concat('<h1>Section ', doc_id % 50, '</h1>') ELSE '' END,
    '<p>', text, '</p>',
    CASE WHEN doc_id % 5 = 0 THEN concat('<script>var x=', doc_id, ';' || chr(10) || 'log(x)</script>') ELSE '' END,
    CASE WHEN doc_id % 7 = 0 THEN concat('<!-- crawl ', doc_id, chr(10) || 'note -->') ELSE '' END,
    '<div class="footer">&copy; site ', doc_id % 20, ' &amp; co &lt;info&gt;</div></body></html>') t
  FROM ${T("documents")}),
c AS (SELECT source, length(t) n,
    length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')) le,
    length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) di,
    length(t) - length(regexp_replace(t, '[ \\t\\n]', '', 'g')) ws
  FROM dirty)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n) AS BIGINT) AS n_chars,
  CAST(sum(le) AS BIGINT) AS letters, CAST(sum(di) AS BIGINT) AS digits,
  CAST(sum(ws) AS BIGINT) AS whitespace,
  CAST(sum(n - le - di - ws) AS BIGINT) AS symbols,
  CAST((sum(le) * 1000000) // sum(n) AS BIGINT) AS letter_share_q6,
  CAST((sum(n - le - di - ws) * 1000000) // sum(n) AS BIGINT) AS symbol_share_q6
FROM c GROUP BY 1 ORDER BY source""",

      // ---- round 14 (§2.54): repeated-measures rank pair ----
      // shared within-week doubled average ranks (epoch-week blocks,
      // full weeks only, 2·avg = 2·less + ties + 1); Friedman Q and
      // Page L over the same relation, each ONE double tree at the end.
      "ts_friedman_test" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt, count(*) y
  FROM ${T("orders")} GROUP BY 1),
d AS (SELECT y, (dt - DATE '1970-01-01') // 7 wk,
    (dt - DATE '1970-01-01') % 7 dow FROM daily),
fw AS (SELECT wk FROM d GROUP BY wk HAVING count(*) = 7),
f AS (SELECT d.* FROM d JOIN fw USING (wk)),
r AS (SELECT a.wk, a.dow,
    2 * sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
      + sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) + 1 r2
  FROM f a JOIN f b ON a.wk = b.wk GROUP BY a.wk, a.dow, a.y),
byd AS (SELECT dow, sum(r2) r2j FROM r GROUP BY 1),
x AS (SELECT (SELECT count(*) FROM fw) n, sum(r2j * r2j) ss,
    min(r2j) r2_min, max(r2j) r2_max FROM byd)
SELECT CAST(n AS BIGINT) AS n_weeks, CAST(ss AS BIGINT) AS sum_r2_sq,
  CAST(r2_min AS BIGINT) AS r2_min, CAST(r2_max AS BIGINT) AS r2_max,
  CAST(floor((3.0 * ss / (56.0 * n) - 24.0 * n) * 1e6) AS BIGINT) AS q_q6
FROM x""",

      "ts_page_trend" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt, count(*) y
  FROM ${T("orders")} GROUP BY 1),
d AS (SELECT y, (dt - DATE '1970-01-01') // 7 wk,
    (dt - DATE '1970-01-01') % 7 dow FROM daily),
fw AS (SELECT wk FROM d GROUP BY wk HAVING count(*) = 7),
f AS (SELECT d.* FROM d JOIN fw USING (wk)),
r AS (SELECT a.wk, a.dow,
    2 * sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
      + sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) + 1 r2
  FROM f a JOIN f b ON a.wk = b.wk GROUP BY a.wk, a.dow, a.y),
byd AS (SELECT dow, sum(r2) r2j FROM r GROUP BY 1),
x AS (SELECT (SELECT count(*) FROM fw) n,
    sum((dow + 1) * r2j) l2 FROM byd)
SELECT CAST(n AS BIGINT) AS n_weeks, CAST(l2 AS BIGINT) AS l2_x2,
  CAST(floor((l2 - 224.0 * n) / sqrt(1568.0 * n / 3) * 1e6) AS BIGINT)
    AS z_q6
FROM x""",

      // NFKC compatibility census: DuckDB has no NFKC, so the oracle
      // expands the PLANTED compatibility set by literal replaces
      // (verified equal to true NFKC on every planted snippet; the
      // base text is pure ASCII, an NFKC fixed point) - the md5 range
      // pins the JDK normalizer against hand-derived expansions.
      "pipeline_nfkc_census" ->
        s"""WITH dirty AS (SELECT source, doc_id, concat(text,
    CASE WHEN doc_id % 4 = 0 THEN ' \uFF37\uFF49\uFF44\uFF54\uFF48\uFF0D\uFF15\uFF16\u3000\uFF4F\uFF4B' ELSE '' END,
    CASE WHEN doc_id % 6 = 0 THEN ' \uFB01ne \uFB02ow o\uFB03ce' ELSE '' END,
    CASE WHEN doc_id % 9 = 0 THEN ' \u2116\uFF14 \u2122 \u00BD x\u00B2 cafe\u0301' ELSE '' END) t
  FROM ${T("documents")}),
n AS (SELECT source, t, replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(t, '\uFF37', 'W'), '\uFF49', 'i'), '\uFF44', 'd'), '\uFF54', 't'), '\uFF48', 'h'), '\uFF0D', '-'), '\uFF15', '5'), '\uFF16', '6'), '\u3000', ' '), '\uFF4F', 'o'), '\uFF4B', 'k'), '\uFB01', 'fi'), '\uFB02', 'fl'), '\uFB03', 'ffi'), '\u2116', 'No'), '\uFF14', '4'), '\u2122', 'TM'), '\u00BD', '1\u20442'), '\u00B2', '2'), 'e\u0301', '\u00E9') nt FROM dirty)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN nt <> t THEN 1 ELSE 0 END) AS BIGINT) AS docs_compat,
  CAST(sum(length(t)) AS BIGINT) AS chars_raw,
  CAST(sum(length(nt)) AS BIGINT) AS chars_nfkc,
  CAST(sum(length(nt)) - sum(length(t)) AS BIGINT) AS chars_delta,
  min(md5(nt)) AS fp_min, max(md5(nt)) AS fp_max
FROM n GROUP BY 1 ORDER BY source""",

      // Deterministic shard-pack manifest: md5 global order, running
      // token sum, integer floor-divide budget rule - content_md5
      // folds per-doc md5s IN pack order (string_agg ORDER BY), so it
      // pins the order itself, not just membership.
      "pipeline_export_manifest" ->
        s"""WITH t AS (SELECT doc_id, text,
    md5(concat('shard|', CAST(doc_id AS VARCHAR))) k,
    CAST(len(string_split(text, ' ')) AS BIGINT) tok
  FROM ${T("documents")}),
c AS (SELECT text, k, tok,
    sum(tok) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) - tok AS cumb FROM t),
s AS (SELECT text, k, tok, CAST(cumb // 2048 AS BIGINT) shard FROM c)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(tok) AS BIGINT) AS n_tokens,
  min(k) AS k_min, max(k) AS k_max,
  md5(string_agg(md5(text), '' ORDER BY k)) AS content_md5
FROM s GROUP BY 1 ORDER BY shard""",

      // ---- round 15 (§2.56): robust shape, rank & goodness-of-fit ----
      // Bowley/Kelly quantile skewness: quantile_cont == the
      // interpolated percentile (agg_median_quantile contract); each
      // coefficient is one double tree over identical doubles.
      "agg_quantile_skew" ->
        s"""WITH q AS (SELECT count(*) n,
    quantile_cont(o_totalprice, 0.10) q10,
    quantile_cont(o_totalprice, 0.25) q25,
    quantile_cont(o_totalprice, 0.50) q50,
    quantile_cont(o_totalprice, 0.75) q75,
    quantile_cont(o_totalprice, 0.90) q90
  FROM ${T("orders")})
SELECT n, floor(q10*100)/100 AS q10, floor(q25*100)/100 AS q25,
  floor(q50*100)/100 AS q50, floor(q75*100)/100 AS q75,
  floor(q90*100)/100 AS q90,
  CAST(floor((q75 + q25 - 2.0*q50) / (q75 - q25) * 1e6) AS BIGINT)
    AS bowley_q6,
  CAST(floor((q90 + q10 - 2.0*q50) / (q90 - q10) * 1e6) AS BIGINT)
    AS kelly_q6
FROM q""",

      // Grubbs statistics: exact HUGEINT sum/sum-of-squares (operand
      // promoted before the multiply), integer extrema, one double
      // tree per statistic.
      "agg_grubbs_max" ->
        s"""WITH e AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) v
  FROM ${T("orders")}),
t AS (SELECT count(*) n, sum(CAST(v AS HUGEINT)) sv,
    sum(CAST(v AS HUGEINT) * v) qv, max(v) mx, min(v) mn FROM e)
SELECT CAST(n AS BIGINT) AS n, CAST(mx AS BIGINT) AS max_cents,
  CAST(mn AS BIGINT) AS min_cents,
  CAST(floor((CAST(mx AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
    / sqrt((CAST(qv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) * 1e6) AS BIGINT)
    AS g_max_q6,
  CAST(floor((CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) - CAST(mn AS DOUBLE))
    / sqrt((CAST(qv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) * 1e6) AS BIGINT)
    AS g_min_q6
FROM t""",

      // Kruskal–Wallis: doubled average ranks from the value-grain
      // pooled cumulative (mann-whitney recipe), HUGEINT rank sums,
      // tie-corrected H in ONE double tree matching the Spark order.
      "agg_kruskal_wallis" ->
        s"""WITH e AS (SELECT o_orderstatus g,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) v
  FROM ${T("orders")}),
grain AS (SELECT v, count(*) c,
    sum(CASE WHEN g = 'F' THEN 1 ELSE 0 END) cf,
    sum(CASE WHEN g = 'O' THEN 1 ELSE 0 END) co,
    sum(CASE WHEN g = 'P' THEN 1 ELSE 0 END) cp
  FROM e GROUP BY 1),
cum AS (SELECT *, sum(c) OVER (ORDER BY v) - c AS b4 FROM grain),
t AS (SELECT
    sum(CAST(cf * (2*b4 + c + 1) AS HUGEINT)) r2f,
    sum(CAST(co * (2*b4 + c + 1) AS HUGEINT)) r2o,
    sum(CAST(cp * (2*b4 + c + 1) AS HUGEINT)) r2p,
    sum(CAST(c*c*c - c AS HUGEINT)) tie3,
    sum(cf) nf, sum(co) no_, sum(cp) np_ FROM cum),
x AS (SELECT nf, no_, np_, r2f, r2o, r2p, tie3,
    CAST(nf + no_ + np_ AS DOUBLE) nd,
    CAST(r2f AS DOUBLE) * CAST(r2f AS DOUBLE) / (4.0 * CAST(nf AS DOUBLE))
      + CAST(r2o AS DOUBLE) * CAST(r2o AS DOUBLE) / (4.0 * CAST(no_ AS DOUBLE))
      + CAST(r2p AS DOUBLE) * CAST(r2p AS DOUBLE) / (4.0 * CAST(np_ AS DOUBLE)) a
  FROM t)
SELECT CAST(nf + no_ + np_ AS BIGINT) AS n, CAST(nf AS BIGINT) AS n_f,
  CAST(no_ AS BIGINT) AS n_o, CAST(np_ AS BIGINT) AS n_p,
  CAST(r2f AS BIGINT) AS r2_f, CAST(r2o AS BIGINT) AS r2_o,
  CAST(r2p AS BIGINT) AS r2_p,
  CAST(floor((12.0 / (nd * (nd + 1.0)) * a - 3.0 * (nd + 1.0))
    / (1.0 - CAST(tie3 AS DOUBLE) / (nd * nd * nd - nd)) * 1e6) AS BIGINT)
    AS h_q6
FROM x""",

      // G-test vs uniform week: epoch-day %% 7 dow, per-cell terms
      // floor-quantized before the 7-cell sum (chi2 recipe).
      "agg_g_test_dow" ->
        s"""WITH c AS (SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 7 dow, count(*) o
  FROM ${T("orders")} GROUP BY 1),
tot AS (SELECT sum(o) n FROM c)
SELECT CAST(n AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k_cells,
  CAST(min(o) AS BIGINT) AS o_min, CAST(max(o) AS BIGINT) AS o_max,
  CAST(sum(CAST(floor(2.0 * o * ln(o * 7.0 / CAST(n AS DOUBLE)) * 1e6)
    AS BIGINT)) AS BIGINT) AS g_q6
FROM c, tot GROUP BY n""",

      // Kendall's W over the shared week-rank relation: exact integer
      // S*4, one double division.
      "ts_kendall_w" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt, count(*) y
  FROM ${T("orders")} GROUP BY 1),
d AS (SELECT y, (dt - DATE '1970-01-01') // 7 wk,
    (dt - DATE '1970-01-01') % 7 dow FROM daily),
fw AS (SELECT wk FROM d GROUP BY wk HAVING count(*) = 7),
f AS (SELECT d.* FROM d JOIN fw USING (wk)),
r AS (SELECT a.wk, a.dow,
    2 * sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
      + sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) + 1 r2
  FROM f a JOIN f b ON a.wk = b.wk GROUP BY a.wk, a.dow, a.y),
byd AS (SELECT dow, sum(r2) r2j FROM r GROUP BY 1),
x AS (SELECT (SELECT count(*) FROM fw) n,
    sum((r2j - 8 * (SELECT count(*) FROM fw))
      * (r2j - 8 * (SELECT count(*) FROM fw))) s4 FROM byd)
SELECT CAST(n AS BIGINT) AS n_weeks, CAST(s4 AS BIGINT) AS s_x4,
  CAST(floor(CAST(s4 AS DOUBLE)
    / (112.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
    AS w_q6
FROM x""",

      // Boilerplate-REMOVAL census: the rewrite itself — kept lines
      // re-joined in position order (generate_subscripts == posexplode
      // order), md5 range pins the rebuilt text.
      "pipeline_boilerplate_removal" ->
        s"""WITH dirty AS (SELECT source, doc_id, concat(text,
    CASE WHEN doc_id % 2 = 0 THEN concat(' | Copyright site', doc_id % 20, ' all rights reserved') ELSE '' END,
    CASE WHEN doc_id % 5 = 0 THEN ' | subscribe to our newsletter today' ELSE '' END,
    CASE WHEN doc_id % 7 = 0 THEN concat(' | unique footnote ', doc_id) ELSE '' END) t
  FROM ${T("documents")}),
ln AS (SELECT source, doc_id,
    generate_subscripts(string_split(t, ' | '), 1) p,
    trim(unnest(string_split(t, ' | '))) line FROM dirty),
df AS (SELECT source, line, count(DISTINCT doc_id) ndocs FROM ln GROUP BY 1, 2),
nd AS (SELECT source, count(*) n_docs FROM dirty GROUP BY 1),
reb AS (SELECT l.doc_id,
    string_agg(l.line, ' | ' ORDER BY l.p) rt
  FROM ln l JOIN df d ON l.source = d.source AND l.line = d.line
  JOIN nd n ON l.source = n.source
  WHERE NOT (d.ndocs >= 2 AND d.ndocs * 10 >= n.n_docs * 3)
  GROUP BY 1)
SELECT dirty.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN coalesce(reb.rt, '') <> dirty.t THEN 1 ELSE 0 END)
    AS BIGINT) AS docs_changed,
  CAST(sum(length(dirty.t)) AS BIGINT) AS chars_before,
  CAST(sum(length(coalesce(reb.rt, ''))) AS BIGINT) AS chars_after,
  min(md5(coalesce(reb.rt, ''))) AS fp_min,
  max(md5(coalesce(reb.rt, ''))) AS fp_max
FROM dirty LEFT JOIN reb ON dirty.doc_id = reb.doc_id
GROUP BY 1 ORDER BY source""",

      // ---- round 15 (§2.57): k-sample completion ----
      // Bartlett: exact HUGEINT moment sums pivoted to one row, one
      // deterministic double tree (chi2 / correction factor).
      "agg_bartlett" ->
        s"""WITH e AS (SELECT o_orderstatus g,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) v
  FROM ${T("orders")}),
grp AS (SELECT g, count(*) ng, sum(CAST(v AS HUGEINT)) sg,
    sum(CAST(v AS HUGEINT) * v) qg FROM e GROUP BY 1),
one AS (SELECT
    max(CASE WHEN g = 'F' THEN ng END) ng_f,
    max(CASE WHEN g = 'F' THEN sg END) sg_f,
    max(CASE WHEN g = 'F' THEN qg END) qg_f,
    max(CASE WHEN g = 'O' THEN ng END) ng_o,
    max(CASE WHEN g = 'O' THEN sg END) sg_o,
    max(CASE WHEN g = 'O' THEN qg END) qg_o,
    max(CASE WHEN g = 'P' THEN ng END) ng_p,
    max(CASE WHEN g = 'P' THEN sg END) sg_p,
    max(CASE WHEN g = 'P' THEN qg END) qg_p
  FROM grp),
x AS (SELECT ng_f, ng_o, ng_p,
    CAST(qg_f AS DOUBLE) - CAST(sg_f AS DOUBLE) * CAST(sg_f AS DOUBLE) / CAST(ng_f AS DOUBLE) a_f,
    CAST(qg_o AS DOUBLE) - CAST(sg_o AS DOUBLE) * CAST(sg_o AS DOUBLE) / CAST(ng_o AS DOUBLE) a_o,
    CAST(qg_p AS DOUBLE) - CAST(sg_p AS DOUBLE) * CAST(sg_p AS DOUBLE) / CAST(ng_p AS DOUBLE) a_p,
    CAST(ng_f + ng_o + ng_p AS DOUBLE) nd
  FROM one)
SELECT CAST(ng_f + ng_o + ng_p AS BIGINT) AS n,
  CAST(ng_f AS BIGINT) AS n_f, CAST(ng_o AS BIGINT) AS n_o,
  CAST(ng_p AS BIGINT) AS n_p,
  CAST(floor(((nd - 3.0) * ln((a_f + a_o + a_p) / (nd - 3.0)) -
    ((CAST(ng_f AS DOUBLE) - 1.0) * ln(a_f / (CAST(ng_f AS DOUBLE) - 1.0)) +
     (CAST(ng_o AS DOUBLE) - 1.0) * ln(a_o / (CAST(ng_o AS DOUBLE) - 1.0)) +
     (CAST(ng_p AS DOUBLE) - 1.0) * ln(a_p / (CAST(ng_p AS DOUBLE) - 1.0))))
    / (1.0 + (1.0 / (CAST(ng_f AS DOUBLE) - 1.0) +
      1.0 / (CAST(ng_o AS DOUBLE) - 1.0) +
      1.0 / (CAST(ng_p AS DOUBLE) - 1.0) - 1.0 / (nd - 3.0)) / 6.0)
    * 1e6) AS BIGINT) AS chi2_q6
FROM x""",

      // Jonckheere-Terpstra: per-group value-grain cumulatives, three
      // doubled U folds, untied null moments, one double tree.
      "agg_jonckheere" ->
        s"""WITH e AS (SELECT o_orderstatus g,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) v
  FROM ${T("orders")}),
grain AS (SELECT v,
    sum(CASE WHEN g = 'F' THEN 1 ELSE 0 END) cf,
    sum(CASE WHEN g = 'O' THEN 1 ELSE 0 END) co,
    sum(CASE WHEN g = 'P' THEN 1 ELSE 0 END) cp
  FROM e GROUP BY 1),
cum AS (SELECT v, cf, co, cp,
    sum(cf) OVER (ORDER BY v) cumf,
    sum(co) OVER (ORDER BY v) cumo FROM grain),
t AS (SELECT
    sum(CAST(co * (2*(cumf - cf) + cf) AS HUGEINT)) u2fo,
    sum(CAST(cp * (2*(cumf - cf) + cf) AS HUGEINT)) u2fp,
    sum(CAST(cp * (2*(cumo - co) + co) AS HUGEINT)) u2op,
    sum(cf) nf, sum(co) no_, sum(cp) np_ FROM cum),
x AS (SELECT nf, no_, np_, u2fo, u2fp, u2op,
    CAST(nf + no_ + np_ AS DOUBLE) nd FROM t)
SELECT CAST(nf + no_ + np_ AS BIGINT) AS n,
  CAST(nf AS BIGINT) AS n_f, CAST(no_ AS BIGINT) AS n_o,
  CAST(np_ AS BIGINT) AS n_p,
  CAST(u2fo + u2fp + u2op AS BIGINT) AS jt_x2,
  CAST(floor(((CAST(u2fo AS DOUBLE) + CAST(u2fp AS DOUBLE)
      + CAST(u2op AS DOUBLE)) / 2.0 -
    (nd * nd - (CAST(nf AS DOUBLE) * CAST(nf AS DOUBLE)
      + CAST(no_ AS DOUBLE) * CAST(no_ AS DOUBLE)
      + CAST(np_ AS DOUBLE) * CAST(np_ AS DOUBLE))) / 4.0)
    / sqrt((nd * nd * (2.0 * nd + 3.0) -
      (CAST(nf AS DOUBLE) * CAST(nf AS DOUBLE) * (2.0 * CAST(nf AS DOUBLE) + 3.0)
       + CAST(no_ AS DOUBLE) * CAST(no_ AS DOUBLE) * (2.0 * CAST(no_ AS DOUBLE) + 3.0)
       + CAST(np_ AS DOUBLE) * CAST(np_ AS DOUBLE) * (2.0 * CAST(np_ AS DOUBLE) + 3.0))) / 72.0)
    * 1e6) AS BIGINT) AS z_q6
FROM x""",

      // Cochran's Q: the above-week-median indicator read off the
      // strict-less count (no interpolated median), integer folds.
      "ts_cochran_q" ->
        s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) dt, count(*) y
  FROM ${T("orders")} GROUP BY 1),
d AS (SELECT y, (dt - DATE '1970-01-01') // 7 wk,
    (dt - DATE '1970-01-01') % 7 dow FROM daily),
fw AS (SELECT wk FROM d GROUP BY wk HAVING count(*) = 7),
f AS (SELECT d.* FROM d JOIN fw USING (wk)),
r AS (SELECT a.wk, a.dow,
    sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END) l
  FROM f a JOIN f b ON a.wk = b.wk GROUP BY a.wk, a.dow, a.y),
xx AS (SELECT wk, dow, CASE WHEN l >= 4 THEN 1 ELSE 0 END x FROM r),
rw AS (SELECT wk, sum(x) ri FROM xx GROUP BY 1),
cl AS (SELECT dow, sum(x) cj FROM xx GROUP BY 1),
t1 AS (SELECT sum(cj * cj) sc2, sum(cj) nn FROM cl),
t2 AS (SELECT count(*) n_weeks, sum(ri * ri) sr2 FROM rw)
SELECT CAST(n_weeks AS BIGINT) AS n_weeks, CAST(nn AS BIGINT) AS n_above,
  CAST(sc2 AS BIGINT) AS sum_c2, CAST(sr2 AS BIGINT) AS sum_r2,
  CAST(floor(6.0 * (7.0 * sc2 - CAST(nn AS DOUBLE) * nn)
    / (7.0 * nn - CAST(sr2 AS DOUBLE)) * 1e6) AS BIGINT) AS q_q6
FROM t1, t2""",

      // ---- round 15 (§2.58): sentence grain & export balance ----
      // Sentencified fixture: 1-based list_transform index (DuckDB's
      // native convention; Spark uses i+1) — md5 range pins alignment.
      "pipeline_sentence_profile" ->
        s"""WITH t AS (SELECT source,
    rtrim(array_to_string(list_transform(string_split(text, ' '),
      (x, i) -> concat(x, CASE WHEN i % 17 = 0 THEN '! '
        WHEN i % 7 = 0 THEN '. ' WHEN i % 5 = 0 THEN ', '
        ELSE ' ' END)), '')) st,
    CAST(len(string_split(text, ' ')) AS BIGINT) nt
  FROM ${T("documents")})
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(nt) AS BIGINT) AS n_tokens,
  CAST(sum(length(st) - length(regexp_replace(st, '[.!]', '', 'g')))
    AS BIGINT) AS n_sentences,
  CAST(sum(length(st) - length(replace(st, ',', ''))) AS BIGINT)
    AS n_commas,
  CAST((sum(nt) * 1000000)
    // sum(length(st) - length(regexp_replace(st, '[.!]', '', 'g')))
    AS BIGINT) AS toks_per_sent_q6,
  min(md5(st)) AS fp_min, max(md5(st)) AS fp_max
FROM t GROUP BY 1 ORDER BY source""",

      // Coleman-Liau: char-class counts, one double tree per source.
      "pipeline_readability" ->
        s"""WITH t AS (SELECT source,
    rtrim(array_to_string(list_transform(string_split(text, ' '),
      (x, i) -> concat(x, CASE WHEN i % 17 = 0 THEN '! '
        WHEN i % 7 = 0 THEN '. ' WHEN i % 5 = 0 THEN ', '
        ELSE ' ' END)), '')) st,
    CAST(len(string_split(text, ' ')) AS BIGINT) w
  FROM ${T("documents")}),
agg AS (SELECT source, count(*) n_docs, sum(w) words,
    sum(length(st) - length(regexp_replace(st, '[A-Za-z]', '', 'g'))) letters,
    sum(length(st) - length(regexp_replace(st, '[.!]', '', 'g'))) sentences
  FROM t GROUP BY 1)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(words AS BIGINT) AS words, CAST(letters AS BIGINT) AS letters,
  CAST(sentences AS BIGINT) AS sentences,
  CAST(floor((0.0588 * (CAST(letters AS DOUBLE) * 100.0 / words) -
    0.296 * (CAST(sentences AS DOUBLE) * 100.0 / words) - 15.8) * 1e6)
    AS BIGINT) AS cli_q6
FROM agg ORDER BY source""",

      // Shard-balance readout over the deterministic pack's manifest.
      "pipeline_export_balance" ->
        s"""WITH t AS (SELECT doc_id, text,
    md5(concat('shard|', CAST(doc_id AS VARCHAR))) k,
    CAST(len(string_split(text, ' ')) AS BIGINT) tok
  FROM ${T("documents")}),
c AS (SELECT k, tok,
    sum(tok) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) - tok AS cumb FROM t),
man AS (SELECT CAST(cumb // 2048 AS BIGINT) shard,
    count(*) n_docs, sum(tok) n_tokens FROM c GROUP BY 1),
agg AS (SELECT count(*) n_shards,
    min(n_tokens) tok_min, max(n_tokens) tok_max,
    min(n_docs) doc_min, max(n_docs) doc_max,
    sum(n_tokens) st, sum(n_tokens * n_tokens) qt FROM man)
SELECT CAST(n_shards AS BIGINT) AS n_shards,
  CAST(tok_min AS BIGINT) AS tok_min, CAST(tok_max AS BIGINT) AS tok_max,
  CAST(doc_min AS BIGINT) AS doc_min, CAST(doc_max AS BIGINT) AS doc_max,
  CAST(((tok_max - tok_min) * 1000000) // 2048 AS BIGINT) AS spread_q6,
  CAST(floor(sqrt((CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
      / CAST(n_shards AS DOUBLE)) / CAST(n_shards AS DOUBLE))
    / (CAST(st AS DOUBLE) / CAST(n_shards AS DOUBLE)) * 1e6) AS BIGINT)
    AS cv_q6
FROM agg""",

      // ---- round 16 (§2.59): tokenizer-true export & weighted mix ----
      // Same deterministic pack as pipeline_export_manifest, budgets in
      // SUBWORD tokens: the frozen vocab's greedy longest-match pattern
      // (pipeline_subword_count contract) is engine-identical.
      "pipeline_export_tokenized" ->
        s"""WITH t AS (SELECT doc_id, text,
    md5(concat('shard|', CAST(doc_id AS VARCHAR))) k,
    CAST(len(regexp_extract_all(text, '${graft.ops.Pipelines.subwordPattern}')) AS BIGINT) tok
  FROM ${T("documents")}),
c AS (SELECT text, k, tok,
    sum(tok) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) - tok AS cumb FROM t),
s AS (SELECT text, k, tok, CAST(cumb // 2048 AS BIGINT) shard FROM c)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(tok) AS BIGINT) AS n_tokens,
  min(k) AS k_min, max(k) AS k_max,
  md5(string_agg(md5(text), '' ORDER BY k)) AS content_md5
FROM s GROUP BY 1 ORDER BY shard""",

      // Weighted token-budgeted mixture manifest: per-source targets by
      // integer div of a 30%-of-corpus budget, greedy md5-order cutoff
      // replayed as a partitioned running-sum window — all BIGINT.
      "pipeline_mix_manifest" ->
        s"""WITH t AS (SELECT source, doc_id, text,
    md5(concat('mix|', CAST(doc_id AS VARCHAR))) mk,
    CAST(len(string_split(text, ' ')) AS BIGINT) tok
  FROM ${T("documents")}),
cum AS (SELECT source, tok,
    sum(tok) OVER (PARTITION BY source ORDER BY mk
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS cumb
  FROM t),
srcw AS (SELECT source, count(*) n_docs, sum(tok) avail,
    (length(source) % 3) + 1 AS w FROM t GROUP BY source),
tgt AS (SELECT source, w, n_docs, avail,
    (((SELECT (sum(tok) * 3) // 10 FROM t) * w)
      // (SELECT sum(w) FROM srcw)) AS target
  FROM srcw),
sel AS (SELECT c.source, c.tok,
    CASE WHEN c.cumb < g.target THEN 1 ELSE 0 END tk
  FROM cum c JOIN tgt g USING (source))
SELECT g.source, CAST(g.w AS BIGINT) AS w,
  CAST(g.n_docs AS BIGINT) AS n_docs,
  CAST(g.avail AS BIGINT) AS avail_tokens,
  CAST(g.target AS BIGINT) AS target_tokens,
  CAST(sum(s.tk) AS BIGINT) AS docs_taken,
  CAST(sum(s.tk * s.tok) AS BIGINT) AS achieved_tokens,
  CAST(CASE WHEN g.target > 0
    THEN (sum(s.tk * s.tok) * 1000000) // g.target ELSE 0 END AS BIGINT)
    AS fill_ppm
FROM sel s JOIN tgt g USING (source)
GROUP BY g.source, g.w, g.n_docs, g.avail, g.target
ORDER BY g.source""",

      // Selected-corpus census: membership + cutoff pinned by the md5
      // range of TAKEN texts and the order-key range.
      "pipeline_mix_census" ->
        s"""WITH t AS (SELECT source, doc_id, text,
    md5(concat('mix|', CAST(doc_id AS VARCHAR))) mk,
    CAST(len(string_split(text, ' ')) AS BIGINT) tok
  FROM ${T("documents")}),
cum AS (SELECT source, doc_id, text, mk, tok,
    sum(tok) OVER (PARTITION BY source ORDER BY mk
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS cumb
  FROM t),
srcw AS (SELECT source, (length(source) % 3) + 1 AS w FROM t GROUP BY source),
tgt AS (SELECT source, (((SELECT (sum(tok) * 3) // 10 FROM t) * w)
      // (SELECT sum(w) FROM srcw)) AS target
  FROM srcw),
sel AS (SELECT c.* FROM cum c JOIN tgt g USING (source)
  WHERE c.cumb < g.target)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(tok) AS BIGINT) AS n_tokens,
  min(md5(text)) AS fp_min, max(md5(text)) AS fp_max,
  min(mk) AS k_min, max(mk) AS k_max
FROM sel GROUP BY 1 ORDER BY source""",

      // ---- round 16 (§2.60): sentence dedup, LM tiers, ECDF-L2 ----
      // Sentence grain: the §2.58 sentencified fixture split on
      // terminal+space, keys normalized by stripping [.!,], >=3-token
      // sentences; df-capped [2,20] equal-sentence doc pairs.
      "dedup_sentence_spans" ->
        s"""WITH t AS (SELECT doc_id,
    rtrim(array_to_string(list_transform(string_split(text, ' '),
      (x, i) -> concat(x, CASE WHEN i % 17 = 0 THEN '! '
        WHEN i % 7 = 0 THEN '. ' WHEN i % 5 = 0 THEN ', '
        ELSE ' ' END)), '')) st
  FROM ${T("documents")}),
sr AS (SELECT doc_id,
    trim(regexp_replace(unnest(str_split_regex(st, '[.!] ')),
      '[.!,]', '', 'g')) sent
  FROM t),
sq AS (SELECT doc_id, md5(sent) h,
    CAST(len(string_split(sent, ' ')) AS BIGINT) tok
  FROM sr WHERE sent <> '' AND len(string_split(sent, ' ')) >= 3),
ds AS (SELECT DISTINCT doc_id, h, tok FROM sq),
keep AS (SELECT h FROM ds GROUP BY h HAVING count(*) BETWEEN 2 AND 20)
SELECT a.doc_id AS d1, b.doc_id AS d2,
  CAST(count(*) AS BIGINT) AS n_shared,
  CAST(sum(a.tok) AS BIGINT) AS shared_tokens,
  min(a.h) AS h_min
FROM ds a JOIN keep k ON a.h = k.h JOIN ds b ON a.h = b.h
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 ORDER BY 1, 2""",

      // C4-style sentence excision: sentences in >=2 distinct docs
      // excised everywhere, docs rebuilt in order — fp range pins the
      // rewrite (string_agg skips the CASE-nulled dup sentences).
      "pipeline_sentence_excision" ->
        s"""WITH t AS (SELECT source, doc_id,
    rtrim(array_to_string(list_transform(string_split(text, ' '),
      (x, i) -> concat(x, CASE WHEN i % 17 = 0 THEN '! '
        WHEN i % 7 = 0 THEN '. ' WHEN i % 5 = 0 THEN ', '
        ELSE ' ' END)), '')) st
  FROM ${T("documents")}),
sr AS (SELECT source, doc_id,
    generate_subscripts(str_split_regex(st, '[.!] '), 1) p,
    trim(regexp_replace(unnest(str_split_regex(st, '[.!] ')),
      '[.!,]', '', 'g')) sent
  FROM t),
sq AS (SELECT source, doc_id, p, sent, md5(sent) h,
    CAST(len(string_split(sent, ' ')) AS BIGINT) tok
  FROM sr WHERE sent <> '' AND len(string_split(sent, ' ')) >= 3),
dup AS (SELECT h FROM sq GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
fl AS (SELECT sq.*, (dup.h IS NOT NULL) rm
  FROM sq LEFT JOIN dup ON sq.h = dup.h),
perdoc AS (SELECT doc_id, source, count(*) s_tot,
    sum(CASE WHEN rm THEN 1 ELSE 0 END) s_rm,
    sum(tok) t_tot, sum(CASE WHEN rm THEN tok ELSE 0 END) t_rm,
    coalesce(string_agg(CASE WHEN NOT rm THEN sent END, '. ' ORDER BY p),
      '') rt
  FROM fl GROUP BY 1, 2)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(s_tot) AS BIGINT) AS sentences,
  CAST(sum(s_rm) AS BIGINT) AS sentences_removed,
  CAST(sum(t_tot) AS BIGINT) AS tokens,
  CAST(sum(t_rm) AS BIGINT) AS tokens_removed,
  CAST(sum(CASE WHEN s_rm > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS docs_changed,
  min(md5(rt)) AS fp_min, max(md5(rt)) AS fp_max
FROM perdoc GROUP BY 1 ORDER BY source""",

      // LM-quality tier mix: the kneser_ney rational scored over ALL
      // docs (the lmFilter semantics), doc-grain integer mean NLL cut
      // at fixed BIGINT thresholds, tier x source census.
      "pipeline_ppl_tier_mix" ->
        s"""WITH toks AS (SELECT doc_id, source,
    (('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10 < 8) is_train,
    string_split(text, ' ') l
  FROM ${T("documents")}),
big AS (SELECT doc_id, source, is_train, l[i] w1, l[i+1] w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) i)),
c12 AS (SELECT w1, w2, count(*) c12 FROM big WHERE is_train GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12) c1, count(*) n1f FROM c12 GROUP BY 1),
nb AS (SELECT w2, count(*) n1b FROM c12 GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM c12) ntypes,
  (SELECT count(DISTINCT w) FROM (SELECT w1 w FROM big WHERE is_train
    UNION SELECT w2 FROM big WHERE is_train)) v),
sc AS (SELECT b.doc_id, b.source,
    CAST(floor(-ln(
      CAST(CASE WHEN c1.c1 IS NOT NULL
        THEN greatest(4 * coalesce(c12.c12, 0) - 3, 0)
          * (tot.ntypes + tot.v + 1)
          + 3 * c1.n1f * (coalesce(nb.n1b, 0) + 1)
        ELSE coalesce(nb.n1b, 0) + 1 END AS DOUBLE) /
      CAST(CASE WHEN c1.c1 IS NOT NULL
        THEN 4 * c1.c1 * (tot.ntypes + tot.v + 1)
        ELSE tot.ntypes + tot.v + 1 END AS DOUBLE)) * 1e6) AS BIGINT) lq
  FROM big b LEFT JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
  LEFT JOIN c1 ON c1.w1 = b.w1
  LEFT JOIN nb ON nb.w2 = b.w2
  CROSS JOIN tot),
docg AS (SELECT doc_id, source, count(*) m, sum(lq) sq
  FROM sc GROUP BY 1, 2),
tiered AS (SELECT source,
    CASE WHEN sq // m < ${graft.ops.Pipelines.PplTierLow} THEN 'low'
      WHEN sq // m < ${graft.ops.Pipelines.PplTierHigh} THEN 'mid'
      ELSE 'high' END tier, m, sq
  FROM docg)
SELECT source, tier, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(m) AS BIGINT) AS bigrams,
  CAST(sum(sq) // sum(m) AS BIGINT) AS mean_nll_q6
FROM tiered GROUP BY 1, 2 ORDER BY 1, 2""",

      // Cramér–von Mises: the L2 ECDF distance on the shared
      // click-vs-purchase value grain; per-value terms floor-quantized
      // at 1e9 before the sum, one double tree for T.
      "agg_cvm_test" ->
        s"""WITH g AS (SELECT value AS v,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM ${T("events")}
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1),
c AS (SELECT v, c1, c2,
  CAST(sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum1,
  CAST(sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum2
  FROM g),
t AS (SELECT max(cum1) AS n1, max(cum2) AS n2 FROM c),
dq AS (SELECT c1, c2,
  CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2 AS dv FROM c, t),
s AS (SELECT sum(CAST(floor(CAST(c1 + c2 AS DOUBLE) * dv * dv * 1e9)
    AS BIGINT)) AS sq FROM dq)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  CAST(floor(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) /
    (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)) *
    (CAST(sq AS DOUBLE) / 1e9) * 1e6) AS BIGINT) AS cvm_q6
FROM t, s"""
    )
  }
}
