package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** TRUE recursive CTEs (Spark 4.1 `WITH RECURSIVE`, lowered by
  * Catalyst to a UnionLoop fixpoint) — the declarative twin of the
  * fixed-unroll graph queries and the Iterate API. naqed's signature
  * capability is unbounded-depth traversal; this is its SQL-native
  * spelling, and the SAME text (modulo the edges CTE) runs on DuckDB,
  * so both engines execute a genuinely recursive plan rather than one
  * engine faking it with unrolls.
  *
  * Scale notes: each recursion level is a distinct-projected frontier
  * join — per-level cost is one shuffle over the frontier, state is
  * bounded by (nodes x depth guard). The depth guard (< 6) is what
  * keeps UNION ALL recursion terminating on a CYCLIC graph: level
  * rows are DISTINCT per depth, so the loop emits at most nodes rows
  * per level and stops at the guard even where cycles exist. */
object Recursive {

  /** Min-hop depth (<= 6) from the max-degree node over the UNDIRECTED
    * co-occurrence graph — graph_bfs_3hop's unbounded-flavor sibling,
    * expressed as a recursive CTE instead of unrolled joins. */
  val graphReachRcte: Q = (s, d) => {
    val view = "ud_rcte"
    Tables.ud(s, d).createOrReplaceTempView(view)
    s.sql(
      s"""WITH RECURSIVE reach(v, depth) AS (
         |  SELECT v, 0 AS depth FROM (
         |    SELECT s AS v FROM $view
         |    GROUP BY s ORDER BY count(*) DESC, s LIMIT 1)
         |  UNION ALL
         |  SELECT DISTINCT u.t AS v, r.depth + 1 AS depth
         |  FROM reach r JOIN $view u ON u.s = r.v
         |  WHERE r.depth < 6)
         |SELECT v, min(depth) AS depth
         |FROM reach GROUP BY v ORDER BY depth, v""".stripMargin)
  }

  /** Recursive month dimension (a series the engine GENERATES, not
    * scans) left-joined against per-month order aggregates — the
    * calendar-spine shape: months with zero orders must appear. */
  val rcteMonthSpine: Q = (s, d) => {
    val view = "orders_rcte"
    Tables(s, d, "orders").createOrReplaceTempView(view)
    s.sql(
      s"""WITH RECURSIVE months(m) AS (
         |  SELECT TIMESTAMP '1995-01-01 00:00:00' AS m
         |  UNION ALL
         |  SELECT m + INTERVAL '1' MONTH FROM months
         |  WHERE m < TIMESTAMP '2001-12-01 00:00:00')
         |SELECT cast(m AS DATE) AS month,
         |       count(o_orderkey) AS n_orders,
         |       round(cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         |         AS total_price
         |FROM months LEFT JOIN $view
         |  ON date_trunc('month', o_orderdate) = m
         |GROUP BY m ORDER BY month""".stripMargin)
  }
}
