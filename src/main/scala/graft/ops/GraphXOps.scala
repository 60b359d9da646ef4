package graft.ops

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** GraphX/Pregel implementations of the graph analytics
  * (BASELINE.json "spark_approach": GraphX/Pregel for analytics).
  *
  * The oracle-checked §2.8 queries use fixed-iteration DataFrame loops
  * because DuckDB must compute the *identical* partial fixpoint; these
  * GraphX twins are the cluster-scale execution path (vertex-cut
  * partitioning, Pregel message combining) and are asserted equivalent
  * to the DataFrame results in GraphXSpec. Same co-purchase graph
  * (Tables.edges), built once and shared.
  */
object GraphXOps {

  /** Undirected co-purchase graph as a GraphX Graph (both edge
    * directions materialized, matching the symmetrized `ud` view). */
  def graph(spark: SparkSession, sfDir: String): Graph[Long, Long] = {
    val ud = Tables.ud(spark, sfDir)
    val edges: RDD[Edge[Long]] = ud.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1L))
    Graph.fromEdges(edges, defaultValue = 0L)
  }

  /** Degree per node (out-degree of the symmetrized graph == undirected
    * degree) — GraphX twin of graph_degree. */
  def degrees(spark: SparkSession, sfDir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    graph(spark, sfDir).outDegrees
      .toDF("node", "degree")
      .select(col("node"), col("degree").cast("long").as("degree"))
  }

  /** Connected components via GraphX's Pregel implementation (run to
    * convergence — unlike the oracle's 4-round partial fixpoint, this
    * is the true component structure). */
  def connectedComponents(spark: SparkSession, sfDir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    graph(spark, sfDir).connectedComponents()
      .vertices.toDF("node", "component")
  }

  /** Triangle count per vertex; global count = sum/3 (each triangle
    * counted at its 3 vertices). GraphX twin of graph_triangles. */
  def triangleTotal(spark: SparkSession, sfDir: String): Long = {
    // canonical orientation requires srcId < dstId and partitioning
    val g = graph(spark, sfDir)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
    g.triangleCount().vertices.map(_._2.toLong).reduce(_ + _) / 3
  }

  /** Static PageRank, damping 0.85 — GraphX twin of graph_pagerank3.
    * Float summation order differs from the decimal-stabilized oracle
    * form, so equivalence is asserted on ranking/value tolerance, not
    * hashes. */
  def pagerank(spark: SparkSession, sfDir: String, iters: Int): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    graph(spark, sfDir).staticPageRank(iters, resetProb = 0.15)
      .vertices.toDF("node", "rank")
  }

  /** Single-source shortest hop-distance via Pregel — the
    * message-passing twin of graph_bfs_3hop. */
  def bfsDepths(spark: SparkSession, sfDir: String, source: Long, maxDepth: Int): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val g = graph(spark, sfDir).mapVertices((id, _) =>
      if (id == source) 0L else Long.MaxValue)
    val res = g.pregel(Long.MaxValue, maxIterations = maxDepth)(
      (_, dist, msg) => math.min(dist, msg),
      triplet =>
        if (triplet.srcAttr != Long.MaxValue && triplet.srcAttr + 1 < triplet.dstAttr)
          Iterator((triplet.dstId, triplet.srcAttr + 1))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices.filter(_._2 != Long.MaxValue).toDF("v", "depth")
      .select(col("v"), col("depth").cast("int").as("depth"))
  }

  /** WEIGHTED static PageRank via aggregateMessages (round 9) — the
    * cluster twin of GraphOps.graphWeightedPagerank3. Edge attr is the
    * weight PRE-normalized by the source's out-strength, so each
    * round is one message pass `rank(u)·wNorm(u→v)` + combiner sum —
    * the vertex-cut form of the 3 t-keyed shuffles the DataFrame
    * version pays. Float summation order differs from the
    * decimal-stabilized oracle form, so equivalence (GraphXSpec) is
    * asserted on ranking, not hashes. */
  def weightedPagerank(spark: SparkSession, sfDir: String, iters: Int): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val e = Tables.edges(spark, sfDir)._1
    val udw = e.select(col("s"), col("t"), col("w"))
      .union(e.select(col("t").as("s"), col("s").as("t"), col("w")))
    val strength = udw.groupBy(col("s")).agg(sum(col("w")).as("str"))
    val edges: RDD[Edge[Double]] = udw.join(strength, "s")
      .select(col("s"), col("t"),
        (col("w").cast("double") / col("str").cast("double")).as("wn"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    val g = Graph.fromEdges(edges, defaultValue = 0.0)
    val n = g.vertices.count()
    val base = 0.15 / n
    var ranks = g.mapVertices((_, _) => 1.0 / n)
    for (_ <- 1 to iters) {
      val contribs = ranks.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr * ctx.attr), _ + _)
      ranks = ranks.outerJoinVertices(contribs)(
        (_, _, c) => base + 0.85 * c.getOrElse(0.0))
    }
    ranks.vertices.toDF("node", "rank")
  }

  /** Katz centrality via aggregateMessages (round 10) — the cluster
    * twin of GraphOps.graphKatz3. Walk counts are INTEGERS, so unlike
    * the pagerank twins (float summation order) this twin is
    * bit-exact against the DataFrame version: katz_q3 =
    * w1·100 + w2·10 + w3 must match EXACTLY, which GraphXSpec
    * asserts. Each walk step is one message pass with a Long-sum
    * combiner — the vertex-cut form of the DataFrame version's
    * t-keyed equi-joins. */
  def katz3(spark: SparkSession, sfDir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val g = graph(spark, sfDir).mapVertices((_, _) => 1L)
    def step(v: Graph[Long, Long]): Graph[Long, Long] = {
      val msgs = v.aggregateMessages[Long](
        ctx => ctx.sendToDst(ctx.srcAttr), _ + _)
      v.outerJoinVertices(msgs)((_, _, m) => m.getOrElse(0L))
    }
    val w1 = step(g)
    val w2 = step(w1)
    val w3 = step(w2)
    w1.vertices.innerJoin(w2.vertices.innerJoin(w3.vertices)((_, a, b) => (a, b))) {
      case (_, a, (b, c)) => a * 100 + b * 10 + c
    }.filter { case (_, q) => q > 0 }
      .toDF("node", "katz_q3")
  }
}
