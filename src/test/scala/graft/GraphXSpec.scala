package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{GraphOps, GraphXOps}

/** GraphX/Pregel twins agree with the oracle-checked DataFrame graph
  * queries (BASELINE.json spark_approach). */
class GraphXSpec extends AnyFunSuite {
  import SharedSpark._

  test("GraphX degrees equal DataFrame graph_degree") {
    val dfTop = GraphOps.graphDegree(spark, sf0001).select("node", "degree")
    val gxTop = GraphXOps.degrees(spark, sf0001)
      .orderBy(col("degree").desc, col("node")).limit(50)
    assert(gxTop.exceptAll(dfTop).count() == 0)
    assert(dfTop.exceptAll(gxTop).count() == 0)
  }

  test("GraphX connected components: consistent with label-prop partial fixpoint") {
    val gx = GraphXOps.connectedComponents(spark, sf0001)
    val nComponents = gx.select("component").distinct().count()
    // 4-round min-label-prop yields >= the true component count
    // (labels may not have fully propagated in large components)
    val lp = GraphOps.graphCcLabelprop(spark, sf0001)
    val lpComponents = lp.count()
    assert(nComponents <= lpComponents)
    // node partition sizes must cover every vertex exactly once
    val ud = Tables.ud(spark, sf0001)
    val nNodes = ud.select(col("s")).union(ud.select(col("t"))).distinct().count()
    assert(gx.count() == nNodes)
  }

  test("Iterate.converge label-prop reaches the GraphX CC fixpoint") {
    // run-to-convergence DataFrame label-prop must induce the identical
    // node partition as GraphX connectedComponents (labels are both
    // min-ids, so they agree exactly)
    val lp = GraphOps.ccConverged(spark, sf0001)
      .select(col("v").as("node"), col("lbl").as("component"))
    val gx = GraphXOps.connectedComponents(spark, sf0001)
    assert(lp.exceptAll(gx).count() == 0)
    assert(gx.exceptAll(lp).count() == 0)
  }

  test("reachable (unbounded traversal) covers the component; bfs_3hop is its prefix") {
    val dfBfs = GraphOps.graphBfs3hop(spark, sf0001)
    val start = dfBfs.filter(col("depth") === 0).collect()(0).getLong(0)
    val all = GraphOps.reachable(spark, sf0001, start)
    // full reach = exactly the GraphX component of start
    val gx = GraphXOps.connectedComponents(spark, sf0001)
    val comp = gx.filter(col("node") === start).collect()(0).getLong(1)
    assert(all.count() == gx.filter(col("component") === comp).count())
    // the oracle-checked 3-hop query is the depth<=3 prefix
    val prefix = all.filter(col("depth") <= 3).select(col("v"), col("depth"))
    assert(prefix.exceptAll(dfBfs.select(col("v"), col("depth"))).count() == 0)
    assert(dfBfs.select(col("v"), col("depth")).exceptAll(prefix).count() == 0)
  }

  test("GraphX triangle count equals DataFrame graph_triangles") {
    val df = GraphOps.graphTriangles(spark, sf0001).collect()(0).getLong(0)
    assert(GraphXOps.triangleTotal(spark, sf0001) == df)
  }

  test("GraphX Pregel BFS depths equal DataFrame graph_bfs_3hop") {
    val dfBfs = GraphOps.graphBfs3hop(spark, sf0001)
    val start = dfBfs.filter(col("depth") === 0).collect()(0).getLong(0)
    val gxBfs = GraphXOps.bfsDepths(spark, sf0001, start, maxDepth = 3)
      .filter(col("depth") <= 3)
    assert(gxBfs.count() == dfBfs.count())
    assert(gxBfs.exceptAll(dfBfs.select(col("v"), col("depth"))).count() == 0)
  }

  test("GraphX static PageRank ranks the same top node") {
    val dfTop = GraphOps.graphPagerank3(spark, sf0001).collect()(0).getLong(0)
    val gxTop = GraphXOps.pagerank(spark, sf0001, iters = 20)
      .orderBy(col("rank").desc, col("node")).collect()(0).getLong(0)
    assert(gxTop == dfTop)
  }

  test("GraphX weighted PageRank matches the DataFrame weighted ranking") {
    // same iteration count on both sides: values should agree to
    // float-order tolerance, and the top-10 ranking should match
    val df = GraphOps.graphWeightedPagerank3(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val gx = GraphXOps.weightedPagerank(spark, sf0001, iters = 3).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Double]("rank"))).toMap
    df.take(10).foreach { case (node, rank) =>
      assert(math.abs(gx(node) - rank) < 1e-6,
        s"node $node: graphx ${gx(node)} vs df $rank")
    }
    val gxTop10 = gx.toSeq.sortBy { case (n, r) => (-r, n) }.take(10).map(_._1)
    assert(gxTop10 == df.take(10).map(_._1).toSeq)
  }

  test("GraphX Katz-3 is BIT-EXACT against the DataFrame graph_katz_3") {
    // walk counts are integers — unlike the float pagerank twins, the
    // two execution models must agree exactly, not to tolerance
    val df = GraphOps.graphKatz3(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val gx = GraphXOps.katz3(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("katz_q3"))).toMap
    assert(df.nonEmpty)
    df.foreach { case (node, q) =>
      assert(gx(node) == q, s"node $node: graphx ${gx(node)} vs df $q")
    }
    // and the DataFrame top-20 IS the global top-20 of the twin
    val gxTop = gx.toSeq.sortBy { case (n, q) => (-q, n) }.take(20).map(_._1)
    assert(gxTop == df.map(_._1).toSeq)
  }
}
