package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected components (large-star/small-star) checked against an
  * in-JVM union-find on structured edge cases and seeded random graphs.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference labels: component = min node id, via union-find. */
  private def unionFind(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots chosen as min(ra, rb) at every union, so find() IS the min id
    nodes.map(n => n -> find(n)).toMap
  }

  /** `distributed = true` forces the shuffle-native star path
    * (driverUnionFindMax = 0); default exercises whichever path the
    * size heuristic picks (the driver fast path at these sizes).
    */
  private def ccOf(edges: Seq[(Long, Long)],
      distributed: Boolean = false): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("a", "b"), "a", "b",
        driverUnionFindMax = if (distributed) 0L else 1L << 20)
      .as[(Long, Long)].collect().toMap

  test("single edge, duplicate and reversed edges, self-loops") {
    val got = ccOf(Seq((2L, 1L), (1L, 2L), (2L, 2L), (2L, 1L)))
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("empty edge set yields empty result") {
    assert(ccOf(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("path graph (worst-case diameter) collapses to one component") {
    // a 64-node chain: diameter 63, converges only if the star rounds
    // actually hop components together (not mere neighbor propagation).
    // Forced through the DISTRIBUTED path — the convergence logic is
    // what this worst case exists to stress.
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = ccOf(chain, distributed = true)
    assert(got === (0L to 63L).map(_ -> 0L).toMap)
  }

  test("driver fast path and distributed star path produce identical labels") {
    for (seed <- 4 to 6) {
      val rnd = new Random(seed)
      val edges = Seq.fill(80)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter { case (a, b) => a != b }
      assert(ccOf(edges) === ccOf(edges, distributed = true), s"seed=$seed")
    }
  }

  test("two separate cliques stay separate") {
    val c1 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val c2 = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val got = ccOf(c1 ++ c2)
    assert(got.filter(_._1 < 10).values.toSet === Set(0L))
    assert(got.filter(_._1 >= 10).values.toSet === Set(10L))
  }

  test("matches union-find on seeded random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val n = 120
      // sparse: ~0.8 edges/node leaves many small components + singletons
      val edges = Seq.fill(96)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      assert(ccOf(edges) === unionFind(nodes, edges), s"seed=$seed")
    }
  }

  test("non-Comparable id type (array) falls through to the star path") {
    // array<bigint> ids are Catalyst-orderable (least/min work) but
    // externalize to Seq — not java.lang.Comparable — so the schema
    // gate must route around the driver union-find even under the
    // size threshold; labels are still min-id per component
    val df = Seq(
      (Seq(2L), Seq(1L)), (Seq(3L), Seq(2L)), (Seq(9L), Seq(8L)))
      .toDF("a", "b")
    val got = GraphOps.connectedComponents(df, "a", "b")
      .as[(Seq[Long], Seq[Long])].collect().toMap
    assert(got === Map(Seq(1L) -> Seq(1L), Seq(2L) -> Seq(1L),
      Seq(3L) -> Seq(1L), Seq(8L) -> Seq(8L), Seq(9L) -> Seq(8L)))
  }

  test("labels every node present in edges, roots included") {
    val got = GraphOps.connectedComponents(
      Seq((5L, 9L), (9L, 7L)).toDF("a", "b"), "a", "b")
    val rows = got.as[(Long, Long)].collect().toMap
    assert(rows === Map(5L -> 5L, 9L -> 5L, 7L -> 5L))
  }

  private def triOf(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    GraphOps.triangleStats(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("triangleStats: complete graph K5 — all clustering 1.0") {
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = triOf(k5)
    assert(got.keySet === (0L to 4L).toSet)
    // every node: degree 4, C(4,2)=6 triangles through it, coefficient 1
    got.values.foreach { case (deg, tri, c) =>
      assert(deg == 4L && tri == 6L && c == 1.0)
    }
  }

  test("triangleStats: path graph has no triangles; leaf clustering is 0") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val got = triOf(path)
    assert(got.values.forall { case (_, tri, c) => tri == 0L && c == 0.0 })
    assert(got(1L)._1 == 2L && got(0L)._1 == 1L)
  }

  test("triangleStats: duplicate, reversed and self-loop edges are tolerated") {
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 2L), (2L, 0L), (2L, 2L))
    val got = triOf(messy)
    // one clean triangle {0,1,2}
    got.values.foreach { case (deg, tri, c) =>
      assert(deg == 2L && tri == 1L && c == 1.0)
    }
  }

  test("triangleStats matches brute force on seeded random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new Random(100 + seed)
      val n = 40
      val edges = Seq.fill(160)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val adj = canon.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val expect = adj.map { case (u, nbrs) =>
        val deg = nbrs.size.toLong
        val tri = nbrs.toSeq.combinations(2)
          .count { case Seq(v, w) => adj(v).contains(w) }.toLong
        val c = if (deg >= 2) 2.0 * tri / (deg * (deg - 1)) else 0.0
        u -> ((deg, tri, c))
      }
      assert(triOf(edges) === expect, s"seed=$seed")
    }
  }

  private def prOf(edges: Seq[(Long, Long)],
      iters: Int = 10): Map[Long, Long] =
    GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("pageRank: symmetric graphs rank by degree share; hub of a star " +
      "dominates; mass conserved up to floor dust") {
    val scale = 1000000000000L
    // triangle: perfect symmetry — every node identical, exactly
    // scale/3 at every iteration (integer fixed point: no drift)
    val tri = prOf(Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    assert(tri.values.toSet.size == 1)
    assert(math.abs(tri(0L) - scale / 3) <= 10)
    // star: the center holds more mass than any leaf, leaves tie
    val star = prOf(Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)))
    assert(star(9L) > star(1L) * 2)
    assert(Set(star(1L), star(2L), star(3L), star(4L)).size == 1)
    // undirected graph, no dangling nodes: total mass ≈ scale
    // (each node floors away < iters·(2+deg) units)
    val total = star.values.sum
    assert(math.abs(total - scale) < 1000L, total.toString)
  }

  test("pageRank is summation-order independent: repartitioned and " +
      "reversed edge lists give bit-identical ranks") {
    val rnd = new Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val base = prOf(edges)
    val reversed = prOf(edges.map(_.swap).reverse)
    assert(reversed === base)
    val repart = GraphOps.pageRank(
        edges.toDF("s", "d").repartition(17), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(repart === base)
  }
}
