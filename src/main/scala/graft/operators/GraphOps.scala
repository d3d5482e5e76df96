package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for corpus curation. The one that
  * matters for training-data pipelines is connected components: near-dup
  * detection ([[TextDedupOps]]) emits *pairs*, but the pipeline decision
  * — which documents to keep — needs *clusters* (near-duplication is
  * transitive in practice: A~B and B~C usually means A, B, C are one
  * group even when A~C falls just under the threshold). No reference
  * analogue (rmravindran/boostdb stores metrics, not documents) —
  * extension tier from the build brief.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * published shuffle-native CC algorithm. Each round is two
  * self-aggregating passes over the edge list keyed by node id; edges
  * monotonically re-point toward each component's minimum id, and the
  * round count is O(log n) in the worst case (near-dup graphs — dense
  * little cliques — converge in 2-3 rounds). Nothing is ever collected
  * to the driver: per-round state is the edge DataFrame itself, and the
  * only driver-side values are the convergence flag and round counter.
  * At 100 TB the edge list is orders of magnitude smaller than the
  * corpus (only near-dup pairs), so CC costs a handful of small
  * shuffles after the dedup join that produced the pairs.
  */
object GraphOps {

  /** Connected components of an undirected graph given as an edge list.
    * Returns one row per node that appears in `edges`, with its
    * component label = the minimum node id reachable from it
    * (`id`, `component`). Nodes not present in any edge are absent —
    * left-join and coalesce to self for singleton handling.
    *
    * Ids must be an orderable type (the label is the component MIN).
    * Self-loops and duplicate/reversed edges are tolerated.
    *
    * Every round `localCheckpoint`s the edge frame: iterative DataFrame
    * algorithms otherwise stack lineage until planning itself dominates.
    * (On a real cluster with executor loss concerns, swap for reliable
    * `checkpoint` against the cluster checkpoint dir — same call shape.)
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    // canonical direction: every edge stored (hi > lo)
    var e = edges
      .select(greatest(col(srcCol), col(dstCol)).as("hi"),
        least(col(srcCol), col(dstCol)).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint()

    var converged = e.isEmpty
    var round = 0
    while (!converged && round < maxIter) {
      // large-star: every node u connects its LARGER neighbors to
      // m = min(N(u) ∪ {u}); keeps (hi > lo) invariant since v > u >= m
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val largeMin = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(largeMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()

      // small-star: every node u re-points its smaller neighbors (and
      // itself) to m = min of the smaller neighbors; v > m by choice of m
      val smallMin = large.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val small = large.join(smallMin, "hi")
        .select(col("lo").as("v"), col("m"))
        .union(smallMin.select(col("hi").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
        .localCheckpoint()

      // converged iff the edge set is a star forest: no node is both a
      // pointer (hi) and a pointee (lo). Star ops preserve connectivity,
      // so height-1 everywhere == one star per original component.
      converged = small.select(col("lo").as("id"))
        .intersect(small.select(col("hi").as("id")))
        .isEmpty
      e = small
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")

    // stars: (member -> root) plus the roots themselves
    e.select(col("hi").as("id"), col("lo").as("component"))
      .union(e.select(col("lo").as("id"), col("lo").as("component")).distinct())
  }
}
