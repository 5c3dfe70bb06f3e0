package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the last
  * step of a near-dup pipeline: pair output (MinHash/SimHash/embedding LSH)
  * forms a graph whose components are the duplicate CLUSTERS; keeping one
  * representative per cluster is what actually shrinks the corpus.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
  * O(log^2 n) rounds on any graph (in practice 2-4 on near-dup graphs, whose
  * components are small and dense), against O(diameter) for naive label
  * propagation (a 10^6-long chain of boilerplate docs would need 10^6 joins).
  * Each half-round is one aggregate + one join on node ids — no collect_list
  * of neighbor sets, so a 10^8-member component cannot materialize a 10^8
  * array in one row; the min-neighbor aggregate is a partial+final
  * HashAggregate and the join shuffles (node, min) pairs only.
  *
  * Round-over-round lineage is truncated with `localCheckpoint` (the iterated
  * plan would otherwise double per round and stall the optimizer); on a real
  * cluster with dynamic executors, set a reliable `spark.checkpoint.dir` and
  * flip `reliableCheckpoint = true`.
  *
  * Convergence is detected by an order-insensitive edge-set checksum
  * (count + bit_xor of per-edge xxhash64) — at the fixpoint the edge set is a
  * star forest rooted at each component's minimum id. Non-convergence within
  * `maxRounds` throws (no silent partial components).
  */
object Components {

  private def canonical(edges: DataFrame, src: String, dst: String): DataFrame =
    edges.select(
      least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()

  /** Large-star: every node u links its strictly-larger neighbors to
    * m = min(N(u) ∪ {u}). Input/output canonical (a < b). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val m = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    // v > u >= m, so (m, v) is canonical; m == v impossible
    sym.join(m, "u").filter(col("v") > col("u"))
      .select(col("m").as("a"), col("v").as("b")).distinct()
  }

  /** Small-star: on edges directed high->low (u > v), u links all smaller
    * neighbors AND itself to m = min(N(u)). Canonical in/out. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(col("b").as("u"), col("a").as("v")) // u > v by construction
    val m = dir.groupBy("u").agg(min("v").as("m"))
    dir.join(m, "u").select(col("m").as("a"), col("v").as("b"))
      .union(m.select(col("m").as("a"), col("u").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Order-insensitive edge-set fingerprint: (edge count, xor of edge hashes).
    * bit_xor, not sum — sum(xxhash64) overflows under ANSI mode. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("c"),
      coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)).as("x")).collect().head
    (r.getLong(0), r.getLong(1))
  }

  /** Connected components of the graph given as an edge list.
    * Returns (id, component) for every node APPEARING IN AN EDGE — callers
    * union isolated vertices themselves (they are their own components).
    * `component` is the minimum node id of the component, so output is
    * deterministic and engine-independent. Id columns may be any orderable
    * type (long doc ids, string keys). */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25, reliableCheckpoint: Boolean = false): DataFrame = {
    def truncate(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)

    var cur = truncate(canonical(edges, srcCol, dstCol))
    var sig = checksum(cur)
    var converged = sig._1 == 0 // empty edge set: nothing to do
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val next = truncate(smallStar(largeStar(cur)))
      val nsig = checksum(next)
      converged = nsig == sig
      cur = next
      sig = nsig
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          s"(${sig._1} edges at round $round) — raise maxRounds")
    // fixpoint edge set is a star forest (root=a=component min, member=b)
    cur.select(col("b").as("id"), col("a").as("component"))
      .union(cur.select(col("a").as("id"), col("a").as("component")))
      .groupBy("id").agg(min("component").as("component"))
  }

  /** [[connectedComponents]] plus every isolated vertex as its own singleton
    * component — the convenience that makes the documented edge-only caveat
    * impossible to forget: callers pass the full node table and get one output
    * row per node. `nodes` rows must be unique on `nodeCol` (doc ids). The
    * singleton side is a left-anti join shipping node ids only. */
  def connectedComponentsWithIsolated(
      nodes: DataFrame, nodeCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25, reliableCheckpoint: Boolean = false): DataFrame = {
    val cc = connectedComponents(edges, srcCol, dstCol, maxRounds, reliableCheckpoint)
    val isolated = nodes.select(col(nodeCol).as("id"))
      .join(cc.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    cc.union(isolated)
  }

  /** Duplicate clusters from a near-dup pair DataFrame (id_a, id_b, ...):
    * (id, component) where component = min doc id of the cluster. */
  def nearDupGroups(pairs: DataFrame): DataFrame =
    connectedComponents(pairs, "id_a", "id_b")

  /** Corpus minus near-duplicates: keeps each cluster's minimum-id
    * representative plus every document in no cluster. The anti-join ships
    * only the loser-id set — never documents. */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = nearDupGroups(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
