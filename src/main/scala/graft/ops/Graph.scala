package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[graft.ext.Dedup.duplicateClusters]]'s
  * label propagation: PageRank, the domain-authority signal crawl-curation
  * pipelines rank hosts with (a link from an authoritative host lends
  * authority — Page et al. 1999).
  *
  * DETERMINISTIC FIXED-POINT VARIANT: rank mass is int64 units (total
  * mass M = 1e12) and every per-edge/per-node term is integer division
  * (`div`), so each iteration is a pure function of the edge set in ANY
  * engine — no float summation order anywhere. Floors shed a few units of
  * mass per iteration (bounded by |V| + |E| units, i.e. ~1e-6 relative)
  * instead of renormalizing; the oracle replays the same recurrence
  * bit-for-bit as unrolled SQL iterations:
  *
  *   contrib(u→v) = (r(u) · d_ppm div 1e6) div outdeg(u)
  *   r'(v) = (M·(1e6−d_ppm) div 1e6) div N            — teleport
  *         + Σ_{u→v} contrib(u)                        — link mass
  *         + (d_ppm·Σ_{dangling u} r(u) div 1e6) div N — dangling share
  *
  * Scale shape at 100 TB: the edge list is the only big table. Per
  * iteration: one join of ranks onto edges co-keyed by src (AQE picks
  * shuffle vs broadcast by rank-table size — ranks are |V|-sized, edges
  * |E|-sized), one partial-agg groupBy(dst), one |V|-sized outer join
  * back. Lineage is cut EVERY round (reliable checkpoint when a dir is
  * configured, else localCheckpoint) — the [[graft.ext.Bpe.trainMerges]]
  * lesson: stacked per-round cache plans double their printed form per
  * iteration and OOM the driver via AQE's plan rendering long before any
  * data pressure. */
object Graph {

  /** Total integer rank mass: 1e12 units = 1.0 of probability. */
  val Mass: Long = 1000000000000L

  private def truncated(df: DataFrame): DataFrame =
    Lineage.cut(df, eager = true)

  /** PageRank over a directed edge list (srcCol, dstCol) — duplicate
    * edges count as parallel links (weight = multiplicity). Nodes are
    * every id appearing on either side. Returns (node, rank_q) with
    * Σ rank_q ≤ [[Mass]] (floor shedding; see object doc).
    * `dampingPpm` is the damping factor in parts-per-million (850000 =
    * the standard 0.85). */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 10,
      dampingPpm: Long = 850000L
  ): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L, "dampingPpm in [0, 1e6]")
    // the edge list is consumed by nodes, outdeg, AND every iteration's
    // contribution join — materialize it once instead of re-deriving the
    // caller's upstream lineage (often itself a join) 2+iterations times
    val e = truncated(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val nodes = truncated(
      e.select(col("src").as("node")).unionByName(e.select(col("dst").as("node")))
        .distinct())
    val outdeg = truncated(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg")))
    var ranks = truncated(
      nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("__n"))))
        .select(col("node"), expr(s"${Mass}L div __n").as("r"), col("__n")))
    var i = 0
    while (i < iterations) {
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
      // dangling nodes (no outlinks) donate their damped mass uniformly
      val dangling = withDeg.where(col("outdeg").isNull)
        .agg(coalesce(sum("r"), lit(0L)).as("__dang"))
      val contrib = withDeg.where(col("outdeg").isNotNull)
        .select(col("node").as("src"),
          expr(s"(r * ${dampingPpm}L div 1000000L) div outdeg").as("c"))
        .join(e, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("__in"))
      val next = ranks.select(col("node"), col("__n"))
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (expr(s"((${Mass}L * ${1000000L - dampingPpm}L) div 1000000L) div __n") +
            coalesce(col("__in"), lit(0L)) +
            expr(s"(${dampingPpm}L * __dang div 1000000L) div __n")).as("r"),
          col("__n"))
      val t = truncated(next)
      // Dataset.unpersist is a silent no-op on checkpointed frames (the
      // CacheManager never saw them) — release the superseded round's
      // blocks through the LogicalRDD directly
      Lineage.release(ranks)
      ranks = t
      i += 1
    }
    // the loop's inputs are dead once the final ranks are materialized
    // (the returned projection reads only the last checkpointed frame)
    Lineage.release(e); Lineage.release(nodes); Lineage.release(outdeg)
    ranks.select(col("node"), col("r").as("rank_q"))
  }

  /** Connected components over an undirected edge list — host-graph
    * clustering, duplicate-cluster realization, crawl-frontier grouping.
    * Returns (node, component) with component = min node id of the
    * component; nodes with no edges don't appear (union an
    * isolated-node frame with `component = node` if needed).
    *
    * Delegates to [[graft.ext.Dedup.duplicateClusters]]'s min-label
    * propagation — edge set materialized once, per-round
    * localCheckpoint, O(diameter) rounds with early convergence — which
    * was always a general CC; this is the graph-flavored surface. */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 25, edgeParts: Int = 4
  ): DataFrame =
    graft.ext.Dedup.duplicateClusters(
        edges.select(col(srcCol).as("a_id"), col(dstCol).as("b_id")),
        maxIterations, edgeParts)
      .select(col("id").as("node"), col("cluster").as("component"))
}
