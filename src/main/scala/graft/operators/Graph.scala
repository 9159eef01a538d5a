package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames (extension surface; the
  * dedup ladder's connected components live in analytics/Dedup — this
  * module holds the rank-propagation side).
  */
object Graph {

  /** PageRank in EXACT fixed-point arithmetic: ranks are integer
    * 1e-12 units (`rank_e12`), every step is integer division —
    *   r'(v) = (0.15·10¹²) div N  +  (85 · Σ_{u→v} r(u) div deg(u)) div 100
    * — so the result after `iters` rounds is bit-identical on any
    * engine, partitioning, or run (float PageRank drifts in the last
    * ulps per accumulation order, which a hash-compared pipeline
    * cannot tolerate). Truncation loses < 1e-12 of mass per edge per
    * round: irrelevant to ranking, and deterministic.
    *
    * Scale shape per iteration: one equi-join of the rank relation to
    * the edge list on the source key, one hash aggregate on the
    * destination — the canonical distributed PageRank step (shuffles
    * on src then dst; at 1000 executors both are plain key shuffles,
    * salted upstream if a hub key is pathological). The edge list and
    * degree relation are computed once and PERSISTED; each new rank
    * frame is persisted and the previous one released, so the lineage
    * stays one-iteration deep (an unpersisted loop re-derives every
    * prior round on each action — quadratic work and a stack-depth
    * hazard). Nodes with no in-edges keep the teleport term only.
    *
    * `edges` must be distinct (src, dst) pairs; nodes are whatever
    * appears in either column. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // degree is folded into the edge list ONCE, so each iteration is a
    // single join — not a (rank ⋈ edges ⋈ deg) three-way
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val eDeg = e
      .join(e.groupBy("__src").agg(count(lit(1)).as("__deg")), "__src")
      .persist(lvl)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst")))
      .distinct().persist(lvl)
    val nTotal = nodes.agg(count(lit(1)).as("__n"))
    val teleport = expr("150000000000L DIV __n")
    var rank = nodes.crossJoin(broadcast(nTotal))
      .select(col("node"), expr("1000000000000L DIV __n").as("rank_e12"),
        col("__n"))
      .persist(lvl)
    for (_ <- 1 to iters) {
      val contribs = rank
        .join(eDeg, rank("node") === eDeg("__src"))
        .select(col("__dst").as("node"), expr("rank_e12 DIV __deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__in"))
      val next = nodes.crossJoin(broadcast(nTotal))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (teleport + expr("85L * coalesce(__in, 0L) DIV 100")).as("rank_e12"),
          col("__n"))
        .persist(lvl)
      next.count() // materialize before releasing the parent
      rank.unpersist()
      rank = next
    }
    // the final rank is materialized; its inputs can go. The rank frame
    // itself stays persisted for the caller's action (session cache
    // hygiene — Verify/Bench clearCache — releases it after).
    eDeg.unpersist()
    nodes.unpersist()
    rank.select(col("node"), col("rank_e12"))
  }
}
