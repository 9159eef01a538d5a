package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames (extension surface; the
  * dedup ladder's connected components live in analytics/Dedup — this
  * module holds the rank-propagation side).
  */
object Graph {

  /** MEASURED, DEFERRED co-partition gate for the iterative operators
    * (guide §2.4, round 15). Past the gate, the cached edge relation is
    * re-laid-out by its per-iteration join key ONCE — hash-partition +
    * sort + persist — so no remaining round's join re-shuffles or
    * re-sorts it: the scale-defining fix for iterative joins where the
    * rank/label side is too large to broadcast. Below the gate the
    * re-layout is counter-productive and is skipped: AQE broadcasts the
    * node-sized side and streams the edge list straight from cache, so
    * a forced repartition+sort only adds an exchange, a sort and a
    * wider cache (measured at sf0.1: pageRank rounds 1.1-2.0 s simple
    * vs 1.5-3.3 s force-partitioned).
    *
    * HOW THE GATE MEASURES AT ZERO COST: the decision is deferred to
    * just after round 1 — which materializes the persisted edge
    * relation anyway — and the row count is read from the
    * InMemoryRelation's accumulated statistics ([[materializedRows]]),
    * never from an extra count() job (an up-front count was tried and
    * measured +1-2 s per query at sf0.1; a plan-stats estimate gate was
    * also tried and rejected — these edge lists sit above joins, whose
    * size-only estimates are side PRODUCTS, TB-scale at sf0.1, so the
    * estimate mis-fired on every registered caller).
    * `spark.graft.graph.copartitionMinEdges` (default 2^21 directed
    * rows ≈ the point where the node-sized rank relation stops fitting
    * a broadcast; 0 forces the re-layout — the plan-evidence/spec
    * switch) tunes it. */
  private def copartitionMinEdges(df: DataFrame): Long =
    df.sparkSession.conf
      .get("spark.graft.graph.copartitionMinEdges", (1L << 21).toString)
      .toLong

  /** Row count of a MATERIALIZED cached relation, read from the
    * InMemoryRelation statistics the cache build accumulated — no job
    * runs. None when the relation is not cached or not yet
    * materialized; callers then keep the simple shape (always
    * correct, just unoptimized past broadcast scale). */
  private def materializedRows(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    df.where(lit(true)).queryExecution.optimizedPlan.collectFirst {
      case r: InMemoryRelation => r.stats.rowCount.map(_.toLong)
    }.flatten
  }

  private def shouldRelayout(cached: DataFrame): Boolean = {
    val gate = copartitionMinEdges(cached)
    gate == 0L || materializedRows(cached).exists(_ >= gate)
  }

  /** One-time re-layout of a materialized cached relation by the loop
    * join key: one exchange + sort now, zero per-round exchanges and
    * sorts for every remaining iteration. Replaces (and releases) the
    * plain cache. */
  private def relayout(cached: DataFrame, key: String): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val d = cached.repartition(col(key)).sortWithinPartitions(key)
      .persist(lvl)
    d.count()
    cached.unpersist()
    d
  }

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
    * salted upstream if a hub key is pathological). The edge list,
    * degree relation, and the loop-invariant (node, total) base are
    * computed once and PERSISTED; each new rank frame is persisted and
    * the previous one released, so the lineage stays one-iteration
    * deep (an unpersisted lazy unroll re-derives every prior round on
    * each action — quadratic work and a stack hazard — and measured
    * SLOWER even for 5 rounds here: AQE re-optimizes the ever-growing
    * nested plan at every one of its stages). Nodes with no in-edges
    * keep the teleport term only.
    *
    * `edges` must be distinct (src, dst) pairs; nodes are whatever
    * appears in either column. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the raw edge projection feeds FOUR subtrees (both sides of the
    // degree join, both arms of the node union) — persist it through
    // the setup phase or an expensive upstream (a join + distinct in
    // the registered callers) is recomputed once per subtree; released
    // right after round 1 so its blocks don't pressure the later
    // rounds' GC
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .persist(lvl)
    // degree is folded into the edge list ONCE as a PARTITIONED window
    // count (round 15; replaces the e ⋈ groupBy(e) self-join): one
    // exchange and one scan of e instead of two scans + a join, and the
    // result is hash-partitioned AND sorted by the per-round join key
    // BY CONSTRUCTION at every scale — each iteration's rank ⋈ edges
    // join reads it from cache with no exchange and no sort (guide
    // §2.4: two operations keyed the same way share one exchange), so
    // this relation needs no deferred re-layout
    val eDeg = e
      .withColumn("__deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__src")))
      .persist(lvl)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst")))
      .distinct().persist(lvl)
    // the (node, n) base for every round's left join is loop-invariant:
    // join it with the 1-row total ONCE and persist, instead of
    // re-broadcasting the total inside every iteration (5 extra
    // broadcast jobs measured as pure overhead)
    val nTotal = nodes.agg(count(lit(1)).as("__n"))
    val nodesN = nodes.crossJoin(broadcast(nTotal)).persist(lvl)
    val teleport = expr("150000000000L DIV __n")
    var rank = nodesN
      .select(col("node"), expr("1000000000000L DIV __n").as("rank_e12"))
      .persist(lvl)
    for (i <- 1 to iters) {
      val contribs = rank
        .join(eDeg, rank("node") === eDeg("__src"))
        .select(col("__dst").as("node"), expr("rank_e12 DIV __deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__in"))
      val next = nodesN
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (teleport + expr("85L * coalesce(__in, 0L) DIV 100")).as("rank_e12"))
        .persist(lvl)
      next.count() // materialize before releasing the parent
      if (i == 1) {
        // round 1 materialized every setup cache: release the raw edge
        // projection and node set (their consumers are all cached)
        e.unpersist()
        nodes.unpersist()
      }
      rank.unpersist()
      rank = next
    }
    // the final rank is materialized; its inputs can go. The rank frame
    // itself stays persisted for the caller's action (session cache
    // hygiene — Verify/Bench clearCache — releases it after).
    eDeg.unpersist()
    nodesN.unpersist()
    rank.select(col("node"), col("rank_e12"))
  }

  /** HITS hubs-and-authorities in EXACT e6 fixed-point integers.
    * Each round: authority(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v}
    * auth(v), each L1-normalized to 1e6 total via integer division
    * (float HITS L2-normalizes; L1 keeps every step an exact integer
    * so the result is engine- and partitioning-identical — same
    * trade as pageRank's e12 units). The e6 scale is what keeps every
    * intermediate Long-safe: Σ hub ≤ 1e6·|nodes| and raw sums ≤
    * 1e6·|edges|, so the ·1e6 normalization multiply stays < 2^63 for
    * graphs up to ~1e12 edges.
    *
    * Scale shape per round: two edge-keyed join+aggregate passes (the
    * transposed propagation reuses the SAME persisted edge list — no
    * second edge relation), each normalization a broadcast 1-row sum.
    * Returns (node, hub_e6, auth_e6) — zero where a node has no
    * out-/in-edges. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct().persist(lvl)
    // each round joins the edge list on __src (auth step) and on __dst
    // (hub step): past the deferred MEASURED gate (class doc — applied
    // after round 1's materialization, no extra job), co-partition +
    // sort ONE cached copy per orientation (guide §2.4) so no later
    // round's join re-exchanges or re-sorts the edge relation
    var eSrc = e0
    var eDst = e0
    var relaid = false
    val nodes = e0.select(col("__src").as("node"))
      .union(e0.select(col("__dst")))
      .distinct().persist(lvl)
    def normalize(raw: DataFrame, valCol: String): DataFrame = {
      val total = raw.agg(sum(col(valCol)).as("__t"))
      raw.crossJoin(broadcast(total))
        .select(col("node"),
          expr(s"$valCol * 1000000L DIV __t").as(valCol))
    }
    var hub = nodes.select(col("node"), lit(1000000L).as("h"))
    var auth: DataFrame = null
    for (i <- 1 to iters) {
      val prevHub = hub
      val prevAuth = auth
      // auth is persisted but NOT counted: the hub action below computes
      // it once, populating the cache en route (one job per round, the
      // pageRank shape) — a separate auth.count() would be a second
      // materializing action doing the same work.
      auth = normalize(
        hub.join(eSrc, hub("node") === eSrc("__src"))
          .groupBy(col("__dst").as("node")).agg(sum("h").as("a")), "a")
        .persist(lvl)
      val nextHub = normalize(
        auth.join(eDst, auth("node") === eDst("__dst"))
          .groupBy(col("__src").as("node")).agg(sum("a").as("h")), "h")
        .persist(lvl)
      nextHub.count() // materializes auth AND hub before releasing parents
      if (i == 1 && iters > 1 && shouldRelayout(e0)) {
        relaid = true
        val s = e0.repartition(col("__src"))
          .sortWithinPartitions("__src").persist(lvl)
        s.count()
        val d = e0.repartition(col("__dst"))
          .sortWithinPartitions("__dst").persist(lvl)
        d.count()
        eSrc = s
        eDst = d
      }
      prevHub.unpersist() // no-op on round 1's unpersisted seed
      if (prevAuth != null) prevAuth.unpersist()
      hub = nextHub
    }
    val out = nodes
      .join(hub.withColumnRenamed("h", "hub_e6"), Seq("node"), "left")
      .join(auth.withColumnRenamed("a", "auth_e6"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub_e6"), lit(0L)).as("hub_e6"),
        coalesce(col("auth_e6"), lit(0L)).as("auth_e6"))
    // nodes is only read by the caller's action — materialize it off
    // the cached e0 BEFORE releasing the edge caches, or that action
    // would recompute the edge distinct from the raw input
    nodes.count()
    e0.unpersist()
    if (relaid) { eSrc.unpersist(); eDst.unpersist() }
    out
  }

  /** Triangle census of an undirected graph: ONE summary row
    * (n_nodes, n_edges, n_wedges, n_triangles, clustering_e6) where
    * n_wedges = Σ_v C(deg v, 2) and clustering_e6 is the global
    * clustering coefficient 3·triangles/wedges in exact e6 integers.
    *
    * Edges are canonicalized (lo, hi) with self-loops dropped and
    * duplicates collapsed, so callers can pass raw pair relations.
    *
    * Scale shape — the standard degree-ordered orientation: each edge
    * points from its (degree, id)-smaller endpoint to the larger, so
    * every out-degree is O(√m) even on power-law graphs (a star's hub
    * gets ONLY in-edges). Triangles are wedge-joins closed by an edge
    * intersection (the edge-iterator algorithm): each oriented edge
    * (u, v) contributes |N⁺(u) ∩ N⁺(v)| — on the orientation DAG
    * every triangle has exactly one pivot with out-edges to the other
    * two, so each is counted once. Total work is Σ outdeg² ≤ O(m^1.5)
    * (the Chiba-Nishizeki arboricity bound) but NOTHING of wedge
    * scale is ever materialized or shuffled — the alternative
    * (self-join wedges, semi-join against the edge list) measured
    * 21 s at sf0.1 where this is ~4 s, all of it in the m-sized
    * relations. The adjacency-list relation is edge-list-sized; it is
    * BROADCAST when the edge count fits an executor
    * (≤ maxBroadcastEdges, measured by a count on the persisted
    * oriented relation) and degrades to two shuffle joins on the
    * endpoint keys past that — the only plan that works when the
    * edge list itself is cluster-sized. canon and oriented are
    * persisted across their consumers so canonicalization isn't
    * recomputed. */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String,
                    maxBroadcastEdges: Long = 4000000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .persist(lvl) // two consumers (deg, oriented): build the raw-pair distinct once
    val deg = canon.select(col("lo").as("node"))
      .union(canon.select(col("hi")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persist(lvl)
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1L) DIV 2")).as("n_wedges"))
    // orient: (deg, id)-smaller endpoint -> larger
    val dLo = deg.select(col("node").as("lo"), col("deg").as("__dlo"))
    val dHi = deg.select(col("node").as("hi"), col("deg").as("__dhi"))
    val oriented = canon.join(dLo, "lo").join(dHi, "hi")
      .select(
        when(col("__dlo") < col("__dhi")
            || (col("__dlo") === col("__dhi") && col("lo") < col("hi")),
          col("lo")).otherwise(col("hi")).as("src"),
        when(col("__dlo") < col("__dhi")
            || (col("__dlo") === col("__dhi") && col("lo") < col("hi")),
          col("hi")).otherwise(col("lo")).as("dst"))
      .persist(lvl)
    val m = oriented.count() // materializes the persist; picks the join plans
    val small = m <= maxBroadcastEdges
    val nbrs = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("__nb"))
    val nbU = nbrs.select(col("src").as("__u"), col("__nb").as("__nbu"))
    val nbV = nbrs.select(col("src").as("__v"), col("__nb").as("__nbv"))
    // dst may have no out-edges (the orientation sink): left join, null
    // adjacency intersects to null, coalesced to 0
    val tri = oriented
      .join(if (small) broadcast(nbU) else nbU, col("src") === col("__u"))
      .join(if (small) broadcast(nbV) else nbV, col("dst") === col("__v"), "left")
      .select(coalesce(size(array_intersect(col("__nbu"), col("__nbv"))), lit(0))
        .cast("long").as("__t"))
      .agg(sum(col("__t")).as("n_triangles"))
    val out = nodeStats.crossJoin(tri)
      .select(col("n_nodes"), lit(m).as("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          expr("3L * n_triangles * 1000000L DIV n_wedges"))
          .otherwise(0L).as("clustering_e6"))
      .persist(lvl)
    out.count() // materialize the 1-row census while its inputs are cached
    canon.unpersist()
    deg.unpersist()
    oriented.unpersist()
    out // stays persisted for the caller's action; clearCache releases it
  }

  /** Fixed-round k-core peeling: run EXACTLY `rounds` iterations of
    * "drop every node with degree < k, keep edges between survivors",
    * then report surviving nodes with their final degree (≥ k). With
    * enough rounds this is the k-core (the maximal subgraph of min
    * degree k); the round count is part of the contract so the result
    * is bit-identical on any engine/partitioning BY CONSTRUCTION —
    * a converge-then-stop variant would tie the output to an
    * engine-specific iteration count. Peeling is monotone, so extra
    * rounds past the fixpoint are no-ops.
    *
    * Scale shape per round: one hash aggregate for degrees (map-side
    * partials over the edge list) + two semi-joins of the edge list
    * against the keep-set. The keep-set is node-sized — broadcast
    * while the initial node count fits an executor
    * (≤ maxBroadcastNodes), shuffle semi-joins past that.
    *
    * Lineage discipline: each round references the previous edge
    * frame THREE times (the frame itself + two keep-set subtrees
    * derived from it), so a persist-only loop grows the logical plan
    * 3^rounds — [[Fixpoint.cut]] truncates the plan to the
    * materialized RDD each round (reliable checkpoint when a dir is
    * configured, executor-loss tolerant) and caps the carried size
    * estimate, keeping round r's plan AND its statistics O(1). */
  /** Personalized PageRank: identical exact fixed-point arithmetic to
    * [[pageRank]], but the teleport mass lands ONLY on the seed set —
    *   r'(v) = [v ∈ S]·(0.15·10¹²) div |S| + (85 · Σ_{u→v} r(u) div deg(u)) div 100
    * — so rank concentrates around the seeds: the "similar to this
    * cohort" recommender primitive (seeds = one customer segment ⇒
    * ranks = supplier affinity to that segment). Same per-iteration
    * scale shape as pageRank (one src-keyed join + one dst-keyed
    * aggregate, rank frames persisted one round deep); the seed flag
    * is a node-keyed left join computed once. Nodes unreachable from
    * the seeds keep rank 0 (reported — their absence would silently
    * change N-dependent comparisons). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iters: Int = 5): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // same discipline as pageRank (round 15): persist the 4-consumer
    // edge projection through setup, deferred measured co-partition
    // gate applied after round 1's materialization
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .persist(lvl)
    // partitioned window count, as in pageRank: one exchange, one scan,
    // cached partitioned + sorted by the loop join key by construction
    val eDeg = e
      .withColumn("__deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__src")))
      .persist(lvl)
    val seedSet = seeds.select(col(seedCol).as("node")).distinct()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst")))
      .distinct()
      .join(seedSet.withColumn("__seed", lit(1L)), Seq("node"), "left")
      .persist(lvl)
    val nSeeds = nodes.agg(sum(col("__seed")).as("__ns"))
    // loop-invariant (node, seed, total) base persisted once, as in
    // pageRank — never re-broadcast the total inside the loop
    val nodesN = nodes.crossJoin(broadcast(nSeeds)).persist(lvl)
    val teleport = expr("CASE WHEN __seed = 1 THEN 150000000000L DIV __ns ELSE 0L END")
    var rank = nodesN
      .select(col("node"),
        expr("CASE WHEN __seed = 1 THEN 1000000000000L DIV __ns ELSE 0L END")
          .as("rank_e12"))
      .persist(lvl)
    for (i <- 1 to iters) {
      val contribs = rank
        .join(eDeg, rank("node") === eDeg("__src"))
        .select(col("__dst").as("node"), expr("rank_e12 DIV __deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__in"))
      val next = nodesN
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (teleport + expr("85L * coalesce(__in, 0L) DIV 100")).as("rank_e12"))
        .persist(lvl)
      next.count()
      if (i == 1) {
        e.unpersist()
        nodes.unpersist()
      }
      rank.unpersist()
      rank = next
    }
    eDeg.unpersist()
    nodesN.unpersist()
    rank.select(col("node"), col("rank_e12"))
  }

  /** Fixed-round multi-source BFS: hop distance from the nearest seed,
    * for every node within `rounds` hops. Round r relaxes
    * dist(v) = min(dist(v), min_{u∈N(v)} dist(u) + 1) — one edge-keyed
    * join + one min-aggregate per round, lineage truncated per round
    * with [[Fixpoint.cut]] (reliable checkpoint when a dir is
    * configured; carried stats capped). The round count is part of the
    * contract (same determinism-by-construction argument as [[kPeel]]):
    * nodes farther than `rounds` hops are absent, and a node's distance
    * is exact once rounds ≥ its true distance (BFS relaxation is
    * monotone — extra rounds are no-ops).
    *
    * Scale shape per round: the frontier relation is node-sized; the
    * relax join is edge ⋈ dist on the node key (co-partitioned
    * shuffle), the min-agg has map-side partials. The undirected edge
    * list is materialized ONCE in both orientations and reused every
    * round. */
  def bfsHops(edges: DataFrame, aCol: String, bCol: String,
              seeds: DataFrame, seedCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val und = Fixpoint.cut(edges
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol), col(aCol)))
      .filter(col("src") =!= col("dst"))
      .distinct())
    var dist = Fixpoint.cut(seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L)))
    (1 to rounds).foreach { _ =>
      dist = Fixpoint.cut(dist
        .union(und.join(dist.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), (col("dist") + 1L).as("dist")))
        .groupBy("node").agg(min(col("dist")).as("dist")))
    }
    dist
  }

  def kPeel(edges: DataFrame, aCol: String, bCol: String, k: Int,
            rounds: Int, maxBroadcastNodes: Long = 5000000L): DataFrame = {
    // default sized for ~40 MB of long keys per broadcast (5M × 8 B) —
    // comfortably inside a 4-8 GiB executor; raise only with memory to
    // spare, the shuffle semi-join path is correct at any size
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    var cur = Fixpoint.cut(edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct())
    def degrees(e: DataFrame): DataFrame =
      e.select(col("lo").as("node")).union(e.select(col("hi")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    val small = degrees(cur).count() <= maxBroadcastNodes
    (1 to rounds).foreach { _ =>
      val keep = degrees(cur).filter(col("deg") >= k).select("node")
      // Fixpoint.cut: plan stays O(1) per round, and the carried-stats
      // cap matters here most — each round references `cur` THREE times
      // (the frame + two keep-set subtrees), so checkpoint-carried size
      // estimates CUBE per round; a deep-enough peel would otherwise
      // hang the planner in BigInteger math (the q57-class pathology).
      cur = Fixpoint.cut(cur
        .join({ val s = keep.select(col("node").as("lo"))
                if (small) broadcast(s) else s }, Seq("lo"), "left_semi")
        .join({ val s = keep.select(col("node").as("hi"))
                if (small) broadcast(s) else s }, Seq("hi"), "left_semi"))
    }
    degrees(cur).filter(col("deg") >= k)
      .select(col("node"), col("deg").as("core_deg"))
    // checkpoint RDDs are released by the ContextCleaner / clearCache
  }

  /** Multi-source WEIGHTED shortest paths via `rounds` Bellman-Ford
    * relaxations, in exact integer weight units (cents here — the same
    * no-float contract as [[pageRank]]/[[bfsHops]]):
    *   dist(v) = min(dist(v), min_{(u,v,w)∈E} dist(u) + w)
    * Parallel edges collapse to their cheapest weight up front, so each
    * round is ONE edge ⋈ dist equi-join on the source key plus one
    * min-aggregate on the destination — the canonical distributed
    * Bellman-Ford step (both shuffles are plain key exchanges at any
    * cluster size; map-side partials absorb the min).
    *
    * The round count is part of the contract: a node's distance is the
    * cheapest path using ≤ `rounds` edges — exact for all nodes once
    * rounds ≥ the graph's weighted-shortest-path hop diameter, and
    * monotonically non-increasing (extra rounds only improve). Nodes
    * unreached within `rounds` edges are absent. Weights must be
    * non-negative integral (relaxation is monotone only then). Lineage
    * is truncated per round with [[Fixpoint.cut]] (reliable checkpoint
    * when a dir is configured; carried stats capped). */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    weightCol: String, seeds: DataFrame, seedCol: String,
                    rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = Fixpoint.cut(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).as("w"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min(col("w")).as("w")))
    var dist = Fixpoint.cut(seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L)))
    (1 to rounds).foreach { _ =>
      dist = Fixpoint.cut(dist
        .union(e.join(dist.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist")))
        .groupBy("node").agg(min(col("dist")).as("dist")))
    }
    dist
  }

  /** Common-neighbor link prediction over an incidence list (node,
    * via): for every node pair sharing ≥ `minCommon` vias, the shared
    * count plus exact integer-e6 Jaccard of their via sets —
    *   jaccard_e6 = common·10⁶ div (deg(u) + deg(v) − common).
    *
    * Scale shape: the pair enumeration is the classic inverted-index
    * self-join — grouped on the via key, each via of degree d emits
    * d·(d−1)/2 candidate pairs. That is quadratic ONLY in per-via
    * degree, so hub vias are df-capped (`maxViaDegree`, the same
    * convention as the n-gram dedup ladder's df cap): a via shared by
    * more than `maxViaDegree` nodes carries almost no link-prediction
    * signal (its pairs are near-random) but dominates the join cost;
    * dropping it bounds the blow-up at (cap²/2)·|vias| candidates
    * regardless of skew. The candidate relation carries bare ids only;
    * degrees ride a node-sized join afterwards. */
  def commonNeighborPairs(incidence: DataFrame, nodeCol: String,
                          viaCol: String, minCommon: Long,
                          maxViaDegree: Long = 256L): DataFrame = {
    val inc = Fixpoint.cut(incidence
      .select(col(nodeCol).as("node"), col(viaCol).as("via"))
      .distinct())
    val viaOk = inc.groupBy("via").agg(count(lit(1)).as("__vd"))
      .filter(col("__vd") <= maxViaDegree).select("via")
    val kept = inc.join(viaOk, Seq("via"), "left_semi")
    val deg = inc.groupBy("node").agg(count(lit(1)).as("deg"))
    val pairs = kept.select(col("via"), col("node").as("u"))
      .join(kept.select(col("via"), col("node").as("v")), Seq("via"))
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    pairs
      .join(deg.select(col("node").as("u"), col("deg").as("__du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("__dv")), Seq("v"))
      .select(col("u"), col("v"), col("common"),
        expr("common * 1000000L DIV (__du + __dv - common)").as("jaccard_e6"))
  }

  /** Newman modularity of a GIVEN partition over a SYMMETRIC edge
    * list with per-endpoint community labels:
    *   Q = Σ_c [E_in(c)/m − (d_c/2m)²]
    * evaluated as ONE exact integer ratio
    * (D·in − Σd_c²)·1e6 DIV D² with D = 2m directed rows and `in` the
    * directed within-community rows — no floats anywhere. The
    * partition-quality score for any community assignment (nation,
    * connected component, label-propagation output).
    *
    * Scale shape: two hash aggregates over the edge relation (total +
    * per-community degree) and a 1-row reduction — never a sort, never
    * a join beyond what produced the labeled edges. */
  def modularity(edges: DataFrame, srcComCol: String,
                 dstComCol: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = edges.select(col(srcComCol).as("__sc"), col(dstComCol).as("__dc"))
    val tot = e.agg(count(lit(1)).cast(D).as("__dd"),
      sum(when(col("__sc") === col("__dc"), 1L).otherwise(0L)).cast(D).as("__in"))
    val dc = e.groupBy("__sc").agg(count(lit(1)).cast(D).as("__d"))
    dc.agg(count(lit(1)).as("n_communities"),
        sum(expr("__d * __d")).as("__sdd"))
      .crossJoin(broadcast(tot))
      .select(
        expr("CAST(__dd AS BIGINT) DIV 2").as("n_edges"),
        col("n_communities"),
        expr("""CAST((__dd * __in - __sdd) * 1000000 DIV (__dd * __dd)
                AS BIGINT)""").as("modularity_e6"))
  }

  /** Degree assortativity of a SYMMETRIC edge list (Newman 2002):
    * Pearson correlation of (deg(src), deg(dst)) over directed edge
    * rows. Positive = hubs attach to hubs; negative = hub-and-spoke
    * (the usual shape of a customer–supplier bipartite graph). Moments
    * are EXACT DECIMAL(38,0) sums (Stats's technique — a float sum is
    * order/engine-dependent); the only float steps are the final
    * division and two IEEE sqrt's. Constant degree yields NULL.
    *
    * Scale shape: one hash aggregate to the NODES-sized degree
    * relation, two degree joins back to edges (broadcast when nodes
    * fit, AQE decides), ONE aggregate to a single row. Never sorts. */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val deg = e.groupBy(col("__src").as("__node"))
      .agg(count(lit(1)).as("__deg"))
    e.join(deg.select(col("__node").as("__src"), col("__deg").as("__dx")),
        Seq("__src"))
      .join(deg.select(col("__node").as("__dst"), col("__deg").as("__dy")),
        Seq("__dst"))
      .select(col("__dx").cast(D).as("__x"), col("__dy").cast(D).as("__y"))
      .agg(count(lit(1)).as("n_edges"),
        sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum(expr("__x * __y")).as("__sxy"),
        sum(expr("__x * __x")).as("__sxx"),
        sum(expr("__y * __y")).as("__syy"))
      .select(col("n_edges"),
        expr("""CASE WHEN n_edges*__sxx - __sx*__sx = 0
                       OR n_edges*__syy - __sy*__sy = 0 THEN NULL
                     ELSE CAST(floor(1000000 * (
                       CAST(n_edges*__sxy - __sx*__sy AS DOUBLE)
                       / (sqrt(CAST(n_edges*__sxx - __sx*__sx AS DOUBLE))
                          * sqrt(CAST(n_edges*__syy - __sy*__sy AS DOUBLE))))
                       + 0.5) AS BIGINT) END""").as("assortativity_e6"))
  }

  /** Synchronous frequency-based label propagation (community
    * detection). Labels start as the node id; each round every node
    * adopts the most frequent label among its NEIGHBORS, ties broken
    * by the smallest label (the deterministic variant — classic async
    * LPA is run-order-dependent and un-oracle-able). A node with no
    * edges keeps its own label. Distinct from connected components
    * (Dedup.groups): frequency voting can split a connected graph
    * into several communities, which is the point.
    *
    * `edges` must be SYMMETRIC (caller unions both directions) and
    * distinct. Returns (node, label) after `rounds` synchronous
    * rounds.
    *
    * Scale shape per round: one equi-join of the label relation to the
    * edge list, one (node, label) count aggregate, then ONE max-struct
    * aggregate picking the winner — two key shuffles, no sort, no
    * window (a row_number top-1 window was measured slower: it re-sorts
    * every partition and its partitionBy(node) cannot reuse the
    * (node, label) aggregate's partitioning), and NO nodes left-join:
    * edges are symmetric by contract, so every node receives at least
    * one vote every round. Same persisted one-deep lineage discipline
    * as pageRank: each round's labels are persisted and the parent
    * released, so the plan never nests. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int = 3): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // past the deferred MEASURED gate (class doc — applied after round
    // 1's materialization, no extra job), co-partition + sort by the
    // per-round join key ONCE (guide §2.4): later rounds' labels ⋈
    // edges joins then reuse this cached exchange instead of
    // re-shuffling/re-sorting the edge list
    var e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .persist(lvl)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst"))).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .persist(lvl)
    for (i <- 1 to rounds) {
      // max of (count, -label) == most-frequent label, ties to SMALLEST
      val next = labels
        .join(e, labels("node") === e("__src"))
        .groupBy(col("__dst").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy("node")
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__w"))
        .select(col("node"), (-col("__w.__nl")).as("label"))
        .persist(lvl)
      next.count()
      if (i == 1 && rounds > 1 && shouldRelayout(e)) e = relayout(e, "__src")
      labels.unpersist()
      labels = next
    }
    e.unpersist()
    labels
  }
}
