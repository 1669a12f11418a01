package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph analytics. PageRank-style propagation is how
  * corpus curation turns pairwise signals (similarity edges, link
  * graphs, purchase graphs) into per-node quality scores.
  *
  * Engine-exactness: ranks live in integer fixed-point units (2^40 of
  * total mass) and every update is BIGINT arithmetic — share =
  * rank div out_degree, damping = ·17 div 20 (0.85 as a rational) —
  * so the iteration is order-free under any partitioning and
  * bit-identical in any engine (the cluster_kmeans integer-sum
  * recipe). Truncation loses ≤out_degree units per node per step —
  * deterministic, and irrelevant at 2^40 resolution.
  */
object Graph {

  val TotalUnits: Long = 1L << 40

  /** Round observability for the iterative operators: the per-round
    * barrier (join + min-agg + checkpoint + probe) is the cost driver
    * and the round COUNT is data-dependent (eccentricity / peeling
    * depth), so a "sssp got slower" report needs this denominator.
    * One stderr line per round — stays out of the query result and
    * survives in driver logs at any scale. */
  private def logRound(op: String, round: Int, startNanos: Long): Unit =
    System.err.println(
      s"[graft.graph] $op round=$round ${(System.nanoTime() - startNanos) / 1000000} ms")

  /** PageRank over a directed edge list. Every node must have at
    * least one OUT edge (feed a bidirected edge list for undirected
    * graphs — also the standard dangling-node fix). Self-loops and
    * duplicate edges are honored as given.
    *
    * Scale shape per iteration: one equi-join of the edge list with
    * the current ranks on src (both hash-partitioned on src — AQE
    * reuses the layout), one partial-agg'd groupBy on dst. Nothing is
    * collected; the rank relation is one (long, long) row per node.
    *
    * Output: (node, rank) with rank in units of 2^-40 total mass. */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, weightCol: Option[String] = None): DataFrame =
    prRun(edges, srcCol, dstCol, iters, weightCol, None)

  /** Personalized PageRank: the teleport mass (3/20 per step, and all
    * of the initial mass) is split over a SEED set instead of every
    * node — rank then measures proximity to the seeds, the standard
    * "expand a trusted/high-quality seed corpus" scorer (harmonic-ish
    * centrality to the seeds over the hyperlink/purchase graph).
    * Same integer fixed-point, same per-iteration shape and linear
    * lineage as [[pagerank]] — only the teleport target differs.
    * Every seed must have at least one out-edge (the rebuild skeleton
    * is keyed by out-degree; a seed outside it would silently leak its
    * teleport mass — enforced with a per-row raise_error). */
  def personalizedPagerank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iters: Int, weightCol: Option[String] = None): DataFrame =
    prRun(edges, srcCol, dstCol, iters, weightCol,
      Some(seeds.select(col(seedCol).cast("long").as("node")).distinct()))

  private def prRun(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int, weightCol: Option[String],
                    seeds: Option[DataFrame]): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    // Weighted form: share = (rank · w_e) div Σw(src) — still pure
    // integer arithmetic; weights must be positive longs with
    // max_w < 2^22 so rank·w stays inside a 63-bit long. Both bounds
    // are enforced per-row below (a codegen'd compare, no extra
    // action): a zero/negative weight would silently drop mass via
    // null division and an oversized one overflows to negative ranks.
    val w = weightCol match {
      case Some(c) =>
        val wc = col(c).cast("long")
        when(wc.isNull || wc <= 0L || wc >= (1L << 22),
          raise_error(concat(lit("pagerank: weight out of range (0, 2^22): "),
            col(c).cast("string"))).cast("long")).otherwise(wc)
      case None => lit(1L)
    }
    // Loop invariants, cached once (in-memory cache, not
    // localCheckpoint: the blocking checkpoint write cost more than it
    // saved at bench scale, while the cache is free on first use).
    // Without the edge cache every iteration re-executes the upstream
    // lineage (the gate query's fact-fact join ran 8× for 2
    // iterations).
    // Pre-partitioned on __src BEFORE caching: the per-iteration
    // contrib join then consumes the cached layout directly instead of
    // re-shuffling the edge relation every iteration — one upfront
    // exchange buys back an edge-sized exchange × iters (measured 30%
    // off 2-iter and 10-iter wall time at sf0.1, and the saving grows
    // with iteration count). The degree aggregate reuses the same
    // layout for free (already partitioned on its grouping key).
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        w.as("__w"))
      .repartition(col("__src"))
      .cache()
    // out-weights double as the node relation (every node has out-edges)
    val deg = e.groupBy(col("__src").as("node"))
      .agg(sum(col("__w")).as("__deg"))
    val n = deg.select(count(lit(1)).as("__n"))
    // nodes = (node, __deg, __n): the cached node-sized rebuild
    // skeleton. Every iteration rebuilds ranks from nodes ⟕ contrib —
    // NOT from the previous ranks — so ranks_i appears exactly ONCE in
    // ranks_{i+1}'s plan (inside contrib) and lineage depth stays
    // LINEAR in iters. (The previous shape joined old ranks twice per
    // iteration — contrib and the rebuild — doubling the
    // unmaterialized plan every step: 2^k recompute between
    // checkpoints at production iteration counts.) base teleport share
    // = (3·T div 20) div N, derived per row from the broadcast count.
    // Personalized variant: nodes additionally carries (__seed, __ns)
    // and the init/teleport expressions target the seed rows only —
    // the per-iteration plan (and its cost) is otherwise unchanged.
    val nodes = seeds match {
      case None => deg.crossJoin(broadcast(n)).cache()
      case Some(s) =>
        // evaluated per seed row via the sum: a seed without out-edges
        // raises instead of silently leaking its teleport mass
        val ns = s.join(deg, Seq("node"), "left")
          .select(when(col("__deg").isNull,
            raise_error(concat(lit("personalizedPagerank: seed has no out-edges: "),
              col("node").cast("string"))).cast("long"))
            .otherwise(lit(1L)).as("__one"))
          // sum over an EMPTY seed relation is NULL — without this
          // guard every teleport share would silently take the
          // non-seed 0 branch and the operator would return all-zero
          // ranks (100% mass leak), the exact contract violation the
          // per-row guard above exists to prevent
          .agg(coalesce(sum(col("__one")),
            raise_error(lit("personalizedPagerank: seed set is empty")).cast("long"))
            .as("__ns"))
        deg.crossJoin(broadcast(n))
          .join(s.withColumn("__seed", lit(1L)), Seq("node"), "left")
          .crossJoin(broadcast(ns)).cache()
    }
    val carry = Seq(col("node"), col("__deg"), col("__n")) ++
      (if (seeds.isDefined) Seq(col("__ns"), col("__seed")) else Nil)
    def initExpr = seeds match {
      case None => expr(s"${TotalUnits}L div __n")
      case Some(_) => when(col("__seed").isNotNull,
        expr(s"${TotalUnits}L div __ns")).otherwise(lit(0L))
    }
    def teleportExpr = seeds match {
      case None => expr(s"(3 * ${TotalUnits}L div 20) div __n")
      case Some(_) => when(col("__seed").isNotNull,
        expr(s"(3 * ${TotalUnits}L div 20) div __ns")).otherwise(lit(0L))
    }
    var ranks = nodes.select(carry :+ initExpr.as("__r"): _*)
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks, col("__src") === col("node"))
        .groupBy(col("__dst"))
        .agg(sum(expr("(__r * __w) div __deg")).as("__s"))
      ranks = nodes.join(contrib, col("node") === col("__dst"), "left_outer")
        .select(carry :+
          (teleportExpr + expr("17 * coalesce(__s, 0L) div 20")).as("__r"): _*)
      // bound analyzer/codegen cost for long runs (lineage is linear
      // now, so this is plan-SIZE hygiene, not a recompute guard);
      // short runs skip the (blocking) checkpoint barrier entirely
      if (i % 5 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    // materialize the final ranks (node-count rows — cheap) so the
    // operator's caches can be dropped before returning: the caller
    // gets a checkpoint-backed relation with no live cache behind it
    val out = ranks.select(col("node"), col("__r").as("rank"))
    if (iters == 0) { e.unpersist(); nodes.unpersist(); return out }
    val sealed0 = out.localCheckpoint()
    e.unpersist(); nodes.unpersist()
    sealed0
  }

  /** Label propagation (community detection): every node starts as its
    * own community and repeatedly adopts its neighbors' most frequent
    * label. Fully deterministic — the adopt choice ranks (count DESC,
    * label ASC), so ties cannot flip under partitioning or engine; the
    * usual random-order LP nondeterminism is deliberately traded for
    * reproducibility (synchronous updates, min-label tie-break).
    * Feed a bidirected edge list for undirected graphs.
    *
    * Per iteration: one edges⋈labels equi-join and two partial-agg'd
    * groupBys — the adopt step is an argmax AGGREGATE
    * (max_by(label, (count, −label))), not a per-dst row_number
    * window, so nothing is sorted. Output: (node, label). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // same pre-partitioned-edge-cache trick as pagerank: the
    // per-iteration counts join reads the cached __src layout
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .repartition(col("__src")).cache()
    var labels = e.select(col("__src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iters) {
      val counts = e.join(labels, col("__src") === col("node"))
        .groupBy(col("__dst"), col("label")).agg(count(lit(1)).as("__c"))
      // adopt = argmax by (count, −label): max_by over a lexicographic
      // struct is a partial-aggregatable AGGREGATE — a per-dst
      // row_number window costs a full shuffle+sort of the
      // neighbor-label relation instead (measured 2× slower)
      labels = counts.groupBy(col("__dst").as("node"))
        .agg(max_by(col("label"), struct(col("__c"), (-col("label")).as("__nl"))).as("label"))
      if (i % 5 == 0 && i < iters) labels = labels.localCheckpoint()
    }
    // node-sized final relation: materialize eagerly so the edge cache
    // can be dropped before returning (same contract as pagerank)
    val out = labels.localCheckpoint()
    e.unpersist()
    out
  }

  /** Connected components over an undirected edge list: every node is
    * labeled with the smallest node id in its component (the same
    * canonical-min contract as eel-style dedup clustering; reference
    * semantics io/eels components are per-source — this is the graph
    * generalization). Input may contain duplicates / self-loops /
    * either direction; normalized away first.
    *
    * Algorithm: synchronous min-label propagation — each round every
    * node adopts the minimum label among itself and its neighbors, so
    * a component's min id floods outward one hop per round and the
    * round count is O(max component diameter), NOT O(nodes). Rounds
    * are driven by a convergence check (an any-label-changed count),
    * and the operator THROWS rather than return split components if
    * `maxRounds` is hit.
    *
    * Scale shape per round: one edges⋈labels equi-join on the cached
    * pre-partitioned edge layout (the same
    * one-upfront-exchange-instead-of-one-per-round trick as pagerank)
    * + one partial-agg'd min groupBy; labels are one (long, long) row
    * per node. Each round's labels are sealed with an EAGER
    * localCheckpoint, not cache(): the round references the previous
    * labels three times (neighbor-min, rebuild, convergence probe), so
    * a cache would stop recompute but the LOGICAL plan would still
    * triple per round — 3^k tree nodes by round k, and analysis/plan
    * stringification hangs long before compute does (caught by this
    * operator's 12-round path-graph spec). The checkpoint makes every
    * round plan against a leaf; the convergence probe rides the same
    * barrier. Shuffles carry ids only.
    *
    * Output: (node, component). */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val sym = edges
      .select(col(aCol).as("__src"), col(bCol).as("__dst"))
      .union(edges.select(col(bCol).as("__src"), col(aCol).as("__dst")))
      .filter(col("__src") =!= col("__dst"))
      .distinct()
      .repartition(col("__dst"))
      .cache()
    // seed: min(self, direct neighbors) — one round of flooding for free
    var labels = sym.groupBy(col("__src").as("node"))
      .agg(least(min(col("__dst")), first(col("__src"))).as("component"))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val t0 = System.nanoTime()
      val neighborMin = sym.join(labels, col("__dst") === col("node"))
        .groupBy(col("__src").as("node"))
        .agg(min(col("component")).as("__nmin"))
      // eager checkpoint = the round's materialization barrier AND
      // lineage cut (see scaladoc); old checkpoint blocks are released
      // by the context cleaner once `labels` is rebound
      val updated = labels
        .join(neighborMin.withColumnRenamed("node", "__nn"),
          col("node") === col("__nn"), "left_outer")
        .select(col("node"),
          least(col("component"), coalesce(col("__nmin"), col("component"))).as("component"))
        .localCheckpoint()
      val changed = updated
        .join(labels.withColumnRenamed("component", "__old"), "node")
        .filter(col("component") =!= col("__old")).limit(1).count()
      labels = updated
      converged = changed == 0L
      round += 1
      logRound("concomp", round, t0)
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds — a component " +
          s"with diameter > $maxRounds exists; raise maxRounds (propagation is one " +
          "hop per round)")
    labels
  }

  /** Multi-source BFS: shortest hop distance from a seed set, over a
    * directed edge list (feed a bidirected list for undirected
    * graphs). Nodes unreachable from every seed are absent from the
    * output — the caller decides the sentinel. Reference semantics:
    * graph reachability is the transitive generalization of eel's
    * join-chain lookups; this is the hop-count variant of
    * connectedComponents' flooding.
    *
    * Algorithm: synchronous distance flooding — each round every node
    * adopts min(own dist, min over in-neighbors' dist + 1), so the
    * frontier advances one hop per round and the round count is the
    * graph's seed eccentricity (max shortest-path dist), NOT node
    * count. Convergence-probed like connectedComponents; THROWS on
    * round exhaustion rather than return truncated distances.
    *
    * Scale shape per round: one edges⋈dist equi-join on the cached
    * pre-partitioned edge layout + one partial-agg'd min groupBy; the
    * dist relation is one (long, long) row per REACHED node (grows
    * monotonically to the reachable set, never the full graph).
    * Rounds are sealed by an eager localCheckpoint — the round
    * references the previous dist three times (propagate, merge,
    * probe), so a cache would leave the logical plan tripling per
    * round (the connectedComponents 3^k lesson). Shuffles carry id/
    * dist longs only.
    *
    * Output: (node, dist) for every node reachable from a seed
    * (seeds themselves at dist 0, present even if edge-less). */
  def bfs(edges: DataFrame, srcCol: String, dstCol: String,
          seeds: DataFrame, seedCol: String,
          maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src") =!= col("__dst"))
      .distinct()
      .repartition(col("__src"))
      .cache()
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val t0 = System.nanoTime()
      val prop = e.join(dist, col("__src") === col("node"))
        .groupBy(col("__dst").as("__nn"))
        .agg(min(col("dist") + 1L).as("__nd"))
      // full outer merge: newly-reached nodes enter, known nodes keep
      // min(old, propagated); seeds stay at 0 by the min
      val updated = dist
        .join(prop, col("node") === col("__nn"), "full_outer")
        .select(coalesce(col("node"), col("__nn")).as("node"),
          least(coalesce(col("dist"), col("__nd")),
            coalesce(col("__nd"), col("dist"))).as("dist"))
        .localCheckpoint()
      val changed = updated
        .join(dist.withColumnRenamed("dist", "__old"), Seq("node"), "left_outer")
        .filter(col("__old").isNull || col("dist") =!= col("__old"))
        .limit(1).count()
      dist = updated
      converged = changed == 0L
      round += 1
      logRound("bfs", round, t0)
    }
    e.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"bfs did not converge in $maxRounds rounds — a shortest path longer than " +
          s"$maxRounds hops exists; raise maxRounds (the frontier advances one hop per round)")
    dist
  }

  /** Multi-source single-source-shortest-paths over POSITIVE integer
    * edge weights (min-plus flooding — the weighted generalization of
    * [[bfs]]): each round every node adopts min(own dist, min over
    * in-neighbors' dist + w). With positive integer weights every
    * improvement lowers an integer, so the loop converges to the
    * exact Bellman-Ford fixed point; round count ≤ the longest
    * shortest-PATH edge count. `maxCost` bounds the explored radius
    * (dist > maxCost rows are dropped each round): the
    * bounded-budget reachability query shape — and the bound that
    * keeps a DuckDB recursive-CTE oracle finite. THROWS on round
    * exhaustion rather than return non-converged distances.
    *
    * Scale shape: identical to [[bfs]] — per round one equi-join on
    * the cached pre-partitioned edge layout + one partial-agg'd min
    * groupBy, rounds sealed by eager localCheckpoint, shuffles carry
    * (id, dist) longs. Weights are guarded per-row (w ≥ 1, codegen'd
    * raise_error — a zero/negative weight would loop or corrupt the
    * fixed point silently).
    *
    * Output: (node, dist) for nodes reachable within `maxCost`. */
  def sssp(edges: DataFrame, srcCol: String, dstCol: String, weightCol: String,
           seeds: DataFrame, seedCol: String,
           maxCost: Long = Long.MaxValue, maxRounds: Int = 30): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    require(maxCost >= 0, "maxCost must be >= 0")
    val wc = col(weightCol).cast("long")
    val w = when(wc.isNull || wc <= 0L,
      raise_error(concat(lit("sssp: weight must be a positive integer: "),
        col(weightCol).cast("string"))).cast("long")).otherwise(wc)
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"), w.as("__w"))
      .filter(col("__src") =!= col("__dst"))
      .groupBy(col("__src"), col("__dst")).agg(min(col("__w")).as("__w"))
      .repartition(col("__src"))
      .cache()
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val t0 = System.nanoTime()
      val prop = e.join(dist, col("__src") === col("node"))
        .select(col("__dst"), (col("dist") + col("__w")).as("__cand"))
        .filter(col("__cand") <= maxCost)
        .groupBy(col("__dst").as("__nn"))
        .agg(min(col("__cand")).as("__nd"))
      val updated = dist
        .join(prop, col("node") === col("__nn"), "full_outer")
        .select(coalesce(col("node"), col("__nn")).as("node"),
          least(coalesce(col("dist"), col("__nd")),
            coalesce(col("__nd"), col("dist"))).as("dist"))
        .localCheckpoint()
      val changed = updated
        .join(dist.withColumnRenamed("dist", "__old"), Seq("node"), "left_outer")
        .filter(col("__old").isNull || col("dist") =!= col("__old"))
        .limit(1).count()
      dist = updated
      converged = changed == 0L
      round += 1
      logRound("sssp", round, t0)
    }
    e.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"sssp did not converge in $maxRounds rounds — a shortest path with more than " +
          s"$maxRounds edges exists inside the cost budget; raise maxRounds")
    dist
  }

  /** Exact triangle count via degree-ordered orientation. Each
    * undirected edge is oriented from its (degree, id)-smaller
    * endpoint to the larger; every triangle then appears as exactly
    * one closed wedge u→v→w with u→w, so the count needs no /3 or /6
    * correction. The orientation is THE scale trick: out-degrees are
    * bounded by O(√m), so the wedge join fans out O(m^1.5) worst-case
    * instead of Σdeg² (which a hub node makes quadratic).
    *
    * Input may contain duplicates / self-loops / both directions —
    * normalized away first. Output: one row (n_triangles). */
  def triangleCount(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val o = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"))
      .cache()
    // the result is one row — materialize it eagerly (cheap) so the
    // orientation cache can be dropped before returning instead of
    // living for the rest of the session
    val res = o.as("e1")
      .join(o.as("e2"), col("e1.dst") === col("e2.src"))
      .join(o.as("e3"),
        col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
      .localCheckpoint()
    o.unpersist()
    res
  }

  /** k-core extraction by synchronous peeling: repeatedly delete every
    * node with (undirected) degree &lt; k until the survivor set is
    * stable — the standard density filter (community cores, spam/bot
    * subgraph mining, the "is this node structurally embedded" signal
    * for graph-side corpus curation). Feed a BIDIRECTED edge list
    * (like [[bfs]]); degree is then out-degree. Returns each k-core
    * node with its within-core degree; an empty result means the
    * graph has no k-core.
    *
    * Scale shape per round: one partial-agg'd degree count + two
    * semi-joins of the edge relation against the |alive-nodes| set
    * (node-sized; AQE broadcasts it while it fits, hash-join
    * otherwise) — shuffles carry (long, long) edges only, and the
    * edge relation only ever SHRINKS. Rounds are sealed by eager
    * localCheckpoints (the concomp plan-growth lesson). Round count =
    * peeling depth; sparse tendrils peel in round 1, so depth is
    * small on real graphs — still, convergence is probed and the
    * operator THROWS on round exhaustion rather than return a
    * superset of the core. */
  def kcore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 8): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    var e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src") =!= col("__dst"))
      .distinct()
      .repartition(col("__src"))
      .localCheckpoint()
    var eCount = e.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val t0 = System.nanoTime()
      val alive = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k)
        .select(col("__src").as("__a"))
        .localCheckpoint()
      val ne = e
        .join(alive, col("__src") === col("__a"), "left_semi")
        .join(alive.withColumnRenamed("__a", "__b"), col("__dst") === col("__b"), "left_semi")
        .localCheckpoint()
      val nc = ne.count()
      converged = nc == eCount
      e = ne
      eCount = nc
      round += 1
      logRound("kcore", round, t0)
    }
    if (!converged)
      throw new IllegalStateException(
        s"kcore did not converge in $maxRounds rounds — peeling is still removing " +
          "nodes; raise maxRounds")
    e.groupBy(col("__src").as("node")).agg(count(lit(1)).as("core_degree"))
  }
}
