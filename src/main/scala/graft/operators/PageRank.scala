package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the crawl-scale link
  * centrality signal (Page et al. 1999; Common Crawl publishes exactly
  * this over its host webgraph, and crawl frontier prioritization /
  * seed-quality weighting consume it).
  *
  * INTEGER-EXACT power iteration: ranks live on a picorank grid
  * (total mass M = 1e12 split as exact longs), every per-iteration
  * quantity — the per-edge share `r div outdeg`, the inbound sum, the
  * dangling redistribution `dangling div N`, the damped update — is
  * truncating integer arithmetic on non-negative longs (floor ==
  * truncate, and DuckDB's `//` agrees), so the whole trajectory is
  * order-free, partitioning-independent, and bitwise replayable in
  * SQL (the unrolled-CTE oracle pattern). Truncation sheds < 1 pico
  * per division; the deliberately-unnormalized output lets the oracle
  * pin mass conservation too.
  *
  * Update (damping num/den, default 85/100):
  * {{{
  *   r_0(v)     = M div N
  *   share_t(u) = r_t(u) div outdeg(u)          (outdeg > 0)
  *   dang_t     = Σ r_t(u) over outdeg(u) = 0
  *   r_{t+1}(v) = ((den−num)·M div den) div N
  *              + num·(Σ_{u→v} share_t(u) + dang_t div N) div den
  * }}}
  *
  * Scale design (100 TB contract): the classic distributed
  * formulation — per iteration one equi-join (ranks ⋈ edges on src,
  * outdeg folded into the edge list ONCE up front), one
  * map-side-combinable long-sum aggregate per dst, one broadcast
  * 1-row dangling scalar; ranks persist per iteration (bounded: one
  * row per node) so the plan depth stays constant instead of growing
  * with the iteration count. No driver collects — the dangling mass
  * rides a broadcast join, not an action.
  */
object PageRank {

  /** @param nodes one column `node` (distinct node ids, long)
    * @param edges columns `src`, `dst` (longs; deduplicated and
    *              self-loop-free — callers with raw links should
    *              `.distinct()` and filter first)
    * @return (node, rank_pico, rank) after `iters` iterations */
  def ranks(
      nodes: DataFrame,
      edges: DataFrame,
      iters: Int = 10,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < num < den, got $dampNum/$dampDen")
    val M = 1000000000000L // total picorank mass
    val spark = nodes.sparkSession
    val P = spark.sessionState.conf.numShufflePartitions

    // outdeg folded into the edge list once: (src, dst, __deg).
    // localCheckpoint (eager) rather than persist: each iteration
    // references the previous ranks TWICE (inbound shares + dangling
    // mass), so an uncut lineage doubles per iteration — 2^iters
    // analysis blowup. Checkpointing truncates the logical plan to the
    // materialized RDD, bounding every iteration's plan at constant
    // depth (the standard iterative-graph cadence; GraphX checkpoints
    // on the same schedule).
    //
    // The edge table — the only corpus-scale side — is checkpointed
    // once (explicit P partitions on src so the materialized layout is
    // deterministic); the node table and the dangling src set are
    // likewise checkpointed ONCE instead of being re-derived from
    // their upstream lineage in every iteration's job. MEASURED NOTE
    // (round 16): under AQE the checkpoint's LogicalRDD reports
    // UnknownPartitioning, so the src layout is NOT visible to the
    // planner — what makes the iteration fast is AQE itself, which
    // sees the node-sized rank shuffle at runtime and converts each
    // iteration's join to a broadcast of the RANK table with local
    // shuffle reads of the edge side. Alternatives that pin the
    // layout statically were tried and REVERTED as strictly slower at
    // sf0.1/32: persist()+merge hint (sorted InMemoryRelation, no
    // edge exchange) ran q_pagerank 5.5→8.6 s — columnar cache decode
    // per iteration outweighs the saved exchange; an AQE-off
    // checkpoint (partitioning captured, SMJ with edge side in place)
    // ran 5.5→7.9 s — the static SMJ forgoes the adaptive rank-table
    // broadcast. At cluster scale, where ranks outgrow broadcast, AQE
    // falls back to SMJ on its own — the adaptive form stays right.
    // (The rank table itself is rebuilt each iteration anyway, so it
    // is NOT re-partitioned per step — an extra exchange of the small
    // side costs more than it saves.) Partitioning cannot affect
    // values: every cross-partition quantity is an exact long sum.
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val eD = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .join(deg, Seq("src"))
      .repartition(P, col("src")).localCheckpoint()
    // distinct over the checkpointed edge layout: already clustered by
    // src, so no exchange; node-count-sized, reused by every iteration
    val srcs = eD.select(col("src").as("node")).distinct().localCheckpoint()
    val n1 = nodes.select(col("node").cast("long").as("node"))
      .repartition(P, col("node")).localCheckpoint()
    // the node count as a driver scalar (bounded: one long) — the
    // per-iteration crossJoin broadcast re-derived the node table
    // every iteration just to read this one number
    val nC = n1.count()
    require(nC > 0, "PageRank needs at least one node")
    val baseShare = ((dampDen - dampNum) * M / dampDen) / nC // longs > 0: / == div

    var r = n1.select(col("node"), lit(M / nC).as("__r")).localCheckpoint()
    for (_ <- 0 until iters) {
      val prev = r
      val inbound = eD.join(prev.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("__r div __deg")).as("__in"))
      val dang = broadcast(
        prev.join(srcs, Seq("node"), "left_anti")
          .agg(coalesce(sum(col("__r")), lit(0L)).as("__dang")))
      r = n1.join(inbound, Seq("node"), "left")
        .crossJoin(dang)
        .select(col("node"), expr(
          s"$baseShare + " +
          s"($dampNum * (coalesce(__in, 0L) + __dang div $nC) div $dampDen)")
          .as("__r"))
        .localCheckpoint()
    }
    r.select(col("node"), col("__r").as("rank_pico"),
      (col("__r").cast("double") / lit(1e12)).as("rank"))
  }
}
