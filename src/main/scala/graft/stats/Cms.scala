package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Count-Min Sketch frequency estimation (Cormode & Muthukrishnan
  * 2005), built — like the rest of the sketch family (Misra-Gries
  * prefilter, MinHash, SimHash, Bloom, HLL) — so every estimate is
  * BIT-REPRODUCIBLE across engines.
  *
  * The 100 TB story: "how often does this token / URL / template
  * appear?" asked of a corpus too big to keep a full frequency table
  * warm. A groupBy-count shuffles the entire distinct-key long tail
  * (the problem [[graft.text.HeavyHitters]] solves for the top of the
  * distribution); CMS answers POINT queries about ANY key from a fixed
  * d×w counter grid built in one map-side-combinable pass. Each key
  * increments d counters (one per row, column = double hash mod w);
  * the estimate is the MIN over its d counters — an overcount-only
  * bound (never an undercount, the one-sided mirror of Bloom's
  * no-false-negative guarantee): est >= true, and
  * P[est > true + eps*N] <= delta at w = ceil(e/eps), d = ceil(ln(1/delta)).
  *
  * Spark-first shape: the grid is NOT a custom kernel — the build is
  * `explode(positions) groupBy pos count`, which Catalyst partial-
  * aggregates to at most d*w rows per map partition (the
  * [[Hll.registerTable]] precedent: the sketch is a tiny mergeable
  * TABLE, merge = per-cell SUM, and persisting it answers point
  * queries over any union of batches without re-touching the data).
  * Probes are scan-local: the bounded grid rides the plan as a
  * literal (small w*d) or a real Spark broadcast via the codegen'd
  * [[graft.functions.CmsMinBcast]] kernel (the Bloom probe/probeBcast
  * split) — no join, no shuffle on the probe side.
  *
  * Determinism: positions are Kirsch-Mitzenmacher double-md5
  * (col_j = (h1 + j*h2') mod w, domain-separated hash56 halves — the
  * [[graft.text.Bloom.positions]] scheme), counters are exact longs,
  * and the estimate is an integer min — no float anywhere, so the
  * DuckDB oracle replays the grid and every estimate verbatim,
  * collisions included.
  */
object Cms {

  /** Classic sizing: w = ceil(e / eps) columns bound the overcount by
    * eps*N with probability 1 - delta at d = ceil(ln(1/delta)) rows. */
  def sizeFor(eps: Double, delta: Double): (Int, Int) = {
    require(eps > 0 && eps < 1 && delta > 0 && delta < 1,
      s"need eps, delta in (0,1), got eps=$eps delta=$delta")
    val w = math.ceil(math.E / eps).toInt
    val d = math.ceil(math.log(1.0 / delta)).toInt.max(1)
    (w, d)
  }

  /** The d flattened grid positions of one key: row j holds
    * j*w + (h1 + j*h2') mod w, with h1 = hash56("gc1:"||key) mod w and
    * h2' = 1 + hash56("gc2:"||key) mod (w-1) (never 0, so the d probes
    * never collapse to one column). All builtin codegen'd functions —
    * the oracle replays this verbatim. */
  def positions(key: Column, w: Int, d: Int): Column = {
    require(w >= 2, s"w must be >= 2, got $w")
    require(d >= 1 && d <= 16, s"d must be in [1, 16], got $d")
    val h1 = TextOps.hash56(concat(lit("gc1:"), key)) % w
    val h2 = lit(1L) + TextOps.hash56(concat(lit("gc2:"), key)) % (w - 1)
    transform(sequence(lit(0L), lit((d - 1).toLong)),
      j => j * w + (h1 + j * h2) % w)
  }

  /** The sketch itself: one (`__pos`, `__c`) row per touched grid cell
    * — at most d*w rows regardless of input size, built by one
    * map-side-combinable aggregate (each map partition collapses to
    * <= d*w rows before the shuffle). `weight` defaults to 1 per input
    * row; pass a count column to fold pre-aggregated data. THIS is the
    * artifact to persist for incremental profiling: sketch each batch
    * once and answer point queries over any union of batches via
    * [[mergeCounterTables]] (per-cell sum — associative/commutative,
    * exactly the grid the union of the raw batches would build). */
  def counterTable(df: DataFrame, key: Column, w: Int, d: Int,
      weight: Column = lit(1L)): DataFrame =
    df.select(explode(positions(key, w, d)).as("__pos"),
        weight.cast("long").as("__w"))
      .groupBy("__pos")
      .agg(sum("__w").as("__c"))

  /** Union of sketches: per-cell sum over any number of counter
    * tables. estimate(merge(cms(A), cms(B))) == estimate(cms(A ++ B))
    * exactly — identical counters, not an approximation (CmsSpec pins
    * the bitwise equality). */
  def mergeCounterTables(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "mergeCounterTables needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy("__pos")
      .agg(sum("__c").as("__c"))
  }

  /** One pass over `df`: the full d*w grid as a flat long array
    * (row-major — cell (j, c) at index j*w + c, zeros filled). The
    * collected row count is bounded by d*w by construction,
    * corpus-size-independent (the [[graft.text.Bloom.buildFilter]]
    * contract). 8*d*w bytes: 32 KB at (w=1024, d=4), 16 MB at
    * (w=2^19, d=8) — past a broadcastable grid, shard the KEY SPACE
    * (one sketch per key-hash shard) rather than growing w. */
  def buildCounters(df: DataFrame, key: Column, w: Int, d: Int,
      weight: Column = lit(1L)): Array[Long] = {
    val rows = counterTable(df, key, w, d, weight)
      .collect() // bounded: <= d*w rows
    val grid = new Array[Long](d * w)
    rows.foreach(r => grid(r.getLong(0).toInt) = r.getLong(1))
    grid
  }

  /** Adds `out`: the CMS frequency estimate of `key` — min over its d
    * counters. Pure scan-local projection, no join, no shuffle (CmsSpec
    * pins the exchange-free plan). The grid rides the plan as an array
    * literal; past ~2^18 cells (2 MB) prefer [[estimateBcast]]. */
  def estimate(incoming: DataFrame, key: Column, grid: Array[Long],
      w: Int, d: Int, out: String = "cms_count"): DataFrame =
    incoming
      .withColumn("__cw", typedLit(grid.toSeq))
      .withColumn("__cp", positions(key, w, d))
      .withColumn(out, expr(
        "array_min(transform(__cp, p -> __cw[cast(p as int)]))"))
      .drop("__cw", "__cp")

  // One broadcast per grid instance (the Bloom.bcastMemo precedent):
  // a profiler probing many batches against the same snapshot must not
  // pile up multi-MB handles until the ContextCleaner GCs them. Weak
  // on BOTH sides (see BcastMemo) so dropped grids release their
  // broadcast blocks (advice r8).
  private val bcastMemo = new graft.functions.BcastMemo[Array[Long]]

  /** [[estimate]] with the grid as a real Spark broadcast — the scale
    * path for big grids, where a plan literal would be serialized into
    * every task binary. Bit-identical estimates to [[estimate]]
    * (CmsSpec pins parity). */
  def estimateBcast(incoming: DataFrame, key: Column, grid: Array[Long],
      w: Int, d: Int, out: String = "cms_count"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val bc = bcastMemo.getOrBroadcast(
      incoming.sparkSession.sparkContext, grid)
    val minC = column(graft.functions.CmsMinBcast(
      expression(positions(key, w, d)), bc))
    incoming.withColumn(out, minC)
  }
}
