package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** HyperLogLog distinct-count estimation (Flajolet 2007), built so the
  * estimate is BIT-REPRODUCIBLE across engines — the sketch-family
  * pattern (Misra-Gries prefilter, MinHash, SimHash, Bloom) applied to
  * cardinality: profiling 100 TB ("how many distinct URLs / tokens /
  * users per partition?") cannot afford count(DISTINCT)'s full shuffle
  * of the key set; HLL reduces each group to m = 2^p registers
  * (max-combinable, so partial aggregation collapses every map
  * partition to <= m rows per group) and reads an estimate off them.
  *
  * Determinism, the same playbook as the Bloom/PMI/unigram-LM oracles:
  * the register build is integer-exact (md5-56 hash; bucket = top p
  * bits; rho from the BINARY STRING LENGTH of the remaining bits —
  * `length(bin(w))`, exact in both engines, never floating log2), the
  * harmonic sum Σ 2^-M_j is computed as the exact integer
  * Σ 2^(maxRho - M_j) (every term a long shift; zeros contribute
  * 2^maxRho each), and the two float steps — the raw estimate's one
  * multiply-divide and the linear-counting ln — are snapped to the
  * 1e-6 grid immediately (the ln-snap precedent), so DuckDB replays
  * the estimate to the last bit, standard ±1.04/sqrt(m) error and all.
  *
  * Spark's own `approx_count_distinct` is the same algorithm but its
  * estimate is not replayable by an external engine; this one is the
  * oracle-able twin, and the register table itself is plain
  * `groupBy(bucket).agg(max(rho))` — Catalyst partial-aggregates it
  * with no custom code in the hot path.
  */
object Hll {

  /** Per-group distinct estimate of `key`. Output: groupCols +
    * `out` (1e-6-snapped double). p in [9, 14]: below 9 the bias
    * corrections the classic paper needs for tiny m aren't worth
    * replicating; above 14 the register table stops being "tiny". */
  def distinctEstimate(
      df: DataFrame,
      key: Column,
      groupCols: Seq[String],
      p: Int,
      out: String = "hll_distinct"): DataFrame =
    estimateFromRegisters(registerTable(df, key, groupCols, p),
      groupCols, p, out)

  /** The sketch itself: one (`__bucket`, `__r`) row per non-zero
    * register per group — at most m rows/group, max-combinable. THIS is
    * the artifact to persist for incremental profiling: sketch each
    * batch/day once, store the tiny table, and answer "distinct over
    * any union of batches" by [[mergeRegisters]] + [[estimateFromRegisters]]
    * without touching the raw data again (registers are a semilattice:
    * merge = per-bucket max, associative/commutative/idempotent). */
  def registerTable(
      df: DataFrame,
      key: Column,
      groupCols: Seq[String],
      p: Int): DataFrame = {
    val (bucket, rho) = bucketRho(key, p)
    df.select((groupCols.map(col) :+ bucket.as("__bucket")) :+
        rho.as("__rho"): _*)
      .groupBy((groupCols :+ "__bucket").map(col): _*)
      .agg(max("__rho").as("__r"))
  }

  /** The per-row sketch projection (register bucket, rank): bucket =
    * top p hash bits, rho = leading-zero rank of the rest — the
    * stateless half of [[registerTable]], exposed so other groupings
    * (e.g. [[graft.streaming.Streaming]]'s event-time windows) can
    * build the identical registers. */
  def bucketRho(key: Column, p: Int): (Column, Column) = {
    require(p >= 9 && p <= 14, s"p must be in [9, 14], got $p")
    val h = TextOps.hash56(key)
    val bucket = shiftright(h, 56 - p)
    val w = h.bitwiseAND(lit((1L << (56 - p)) - 1))
    // bit length of w via the binary string — exact integer in both
    // engines; w = 0 has no set bit, giving rho = maxRho
    val bitLen = when(w === 0L, lit(0)).otherwise(length(bin(w)))
    val rho = lit(56 - p + 1) - bitLen
    (bucket, rho)
  }

  /** Union of sketches: per-(group, bucket) max over any number of
    * register tables. estimate(merge(regs(A), regs(B))) is EXACTLY
    * estimate(regs(A ∪ B)) — not an approximation of the union, the
    * identical registers (HllSpec pins the bitwise equality). */
  def mergeRegisters(tables: Seq[DataFrame],
      groupCols: Seq[String]): DataFrame = {
    require(tables.nonEmpty, "mergeRegisters needs at least one table")
    tables.reduce(_ unionByName _)
      .groupBy((groupCols :+ "__bucket").map(col): _*)
      .agg(max("__r").as("__r"))
  }

  /** Read the estimate off a register table ([[registerTable]] /
    * [[mergeRegisters]] output). */
  def estimateFromRegisters(
      regs: DataFrame,
      groupCols: Seq[String],
      p: Int,
      out: String = "hll_distinct"): DataFrame = {
    require(p >= 9 && p <= 14, s"p must be in [9, 14], got $p")
    val m = 1 << p
    val maxRho = 56 - p + 1
    val alphaM2 = alpha(m) * m.toDouble * m.toDouble
    val scale = math.pow(2.0, maxRho.toDouble) // 2^maxRho, exact
    val agg = regs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__nnz"),
        sum(expr(s"shiftleft(1L, cast($maxRho - __r as int))")).as("__s"))
      .withColumn("__zeros", lit(m.toLong) - col("__nnz"))
      .withColumn("__st",
        col("__zeros") * lit(1L << maxRho) + col("__s"))
    // raw estimate alpha*m^2 / (st / 2^maxRho), one multiply-divide,
    // snapped; linear counting for the small range (zeros > 0 and raw
    // under 2.5m), its ln snapped before and after the m-scale
    val rawE = round(lit(alphaM2) * lit(scale) / col("__st").cast("double"), 6)
    val linear = round(lit(m.toDouble) *
      round(log(lit(m.toDouble) / col("__zeros").cast("double")), 6), 6)
    agg.select(groupCols.map(col) :+
      when(col("__zeros") > 0L && rawE <= lit(2.5 * m), linear)
        .otherwise(rawE).as(out): _*)
  }

  /** Classic alpha_m for m >= 128. */
  def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m.toDouble)
}
