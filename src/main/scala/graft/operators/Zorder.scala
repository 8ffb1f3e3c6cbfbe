package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data-layout clustering: interleave the bits of
  * several integer dimensions into one sort key so that sorting by it
  * co-locates rows that are close in EVERY dimension at once.
  *
  * The 100 TB story: parquet pruning is only as good as the layout.
  * A table sorted by one column prunes scans on that column and
  * nothing else; a Z-ordered table gives every clustered dimension
  * sub-linear file/row-group pruning simultaneously, because each
  * written file covers a small hyper-rectangle of the key space —
  * min/max footer stats then exclude most files for any conjunctive
  * range predicate (the layout trick behind Delta/Iceberg OPTIMIZE
  * ZORDER). ZorderSpec measures this directly: bounding-box pruning
  * over written files vs the unclustered layout.
  *
  * The z-value is pure builtin bit arithmetic — shift/and/or terms,
  * whole-stage-codegen'd, replayed verbatim by the DuckDB oracle
  * (q_zorder) — and `clusterBy` is declarative Spark: range-partition
  * on the z-value, sort within partitions, let the writer emit one
  * tight hyper-rectangle per file. No custom partitioner, no RDDs.
  *
  * The alphalens reference has no storage layout concerns (in-memory
  * pandas); this extends the engine's write path the way §2.1's
  * sources extend its read path.
  */
object Zorder {

  /** Morton interleave: bit b of `cols(j)` lands at z-bit `b * n + j`
    * (dimension-round-robin, LSB first). Inputs must be non-negative
    * and < 2^bits — values at or past 2^bits would alias distant keys
    * into the same z-prefix and silently destroy locality, so the
    * caller picks `bits` from the domain (require-checked per row). */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 1, "zvalue needs at least one column")
    require(bits >= 1 && bits * n <= 63,
      s"bits * nCols must fit a positive long, got $bits * $n")
    val lim = 1L << bits
    val guarded = cols.map(c => when(c.isNull, lit(null).cast("long"))
      .when(c < 0 || c >= lim, raise_error(concat(
        lit(s"zvalue input out of [0, $lim): "), c.cast("string"))))
      .otherwise(c.cast("long")))
    val terms = for {
      b <- 0 until bits
      (c, j) <- guarded.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + j)
    terms.reduce(_ + _)
  }

  /** Cluster `df` for writing: range-partition into `numFiles` output
    * partitions by z-value and sort within each, so every written file
    * covers one compact hyper-rectangle. `df.write.parquet(...)` after
    * this emits the pruned layout; the z column is dropped (it is a
    * layout key, not data). */
  def clusterBy(df: DataFrame, dims: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    val z = zvalue(dims.map(col), bits)
    df.withColumn("__zval", z)
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
  }

  /** Equi-depth bucket id per distinct value of `dim`: bucket(v) =
    * floor(rows_before(v) * 2^bits / N) — rank-based, so ANY orderable
    * dimension (prices, dates, strings, skewed ids) z-orders without
    * the caller pre-normalizing to small non-negative ints, and heavy
    * hitters cannot starve the rest of the bucket range.
    *
    * Scale shape: the cumulative count is a TWO-LEVEL prefix sum, not
    * a global window — per-range-partition running sums in parallel,
    * plus one tiny window over the per-partition totals (numParts
    * rows) broadcast back. The result is partitioning-INDEPENDENT
    * (rows_before(v) is defined by the value order alone), which is
    * what makes the bucket ids — and the z-values built from them —
    * oracle-replayable by a plain SQL window. Returns (value ->
    * bucket); join it back on `dim` to tag rows. */
  def rankBuckets(df: DataFrame, dim: String, bits: Int,
      numParts: Int = 0): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    bucketsFromHist(
      df.na.drop(Seq(dim)).groupBy(dim).agg(count(lit(1)).as("__c")),
      dim, bits, numParts)
  }

  /** Equi-depth bucket map from a (dim, __c) distinct-value histogram:
    * two-level prefix sum (see PrefixSum for the determinism contract,
    * advice r8) + the integer floor-div bucket id. */
  private def bucketsFromHist(hist: DataFrame, dim: String, bits: Int,
      numParts: Int): DataFrame = {
    val b = 1L << bits
    val total = hist.agg(sum("__c").as("__n"))
    PrefixSum.rowsBefore(hist, dim, numParts)
      .crossJoin(broadcast(total))
      .select(col(dim),
        // floor-div keeps everything integer-exact; rb*b must fit a
        // long, i.e. N < 2^63 / 2^bits — 2^43 rows at bits=20
        expr(s"(__rb * $b) div __n").as("__bucket"))
  }

  /** EVERY requested dimension's distinct-value histogram in ONE pass
    * over `df` (round-9 economy: the old per-dim `rankBuckets` loop
    * re-scanned the table once per clustered dimension — a d-dim
    * cluster key cost d full scans where one suffices). GROUPING SETS
    * {(d0), (d1), ...} lowers to a single scan + Expand + one
    * aggregate; each output row carries one dim's value (the others
    * null) and `__gid` = grouping_id() identifies which. Native value
    * types are preserved — no lossy melt-to-string. The result is
    * eagerly localCheckpoint'ed: the per-dim branches each filter the
    * SAME bounded materialization instead of re-running the scan. */
  private[graft] def multiHistogram(df: DataFrame, dims: Seq[String]): DataFrame =
    multiHistogramPlan(df, dims).localCheckpoint(true)

  /** The pre-checkpoint one-scan plan (ZorderSpec asserts its shape —
    * the checkpointed Dataset's own plan is just the cached blocks). */
  private[graft] def multiHistogramPlan(df: DataFrame, dims: Seq[String]): DataFrame =
    df.groupingSets(dims.map(d => Seq(col(d))), dims.map(col): _*)
      .agg(count(lit(1)).as("__c"), grouping_id().as("__gid"))

  /** [[zvalue]] over rank buckets: one shared histogram pass, then per
    * dimension a bounded prefix sum and a distinct-value-sized
    * equi-join back (never all-pairs). Null dims bucket to 0
    * (nulls-first layout). */
  def zvalueByRank(df: DataFrame, dims: Seq[String], bits: Int,
      zcol: String = "__zval"): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    val n = dims.length
    val melted = if (n == 1) null else multiHistogram(df, dims)
    def bucketMap(j: Int): DataFrame = {
      val dim = dims(j)
      if (n == 1) rankBuckets(df, dim, bits)
      else {
        // grouping_id: bit (n-1-j) is CLEAR exactly when dims(j) is
        // the grouped column of the set
        val mask = (1 << n) - 1 - (1 << (n - 1 - j))
        bucketsFromHist(
          melted.filter(col("__gid") === mask && col(dim).isNotNull)
            .select(col(dim), col("__c")),
          dim, bits, numParts = 0)
      }
    }
    val tagged = dims.zipWithIndex.foldLeft(df) { case (d, (dim, j)) =>
      d.join(bucketMap(j).withColumnRenamed("__bucket", s"__b$j"),
          Seq(dim), "left")
        .withColumn(s"__b$j", coalesce(col(s"__b$j"), lit(0L)))
    }
    tagged
      .withColumn(zcol,
        zvalue(dims.indices.map(j => col(s"__b$j")), bits))
      .drop(dims.indices.map(j => s"__b$j"): _*)
  }

  /** [[clusterBy]] for arbitrary orderable dimensions: rank-bucket,
    * interleave, range-partition, sort, drop the layout key. */
  def clusterByRank(df: DataFrame, dims: Seq[String], bits: Int,
      numFiles: Int): DataFrame =
    zvalueByRank(df, dims, bits)
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")

  /** [[zvalueByRank]] with every rank computed WITHIN a group (round
    * 15 — the pooled partitioned-OPTIMIZE path): ONE grouping-sets
    * pass yields every (group, dim) distinct-value histogram, prefix
    * sums run as windows PARTITIONED BY GROUP (parallel across
    * groups; sized by a group's distinct values per dim — for a few
    * huge high-cardinality leaves prefer the flat [[zvalueByRank]]
    * per leaf, whose two-level prefix sum splits inside the leaf),
    * and the equi-depth buckets join back on (group, value). The
    * point: tagging N groups costs O(1) jobs, not O(N) — the
    * per-branch eager histogram + range-sampling jobs are what made
    * a many-leaf OPTIMIZE driver-bound. */
  def zvalueByRankGrouped(df: DataFrame, groupCol: String,
      dims: Seq[String], bits: Int,
      zcol: String = "__zval"): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    val b = 1L << bits
    val n = dims.length
    val melted = df.groupingSets(
        dims.map(d => Seq(col(groupCol), col(d))),
        (col(groupCol) +: dims.map(col)): _*)
      .agg(count(lit(1)).as("__c"), grouping_id().as("__gid"))
      .localCheckpoint(true)
    def bucketMap(j: Int): DataFrame = {
      val dim = dims(j)
      // gid over (group, d0..d(n-1)): group is ALWAYS grouped (bit n
      // clear); set j additionally grounds dims(j) (bit n-1-j clear)
      val mask = (1 << n) - 1 - (1 << (n - 1 - j))
      val hist = melted
        .filter(col("__gid") === mask && col(dim).isNotNull)
        .select(col(groupCol), col(dim), col("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCol).orderBy(col(dim))
        .rowsBetween(Long.MinValue, 0)
      val tot = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCol)
      hist
        .withColumn("__rb", sum("__c").over(w) - col("__c"))
        .withColumn("__n", sum("__c").over(tot))
        .select(col(groupCol), col(dim),
          expr(s"(__rb * $b) div __n").as("__bucket"))
    }
    val tagged = dims.zipWithIndex.foldLeft(df) { case (d, (dim, j)) =>
      d.join(bucketMap(j).withColumnRenamed("__bucket", s"__b$j"),
          Seq(groupCol, dim), "left")
        .withColumn(s"__b$j", coalesce(col(s"__b$j"), lit(0L)))
    }
    tagged
      .withColumn(zcol, zvalue(dims.indices.map(j => col(s"__b$j")), bits))
      .drop(dims.indices.map(j => s"__b$j"): _*)
  }
}
