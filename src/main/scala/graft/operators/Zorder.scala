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
}
