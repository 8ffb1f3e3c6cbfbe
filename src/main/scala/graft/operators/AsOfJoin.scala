package graft.operators

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks up the payload of the most
  * recent right row with `right.time <= left.time` for the same keys —
  * the canonical point-in-time lookup (trade->quote, event->state,
  * click->view attribution) that Spark has no built-in operator for.
  *
  * Scale design: NOT a range join (which Spark plans as a per-key
  * nested-loop or a sort-merge that materializes every left x right
  * pair per key before filtering). Instead the classic union+window
  * formulation: tag right rows 0 and left rows 1, union them, and
  * forward-fill the right payload over a per-key window ordered by
  * (time, tag). One shuffle on the by-keys, linear output, AQE-friendly
  * — the same shape at 1000 executors as at 1.
  *
  * Right rows at the exact left timestamp are visible (tag 0 sorts
  * first), matching DuckDB's `ASOF JOIN ... ON l.t >= r.t`, which the
  * oracle twin uses. Ties between right rows at the same (keys, time)
  * are broken by `tieBreak` (largest wins) when supplied.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns pass through
    * @param right     build side carrying `payloadCols` (+ the time and
    *                  key columns; its other columns are ignored)
    * @param timeCol   event-time column name present on both sides
    * @param byCols    equality keys
    * @param payloadCols right columns to attach (must not clash with
    *                  left column names; prefixed with `prefix`)
    * @param tolerance optional max age: matches older than this yield
    *                  null payload (pandas merge_asof tolerance)
    * @param tieBreak  optional right column ordering tie-break for
    *                  duplicate (keys, time) rows
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      timeCol: String,
      byCols: Seq[String],
      payloadCols: Seq[String],
      prefix: String = "asof_",
      tolerance: Option[Duration] = None,
      tieBreak: Option[String] = None): DataFrame = {
    val payload = struct(
      (payloadCols.map(col) :+ col(timeCol).as("__rt")): _*)
    val r = right
      .select((byCols :+ timeCol).map(col) :+ payload.as("__rv"): _*)
      .withColumn("__tag", lit(0))
    val l = left.withColumn("__tag", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)

    val order: Seq[Column] = col(timeCol) +: col("__tag") +:
      tieBreak.map(t => col("__rv").getField(t)).toSeq
    val w = Window.partitionBy(byCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = u
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val aged = tolerance match {
      case None => filled
      case Some(tol) =>
        // unix_micros keeps sub-second precision; matches older than the
        // tolerance are dropped (payload nulled), like pandas merge_asof
        filled.withColumn("__rv",
          when(unix_micros(col(timeCol)) - unix_micros(col("__rv.__rt")) <=
            tol.toNanos / 1000, col("__rv")))
    }
    aged.select(left.columns.toIndexedSeq.map(col) ++
      payloadCols.map(c => col(s"__rv.$c").as(s"$prefix$c")) :+
      col("__rv.__rt").as(s"${prefix}$timeCol"): _*)
  }
}
