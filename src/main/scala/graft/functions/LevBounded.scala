package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Band-limited Levenshtein distance with early exit — the verify
  * kernel edit-similarity dedup needs and the builtin lacks: Spark's
  * `levenshtein(l, r, threshold)` takes one GLOBAL Int threshold,
  * while a similarity predicate `sim >= minSim` bounds each pair by
  * its OWN length (`lev <= floor(maxLen·(1−minSim))`). This expression
  * takes the bound as a third COLUMN.
  *
  * Semantics: the exact code-point Levenshtein distance when it is
  * <= bound, else −1 (never a clamped value — callers filter on >= 0
  * and keep the exact distance for survivors). A negative bound
  * yields −1; null in yields null out.
  *
  * Algorithm: the classic Ukkonen band — the DP evaluates only cells
  * with |i−j| <= bound, O((2·bound+1)·min(m,n)) instead of O(m·n),
  * and exits the moment a full band row exceeds the bound (the
  * monotone-diagonal property makes that final). For verify workloads
  * at tight thresholds the bound is a small fraction of the length,
  * so the DP is linear-ish per pair; LSH false-positive candidates
  * exit within a few rows. Registered as `graft_lev_bounded` via
  * [[GraftExtensions]]; both eval paths share one static kernel.
  */
case class LevBounded(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_lev_bounded requires (string, string, int), " +
          s"got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    LevBounded.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      t.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, t) =>
      s"graft.functions.LevBounded.dist($a, $b, $t)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LevBounded =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "graft_lev_bounded"
}

object LevBounded {

  /** Exact code-point Levenshtein if <= bound, else −1. */
  def dist(a: UTF8String, b: UTF8String, bound: Int): Int = {
    if (bound < 0) return -1
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    // iterate over the longer string so the band rows are shorter
    val (p, q) = if (s.length <= t.length) (s, t) else (t, s)
    val n = p.length
    val m = q.length
    if (m.toLong - n > bound) return -1
    if (n == 0) return m // m <= bound here
    // distance <= m (the longer length), so a larger bound changes
    // nothing — clamping also keeps i + bound from overflowing
    val bnd = math.min(bound, m)
    // two banded rows over the shorter dimension, j in [i−bnd, i+bnd]
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var j = 0
    while (j <= math.min(n, bnd)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      val lo = math.max(1, i - bnd)
      val hi = math.min(n, i + bnd)
      cur(lo - 1) = if (lo == 1) i else Int.MaxValue - 1
      var rowMin = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (q(i - 1) == p(j - 1)) 0 else 1)
        // neighbors outside the band are by construction > bnd
        val del =
          if (j - 1 >= i - bnd && j - 1 <= i - 1 + bnd) cur(j - 1) + 1
          else Int.MaxValue - 1
        val ins =
          if (j >= i - 1 - bnd && j <= i - 1 + bnd) prev(j) + 1
          else Int.MaxValue - 1
        val v = math.min(sub, math.min(del, ins))
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      // the band-row minimum lower-bounds every later cell — once it
      // exceeds the bound no path can come back under it
      if (rowMin > bnd) return -1
      System.arraycopy(cur, lo - 1, prev, lo - 1, hi - lo + 2)
      i += 1
    }
    val d = prev(n)
    if (d > bnd) -1 else d
  }
}
