package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LevBounded

/** The band-limited early-exit Levenshtein kernel: exact under the
  * bound, -1 past it, bitwise parity with a reference full DP. */
class LevBoundedSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(a: String, b: String, t: Int) =
    LevBounded.dist(UTF8String.fromString(a), UTF8String.fromString(b), t)

  test("kernel: exact under the bound, -1 past it, randomized full-DP parity") {
    assert(d("kitten", "sitting", 10) === 3)
    assert(d("kitten", "sitting", 3) === 3)
    assert(d("kitten", "sitting", 2) === -1)
    assert(d("", "", 0) === 0)
    assert(d("", "abc", 2) === -1)
    assert(d("", "abc", 3) === 3)
    assert(d("abc", "abc", 0) === 0)
    assert(d("abc", "abd", 0) === -1)
    assert(d("a", "b", Int.MaxValue) === 1) // clamped, no overflow
    assert(d("ab", "ba", -1) === -1)
    // randomized parity against a reference unbanded DP, every bound
    def ref(a: String, b: String): Int = {
      val (s, t) = (a.toCharArray, b.toCharArray)
      val dp = Array.tabulate(s.length + 1)(identity)
      for (j <- 1 to t.length) {
        var diag = dp(0); dp(0) = j
        for (i <- 1 to s.length) {
          val tmp = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            diag + (if (s(i - 1) == t(j - 1)) 0 else 1))
          diag = tmp
        }
      }
      dp(s.length)
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 400) {
      val a = (0 until rnd.nextInt(24))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val b = (0 until rnd.nextInt(24))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val truth = ref(a, b)
      for (t <- 0 to 26) {
        val got = d(a, b, t)
        assert(got === (if (truth <= t) truth else -1),
          s"'$a' vs '$b' at bound $t (truth $truth)")
      }
    }
  }

  test("expression: registered function, per-row bounds, null propagation") {
    val df = Seq(
      (Some("kitten"), "sitting", 3),
      (Some("kitten"), "sitting", 2),
      (None: Option[String], "x", 5)).toDF("a", "b", "t")
    val out = df.selectExpr("graft_lev_bounded(a, b, t) AS lv").collect()
    assert(out(0).getInt(0) === 3)
    assert(out(1).getInt(0) === -1)
    assert(out(2).isNullAt(0))
    // survivors of the banded verify carry the EXACT distance the
    // builtin computes — the editVerifiedNearDups contract
    val pairs = Seq(("abcdefgh", "abcxefgh"), ("aaaa", "aaab"))
      .toDF("x", "y")
    val both = pairs.selectExpr(
      "graft_lev_bounded(x, y, 4) AS banded",
      "levenshtein(x, y) AS full").collect()
    both.foreach(r => assert(r.getInt(0) === r.getInt(1).toInt))
  }
}
