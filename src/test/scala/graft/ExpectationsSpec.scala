package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Expectations
import graft.stats.Expectations._

/** The declarative data-quality gate: rule semantics (null handling,
  * set membership, uniqueness, count floors), empty-table behavior,
  * and exact-integer verdicts. */
class ExpectationsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(5.0), "A"),
    (Some(2L), Some(60.0), "X"),   // between + accepted violations
    (None, None, "N"),             // null id; null v is NOT a between violation
    (Some(2L), Some(7.0), "R"))    // duplicate id
    .toDF("id", "v", "flag")

  private def verdicts(rules: Seq[Rule]): Map[String, (Long, Long, Boolean)] =
    Expectations.check(df, rules).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("rule semantics: nulls, ranges, sets, uniqueness, count floor") {
    val v = verdicts(Seq(
      notNull("id"), between("v", 0.0, 50.0),
      acceptedValues("flag", Seq("A", "N", "R")),
      unique("id"), rowCountAtLeast(3L), rowCountAtLeast(10L)))
    assert(v("not_null:id") == ((1L, 1L, false)))
    // 60.0 violates; the NULL does not (pair with notNull to insist)
    assert(v("between:v:[0.0,50.0]") == ((1L, 1L, false)))
    assert(v("accepted:flag:{A|N|R}") == ((1L, 1L, false)))
    // ids 1, 2, null, 2: null-safe grouping — a single null key is NOT
    // a duplicate (SQL DISTINCT keeps one NULL group); duplicates =
    // rows beyond the first per group = 1 (the second id=2)
    assert(v("unique:id") == ((1L, 1L, false)))
    assert(v("row_count_at_least:3") == ((4L, 0L, true)))
    assert(v("row_count_at_least:10") == ((4L, 6L, false)))
  }

  test("a fully clean table passes every rule") {
    val clean = Seq((1L, 1.0, "A"), (2L, 2.0, "N")).toDF("id", "v", "flag")
    val out = Expectations.check(clean, Seq(
      notNull("id"), between("v", 0.0, 50.0),
      acceptedValues("flag", Seq("A", "N")), unique("id"),
      rowCountAtLeast(2L))).collect()
    assert(out.length == 5 && out.forall(_.getBoolean(3)))
  }

  test("empty table: count floor fails, everything else passes") {
    val empty = Seq.empty[(Long, Double, String)].toDF("id", "v", "flag")
    val out = Expectations.check(empty, Seq(
      notNull("id"), unique("id"), rowCountAtLeast(1L))).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(out("not_null:id") && out("unique:id"))
    assert(!out("row_count_at_least:1"))
  }

  test("unique: two all-null keys are one duplicate, matching SQL DISTINCT") {
    val d = Seq[(Option[Long], String)](
      (None, "a"), (None, "b"), (Some(1L), "c")).toDF("id", "x")
    val out = Expectations.check(d, Seq(unique("id"))).collect()
    assert(out.head.getLong(2) == 1L && !out.head.getBoolean(3))
  }

  test("rejects an empty rule set") {
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq.empty)
    }
  }
}
