package graft

import java.time.Duration

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Backward as-of join semantics: most-recent-at-or-before match,
  * unmatched-left nulls, exact-timestamp visibility, tolerance aging,
  * and duplicate-timestamp tie-breaks. */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def t(s: String) = ts(s)

  private lazy val quotes = Seq(
    ("A", t("2024-01-01"), 1.0, 101L),
    ("A", t("2024-01-03"), 2.0, 102L),
    ("A", t("2024-01-10"), 3.0, 103L),
    ("B", t("2024-01-05"), 9.0, 104L)
  ).toDF("sym", "ts", "px", "qid")

  private lazy val trades = Seq(
    ("A", t("2024-01-02"), 1),  // after q101
    ("A", t("2024-01-03"), 2),  // exactly at q102 -> visible
    ("A", t("2024-01-09"), 3),  // q102 still latest
    ("A", t("2024-01-20"), 4),  // q103
    ("B", t("2024-01-04"), 5),  // before any B quote -> null
    ("C", t("2024-01-04"), 6)   // key never quoted -> null
  ).toDF("sym", "ts", "tid")

  test("most recent at-or-before match per key; unmatched -> null") {
    val out = AsOfJoin.asof(trades, quotes, "ts", Seq("sym"), Seq("px", "qid"))
      .orderBy("tid").collect()
    val px = out.map(r => Option(r.getAs[Any]("asof_px")))
    assert(px.toSeq === Seq(Some(1.0), Some(2.0), Some(2.0), Some(3.0), None, None))
    assert(out.map(_.getAs[String]("sym")).toSeq === Seq("A", "A", "A", "A", "B", "C"))
    // left columns pass through untouched
    assert(out.map(_.getAs[Int]("tid")).toSeq === (1 to 6))
  }

  test("tolerance nulls matches older than the max age") {
    val out = AsOfJoin.asof(trades, quotes, "ts", Seq("sym"), Seq("px", "qid"),
        tolerance = Some(Duration.ofDays(2)))
      .orderBy("tid").collect()
    val px = out.map(r => Option(r.getAs[Any]("asof_px")))
    // tid=3 (6 days after q102) and tid=4 (10 days after q103) age out
    assert(px.toSeq === Seq(Some(1.0), Some(2.0), None, None, None, None))
  }

  test("matches a brute-force reference on random data (seeded)") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("A", "B", "C")
    def randTs() = t(f"2024-01-${1 + rnd.nextInt(28)}%02d")
    val qs = (1 to 60).map(i => (keys(rnd.nextInt(3)), randTs(), rnd.nextDouble(), i.toLong))
    // drop duplicate (key, ts) quote instants: ties are tieBreak territory
    val qd = qs.groupBy(q => (q._1, q._2)).map(_._2.head).toSeq
    val ts0 = (1 to 40).map(i => (keys(rnd.nextInt(3)), randTs(), 100 + i))
    val quotes = qd.toDF("sym", "ts", "px", "qid")
    val trades = ts0.toDF("sym", "ts", "tid")
    val out = AsOfJoin.asof(trades, quotes, "ts", Seq("sym"), Seq("px", "qid"))
      .collect().map(r => r.getAs[Int]("tid") ->
        Option(r.getAs[Any]("asof_qid")).map(_.asInstanceOf[Long])).toMap
    ts0.foreach { case (sym, tts, tid) =>
      val expect = qd.filter(q => q._1 == sym && !q._2.after(tts))
        .sortBy(_._2.getTime).lastOption.map(_._4)
      assert(out(tid) === expect, s"trade $tid ($sym @ $tts)")
    }
  }

  test("duplicate right timestamps: tieBreak largest wins") {
    val dupQuotes = Seq(
      ("A", t("2024-01-01"), 1.0, 7L),
      ("A", t("2024-01-01"), 2.0, 9L),
      ("A", t("2024-01-01"), 3.0, 8L)
    ).toDF("sym", "ts", "px", "qid")
    val one = Seq(("A", t("2024-01-02"), 1)).toDF("sym", "ts", "tid")
    val out = AsOfJoin.asof(one, dupQuotes, "ts", Seq("sym"), Seq("px", "qid"),
      tieBreak = Some("qid")).collect()
    assert(out.head.getAs[Long]("asof_qid") === 9L)
    assert(out.head.getAs[Double]("asof_px") === 2.0)
  }
}
