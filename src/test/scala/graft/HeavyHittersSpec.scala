package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.HeavyHitters
import graft.text.HeavyHitters.MgSketch

class HeavyHittersSpec extends AnyFunSuite with SparkSpec {

  // ---- sketch unit behavior ----

  test("Misra-Gries hand trace: k=2 over a,b,a,c,a keeps a dominant") {
    val sk = new MgSketch(2)
    Seq("a", "b", "a", "c", "a").foreach(sk.add)
    // a: +1, b: +1, a: 2, c: decrement-all -> a=1, b gone; a: 2
    assert(sk.counters("a") == 2)
    assert(sk.n == 5)
    assert(sk.counters.size <= 2)
  }

  test("undercount bound: est >= true - n/(k+1) on adversarial data") {
    val k = 9
    val rnd = new Random(7)
    val items = Seq.fill(2000)(s"t${rnd.nextInt(40)}") ++ Seq.fill(500)("hot")
    val shuffled = rnd.shuffle(items)
    val sk = shuffled.foldLeft(new MgSketch(k))((s, x) => s.add(x))
    val trueCounts = shuffled.groupBy(identity).view.mapValues(_.size.toLong)
    val bound = shuffled.size.toLong / (k + 1)
    trueCounts.foreach { case (t, c) =>
      val est = sk.counters.getOrElse(t, 0L)
      assert(est <= c, s"$t overestimated: $est > $c")
      assert(est >= c - bound, s"$t undercut past the bound: $est < $c - $bound")
    }
  }

  test("merge keeps the bound: two halves merged vs one pass") {
    val k = 15
    val rnd = new Random(13)
    val data = Seq.fill(3000)(s"w${(rnd.nextGaussian().abs * 8).toInt}")
    val (l, r) = data.splitAt(1700)
    val merged = l.foldLeft(new MgSketch(k))(_ add _)
      .merge(r.foldLeft(new MgSketch(k))(_ add _))
    assert(merged.n == 3000)
    val bound = 3000L / (k + 1)
    val trueCounts = data.groupBy(identity).view.mapValues(_.size.toLong)
    trueCounts.foreach { case (t, c) =>
      val est = merged.counters.getOrElse(t, 0L)
      assert(est <= c && est >= c - bound,
        s"$t: est=$est true=$c bound=$bound")
    }
    assert(merged.counters.size <= k)
  }

  // ---- end-to-end operator ----

  test("exact heavy hitters on a skewed corpus match brute force") {
    import spark.implicits._
    val rnd = new Random(42)
    // zipf-ish: token z<i> with frequency ~ 1/i, plus a long random tail
    val words = (1 to 30).flatMap(i => Seq.fill(600 / i)(s"z$i")) ++
      Seq.fill(2000)(s"tail${rnd.nextInt(1500)}")
    val docs = rnd.shuffle(words).grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")

    val got = HeavyHitters.heavyHitters(docs, num = 1, den = 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

    val brute = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = words.size.toLong
    val expect = brute.filter { case (_, c) => c * 100 >= n }
    assert(got == expect, s"got ${got.size} expected ${expect.size}")
  }

  test("verify phase joins broadcast and output counts are exact") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong,
      "the quick fox " + ("rare" + i) + " jumps the")).toSeq
      .toDF("doc_id", "text")
    val hh = HeavyHitters.heavyHitters(docs, num = 1, den = 10)
    val plan = hh.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate join is not broadcast:\n$plan")
    val got = hh.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // 6 tokens/doc * 50 docs = 300; threshold 30
    assert(got == Map("the" -> 100L, "quick" -> 50L, "fox" -> 50L,
      "jumps" -> 50L))
  }

  test("capacity below den/num is rejected (guarantee would break)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(docs, num = 1, den = 1000, capacity = 10)
    }
  }
}
