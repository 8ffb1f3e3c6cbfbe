package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Drift

/** The volume-drift monitor: dense-spine zeros, the dead-source and
  * burst alerts, warmup suppression, and constant-history semantics. */
class DriftSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** events: `perHour(h)` rows for key in hour h (bucket ids 0..n-1). */
  private def eventsFor(key: String, perHour: Int => Int, hours: Int) =
    (0 until hours).flatMap(h => (0 until perHour(h)).map(i =>
      (key, h.toLong * 100 + i, h.toLong)))
      .toDF("src", "event_id", "bucket")

  private def drift(df: org.apache.spark.sql.DataFrame,
      lookback: Int = 6, z: Double = 3.0) =
    Drift.volumeDrift(df, "src", col("bucket"), lookback, z)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(6))).toSeq

  test("a flat source that dies alerts on its first silent hour") {
    // steady 10/hour for 20 hours, then silence — but the silent hours
    // produce NO event rows: only the dense spine can see them, and it
    // does because another live key extends the global bucket range
    val dead = eventsFor("dead", h => if (h < 20) 10 else 0, 20)
    val live = eventsFor("live", _ => 5, 30)
    val out = drift(dead.unionByName(live))
    val deadRows = out.filter(_._1 == "dead")
    assert(deadRows.length == 30, "spine must cover the silent tail")
    // hour 20: history = constant 10s (sigma 0), c = 0 -> alert
    val h20 = deadRows.find(_._2 == 20L).get
    assert(h20._3 == 0L && h20._5, "death hour must alert")
    // steady hours never alert; the live key never alerts
    assert(deadRows.filter(r => r._2 < 20).forall(!_._5))
    assert(out.filter(_._1 == "live").forall(!_._5))
  }

  test("a burst alerts; warmup hours never do") {
    val burst = eventsFor("b", h => if (h == 10) 500 else 8 + (h % 3), 15)
    val out = drift(burst)
    assert(out.find(_._2 == 10L).get._5, "the 60x burst must alert")
    // n_hist < lookback => no alert regardless of deviation
    assert(out.filter(_._4 < 6).forall(!_._5))
    // after the burst leaves the window, normal hours settle back
    assert(out.count(_._5) <= 3, "alerting should be the exception")
  }

  test("constant history with matching current never alerts; z is 0 there") {
    val flat = eventsFor("f", _ => 7, 12)
    val rows = Drift.volumeDrift(flat, "src", col("bucket"), 6, 3.0)
      .collect()
    assert(rows.forall(!_.getBoolean(6)))
    assert(rows.forall(_.getDouble(5) == 0.0), "sigma=0 hours report z=0")
  }
}
