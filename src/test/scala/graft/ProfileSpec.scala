package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Profile

/** Table-profile goldens: exact counts/min/max per type channel, the
  * '' / NaN sentinels on unused channels, HLL estimates in the
  * linear-counting band for tiny cardinalities, and determinism. */
class ProfileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(2.5), "a", Some(new Timestamp(1700000000000L))),
    (2L, Some(-1.25), "b", Some(new Timestamp(1700000060000L))),
    (3L, None, "a", None),
    (4L, Some(2.5), "c", Some(new Timestamp(1700000120000L))),
    (5L, Some(7.0), "a", Some(new Timestamp(1700000000000L))))
    .toDF("id", "x", "s", "ts")

  test("counts, min/max channels, and sentinels per column type") {
    val prof = Profile.profileTable(fixture, Seq("id", "x", "s", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.size == 4)
    prof.values.foreach(r => assert(r.getAs[Long]("n_rows") == 5L))
    // numeric channel: doubles, string channel blank
    val x = prof("x")
    assert(x.getAs[Long]("n_null") == 1L)
    assert(x.getAs[Double]("min_num") == -1.25)
    assert(x.getAs[Double]("max_num") == 7.0)
    assert(x.getAs[String]("min_str") == "" && x.getAs[String]("max_str") == "")
    // string channel: numeric channel NaN
    val s = prof("s")
    assert(s.getAs[Long]("n_null") == 0L)
    assert(s.getAs[Double]("min_num").isNaN && s.getAs[Double]("max_num").isNaN)
    assert(s.getAs[String]("min_str") == "a" && s.getAs[String]("max_str") == "c")
    // timestamp channel: formatted strings
    val ts = prof("ts")
    assert(ts.getAs[Long]("n_null") == 1L)
    assert(ts.getAs[String]("min_str") == "2023-11-14 22:13:20")
    assert(ts.getAs[String]("max_str") == "2023-11-14 22:15:20")
    // HLL at tiny cardinalities sits in the linear-counting band
    assert(math.abs(prof("id").getAs[Double]("hll_distinct") - 5.0) < 0.5)
    assert(math.abs(x.getAs[Double]("hll_distinct") - 3.0) < 0.5) // nulls excluded
    assert(math.abs(s.getAs[Double]("hll_distinct") - 3.0) < 0.5)
    assert(math.abs(ts.getAs[Double]("hll_distinct") - 3.0) < 0.5) // dup instant
  }

  test("profile is deterministic and partitioning-independent") {
    val a = Profile.profileTable(fixture.repartition(7), Seq("id", "x", "s"))
      .collect().map(_.toString).sorted.toSeq
    val b = Profile.profileTable(fixture.coalesce(1), Seq("id", "x", "s"))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("incremental: merged snapshot registers equal the union's profile") {
    import org.apache.spark.sql.functions.col
    val a = fixture.filter(col("id") <= 2)
    val b = fixture.filter(col("id") > 2)
    val cols = Seq("id", "x", "s")
    val merged = graft.stats.Hll.mergeRegisters(
      Seq(Profile.profileRegisters(a, cols), Profile.profileRegisters(b, cols)),
      Seq("column"))
    val mergedEst = Profile.estimateRegisters(merged)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val unionEst = Profile.profileTable(fixture, cols)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("hll_distinct")).toMap
    // bitwise: merged registers ARE the union's registers
    cols.foreach(c => assert(mergedEst(c) == unionEst(c), c))
  }

  test("profileArray: per-dimension stats over a vector column") {
    val df = Seq(
      (1L, Seq(1.0f, 5.0f, 0.0f)),
      (2L, Seq(2.0f, 5.0f, 0.0f)),
      (3L, Seq(3.0f, 5.0f, 0.0f))).toDF("vec_id", "embedding")
    val prof = Profile.profileArray(df, "embedding")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(prof.size == 3)
    prof.values.foreach(r => assert(r.getAs[Long]("n") == 3L))
    assert(prof(0).getAs[Double]("min_num") == 1.0 &&
      prof(0).getAs[Double]("max_num") == 3.0)
    // a constant dimension profiles as a single distinct value
    assert(math.abs(prof(1).getAs[Double]("n_distinct_est") - 1.0) < 0.1)
    assert(prof(1).getAs[Double]("min_num") == 5.0)
    assert(math.abs(prof(0).getAs[Double]("n_distinct_est") - 3.0) < 0.5)
  }

  test("all-null column: zero estimate, sentinel channels") {
    val df = Seq((1L, Option.empty[Double]), (2L, None))
      .toDF("id", "v")
    val r = Profile.profileTable(df, Seq("v"))
      .collect().head
    assert(r.getAs[Long]("n_null") == 2L)
    assert(r.getAs[Double]("hll_distinct") == 0.0)
    assert(r.getAs[Double]("min_num").isNaN)
  }
}
