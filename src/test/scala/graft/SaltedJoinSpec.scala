package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SaltedJoin

class SaltedJoinSpec extends AnyFunSuite with SparkSpec {

  // a zipf-ish skewed fact table: key 0 owns half the rows
  private def big(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (if (i % 2 == 0) 0L else (i % 13).toLong, s"row $i"))
      .toDF("k", "payload")
  }

  private def dim(): DataFrame = {
    import spark.implicits._
    (0L to 12L).map(k => (k, s"dim $k")).toDF("k", "attr")
  }

  test("salted join result equals the plain join, duplicates included") {
    val b = big(1000)
    val d = dim()
    def multiset(df: DataFrame): Map[(Long, String, String), Int] =
      df.select("k", "payload", "attr").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val salted = multiset(SaltedJoin.saltedJoin(b, d, "k", salts = 8))
    val plain = multiset(b.join(d, "k"))
    assert(salted == plain)
  }

  test("left join keeps unmatched big-side rows exactly once") {
    import spark.implicits._
    val b = Seq((1L, "a"), (99L, "orphan"), (99L, "orphan2"))
      .toDF("k", "payload")
    val out = SaltedJoin.saltedJoin(b, dim(), "k", salts = 4,
      joinType = "left")
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out.count(_._1 == 99L) == 2)
    assert(out.filter(_._1 == 99L).forall(_._3.isEmpty))
    assert(out.contains((1L, "a", Some("dim 1"))))
  }

  test("the hot key's rows spread across all salts") {
    val b = big(2000)
    val salted = b.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(8)).cast("int"))
    val hotSpread = salted.filter(col("k") === 0L)
      .groupBy("__salt").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hotSpread.keySet == (0 until 8).toSet,
      s"hot key only reached salts ${hotSpread.keySet}")
    // 1000 hot rows over 8 salts: no salt should hold more than ~3x fair
    assert(hotSpread.values.max <= 375, hotSpread.toString)
  }

  test("the physical join is on (key, salt) — the skew-breaking shape") {
    val j = SaltedJoin.saltedJoin(big(100), dim(), "k", salts = 4)
    val keys = j.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.catalyst.plans.logical.Join(_, _, _,
          Some(cond), _) => cond.references.map(_.name).toSet
    }.flatten.toSet
    assert(keys.contains("__salt"), keys.toString)
  }

  test("salts=1 degenerates to the plain join") {
    val out = SaltedJoin.saltedJoin(big(50), dim(), "k", salts = 1).count()
    assert(out == big(50).join(dim(), "k").count())
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedJoin(big(10), dim(), "k", salts = 0)
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.saltedJoin(big(10), dim(), "k", 2, joinType = "full")
    }
  }

  test("sketchSaltCounts: the zipf head gets salts > 1, the tail gets none") {
    // key 0 owns half the rows; each tail key ~1/26 of them
    val counts = SaltedJoin.sketchSaltCounts(big(2000), "k",
      maxSalts = 16, heavyFrac = 0.10).toMap
    assert(counts.contains("0"), counts.toString)
    assert(counts("0") >= 2 && counts("0") <= 16, counts.toString)
    // no tail key crosses the 10% share bar
    assert(counts.keySet == Set("0"), counts.toString)
    // salt count scales with the estimated share: half the table at a
    // 10% bar wants ~5 salts
    assert(counts("0") >= 4, counts.toString)
  }

  test("adaptiveSaltedJoin equals the plain join, duplicates included") {
    val b = big(1000)
    val d = dim()
    def multiset(df: DataFrame): Map[(Long, String, String), Int] =
      df.select("k", "payload", "attr").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val salted = multiset(
      SaltedJoin.adaptiveSaltedJoin(b, d, "k", maxSalts = 8, heavyFrac = 0.10))
    assert(salted == multiset(b.join(d, "k")))
  }

  test("adaptiveSaltedJoin: left-join orphans and null keys survive once") {
    import spark.implicits._
    val b = Seq((java.lang.Long.valueOf(1L), "a"),
        (java.lang.Long.valueOf(99L), "orphan"),
        (null.asInstanceOf[java.lang.Long], "nullkey"))
      .toDF("k", "payload")
    val out = SaltedJoin.adaptiveSaltedJoin(b, dim(), "k", maxSalts = 4,
        heavyFrac = 0.10, joinType = "left")
      .select("k", "payload", "attr").collect()
      .map(r => (Option(r.get(0)), r.getString(1), Option(r.getString(2))))
    assert(out.length == 3)
    assert(out.contains((Some(1L), "a", Some("dim 1"))))
    assert(out.contains((Some(99L), "orphan", None)))
    assert(out.contains((None, "nullkey", None)))
  }

  test("adaptiveSaltedJoin replicates the dim side only for heavy keys") {
    // with only key 0 heavy at maxSalts<=16, the salted dim has
    // |dim| - 1 tail rows (salt 0) + nSalts rows for key 0
    val counts = SaltedJoin.sketchSaltCounts(big(2000), "k",
      maxSalts = 16, heavyFrac = 0.10).toMap
    val ns = counts("0")
    // reproduce the internal small-side expansion to pin its size
    import spark.implicits._
    val hmap = counts.toSeq.toDF("__hk", "__ns")
    val saltedSmall = dim()
      .join(broadcast(hmap), col("k").cast("string") === col("__hk"), "left")
      .withColumn("__salt",
        explode(sequence(lit(0), coalesce(col("__ns"), lit(1)) - 1)))
    assert(saltedSmall.count() == (13 - 1) + ns)
  }
}
