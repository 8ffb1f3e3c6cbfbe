package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Cms

class CmsSpec extends AnyFunSuite with SparkSpec {

  private def corpus(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "token")
  }

  private val w = 512
  private val d = 4

  test("grid cells are exactly the per-position multiplicity sums") {
    val toks = corpus(Seq(1L -> "alpha", 2L -> "alpha", 3L -> "beta",
      4L -> "gamma", 5L -> "alpha"))
    val grid = Cms.buildCounters(toks, col("token"), w, d)
    val expected = toks
      .select(explode(Cms.positions(col("token"), w, d)).as("pos"))
      .groupBy("pos").count()
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    grid.zipWithIndex.foreach { case (c, i) =>
      assert(c == expected.getOrElse(i, 0L), s"cell $i")
    }
    assert(grid.sum == 5L * d) // every occurrence lands in d cells
  }

  test("estimates never undercount, and match exactly without collisions") {
    val toks = corpus((1L to 400L).flatMap(i =>
      // token t_i appears i % 7 + 1 times
      (0L to i % 7).map(r => (i * 10 + r) -> s"tok $i")))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact"))
    val grid = Cms.buildCounters(toks, col("token"), w, d)
    val est = Cms.estimate(exact, col("token"), grid, w, d)
      .select(col("token"), col("exact"), col("cms_count")).collect()
    est.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"undercount for ${r.getString(0)}"))
    // d=4 rows of w=512 on 400 distinct keys: a key collides in ALL
    // four rows with probability ~ (400/512)^4 ~ 0.37 — but the MIN
    // only overcounts when every row collides, so most keys are exact
    val overcounted = est.count(r => r.getLong(2) > r.getLong(1))
    assert(overcounted < est.length / 2, s"$overcounted/${est.length}")
    // and a roomy grid makes every estimate exact
    val big = Cms.buildCounters(toks, col("token"), 65536, d)
    val exactAll = Cms.estimate(exact, col("token"), big, 65536, d)
      .filter(col("cms_count") =!= col("exact")).count()
    assert(exactAll == 0)
  }

  test("weighted build equals building from the exploded raw rows") {
    val toks = corpus(Seq(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "y",
      5L -> "y", 6L -> "z"))
    val pre = toks.groupBy("token").agg(count(lit(1)).as("n"))
    val raw = Cms.buildCounters(toks, col("token"), w, d)
    val weighted = Cms.buildCounters(pre, col("token"), w, d, col("n"))
    assert(raw.toSeq == weighted.toSeq)
  }

  test("merge of batch sketches equals the union sketch, cell for cell") {
    val a = corpus((1L to 300L).map(i => i -> s"m ${i % 40}"))
    val b = corpus((1L to 200L).map(i => i -> s"m ${i % 57}"))
    val merged = Cms.mergeCounterTables(Seq(
        Cms.counterTable(a, col("token"), w, d),
        Cms.counterTable(b, col("token"), w, d)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val union = Cms.counterTable(a.unionByName(b), col("token"), w, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == union)
  }

  test("build is partition-independent (cell-for-cell equal grids)") {
    val toks = corpus((1L to 500L).map(i => i -> s"part ${i % 90}"))
    val one = Cms.buildCounters(toks.repartition(1), col("token"), w, d)
    val many = Cms.buildCounters(toks.repartition(7), col("token"), w, d)
    assert(one.toSeq == many.toSeq)
  }

  test("literal and broadcast estimates agree value-for-value") {
    val toks = corpus((1L to 400L).map(i => i -> s"p ${i % 63}"))
    val probes = corpus((1L to 100L).map(i =>
      i -> (if (i % 2 == 0) s"p ${i % 63}" else s"novel $i")))
    val grid = Cms.buildCounters(toks, col("token"), w, d)
    val lit0 = Cms.estimate(probes, col("token"), grid, w, d)
      .select("doc_id", "cms_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bc = Cms.estimateBcast(probes, col("token"), grid, w, d)
      .select("doc_id", "cms_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lit0 == bc)
    // absent keys may still overcount (collisions), but zero is common
    // at this density; all that is guaranteed is est >= 0
    assert(bc.values.forall(_ >= 0L))
  }

  test("bcast kernel: interpreted and codegen paths agree") {
    val toks = corpus((1L to 200L).map(i => i -> s"cg ${i % 31}"))
    val grid = Cms.buildCounters(toks, col("token"), w, d)
    def run(codegen: String): Map[Long, Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try Cms.estimateBcast(toks, col("token"), grid, w, d)
        .select("doc_id", "cms_count").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") == run("NO_CODEGEN"))
  }

  test("estimate is scan-local: no exchange, no join in the plan") {
    val toks = spark.range(50).select(col("id").as("doc_id"),
      concat(lit("plan tok "), col("id") % 9).as("token"))
    val grid = Cms.buildCounters(toks, col("token"), w, d)
    for (df <- Seq(Cms.estimate(toks, col("token"), grid, w, d),
                   Cms.estimateBcast(toks, col("token"), grid, w, d))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.toLowerCase.contains("join"), plan)
    }
  }

  test("broadcast estimate carries the bcast kernel, not an array literal") {
    val toks = spark.range(10).select(col("id").as("doc_id"),
      concat(lit("bc tok "), col("id")).as("token"))
    val grid = Cms.buildCounters(toks, col("token"), w, d)
    val plan = Cms.estimateBcast(toks, col("token"), grid, w, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_cms_min_bcast"), plan)
  }

  test("sizeFor: bigger budgets tighten the overcount") {
    val (w1, d1) = Cms.sizeFor(0.01, 0.05)
    assert(w1 == math.ceil(math.E / 0.01).toInt && d1 == 3)
    intercept[IllegalArgumentException] { Cms.sizeFor(0.0, 0.1) }
    intercept[IllegalArgumentException] { Cms.sizeFor(0.1, 1.5) }
    // empirical: total overcount shrinks as w grows, zipf-ish input
    val toks = corpus((1L to 2000L).map(i =>
      i -> s"z ${(math.sqrt(i.toDouble)).toInt}"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact"))
    def totalOver(width: Int): Long = {
      val g = Cms.buildCounters(toks, col("token"), width, d)
      Cms.estimate(exact, col("token"), g, width, d)
        .select(sum(col("cms_count") - col("exact"))).head.getLong(0)
    }
    val coarse = totalOver(64)
    val fine = totalOver(4096)
    assert(fine <= coarse, s"fine=$fine coarse=$coarse")
    assert(fine == 0L, s"4096 columns over 45 keys should be collision-free")
  }
}
