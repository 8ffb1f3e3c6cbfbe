package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bloom

class BloomSpec extends AnyFunSuite with SparkSpec {

  private def corpus(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val m = 4096
  private val k = 3

  test("filter bits are exactly the union of per-key positions") {
    val docs = corpus(Seq(1L -> "alpha beta", 2L -> "gamma", 3L -> "delta eps"))
    val filter = Bloom.buildFilter(docs, "text", m, k)
    val expected = docs
      .select(explode(Bloom.positions(col("text"), m, k)).as("pos"))
      .distinct().collect().map(_.getLong(0)).toSet
    val set = (0L until m.toLong).filter(b =>
      (filter((b >>> 6).toInt) & (1L << (b & 63))) != 0L).toSet
    assert(set == expected)
    assert(expected.size >= 3) // distinct keys set multiple bits
  }

  test("no false negatives: every existing key probes true") {
    val docs = corpus((1L to 100L).map(i => i -> s"document number $i"))
    val filter = Bloom.buildFilter(docs, "text", m, k)
    val probed = Bloom.probe(docs, "text", filter, m, k)
    assert(probed.filter(!col("maybe_seen")).count() == 0)
  }

  test("unseen keys probe false at adequate m (and small m forces FPs)") {
    val existing = corpus((1L to 200L).map(i => i -> s"seen $i"))
    val fresh = corpus((1L to 200L).map(i => i -> s"unseen $i"))
    // m=4096, n=200, k=3: fp ~ (1-e^{-3*200/4096})^3 ~ 3e-3 -> expect ~0-2
    val big = Bloom.buildFilter(existing, "text", m, k)
    val fpBig = Bloom.probe(fresh, "text", big, m, k)
      .filter(col("maybe_seen")).count()
    assert(fpBig <= 5)
    // m=128, n=200, k=3 saturates the filter -> nearly all probe true
    val small = Bloom.buildFilter(existing, "text", 128, k)
    val fpSmall = Bloom.probe(fresh, "text", small, 128, k)
      .filter(col("maybe_seen")).count()
    assert(fpSmall > 150)
  }

  test("build is partition-independent (word-for-word equal filters)") {
    val docs = corpus((1L to 500L).map(i => i -> s"part doc $i"))
    val one = Bloom.buildFilter(docs.repartition(1), "text", m, k)
    val many = Bloom.buildFilter(docs.repartition(7), "text", m, k)
    assert(one.toSeq == many.toSeq)
  }

  test("literal and broadcast probes agree verdict-for-verdict") {
    val existing = corpus((1L to 300L).map(i => i -> s"corpus $i"))
    val probeSet = corpus((1L to 600L).map(i =>
      i -> (if (i % 2 == 0) s"corpus ${i / 2}" else s"novel $i")))
    val filter = Bloom.buildFilter(existing, "text", m, k)
    val lit = Bloom.probe(probeSet, "text", filter, m, k)
      .select("doc_id", "maybe_seen").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bc = Bloom.probeBcast(probeSet, "text", filter, m, k)
      .select("doc_id", "maybe_seen").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(lit == bc)
    // every replayed key is seen (no false negatives through either path)
    (1L to 300L).filter(_ % 2 == 0).foreach(i => assert(lit(i)))
  }

  test("probe is scan-local: no exchange, no join in the plan") {
    // spark.range base so the probe projection survives into the
    // physical plan (a local fixture folds to LocalTableScan)
    val docs = spark.range(50).select(col("id").as("doc_id"),
      concat(lit("plan doc "), col("id")).as("text"))
    val filter = Bloom.buildFilter(docs, "text", m, k)
    for (df <- Seq(Bloom.probe(docs, "text", filter, m, k),
                   Bloom.probeBcast(docs, "text", filter, m, k))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.toLowerCase.contains("join"), plan)
    }
  }

  test("broadcast probe carries the bcast kernel, not an array literal") {
    // spark.range base: a local-relation fixture would be constant-folded
    // into a LocalTableScan, hiding the projection from the plan
    val docs = spark.range(10).select(col("id").as("doc_id"),
      concat(lit("bc doc "), col("id")).as("text"))
    val filter = Bloom.buildFilter(docs, "text", m, k)
    val plan = Bloom.probeBcast(docs, "text", filter, m, k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains_bcast"), plan)
  }

  test("sizeFor hits the requested false-positive rate empirically") {
    val n = 2000L
    val (mb, kb) = Bloom.sizeFor(n, 0.01)
    assert(mb % 64 == 0 && kb >= 1)
    val existing = corpus((1L to n).map(i => i -> s"sz $i"))
    val fresh = corpus((1L to 4000L).map(i => i -> s"novel $i"))
    val filter = Bloom.buildFilter(existing, "text", mb, kb)
    val fp = Bloom.probe(fresh, "text", filter, mb, kb)
      .filter(col("maybe_seen")).count()
    // 4000 probes at 1% target -> expect ~40; allow 3x
    assert(fp <= 120, s"$fp false positives for target 0.01")
    intercept[IllegalArgumentException] { Bloom.sizeFor(0, 0.01) }
    intercept[IllegalArgumentException] { Bloom.sizeFor(10, 1.5) }
  }

  test("semiJoinPrefilter: keeps every match, cuts misses, composes to the join") {
    import spark.implicits._
    val big = (1L to 2000L).map(i => (i % 200, s"fact $i")).toDF("k", "payload")
    val small = (0L to 9L).map(k => (k, s"dim $k")).toDF("k", "attr")
    val pre = Bloom.semiJoinPrefilter(big, "k", small, "k", m, k)
    // no false negatives: every true match survives the prefilter
    val matches = big.filter(col("k") < 10).count()
    assert(pre.filter(col("k") < 10).count() == matches)
    // selectivity: 10/200 keys -> the prefilter drops the bulk
    assert(pre.count() < big.count() / 2, s"${pre.count()} of ${big.count()}")
    // the composition with the real join IS the plain join
    val composed = pre.join(small, "k").select("k", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    val plain = big.join(small, "k").select("k", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    assert(composed == plain)
    // the probe stays the scan-local bit test inside the composed plan
    // (spark.range base — a local fixture folds to LocalTableScan and
    // hides the projection, the plan-pin precedent above)
    val bigR = spark.range(2000).select((col("id") % 200).as("k"),
      concat(lit("fact "), col("id")).as("payload"))
    val preR = Bloom.semiJoinPrefilter(bigR, "k", small, "k", m, k)
    val plan = preR.join(small, "k").queryExecution.executedPlan.toString
    // the unrolled scalar probe (k bit-test conjuncts, no per-row
    // array machinery) sits in a Filter ahead of the join; LONG keys
    // take the raw-xxhash64 path — no per-row string materialization
    assert(plan.contains("xxhash64") && plan.contains("shiftleft"), plan)
    assert(!plan.contains("graft_hash56") && !plan.contains("cast(k"),
      s"integral keys must not stringify for the probe:\n$plan")
    assert(!plan.contains("forall"),
      "probe regressed to the array-HOF spelling")
    // STRING keys keep the engine-replayable hash56 path and the same
    // composition guarantee
    val bigS = spark.range(500).select(
      concat(lit("key"), col("id") % 100).as("k"),
      col("id").as("payload"))
    val smallS = (0 until 30).map(i => (s"key$i", s"attr$i"))
      .toDF("k", "attr")
    val composedS = Bloom.semiJoinPrefilter(bigS, "k", smallS, "k", m, k)
      .join(smallS.withColumnRenamed("k", "ks"), col("k") === col("ks"))
      .select("k", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val plainS = bigS.join(smallS, "k").select("k", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(composedS == plainS && plainS.nonEmpty)
    val planS = Bloom.semiJoinPrefilter(bigS, "k", smallS, "k", m, k)
      .queryExecution.executedPlan.toString
    assert(planS.contains("graft_hash56"), planS)
  }

  test("semiJoinPrefilter drops null big-side keys on BOTH paths") {
    import spark.implicits._
    // integral path: xxhash64 would skip a null child and hand the row
    // a live position set — the explicit key gate must drop it anyway
    val bigI = Seq((Some(1L), "a"), (None, "null-key"), (Some(7L), "miss"))
      .toDF("k", "payload")
    val smallI = Seq((1L, "x"), (2L, "y")).toDF("k", "attr")
    val gotI = Bloom.semiJoinPrefilter(bigI, "k", smallI, "k", m, k)
      .select("payload").as[String].collect().sorted.toSeq
    assert(!gotI.contains("null-key") && gotI.contains("a"))
    // and a null key on the SMALL side must not resurrect big nulls
    val smallN = Seq((Some(1L), "x"), (Option.empty[Long], "ynull"))
      .toDF("k", "attr")
    val gotN = Bloom.semiJoinPrefilter(bigI, "k", smallN, "k", m, k)
      .select("payload").as[String].collect().sorted.toSeq
    assert(!gotN.contains("null-key"))
    // string path agrees (its null probe already yields a null verdict)
    val bigS = Seq((Some("a"), "s1"), (None, "snull")).toDF("k", "payload")
    val smallS = Seq(("a", "x")).toDF("k", "attr")
    val gotS = Bloom.semiJoinPrefilter(bigS, "k", smallS, "k", m, k)
      .select("payload").as[String].collect().toSeq
    assert(gotS === Seq("s1"))
  }

  test("incrementalDedup end-to-end: new batch vs existing corpus") {
    val existing = corpus((1L to 100L).map(i => i -> s"crawl-a $i"))
    val incoming = corpus(
      (1L to 50L).map(i => (1000L + i) -> s"crawl-a $i") ++ // replays
        (1L to 50L).map(i => (2000L + i) -> s"crawl-b $i")) // new
    val verdicts = Bloom.incrementalDedup(existing, incoming, "text", m, k)
      .select("doc_id", "maybe_seen").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (1L to 50L).foreach(i => assert(verdicts(1000L + i), s"replay $i missed"))
    val fp = (1L to 50L).count(i => verdicts(2000L + i))
    assert(fp <= 3, s"$fp false positives at fp-rate ~3e-3")
  }
}
