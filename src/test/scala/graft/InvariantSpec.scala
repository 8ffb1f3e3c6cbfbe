package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Pipelines
import graft.perf.{Information, Returns, Turnover}

/** Operator invariants on the sf0.001 fixture (SURVEY §5 plan item 3):
  * properties the reference implies, checked over a real panel rather
  * than synthetic micro-fixtures. */
class InvariantSpec extends AnyFunSuite with SparkSpec {

  private lazy val fd = Pipelines.factorData(spark, "/root/testdata/sf0.001")

  test("weights: gross leverage 1 per date (performance.py:193)") {
    val gross = Returns.factorWeights(fd)
      .groupBy("date").agg(sum(abs(col("weight"))).as("g")).collect()
    gross.foreach(r => assertClose(r.getAs[Double]("g"), 1.0, 1e-9))
  }

  test("weights: demeaned weights sum to 0 per date") {
    val net = Returns.factorWeights(fd, demeaned = true)
      .groupBy("date").agg(sum(col("weight")).as("s")).collect()
    net.foreach(r => assertClose(r.getAs[Double]("s"), 0.0, 1e-9))
  }

  test("equal-weight long-only weights are uniform per date") {
    val w = Returns.factorWeights(fd, demeaned = false, equalWeight = true)
      .groupBy("date")
      .agg(min("weight").as("mn"), max("weight").as("mx"),
        count(lit(1)).as("n")).collect()
    w.foreach { r =>
      assertClose(r.getAs[Double]("mn"), r.getAs[Double]("mx"), 1e-12)
      assertClose(r.getAs[Double]("mn"), 1.0 / r.getAs[Long]("n"), 1e-12)
    }
  }

  test("IC values lie in [-1, 1]") {
    val ic = Information.factorInformationCoefficient(fd).collect()
    fd.returnCols.foreach { rc =>
      ic.foreach { r =>
        if (!r.isNullAt(r.fieldIndex(rc))) {
          val v = r.getAs[Double](rc)
          assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12, s"$rc IC $v out of range")
        }
      }
    }
  }

  test("quantile turnover lies in [0, 1]") {
    val to = Turnover.allQuantileTurnover(fd).collect()
    to.foreach { r =>
      val v = r.getAs[Double]("turnover")
      assert(v >= 0.0 && v <= 1.0, s"turnover $v out of range")
    }
  }

  test("qcut quantile counts are balanced per date (within 1)") {
    val counts = fd.df.groupBy("date", "factor_quantile").count()
      .groupBy("date").agg(max("count").as("mx"), min("count").as("mn"))
      .collect()
    counts.foreach { r =>
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 1L,
        s"unbalanced qcut buckets: ${r}")
    }
  }

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("BM25: positive scores, contiguous ranks, every query matches its source doc") {
    import graft.text.{Search, TextOps}
    // query = a doc's own first 8 tokens. NOTE: the source doc need not
    // rank FIRST (length normalization can favor a shorter doc that
    // repeats several query terms), but it must appear in the scored
    // set with a positive score — it matches every query term.
    val qs = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("qtext"))
    val scored = Search.bm25Scores(docs, qs).collect()
    assert(scored.forall(_.getAs[Double]("score") > 0.0))
    val selfPairs = scored.filter(r =>
      r.getAs[Long]("query_id") == r.getAs[Long]("doc_id"))
    assert(selfPairs.map(_.getAs[Long]("query_id")).toSet
      === Set(0L, 1L, 2L, 3L, 4L))
    val top = Search.bm25TopK(docs, qs, k = 7).collect()
    top.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq
        === (1L to rs.length).toSeq, s"query $q ranks not contiguous")
      // ranked by score desc
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("containment lies in (0, 1] and implies jaccard <= containment") {
    import graft.text.Dedup
    val sets = Dedup.shingleSets(docs, n = 3)
    val c = Dedup.containmentPairsFromSets(sets, minContainment = 0.01,
      maxDf = 100).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("containment")).toMap
    assert(c.nonEmpty)
    assert(c.values.forall(v => v > 0.0 && v <= 1.0))
    val j = Dedup.jaccardPairsFromSets(sets, minJaccard = 0.01, maxDf = 100)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    // J = c/(a+b-c) <= c/min(a,b) = C on every common pair
    j.foreach { case (k, jv) =>
      c.get(k).foreach(cv => assert(jv <= cv + 1e-9, s"pair $k: J=$jv > C=$cv"))
    }
  }

  test("unigram log-probs are negative and bounded by the rarest-term floor") {
    import graft.text.TextStats
    val lp = TextStats.unigramLogProb(docs).collect()
    assert(lp.nonEmpty)
    // every per-token mean log-prob lies in [ln(1/C), 0): each token's
    // probability is at least 1/C (it occurs) and below 1 (C > 1 token)
    val totalTokens = lp.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val floor = math.log(1.0 / totalTokens) - 1e-6
    lp.foreach { r =>
      val v = r.getAs[Double]("logprob")
      assert(v < 0.0 && v >= floor, s"logprob $v outside [$floor, 0)")
    }
  }

  test("chunkDedup conserves exactly the distinct chunks of the corpus") {
    import graft.text.Rewrite
    val kept = Rewrite.chunkDedup(docs, k = 3)
      .agg(sum("n_kept")).collect()(0).getLong(0)
    val distinct = Rewrite.chunkOccurrences(docs, k = 3)
      .select("chunk").distinct().count()
    assert(kept === distinct,
      "each distinct chunk must survive exactly once corpus-wide")
  }

  test("classifier scores are probabilities consistent with the verdict") {
    import graft.text.Classifier
    val labeled = docs.withColumn("y", (col("doc_id") % 2).cast("long"))
    val w = Classifier.fit(labeled, "y", dim = 32, iters = 2)
    Classifier.classify(labeled, w, dim = 32).collect().foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s <= 1.0, s"score $s outside [0,1]")
      assert(r.getAs[Int]("predicted") === (if (s >= 0.5) 1 else 0))
    }
  }

  test("dsir weights vanish when the target IS the raw corpus") {
    import graft.text.CorpusOps
    val all = docs.withColumn("y", lit(1L))
    CorpusOps.dsirWeights(all, "y").collect().foreach { r =>
      assert(r.getAs[Long]("lw_scaled") === 0L,
        "target == raw must give zero log importance everywhere")
    }
  }

  test("leakageSafeSplit: no real near-dup cluster straddles a split") {
    import graft.text.{CorpusOps, Dedup}
    val pairs = Dedup.jaccardPairs(docs, n = 3, minJaccard = 0.3, maxDf = 100)
      .select("doc_a", "doc_b")
    val clusters = Dedup.duplicateClusters(pairs)
    val out = CorpusOps.leakageSafeSplit(docs.select("doc_id"), clusters)
      .join(clusters, Seq("doc_id"))
    val perCluster = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).collect()
    assert(perCluster.nonEmpty, "fixture has no clusters to check")
    perCluster.foreach(r => assert(r.getAs[Long]("n") === 1L,
      s"cluster ${r.get(0)} straddles splits"))
  }

  test("TopKPairsAgg: partitioning-invariant, equals the rank-window spelling") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import org.apache.spark.sql.expressions.Window
    // colliding ord values (i % 5) force heavy ties; the retained set
    // must be a pure function of the pair set — identical under any
    // partitioning and merge order, equal to the window twin
    val rows = (1L to 500L).map(i => ((i % 13).toString, (i % 5).toDouble, i))
    def run(parts: Int): Array[(String, Long, Double, Long)] = {
      val df = rows.toDF("k", "ord", "id").repartition(parts)
      val agg = column(graft.functions.TopKPairsAgg(
        expression(col("ord")), expression(col("id")), 4)
        .toAggregateExpression())
      df.groupBy("k").agg(agg.as("top"))
        .select(col("k"), posexplode(col("top")))
        .select(col("k"), (col("pos") + 1L).as("rank"),
          col("col.ord"), col("col.id"))
        .orderBy("k", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(3)))
    }
    val p1 = run(1); val p7 = run(7); val p32 = run(32)
    assert(p1.toSeq === p7.toSeq)
    assert(p1.toSeq === p32.toSeq)
    val win = rows.toDF("k", "ord", "id")
      .withColumn("rank", row_number().over(Window.partitionBy("k")
        .orderBy(col("ord").desc, col("id"))).cast("long"))
      .filter(col("rank") <= 4)
      .select("k", "rank", "ord", "id").orderBy("k", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(p1.toSeq === win.toSeq)
  }

  test("every mixed-corpus row decodes genuinely for all media operators") {
    implicit val s = spark
    import graft.multimodal.Multimodal
    val corpus = Multimodal.mixedCorpus(docs)
    assert(Multimodal.mediaFingerprints(corpus)
      .where(!col("decoded")).count() === 0L)
    assert(Multimodal.extractFeatures(corpus).filter(f => !f.decoded)
      .count() === 0L)
  }
}
