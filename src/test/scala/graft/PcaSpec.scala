package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.vector.Pca

class PcaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("covarianceLong matches the hand-computed sample covariance") {
    val d = Seq(
      (1L, Array(1f, 2f, 0f)),
      (2L, Array(3f, 0f, 0f)),
      (3L, Array(5f, 4f, 0f))).toDF("vec_id", "embedding")
    val cov = Pca.covarianceLong(d, dim = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // means: (3, 2, 0); sample covariance with n-1 = 2
    assert(cov((0, 0)) === 4.0)   // var x: ((−2)²+0+2²)/2
    assert(cov((0, 1)) === 2.0)   // cov(x,y): ((−2)(0)+0(−2)+2·2)/2
    assert(cov((1, 1)) === 4.0)
    assert(cov((2, 2)) === 0.0 && cov((0, 2)) === 0.0)
    // upper triangle only
    assert(cov.size === 6)
  }

  test("eigenSym recovers analytic eigenvalues of known matrices") {
    // [[2,1],[1,2]] -> eigenvalues 3 and 1
    val (e2, v2) = Pca.eigenSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(e2.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
    // eigenvector columns are orthonormal
    val dot01 = v2(0)(0) * v2(0)(1) + v2(1)(0) * v2(1)(1)
    assert(math.abs(dot01) < 1e-12)
    // diag matrix is a fixed point
    val (e3, _) = Pca.eigenSym(Array(
      Array(5.0, 0.0, 0.0), Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 7.0)))
    assert(e3.sorted.zip(Seq(2.0, 5.0, 7.0)).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
  }

  test("eigenSym satisfies A v = lambda v on a generic symmetric 3x3") {
    val m = Array(
      Array(33.0, 32.0, 0.3),
      Array(32.0, 34.0, -0.2),
      Array(0.3, -0.2, 0.1))
    val (e, v) = Pca.eigenSym(m)
    for (c <- 0 until 3) {
      val av = Array.tabulate(3)(r => (0 until 3).map(k => m(r)(k) * v(k)(c)).sum)
      val worst = (0 until 3).map(r => math.abs(av(r) - e(c) * v(r)(c))).max
      assert(worst < 1e-9, s"residual of eigenpair $c: $worst (lambda=${e(c)})")
    }
    for (c1 <- 0 until 3; c2 <- 0 until 3) {
      val d = (0 until 3).map(k => v(k)(c1) * v(k)(c2)).sum
      assert(math.abs(d - (if (c1 == c2) 1.0 else 0.0)) < 1e-10,
        s"V column dot ($c1,$c2) = $d")
    }
  }

  test("fit finds the dominant direction of correlated data") {
    // points along (1, 1)/sqrt(2) with small orthogonal noise
    val rows = (0 until 200).map { i =>
      val tpos = (i - 100) / 10.0
      val noise = ((i * 7) % 5 - 2) / 100.0
      (i.toLong, Array((tpos + noise).toFloat, (tpos - noise).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, dim = 2, k = 2)
    assert(m.eigenvalues(0) > 100 * m.eigenvalues(1)) // dominant direction
    val w0 = m.components(0)
    assert(math.abs(math.abs(w0(0)) - math.sqrt(0.5)) < 1e-2)
    assert(math.abs(w0(0) - w0(1)) < 1e-2) // along (1,1)
    assert(w0(0) > 0)                      // deterministic sign convention
    // components orthonormal
    val w1 = m.components(1)
    assert(math.abs(w0(0) * w1(0) + w0(1) * w1(1)) < 1e-10)
    assert(math.abs(w0(0) * w0(0) + w0(1) * w0(1) - 1.0) < 1e-10)
  }

  test("project decorrelates; whiten normalizes the variance") {
    // three independent residue cycles -> full-rank covariance (a
    // rank-deficient direction whitens toward variance 0, not 1 —
    // that's correct behavior, so the test avoids it)
    val rows = (0 until 300).map { i =>
      val a = (i - 150) / 15.0
      val b = ((i * 13) % 21 - 10) / 10.0
      val c = ((i * 5) % 13 - 6) / 6.0
      (i.toLong, Array((a + b).toFloat, (a - b).toFloat, (0.3 * c).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, dim = 3, k = 3)
    def sampleCov(proj: Array[Array[Double]]): Array[Array[Double]] = {
      val n = proj.length
      val k = proj.head.length
      val mu = Array.tabulate(k)(c => proj.map(_(c)).sum / n)
      Array.tabulate(k, k)((x, y) =>
        proj.map(p => (p(x) - mu(x)) * (p(y) - mu(y))).sum / (n - 1))
    }
    val plain = Pca.project(df, m).collect()
      .map(_.getSeq[Double](1).toArray)
    val cPlain = sampleCov(plain)
    // off-diagonals vanish, diagonals equal the eigenvalues
    for (x <- 0 until 3; y <- 0 until 3)
      if (x == y) assert(math.abs(cPlain(x)(x) - m.eigenvalues(x)) <
        1e-6 * math.max(1.0, m.eigenvalues(x)))
      else assert(math.abs(cPlain(x)(y)) < 1e-6)
    val white = Pca.project(df, m, whiten = true).collect()
      .map(_.getSeq[Double](1).toArray)
    val cWhite = sampleCov(white)
    for (x <- 0 until 3)
      assert(math.abs(cWhite(x)(x) - 1.0) < 1e-6)
  }

  test("d=512 probe: covariance stays in the aggregate buffer, " +
      "exact vs a driver BigInt reference") {
    // real-LLM-embedding width — the size where the old inline pair
    // explosion emitted 131,328 rows PER VECTOR. The buffering
    // aggregate must (a) produce exactly the integer-grid covariance
    // and (b) show a plan whose only Generate is the post-aggregation
    // inline of the single moments struct — per-row work lands in the
    // CovarMoments buffer, never in exploded rows.
    val dim = 512
    val n = 64
    val rows = (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim) { j =>
        (((i * 31 + j * 17) % 241 - 120) / 60.0f)
      })
    }
    val df = rows.toDF("vec_id", "embedding")
    val covDf = Pca.covarianceLong(df, dim = dim)

    val plan = covDf.queryExecution.executedPlan.toString
    assert(plan.contains("graft_covar_moments"),
      "covarianceLong must run through the CovarMoments aggregate")
    val generates = "(?m)^.*Generate".r.findAllIn(plan).size
    assert(generates <= 1,
      s"expected at most the single post-agg inline Generate, got $generates")
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      "one-pass covariance needs no joins")

    // driver reference: identical 1e6 integer grid, exact BigInt sums
    val scaled = rows.map(_._2.map(x =>
      java.math.BigDecimal.valueOf(x.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong))
    val got = covDf.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size === dim * (dim + 1) / 2)
    // spot-check a grid of pairs (full 131k-pair loop would be slow)
    val checks = for {
      i <- Seq(0, 1, 7, 63, 255, 300, 511)
      j <- Seq(0, 1, 7, 63, 255, 300, 511) if j >= i
    } yield (i, j)
    checks.foreach { case (i, j) =>
      val spp = scaled.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      val si = scaled.map(v => BigInt(v(i))).sum
      val sj = scaled.map(v => BigInt(v(j))).sum
      val num = (BigInt(n) * spp - si * sj).toDouble
      val expect = BigDecimal(num / (n.toDouble * (n - 1).toDouble * 1e12))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got((i, j)) === expect, s"cov($i,$j)")
    }
  }

  test("whiten -> IVF -> residual-PQ -> rerank: the index-build seam " +
      "holds recall in whitened space") {
    // the vector family's end-to-end composition (SURVEY §7.5b #1):
    // decorrelate/whiten the real embeddings, train the coarse
    // quantizer and residual codebooks ON the whitened vectors, search
    // with IVFADC + exact rerank, and measure recall against the exact
    // whitened-space ground truth. Pins that the projection's output
    // feeds the exact fixed-point training/search grid unchanged (the
    // seam itself), deterministically.
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val model = graft.vector.Pca.fit(e, dim = 64, k = 16)
    val wh = graft.vector.Pca.project(e, model, whiten = true)
      .select(col("vec_id"), col("projection").as("embedding"))
    wh.persist()
    val queries = wh.filter(col("vec_id") < 20)
    val truth = graft.vector.Similarity.bruteForceTopK(wh, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val coarse = graft.vector.Ivf.trainCentroids(wh, nCells = 16, iters = 5)
    val books = graft.vector.Pq.trainResidualCodebooks(wh, coarse,
      dim = 16, m = 8, k = 16, iters = 3)
    val got = graft.vector.Pq.ivfAdcTopK(wh, queries, coarse, books,
        dim = 16, k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"whitened IVFADC recall@10 $recall")
    // the composed chain is deterministic end to end
    val again = graft.vector.Pq.ivfAdcTopK(wh, queries, coarse, books,
        dim = 16, k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == got)
    wh.unpersist()
    ()
  }

  test("fit + project are deterministic across runs") {
    val df = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 17 + j * 5) % 11 - 5).toFloat)))
      .toDF("vec_id", "embedding")
    val m1 = Pca.fit(df, dim = 4, k = 2)
    val m2 = Pca.fit(df, dim = 4, k = 2)
    assert(m1.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    val p1 = Pca.project(df, m1).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1))
    val p2 = Pca.project(df, m2).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1))
    assert(p1.toSeq === p2.toSeq)
  }
}
