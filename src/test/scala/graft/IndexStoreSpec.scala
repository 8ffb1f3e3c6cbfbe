package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.vector.{IndexStore, Ivf, Pq}

/** The index-survives-the-cluster pin: coarse quantizer + residual PQ
  * codebooks trained once, persisted as parquet tables, reloaded, and
  * the IVFADC search re-run against the reloaded artifacts must return
  * the IDENTICAL result rows — bitwise matrices by construction (raw
  * long bits), so the equality is exact, not tolerance-based. */
class IndexStoreSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("matrix and codebook round trips are bitwise; searches agree") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val coarse = Ivf.trainCentroids(emb, nCells = 16, iters = 5)
    val books = Pq.trainResidualCodebooks(emb, coarse, dim = 64, m = 8,
      k = 16, iters = 3)

    val base = java.nio.file.Files
      .createTempDirectory("graft_index_store").toString
    IndexStore.saveMatrix(spark, s"$base/coarse", coarse)
    IndexStore.saveBooks(spark, s"$base/books", books)
    val coarse2 = IndexStore.loadMatrix(spark, s"$base/coarse")
    val books2 = IndexStore.loadBooks(spark, s"$base/books")

    // bitwise artifact equality (raw bits, not value-approximate)
    assert(coarse.length === coarse2.length)
    coarse.indices.foreach { i =>
      coarse(i).indices.foreach { j =>
        assert(java.lang.Double.doubleToRawLongBits(coarse(i)(j)) ===
          java.lang.Double.doubleToRawLongBits(coarse2(i)(j)), s"coarse($i)($j)")
      }
    }
    books.indices.foreach { m =>
      books(m).indices.foreach { c =>
        books(m)(c).indices.foreach { j =>
          assert(java.lang.Double.doubleToRawLongBits(books(m)(c)(j)) ===
            java.lang.Double.doubleToRawLongBits(books2(m)(c)(j)),
            s"books($m)($c)($j)")
        }
      }
    }

    // the search against the RELOADED index is row-identical
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    def run(cs: Array[Array[Double]], bk: Array[Array[Array[Double]]]) =
      Pq.ivfAdcTopK(emb, queries, cs, bk, dim = 64, k = 10, nProbe = 4)
        .orderBy("query_id", "rank").collect().toSeq
    assert(run(coarse2, books2) === run(coarse, books))
  }

  test("loadMatrix restores shape from sparse-looking row order") {
    // shuffle-resistant: the (i, j, bits) rows carry their own
    // coordinates, so partition/file order cannot permute the matrix
    val m = Array(Array(1.5, -0.0, Double.NaN), Array(2.5, 3.5, -7.25))
    val base = java.nio.file.Files
      .createTempDirectory("graft_index_store2").toString
    IndexStore.saveMatrix(spark, s"$base/m", m)
    val got = IndexStore.loadMatrix(spark, s"$base/m")
    assert(got.length === 2 && got(0).length === 3)
    // NaN and signed zero survive bitwise
    assert(java.lang.Double.doubleToRawLongBits(got(0)(2)) ===
      java.lang.Double.doubleToRawLongBits(Double.NaN))
    assert(java.lang.Double.doubleToRawLongBits(got(0)(1)) ===
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(got(1).toSeq === Seq(2.5, 3.5, -7.25))
  }
}
