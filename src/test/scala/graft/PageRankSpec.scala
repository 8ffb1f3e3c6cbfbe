package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PageRank

/** Semantics pins for the integer-exact picorank power iteration. */
class PageRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val M = 1000000000000L

  test("one hand-computed iteration: path graph with a dangling sink") {
    // A->B, B->C, C dangling; N=3, damping 85/100:
    //   r0 = 333333333333 each; dang div 3 = 111111111111
    //   base = (15e12 div 100) div 3 = 50000000000
    //   rA = base + 85*111111111111 div 100          = 144444444444
    //   rB = base + 85*(333333333333+111111111111) div 100 = 427777777777
    //   rC = rB
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = PageRank.ranks(nodes, edges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 144444444444L, 1L -> 427777777777L,
      2L -> 427777777777L))
  }

  test("symmetric cycle stays exactly uniform; mass within truncation loss") {
    val n = 12
    val nodes = (0L until n.toLong).toDF("node")
    val edges = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val got = PageRank.ranks(nodes, edges, iters = 7).collect()
      .map(_.getLong(1))
    assert(got.toSet.size === 1, s"cycle ranks diverged: ${got.toSet}")
    // each iteration loses < 1 pico per division (shares + dangling +
    // base): loose bound iters * (edges + 2n + 2)
    val sum = got.sum
    assert(sum <= M && sum >= M - 7L * (n + 2 * n + 2), s"mass $sum")
  }

  test("star graph concentrates rank in the hub") {
    val n = 21L
    val nodes = (0L until n).toDF("node")
    val edges = (1L until n).map(i => (i, 0L)).toDF("src", "dst")
    val got = PageRank.ranks(nodes, edges, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = got(0L)
    assert((1L until n).forall(i => got(i) < hub / 5),
      s"hub not dominant: $got")
  }

  test("partitioning independence (integer arithmetic is order-free)") {
    val nodes = (0L until 50L).toDF("node")
    val edges = (0L until 50L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 50), (i, (i * 13 + 11) % 50)))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst").distinct()
    val a = PageRank.ranks(nodes, edges, iters = 4)
      .orderBy("node").collect().toSeq
    val b = PageRank.ranks(nodes.repartition(7), edges.repartition(13),
      iters = 4).orderBy("node").collect().toSeq
    assert(a === b)
  }

  test("argument guards") {
    val nodes = Seq(0L).toDF("node")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.ranks(nodes, edges, iters = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.ranks(nodes, edges, dampNum = 100, dampDen = 100)
    }
  }
}
