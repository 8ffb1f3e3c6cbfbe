package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Native Catalyst ShingleSeq expression vs the HOF fallback: the two
  * must produce identical arrays (the whole dedup family and its DuckDB
  * oracle twins are built on these exact strings), and the native path
  * must survive both codegen and interpreted evaluation. */
class ShingleSeqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val texts = Seq(
    1L -> "a b c d e",
    2L -> "a b",                 // fewer tokens than n -> empty
    3L -> "",                    // no tokens
    4L -> "solo",
    5L -> "x  y   z w",          // runs of spaces (empty tokens dropped)
    6L -> "dup dup dup dup",     // duplicate shingles kept, in order
    7L -> ((0 until 200).map(i => s"t$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("graft_shingle_seq is registered by GraftExtensions on the shared session") {
    assert(spark.catalog.functionExists("graft_shingle_seq"))
  }

  test("native expression matches the HOF composition exactly") {
    for (n <- Seq(1, 2, 3, 5)) {
      val both = texts.select(
        call_function("graft_shingle_seq", TextOps.tokens(col("text")), lit(n))
          .as("native"),
        TextOps.hofShingleSeq(TextOps.tokens(col("text")), n).as("hof"))
      both.collect().foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("null text yields an empty array, never null (HOF parity)") {
    val df = Seq((1L, Option("a b c d")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val both = df.select(
      call_function("graft_shingle_seq", TextOps.tokens(col("text")), lit(3))
        .as("native"),
      TextOps.hofShingleSeq(TextOps.tokens(col("text")), 3).as("hof")).collect()
    both.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
    assert(both(1).getSeq[String](0) === Seq.empty)
  }

  test("interpreted eval (codegen disabled) matches codegen") {
    val sel = texts.select(
      call_function("graft_shingle_seq", TextOps.tokens(col("text")), lit(3)))
    val expected = sel.collect().map(_.getSeq[String](0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = sel.collect().map(_.getSeq[String](0))
      assert(interp.toSeq === expected.toSeq)
    }
  }

  test("TextOps.shingleSeq routes to the native function when registered") {
    val plan = texts.select(TextOps.shingleSeq(TextOps.tokens(col("text")), 3))
      .queryExecution.analyzed.toString
    assert(plan.contains("graft_shingle_seq"))
  }

  test("shingle values: positional order, duplicates kept, single-space join") {
    val out = texts.filter(col("doc_id").isin(1L, 5L, 6L))
      .select(col("doc_id"),
        call_function("graft_shingle_seq", TextOps.tokens(col("text")), lit(3)))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("a b c", "b c d", "c d e"))
    assert(out(5L) === Seq("x y z", "y z w"))
    assert(out(6L) === Seq("dup dup dup", "dup dup dup"))
  }

  test("graft_tokens matches the builtin split+filter composition exactly") {
    val probe = texts.select(col("text")).unionByName(Seq(
      " leading", "trailing ", "  both  sides  ", "   ", "ünï ★ tøk",
      "a\tb", "line\nbreak", "x" * 3000 + " y").toDF("text"))
    val both = probe.select(
      call_function("graft_tokens", col("text")).as("native"),
      TextOps.hofTokens(col("text")).as("hof"))
    both.collect().foreach(r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"for ${r}"))
    // null in -> null out, like the builtin chain
    val n = Seq(Option.empty[String]).toDF("text")
      .select(call_function("graft_tokens", col("text")),
        TextOps.hofTokens(col("text"))).collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("graft_tokens interpreted eval matches codegen") {
    val sel = texts.select(call_function("graft_tokens", col("text")))
    val expected = sel.collect().map(_.getSeq[String](0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(sel.collect().map(_.getSeq[String](0)).toSeq === expected.toSeq)
    }
  }

  test("TextOps.tokens routes to the native function when registered") {
    val plan = texts.select(TextOps.tokens(col("text")))
      .queryExecution.analyzed.toString
    assert(plan.contains("graft_tokens"))
  }

  test("graft_hash56 matches the builtin md5/conv composition exactly") {
    val probe = texts.select(col("text")).unionByName(
      Seq("", "a", "the quick brown fox", "ünïcødé ★ text", "x" * 5000)
        .toDF("text"))
    val both = probe.select(
      call_function("graft_hash56", col("text")).as("native"),
      TextOps.hofHash56(col("text")).as("hof"))
    both.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // null in -> null out, like the builtin chain
    val n = Seq(Option.empty[String]).toDF("text")
      .select(call_function("graft_hash56", col("text"))).collect().head
    assert(n.isNullAt(0))
  }

  test("graft_hash56 interpreted eval matches codegen") {
    val sel = texts.select(call_function("graft_hash56", col("text")))
    val expected = sel.collect().map(_.getLong(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(sel.collect().map(_.getLong(0)).toSeq === expected.toSeq)
    }
  }

  test("TextOps.hash56 routes to the native function when registered") {
    val plan = texts.select(TextOps.hash56(col("text")))
      .queryExecution.analyzed.toString
    assert(plan.contains("graft_hash56"))
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
