package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.Similarity

/** Native Catalyst DotProduct expression vs the HOF fallback: the two
  * must be bit-identical (the oracle SQL twins depend on the exact
  * left-to-right double summation), and the native path must survive
  * both codegen and interpreted evaluation. */
class DotProductSpec extends AnyFunSuite with SparkSpec {

  private lazy val vecs = {
    val rows = (0 until 50).map { i =>
      Row(i.toLong,
        Array.tabulate(16)(d => ((i * 31 + d * 7) % 97 - 48) / 13.0f),
        Array.tabulate(16)(d => ((i * 17 + d * 11) % 89 - 44) / 7.0f))
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("graft_dot is registered by GraftExtensions on the shared session") {
    assert(spark.catalog.functionExists("graft_dot"))
  }

  test("native expression matches the HOF composition bitwise") {
    val both = vecs.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      Similarity.hofDot(col("a"), col("b")).as("hof"))
    both.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mixed float/double argument types widen like the HOF path") {
    val w = array((0 until 16).map(d => lit(Similarity.projWeight(3, d))): _*)
    val both = vecs.select(
      call_function("graft_dot", col("a"), w).as("native"),
      Similarity.hofDot(col("a"), w).as("hof"))
    both.collect().foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("null element or length mismatch yields null (zip_with parity)") {
    val df = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, NULL)) AS withNull,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D)) AS lenMismatch,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ok""".stripMargin)
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) === 11.0)
  }

  test("interpreted eval (codegen disabled) matches codegen") {
    val expected = vecs.select(call_function("graft_dot", col("a"), col("b")))
      .collect().map(_.getDouble(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = vecs.select(call_function("graft_dot", col("a"), col("b")))
        .collect().map(_.getDouble(0))
      assert(interp.toSeq === expected.toSeq)
    }
  }

  test("Similarity.dot routes to the native function when registered") {
    val plan = vecs.select(Similarity.dot(col("a"), col("b")))
      .queryExecution.analyzed.toString
    assert(plan.contains("graft_dot"))
  }

  test("optimizer rewrites the HOF dot composition to graft_dot") {
    val hof = vecs.select(Similarity.hofDot(col("a"), col("b")).as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // and the rewrite preserves values bitwise
    val native = vecs.select(call_function("graft_dot", col("a"), col("b")).as("d"))
    assert(hof.collect().map(_.getDouble(0)).toSeq ===
      native.collect().map(_.getDouble(0)).toSeq)
  }

  test("optimizer rewrite fires for double arrays (elided casts)") {
    val dd = vecs.select(
      col("a").cast("array<double>").as("da"), col("b").cast("array<double>").as("db"))
    val hof = dd.select(Similarity.hofDot(col("da"), col("db")).as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("graft_sign_bits matches the per-bit HOF composition") {
    val nBits = 16; val dim = 16
    val mat = typedLit((0 until nBits).map(j =>
      (0 until dim).map(d => Similarity.projWeight(j, d))))
    val mask = call_function("graft_sign_bits", col("a"), mat)
    val hofBits = (0 until nBits).map { j =>
      val w = array((0 until dim).map(d => lit(Similarity.projWeight(j, d))): _*)
      (Similarity.hofDot(col("a"), w) > 0.0).cast("long") * lit(1L << j)
    }.reduce(_ + _)
    vecs.select(mask.as("m"), hofBits.as("h")).collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_sign_bits interpreted eval matches codegen") {
    val mat = typedLit((0 until 8).map(j =>
      (0 until 16).map(d => Similarity.projWeight(j, d))))
    val expected = vecs.select(call_function("graft_sign_bits", col("a"), mat))
      .collect().map(_.getLong(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = vecs.select(call_function("graft_sign_bits", col("a"), mat))
        .collect().map(_.getLong(0))
      assert(interp.toSeq === expected.toSeq)
    }
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
