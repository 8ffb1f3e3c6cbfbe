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
}
