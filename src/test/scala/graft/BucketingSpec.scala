package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_bucketing_$tag").toString

  private def left(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
  }

  private def right(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, i % 7)).toDF("doc_id", "label")
  }

  /** Run `body` with broadcast joins disabled so the bucketed layout —
    * not a broadcast — is what removes the exchanges. */
  private def forceMergeJoin[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("co-located join: no exchange, no sort, identical rows") {
    // coalesce(1) -> one file per bucket, so the read side reports
    // both hash-partitioned AND sorted output: the merge join needs
    // neither an Exchange nor a Sort on either side
    Bucketing.writeBucketed(left(500).coalesce(1), "b_docs", tmp("docs"),
      "doc_id", nBuckets = 8)
    Bucketing.writeBucketed(right(500).coalesce(1), "b_lab", tmp("lab"),
      "doc_id", nBuckets = 8)
    forceMergeJoin {
      val j = Bucketing.colocatedJoin(spark, "b_docs", "b_lab", "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // sorted-scan metadata is behind a default-off conf (listing files
      // at planning time costs); with it on, the per-bucket sortBy also
      // removes the read-side Sorts
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val sorted = Bucketing.colocatedJoin(spark, "b_docs", "b_lab", "doc_id")
          .queryExecution.executedPlan.toString
        assert(!sorted.contains("Exchange"), sorted)
        assert(!sorted.contains("Sort "), sorted)
      } finally spark.conf
        .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      val rows = j.select("doc_id", "text", "label").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
      val expected = left(500).join(right(500), "doc_id")
        .select("doc_id", "text", "label").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
      assert(rows.toSeq == expected.toSeq)
    }
  }

  test("control: the same join over unbucketed tables shuffles both sides") {
    forceMergeJoin {
      val plan = left(500).join(right(500), "doc_id")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), plan)
    }
  }

  test("aggregation on the bucket key is exchange-free too") {
    Bucketing.writeBucketed(right(300), "b_agg", tmp("agg"),
      "doc_id", nBuckets = 4)
    val agg = spark.table("b_agg").groupBy("doc_id")
      .agg(sum("label").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(agg.count() == 300)
  }

  test("multi-file buckets still join without an exchange") {
    // two write tasks -> two files per bucket: sortedness is no longer
    // guaranteed (a Sort may appear) but the hash layout still holds
    Bucketing.writeBucketed(left(400).repartition(2), "b_m1", tmp("m1"),
      "doc_id", nBuckets = 4)
    Bucketing.writeBucketed(right(400).repartition(2), "b_m2", tmp("m2"),
      "doc_id", nBuckets = 4)
    forceMergeJoin {
      val j = Bucketing.colocatedJoin(spark, "b_m1", "b_m2", "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() == 400)
    }
  }

  test("layout mismatches are refused, not silently re-shuffled") {
    Bucketing.writeBucketed(left(50), "b_n8", tmp("n8"), "doc_id", 8)
    Bucketing.writeBucketed(right(50), "b_n4", tmp("n4"), "doc_id", 4)
    intercept[IllegalArgumentException] {
      Bucketing.colocatedJoin(spark, "b_n8", "b_n4", "doc_id")
    }
    spark.sql("CREATE TABLE b_plain (doc_id BIGINT) USING parquet " +
      s"LOCATION '${tmp("plain")}'")
    intercept[IllegalArgumentException] {
      Bucketing.colocatedJoin(spark, "b_n8", "b_plain", "doc_id")
    }
    assert(Bucketing.bucketSpec(spark, "b_n8").contains(Seq("doc_id") -> 8))
    assert(Bucketing.bucketSpec(spark, "b_plain").isEmpty)
  }
}
