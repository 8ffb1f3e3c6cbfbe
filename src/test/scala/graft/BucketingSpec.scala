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

  test("binPackBucketed: fewer files per bucket, layout intact, join stays exchange-free") {
    import graft.operators.Compact
    // three write tasks -> three small files per bucket (12 files)
    Bucketing.writeBucketed(left(600).repartition(3), "b_cmp_in",
      tmp("cmpin"), "doc_id", nBuckets = 4)
    val outDir = tmp("cmpout")
    val rep = Compact.binPackBucketed(spark, "b_cmp_in", "b_cmp_out",
      s"$outDir/t", targetBytes = 1L << 26)
    assert(rep.nFilesBefore === 12L)
    assert(rep.nFilesAfter === 4L, s"expected one file per bucket: $rep")
    assert(rep.nBinsRewritten === 4L)

    // the compacted table keeps the identical declared spec...
    assert(Bucketing.bucketSpec(spark, "b_cmp_out") ===
      Some((Seq("doc_id"), 4)))
    // ...the rows are lossless...
    val before = spark.table("b_cmp_in").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val after = spark.table("b_cmp_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(after === before)
    // ...every output file carries a parseable bucket suffix...
    val outFiles = new java.io.File(s"$outDir/t").listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName).sorted
    val ids = outFiles.flatMap(
      org.apache.spark.sql.graftbridge.ColumnBridge.bucketIdOfFile)
    assert(ids.sorted.toSeq === Seq(0, 1, 2, 3), outFiles.mkString(","))
    // ...and the whole point: a join on the bucket key over the
    // COMPACTED table still plans no Exchange on that side
    Bucketing.writeBucketed(right(600), "b_cmp_dim", tmp("cmpdim"),
      "doc_id", nBuckets = 4)
    forceMergeJoin {
      val j = Bucketing.colocatedJoin(spark, "b_cmp_out", "b_cmp_dim",
        "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"compaction broke the exchange-free layout:\n$plan")
      assert(j.count() === 600)
    }
    // a plain (unbucketed) table is refused (use binPack)
    spark.sql("DROP TABLE IF EXISTS b_cmp_plain")
    left(10).write.format("parquet").option("path", tmp("cmpplain"))
      .saveAsTable("b_cmp_plain")
    intercept[IllegalArgumentException] {
      Compact.binPackBucketed(spark, "b_cmp_plain", "x", tmp("cmpx"), 1L)
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
