package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed table layout: pay the shuffle ONCE at write time,
  * then every join / aggregation on the bucket key is exchange-free.
  *
  * The 100 TB story, complementing [[Zorder]] (which buys range-scan
  * pruning): a training-data pipeline joins the same huge tables on
  * the same keys over and over — documents ⋈ embeddings, corpus ⋈
  * dedup verdicts, tokens ⋈ vocab. Re-shuffling 100 TB per join is
  * the single biggest avoidable cost in that loop. Writing both sides
  * bucketed by the join key (same bucket count, sorted within
  * buckets) lets Spark plan a sort-merge join with NO Exchange on
  * either side — each task zips bucket i of A with bucket i of B
  * straight off parquet. The per-bucket sortBy additionally removes
  * the read-side Sorts once
  * `spark.sql.legacy.bucketedTableScan.outputOrdering` is on (off by
  * default because proving one-file-per-bucket lists files at planning
  * time). BucketingSpec pins the exchange-free plan, the sort-free
  * plan under that conf, the shuffling control plan, and the
  * exchange-free groupBy on the bucket key.
  *
  * Declarative Spark throughout: `bucketBy`/`sortBy` + external-path
  * `saveAsTable` — the layout lives in catalog metadata + file names,
  * no custom partitioner. The writer emits `nBuckets` files per write
  * task side (bucket id = pmod(hash(key), n)); read-side Spark
  * reassembles buckets across files, so append-mode ingest batches
  * compose. The reference has no storage layer at all (in-memory
  * pandas panels); this is the write-path face of SURVEY §4's
  * partitioning story.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet
    * table at `path`, registered as `name` in the session catalog.
    * Sorting within buckets (default: by the bucket key) removes the
    * read-side Sort from merge joins as well. Overwrites any prior
    * table of the same name. */
  def writeBucketed(
      df: DataFrame,
      name: String,
      path: String,
      bucketCol: String,
      nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val sort = if (sortCols.nonEmpty) sortCols else Seq(bucketCol)
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sort.head, sort.tail: _*)
      .saveAsTable(name)
  }

  /** The declared bucket spec of a catalog table:
    * (bucket columns, nBuckets), None if unbucketed. */
  def bucketSpec(spark: SparkSession, name: String): Option[(Seq[String], Int)] = {
    val id = spark.sessionState.sqlParser.parseTableIdentifier(name)
    spark.sessionState.catalog.getTableMetadata(id).bucketSpec
      .map(s => (s.bucketColumnNames, s.numBuckets))
  }

  /** Join two bucketed tables on their shared bucket key, verifying
    * first (from catalog metadata) that the layouts actually co-locate
    * — same key, same bucket count. A silent layout mismatch would
    * still compute the right answer but re-shuffle both sides, which
    * at the scale this exists for is an outage, not a detail. */
  def colocatedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String,
      joinType: String = "inner"): DataFrame = {
    def spec(t: String) = bucketSpec(spark, t).getOrElse(
      throw new IllegalArgumentException(s"table $t is not bucketed"))
    val (lCols, lN) = spec(left)
    val (rCols, rN) = spec(right)
    require(lCols == Seq(key) && rCols == Seq(key),
      s"both tables must be bucketed by [$key], got $left=$lCols $right=$rCols")
    require(lN == rN,
      s"bucket counts must match for a co-located join, got $left=$lN $right=$rN")
    spark.table(left).join(spark.table(right), Seq(key), joinType)
  }
}
