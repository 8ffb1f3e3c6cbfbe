package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-volume drift monitor — "did a source silently die (or
  * explode)?": per (key, time-bucket) event counts on a DENSE bucket
  * spine (missing buckets are real zeros — exactly the case a
  * groupBy-only monitor cannot see), each bucket judged against its
  * own trailing-history mean/σ.
  *
  * Exactness: the trailing window carries only INTEGER sums (n, Σc,
  * Σc²); mean and σ derive from them with one IEEE division and one
  * sqrt on integer-valued operands, so verdicts are bitwise
  * engine-reproducible — the same sum-of-squares-over-exact-integers
  * trick as the classifier/PCA family. n_hist < 2 short-circuits to
  * σ = 0 (no NaN ever enters a comparison: DuckDB orders NaN ABOVE
  * everything, Spark's comparisons return false — a silent
  * cross-engine verdict flip if NaN reached the alert predicate).
  *
  * Scale shape: one hash aggregate for the counts, a keys × buckets
  * spine (bounded: distinct keys times the time span), a per-key
  * window over the spine — no corpus-wide window, no shuffle beyond
  * the counts aggregate and the spine join. The global [lo, hi]
  * bucket bounds ride a one-row broadcast.
  *
  * Alert semantics: a bucket alerts iff its history is FULL
  * (n_hist == lookback) and |c − mean| > zThresh·σ. With constant
  * history σ = 0, so any deviation alerts — the "flat source
  * vanished" case needs no special path.
  *
  * @param bucket integer bucket id column (keep the time arithmetic
  *               in the caller so the oracle replays it verbatim —
  *               the Bloom.positions convention)
  * @return (key, bucket, c, n_hist, mean, z, alert); z is 0 where
  *         σ = 0 (the alert column carries the verdict there)
  */
object Drift {

  def volumeDrift(
      events: DataFrame,
      keyCol: String,
      bucket: Column,
      lookback: Int = 24,
      zThresh: Double = 3.0): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    require(zThresh > 0.0, s"zThresh must be positive, got $zThresh")
    val counts = events.select(col(keyCol).as("key"), bucket.as("bucket"))
      .groupBy("key", "bucket").agg(count(lit(1)).as("c"))
    val bounds = counts.agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
    val spine = counts.select("key").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("key"),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val dense = spine.join(counts, Seq("key", "bucket"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(-lookback, -1)
    dense
      .withColumn("n_hist", count(lit(1)).over(w))
      .withColumn("__s", coalesce(sum("c").over(w), lit(0L)))
      .withColumn("__ss", coalesce(sum(col("c") * col("c")).over(w), lit(0L)))
      .withColumn("mean",
        when(col("n_hist") >= 1, col("__s").cast("double") / col("n_hist"))
          .otherwise(lit(0.0)))
      .withColumn("__sd",
        when(col("n_hist") >= 2, sqrt(
          (col("n_hist") * col("__ss") - col("__s") * col("__s")).cast("double") /
            (col("n_hist").cast("double") * (col("n_hist") - lit(1)))))
          .otherwise(lit(0.0)))
      .withColumn("z",
        when(col("__sd") > 0.0, (col("c") - col("mean")) / col("__sd"))
          .otherwise(lit(0.0)))
      .withColumn("alert", col("n_hist") === lookback &&
        abs(col("c") - col("mean")) > lit(zThresh) * col("__sd"))
      .select(col("key"), col("bucket"), col("c"), col("n_hist"),
        round(col("mean"), 9).as("mean"), round(col("z"), 9).as("z"),
        col("alert"))
      .orderBy("key", "bucket")
  }
}
