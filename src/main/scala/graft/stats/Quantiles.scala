package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles without a global sort — the profiling
  * primitive behind partition sizing, histogram binning, outlier
  * thresholds, and [[graft.operators.Zorder.rankBuckets]]' equi-depth
  * layout: "give me the deciles of a 100 TB column".
  *
  * `approxQuantile`/t-digest trade exactness for one pass and are not
  * engine-replayable (rank error, merge-order dependence). This is the
  * exact complement, and still never globally sorts rows: aggregate to
  * DISTINCT VALUES with counts (map-side combinable — the shuffled
  * volume is the value histogram, not the rows), attach 0-based
  * `rows_before` by the two-level prefix-sum (per-range-partition
  * running sums in parallel + one bounded window over numParts
  * partition totals broadcast back — the rankBuckets shape), then pick
  * each requested rank with a BROADCAST of the q+1 target ranks
  * against the interval (rows_before, rows_before + cnt] — a bounded
  * nested-loop by design, like the ANN query batch.
  *
  * Semantics are percentile_disc (order statistics): quantile j of q
  * is the value at 1-based rank max(1, ceil(j*N/q)) — an EXISTING data
  * value picked by integer rank arithmetic, so the result is bitwise
  * engine-identical even for doubles (no interpolation, no float
  * rank math; ceil(j*N/q) computed as the integer (j*N + q-1) div q).
  */
object Quantiles {

  /** The q+1 cut points (j = 0..q: min, 1/q, ..., max) of `dim`.
    * Nulls are excluded (SQL aggregate convention). Output:
    * (j, p = j/q, rank, value-typed `dim`). */
  def exactQuantiles(
      df: DataFrame,
      dim: String,
      q: Int,
      numParts: Int = 0): DataFrame = {
    require(q >= 1 && q <= 10000, s"q must be in [1, 10000], got $q")
    val spark = df.sparkSession
    val counts = df.na.drop(Seq(dim))
      .groupBy(dim).agg(count(lit(1)).as("__c"))
    // two-level prefix sum over the frozen histogram — see
    // graft.operators.PrefixSum for the determinism contract
    val ranked = graft.operators.PrefixSum.rowsBefore(counts, dim, numParts)
      .select(col(dim), col("__rb"), col("__c"))

    val total = counts.agg(sum("__c").as("__n"))
    // ceil(j*N/q) as pure integer arithmetic; j = 0 clamps to rank 1
    val js = spark.range(0, q + 1L).toDF("j")
      .crossJoin(broadcast(total))
      .select(col("j"),
        (col("j").cast("double") / q).as("p"),
        // ceil(j*N/q) = (j*N + q - 1) div q — operands non-negative, so
        // truncating (Spark div) and floor (DuckDB //) division agree
        greatest(lit(1L), expr(s"(j * __n + ${q - 1}) div $q")).as("rank"))

    ranked.join(broadcast(js),
        col("__rb") < col("rank") && col("rank") <= col("__rb") + col("__c"))
      .select(col("j"), col("p"), col("rank"), col(dim))
      .orderBy("j")
  }

  /** SAMPLE-based quantiles — the bounded-size path for when even the
    * distinct-value histogram of [[exactQuantiles]] is too wide (a
    * near-unique 100 TB column ships its whole domain through the
    * shuffle; a k-row sample ships k rows, period): take the k rows
    * with the SMALLEST salted key hashes — a deterministic,
    * partitioning-independent, engine-replayable simple random sample
    * (hash56 is uniform on the key domain, so hash-order top-k ≡
    * uniform sampling without replacement; same primitive as
    * [[graft.text.CorpusOps.weightedSample]] at equal weights) — and
    * return the exact percentile_disc quantiles OF THE SAMPLE.
    *
    * Rank error is the classic DKW bound: with probability ≥ 1−δ the
    * sampled quantile's true rank is within N·sqrt(ln(2/δ)/(2k)) of
    * the requested one (k = 4,000 gives ~2% rank error at δ = 1e-3 —
    * independent of N). Deterministic given (keyCols, salt): re-runs,
    * repartitions, and the DuckDB oracle all pick the identical rows.
    *
    * Scale: one projection + a global top-k (per-partition TakeOrdered
    * + k-row merge) + [[exactQuantiles]] over k rows. Nothing scales
    * with N but the scan.
    *
    * Sampling is ROW-level: every physical row is a candidate draw,
    * and rows sharing the same key hash identically, sort adjacent,
    * and enter (or miss) the sample together — so a non-unique key
    * over-represents its duplicated rows and the draw is uniform over
    * rows only when `keyCols` identify rows uniquely. Pass a true row
    * identity (e.g. doc_id, or the full primary key); deduplicate
    * upstream if the key frame is what should be sampled.
    *
    * @param keyCols columns forming a stable row identity used as the
    *                deterministic sampling hash (must be unique per
    *                row for a simple random sample over rows)
    */
  def sampleQuantiles(
      df: DataFrame,
      dim: String,
      q: Int,
      k: Int,
      keyCols: Seq[String],
      salt: String = "graft"): DataFrame = {
    require(k >= q, s"sample size k=$k must be >= q=$q")
    require(keyCols.nonEmpty, "keyCols must name a stable row identity")
    val h = graft.text.TextOps.hash56(concat_ws(":",
      lit("sq") +: lit(salt) +: keyCols.map(c => col(c).cast("string")): _*))
    val sample = df.na.drop(Seq(dim))
      .select(col(dim), h.as("__h"))
      .orderBy(col("__h"), col(dim))
      .limit(k)
      .select(col(dim))
    exactQuantiles(sample, dim, q, numParts = 1)
  }
}
