package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact corpus-wide heavy hitters with a sketch prefilter — the only
  * shape that works at 100 TB.
  *
  * A naive `groupBy(token).count.filter(cnt >= theta*N)` shuffles every
  * distinct token; web-scale corpora have billions of distinct tokens
  * (typos, ids, hashes), almost all of which the filter then discards.
  * The two-phase shape shuffles only provable candidates:
  *
  *  1. **Candidate pass**: one scan building per-partition Misra-Gries
  *     summaries (capacity k), merged pairwise via `treeAggregate` — the
  *     driver receives ONE k-entry sketch regardless of corpus or
  *     cluster size. Merged-MG undercounts by at most N/(k+1)
  *     (Agarwal et al., "Mergeable Summaries", PODS'12), so with
  *     k >= den/num every true (num/den)-heavy token is STILL PRESENT in
  *     the merged sketch: the key set is a guaranteed candidate
  *     superset.
  *  2. **Verify pass**: broadcast the <=k candidates, semi-join the token
  *     stream (map-side hash probe, no full shuffle), exact count of the
  *     survivors (<=k groups -> map-side partial agg collapses each
  *     partition to <=k rows), integer threshold `cnt*den >= num*N`.
  *
  * The output is EXACT counts — the sketch only prunes — so the result
  * is deterministic, engine-independent, and oracle-comparable.
  */
object HeavyHitters {

  /** Misra-Gries frequency summary, mergeable form. `n` tracks the
    * number of items offered so the candidate pass also yields the
    * exact corpus token count without a second scan. */
  final class MgSketch(val k: Int) extends Serializable {
    require(k >= 1, "sketch capacity must be >= 1")
    val counters: mutable.LinkedHashMap[String, Long] = mutable.LinkedHashMap.empty
    var n: Long = 0L

    def add(x: String): this.type = {
      n += 1
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None if counters.size < k => counters.update(x, 1L)
        case None =>
          // decrement-all; zeros drop out. Amortized O(1): each of the
          // k decrements cancels one earlier increment.
          val dead = mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(counters.remove)
      }
      this
    }

    /** Mergeable-summaries merge: sum by key, then subtract the
      * (k+1)-th largest combined count and drop non-positives —
      * undercount errors add, staying <= (n1+n2)/(k+1). */
    def merge(other: MgSketch): MgSketch = {
      val out = new MgSketch(k)
      out.n = n + other.n
      val sum = mutable.HashMap.empty[String, Long]
      counters.foreach { case (t, c) => sum.update(t, sum.getOrElse(t, 0L) + c) }
      other.counters.foreach { case (t, c) => sum.update(t, sum.getOrElse(t, 0L) + c) }
      if (sum.size > k) {
        val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        sum.foreach { case (t, c) => if (c - cut > 0) out.counters.update(t, c - cut) }
      } else sum.foreach { case (t, c) => out.counters.update(t, c) }
      out
    }
  }

  /** One candidate-generation scan: merged MG sketch over `tokens`.
    * Driver-side result is k entries + a count — corpus-size
    * independent. */
  def mgCandidates(tokens: Dataset[String], capacity: Int): MgSketch =
    tokens.rdd.treeAggregate(new MgSketch(capacity))(
      (sk, t) => sk.add(t), (a, b) => a.merge(b), depth = 2)

  /** All tokens with exact count >= (num/den) * total, exact counts out.
    *
    * `capacity` must be >= den/num for the superset guarantee; the
    * default doubles it for slack (smaller residual counters, cheaper
    * verify join). */
  def heavyHitters(
      docs: DataFrame,
      num: Long,
      den: Long,
      capacity: Int = 0): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "need 0 < num/den <= 1")
    val k = if (capacity > 0) capacity
            else math.max(64, 2L * den / num).min(1 << 20).toInt
    require(k >= den / num, s"capacity $k below den/num = ${den / num}")
    val spark = docs.sparkSession
    import spark.implicits._

    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
    val sketch = mgCandidates(toks.as[String], k)
    val total = sketch.n

    val cand = spark.createDataset(sketch.counters.keys.toSeq.sorted).toDF("token")
    toks.join(broadcast(cand), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * den >= num * total)
      .orderBy("token")
  }
}
