package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** KMV / theta-sketch estimators over the [[graft.functions.KmvAgg]]
  * retained-value arrays (Beyer et al. SIGMOD '07 §3; the Apache
  * DataSketches theta framework is the production precedent).
  *
  * The sketch of a set S under a uniform 56-bit hash keeps S's k
  * smallest distinct hash values. With theta = (k-th smallest)/2^56,
  * the unbiased distinct estimate is (k-1)/theta; an UNSATURATED
  * sketch (fewer than k values) IS the whole hashed set, so the count
  * is exact. Set algebra:
  *   - union: k-smallest-of-union of two retained arrays is exactly
  *     the sketch of A ∪ B — pure builtin array ops, no rescan;
  *   - intersection: below theta_min = min(theta_A, theta_B) BOTH
  *     sketches retain every hash they contain, so the candidates
  *     `array_intersect(a, b) < theta_min` are a uniform sample of
  *     A ∩ B at rate theta_min: estimate = |candidates| / theta_min.
  *
  * Everything is integer hash arithmetic plus ONE division by a
  * power of two (exact) and one IEEE division, snapped to the shared
  * round-9 grid — bit-reproducible cross-engine, like the HLL/CMS
  * siblings. All estimator inputs ride the arrays themselves, so
  * estimates compose over PERSISTED sketches without touching the
  * base data (the mergeable-artifact story: build once per partition
  * of a 100 TB corpus, answer distinct/overlap queries forever).
  *
  * Scale design: the build is one TypedImperativeAggregate pass —
  * partial sketches of ≤ k longs per group per task, map-side
  * combined, one bounded shuffle. The pairwise set-op queries join
  * sketch TABLES (one row per group), never the base data.
  */
object Kmv {

  /** 2^56 — the hash56 value space, as an exactly-representable double. */
  val HashSpace: Double = 7.2057594037927936e16

  private val HashSpaceL: Long = 1L << 56

  /** Domain-separated sketch hash of a value column. */
  def hashCol(value: Column): Column =
    TextOps.hash56(concat(lit("kmv:"), value.cast("string")))

  /** One sketch row per key group: (keys..., kmv array<bigint>). */
  def sketch(df: DataFrame, keyCols: Seq[String], value: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val agg = column(graft.functions.KmvAgg(expression(hashCol(value)), k)
      .toAggregateExpression())
    df.groupBy(keyCols.map(col): _*).agg(agg.as("kmv"))
  }

  /** Raw theta: the k-th retained hash when the sketch saturated, else
    * 2^56 (an unsaturated sketch covers the whole hash space). */
  def thetaRaw(kmv: Column, k: Int): Column =
    when(size(kmv) >= k, element_at(kmv, k)).otherwise(lit(HashSpaceL))

  /** Distinct-count estimate: exact below k, else (k-1)/theta. */
  def distinctEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(kmv, k).cast("double") / lit(HashSpace)))

  /** The sketch of A ∪ B from the two retained arrays alone. */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Intersection estimate from the two retained arrays alone. */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val t = least(thetaRaw(a, k), thetaRaw(b, k))
    size(filter(array_intersect(a, b), v => v < t)).cast("double") /
      (t.cast("double") / lit(HashSpace))
  }

  /** Jaccard similarity estimate |A∩B| / |A∪B| — the ratio of the two
    * estimators above (both exact when neither sketch saturated). */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column =
    intersectEstimate(a, b, k) /
      distinctEstimate(unionSketch(a, b, k), k)

  /** Inverse-probability POOLED union estimate — the read-time
    * lower-variance variant (the HIP idea of Ting, KDD '14 — weight
    * every observation by its inverse inclusion probability — applied
    * at read time with the canonical probability θ_min instead of the
    * stream-order-dependent running θ, so the retained-array artifact
    * is UNCHANGED and value-set purity holds):
    * below θ_min = min(θ_A, θ_B) both sketches retain every hash they
    * contain, so each distinct pooled hash < θ_min is a member of
    * A ∪ B observed with probability exactly θ_min, and the
    * Horvitz–Thompson sum is |pooled < θ_min| / θ_min. The pool holds
    * up to 2k−1 observations where [[unionSketch]] truncates to k —
    * on same-size low-overlap inputs that near-halves the variance of
    * `distinctEstimate(unionSketch(a, b, k), k)` (DataSketches'
    * pairwise theta estimates use the same pooling). Exact when
    * neither sketch saturated. */
  def hipUnionEstimate(a: Column, b: Column, k: Int): Column = {
    val t = thetaMin(a, b, k)
    size(filter(array_union(a, b), v => v < t)).cast("double") /
      (t.cast("double") / lit(HashSpace))
  }

  /** Inverse-probability difference estimate |A \ B| from the arrays
    * alone, by the same pooling argument: a hash < θ_min in A's array
    * is in A∖B iff it is absent from B's (B retains everything it
    * contains below θ_min), so the candidates are a θ_min-rate sample
    * of A∖B. Exact when neither sketch saturated. */
  def hipDifferenceEstimate(a: Column, b: Column, k: Int): Column = {
    val t = thetaMin(a, b, k)
    size(filter(array_except(a, b), v => v < t)).cast("double") /
      (t.cast("double") / lit(HashSpace))
  }

  private def thetaMin(a: Column, b: Column, k: Int): Column =
    least(thetaRaw(a, k), thetaRaw(b, k))
}
