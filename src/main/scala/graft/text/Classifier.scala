package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — hashed-feature logistic regression, the
  * fasttext-style learned filter that complements the rule-based
  * quality stages ([[TextStats.gopherRules]] scores by fixed
  * thresholds; this LEARNS a boundary from a labeled seed set and
  * scores the whole corpus).
  *
  * Training is full-batch gradient descent with every quantity that
  * crosses an aggregation kept on an exact integer grid, so the fitted
  * weights — and therefore every score — are bitwise reproducible
  * across runs, partitionings, and engines (the q_quality_clf oracle
  * replays the identical unrolled iterations in DuckDB):
  *  - features are [[TextStats.hashVectorize]]'s signed integer counts
  *    plus an integer bias column;
  *  - weights live on a 1e-6 grid as scaled longs, so margins are
  *    EXACT integer dot products (no float-sum order dependence);
  *  - the only float op per iteration is one exp() on an
  *    exactly-agreed double, snapped to the 1e-6 grid immediately
  *    (the [[TextStats.unigramLogProb]] ln-snap precedent);
  *  - the weight update rounds half-away-from-zero back onto the grid.
  *
  * Scale design (the 100 TB contract): one map-side-combinable margin
  * aggregate + one equi-join + one gradient aggregate per iteration —
  * the honest cost of full-batch GD; the only driver transfer is the
  * (dim+1)-row gradient per iteration. (A minibatch/SGD variant would
  * subsample `docs` upstream; the loop is agnostic.) */
object Classifier {

  /** Sparse hashed features + a bias row per document (dim = `dim`,
    * value = 1), so every document — token-less included — has at
    * least one feature row and a defined margin. */
  def sparseFeatures(
      docs: DataFrame,
      dim: Int = 64,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    TextStats.hashVectorize(docs, dim, textCol, idCol)
      .unionByName(docs.select(col(idCol).as("doc_id"),
        lit(dim.toLong).as("dim"), lit(1L).as("value")))

  /** round-half-away-from-zero on the double's DECIMAL value — the
    * semantics of Spark's and DuckDB's round(), so all three engines
    * take the same branch on ties. */
  private def roundHalfAway(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact

  /** Fit by `iters` full-batch GD steps from w = 0; returns the
    * (dim+1) weights as 1e-6-scaled longs (index `dim` = bias).
    * `labelCol` must be 0/1.
    *
    * `l2` adds standard weight decay: the update becomes
    * w -= round(lr·g/n + (lr·l2)·w) in ONE grid snap (the decay term
    * uses the pre-update weight; lr·l2 is precomputed so the oracle's
    * SQL literal is the identical double). A dimension absent from the
    * feature table never acquires weight, so decay over gradient rows
    * covers every weighted dimension. l2 = 0 reproduces the unpenalized
    * trajectory bitwise (the decay term is an exact ±0.0). */
  def fit(
      docs: DataFrame,
      labelCol: String,
      dim: Int = 64,
      iters: Int = 3,
      lr: Double = 0.5,
      l2: Double = 0.0,
      textCol: String = "text",
      idCol: String = "doc_id"): Array[Long] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(l2 >= 0.0, s"l2 must be non-negative, got $l2")
    val lrl2 = lr * l2
    // label attached ONCE and the feature table persisted already
    // hash-partitioned and sorted on doc_id: each of the `iters`
    // full-batch passes then computes the per-doc margin as a WINDOW
    // sum over the cached layout (no exchange, no sort, no re-join of
    // labels) and only the (dim+1)-key gradient aggregate shuffles —
    // bitwise the same trajectory, since every cross-partition
    // quantity is an exact long sum (order-free) and the one float op
    // per doc snaps on the identical input
    val feats = sparseFeatures(docs, dim, textCol, idCol)
      .join(docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("long").as("__y")), "doc_id")
      .repartition(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .persist()
    val n = docs.count()
    require(n > 0, "cannot fit on an empty corpus")
    val w = Array.fill[Long](dim + 1)(0L)
    try {
      val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      for (_ <- 0 until iters) {
        val wLit = typedlit(w.toSeq)
        // margin*1e6 as an exact integer dot product, per row via the
        // doc window (identical long on every row of the doc)
        val ms = sum(element_at(wLit, col("dim").cast("int") + 1) * col("value"))
          .over(byDoc)
        // e = round(1e6 * sigmoid(margin)): the one float op, snapped
        val e = round(lit(1e6) / (lit(1.0) + exp(-ms.cast("double") / lit(1e6))), 0)
          .cast("long")
        val grads = feats
          .select(col("dim"),
            ((e - col("__y") * lit(1000000L)) * col("value")).as("__r"))
          .groupBy("dim")
          .agg(sum(col("__r")).as("__g"))
          .collect() // bounded: at most dim+1 rows
        grads.foreach { r =>
          val d = r.getAs[Long]("dim").toInt
          w(d) -= roundHalfAway(
            lr * r.getAs[Long]("__g").toDouble / n + lrl2 * w(d).toDouble)
        }
      }
    } finally feats.unpersist()
    w
  }

  /** Score every document with fitted weights: sigmoid of the exact
    * integer margin, snapped to 1e-6; `predicted` compares the SNAPPED
    * score to the threshold (engine-consistent by construction).
    * @return (doc_id, score, predicted) */
  def classify(
      docs: DataFrame,
      weights: Array[Long],
      dim: Int = 64,
      threshold: Double = 0.5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(weights.length == dim + 1,
      s"expected ${dim + 1} weights (incl. bias), got ${weights.length}")
    val wLit = typedlit(weights.toSeq)
    sparseFeatures(docs, dim, textCol, idCol)
      .groupBy("doc_id")
      .agg(sum(element_at(wLit, col("dim").cast("int") + 1) * col("value"))
        .as("__ms"))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("__ms").cast("double") / lit(1e6))), 6)
          .as("score"))
      .withColumn("predicted", (col("score") >= lit(threshold)).cast("int"))
  }

  /** Sparse hashed features + bias, each row carrying the doc's token
    * count `__nt` (0 on the bias row — the bias never normalizes).
    * The feature shape of the LENGTH-NORMALIZED variant below. */
  private def sparseFeaturesNt(
      docs: DataFrame,
      dim: Int,
      textCol: String,
      idCol: String): DataFrame = {
    val nt = docs.select(col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("__nt"))
    TextStats.hashVectorize(docs, dim, textCol, idCol)
      .join(nt, "doc_id")
      .unionByName(docs.select(col(idCol).as("doc_id"),
        lit(dim.toLong).as("dim"), lit(1L).as("value"), lit(0L).as("__nt")))
  }

  /** Exact normalized margin (1e-6-scaled long): bias + the hashed
    * contribution divided by the doc's token count, snapped ONCE per
    * doc. The division is one IEEE op on exactly-agreed integers and
    * the round is the shared half-away snap, so the margin — like the
    * unnormalized one — is engine-bitwise. Token-less docs (no hashed
    * rows, max(__nt)=0) keep the pure-bias margin. */
  private def normMargins(feats: DataFrame, wLit: Column, dim: Int): DataFrame =
    feats.groupBy("doc_id")
      .agg(
        sum(when(col("dim") === dim,
            element_at(wLit, col("dim").cast("int") + 1) * col("value"))
          .otherwise(0L)).as("__b"),
        sum(when(col("dim") =!= dim,
            element_at(wLit, col("dim").cast("int") + 1) * col("value"))
          .otherwise(0L)).as("__h"),
        max(col("__nt")).as("__n"))
      .select(col("doc_id"),
        (col("__b") + when(col("__n") > 0L,
          round(col("__h").cast("double") / col("__n"), 0).cast("long"))
          .otherwise(0L)).as("__ms"))

  /** LENGTH-NORMALIZED [[fit]] — fastText's mean pooling: the margin's
    * hashed-feature contribution is the AVERAGE of the per-token
    * weights (bias unnormalized), so a 10,000-token page and a
    * 40-token page sit on the same margin scale and neither dominates
    * the gradient. This is what moves the 0.5 operating threshold back
    * into play on corpora with wide length spread: unnormalized counts
    * let long documents swamp the bias toward the majority class
    * (the q_corpus_pipeline calibration note).
    *
    * Exactness: the per-doc margin snaps once
    * (round(Σ w·value / ntok)); the per-(doc,dim) gradient
    * contribution snaps once (round((e − y·1e6)·value / ntok)); both
    * are single IEEE divisions of exactly-agreed integers followed by
    * the shared half-away round, so the whole trajectory stays
    * bitwise (q_quality_clf_norm replays it in DuckDB). Magnitudes
    * stay exact in doubles: |(e − y·1e6)·value| ≤ 1e6·ntok ≪ 2^53.
    *
    * Same scale shape as [[fit]]: one margin aggregate + one equi-join
    * + one (dim+1)-row gradient collect per iteration. */
  def fitNorm(
      docs: DataFrame,
      labelCol: String,
      dim: Int = 64,
      iters: Int = 3,
      lr: Double = 0.5,
      l2: Double = 0.0,
      textCol: String = "text",
      idCol: String = "doc_id"): Array[Long] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(l2 >= 0.0, s"l2 must be non-negative, got $l2")
    val lrl2 = lr * l2
    // the [[fit]] cadence: label attached once, the feature table
    // persisted hash-partitioned + sorted on doc_id, each pass one
    // exchange-free window walk + the (dim+1)-key gradient shuffle —
    // the per-doc normalized margin and the per-row gradient snap are
    // the identical IEEE expressions, so the trajectory is bitwise
    // unchanged
    val feats = sparseFeaturesNt(docs, dim, textCol, idCol)
      .join(docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("long").as("__y")), "doc_id")
      .repartition(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .persist()
    val n = docs.count()
    require(n > 0, "cannot fit on an empty corpus")
    val w = Array.fill[Long](dim + 1)(0L)
    try {
      val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      for (_ <- 0 until iters) {
        val wLit = typedlit(w.toSeq)
        // normMargins's (__b, __h, max __nt) per doc, as window sums
        val b = sum(when(col("dim") === dim,
            element_at(wLit, col("dim").cast("int") + 1) * col("value"))
          .otherwise(0L)).over(byDoc)
        val h = sum(when(col("dim") =!= dim,
            element_at(wLit, col("dim").cast("int") + 1) * col("value"))
          .otherwise(0L)).over(byDoc)
        val nmax = max(col("__nt")).over(byDoc)
        val ms = b + when(nmax > 0L,
          round(h.cast("double") / nmax, 0).cast("long")).otherwise(0L)
        val e = round(lit(1e6) / (lit(1.0) + exp(-ms.cast("double") / lit(1e6))), 0)
          .cast("long")
        val resid = (e - col("__y") * lit(1000000L)) * col("value")
        val grads = feats
          .select(col("dim"),
            when(col("dim") === dim, resid)
              .otherwise(round(resid.cast("double") / col("__nt"), 0)
                .cast("long")).as("__r"))
          .groupBy("dim")
          .agg(sum(col("__r")).as("__g"))
          .collect() // bounded: at most dim+1 rows
        grads.foreach { r =>
          val d = r.getAs[Long]("dim").toInt
          w(d) -= roundHalfAway(
            lr * r.getAs[Long]("__g").toDouble / n + lrl2 * w(d).toDouble)
        }
      }
    } finally feats.unpersist()
    w
  }

  /** Score with [[fitNorm]] weights: sigmoid of the exact normalized
    * margin, snapped at 1e-6; threshold compares the SNAPPED score.
    * @return (doc_id, score, predicted) */
  def classifyNorm(
      docs: DataFrame,
      weights: Array[Long],
      dim: Int = 64,
      threshold: Double = 0.5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(weights.length == dim + 1,
      s"expected ${dim + 1} weights (incl. bias), got ${weights.length}")
    normMargins(sparseFeaturesNt(docs, dim, textCol, idCol),
        typedlit(weights.toSeq), dim)
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("__ms").cast("double") / lit(1e6))), 6)
          .as("score"))
      .withColumn("predicted", (col("score") >= lit(threshold)).cast("int"))
  }

  /** [[classify]] as a PURE PER-ROW PROJECTION — no explode, no
    * groupBy, no shuffle — so scoring runs unchanged on an unbounded
    * stream (the [[graft.streaming.Streaming.streamingIngestGate]]
    * quality half) and on any batch frame, appending `score` /
    * `predicted` to the input columns.
    *
    * Bitwise the batch scores by LINEARITY: the margin is linear in
    * the hashed features, so the per-token fold
    * `bias + Σ_t ±w[hash56(t) % dim]` equals [[classify]]'s per-dim
    * aggregation `Σ_d w[d]·value[d]` in exact integer arithmetic —
    * summation order cannot matter for longs, and the one float step
    * (the sigmoid) snaps at 1e-6 identically (StreamingSpec pins the
    * replay). */
  def classifyStateless(
      docs: DataFrame,
      weights: Array[Long],
      dim: Int = 64,
      threshold: Double = 0.5,
      textCol: String = "text"): DataFrame = {
    require(weights.length == dim + 1,
      s"expected ${dim + 1} weights (incl. bias), got ${weights.length}")
    val wLit = typedlit(weights.toSeq)
    val margin = aggregate(
      TextOps.tokens(col(textCol)),
      lit(weights(dim)), // bias feature, value 1
      (acc, t) => {
        val h = TextOps.hash56(t)
        val w = element_at(wLit, (h % dim).cast("int") + 1)
        acc + when(shiftright(h, 32) % 2 === 0, w).otherwise(-w)
      })
    docs
      .withColumn("score",
        round(lit(1.0) / (lit(1.0) + exp(-margin.cast("double") / lit(1e6))), 6))
      .withColumn("predicted", (col("score") >= lit(threshold)).cast("int"))
  }
}
