package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality filter: train an interpolated
  * Kneser-Ney BIGRAM model on a reference corpus, score every
  * document's perplexity, and bucket the corpus into head / middle /
  * tail by exact perplexity terciles — the standard LM-quality stage
  * of public pretraining pipelines (CCNet trains KenLM on Wikipedia
  * and keeps the low-perplexity head; Wenzek et al. 2020 §4.3). A
  * bigram with one-count discounting is the smallest model that
  * exercises every KN ingredient — discount, context fan-out
  * interpolation, continuation probability — while every quantity
  * stays a ratio of integer corpus counts, which is what makes the
  * score bit-reproducible across engines.
  *
  * Model (discount D, trained on the reference bigram counts c12 with
  * a BOS context `<s>` before each document's first token):
  *
  *  - continuation: Pc(w2) = (N1+(·,w2) + 1) / (N1+(··) + V + 1) —
  *    add-one smoothed over the continuation vocabulary so unseen
  *    words keep positive mass (the +1/+V+1 terms make it a proper
  *    distribution over V ∪ {OOV});
  *  - seen context w1: P(w2|w1) = (max(c12 − D, 0)
  *      + D · N1+(w1,·) · Pc(w2)) / c(w1)  — absolute discounting
  *    with the freed mass D·N1+(w1,·) re-spent on Pc;
  *  - unseen context: P(w2|w1) = Pc(w2).
  *
  * Exactness: P is assembled from integer counts and the literal D in
  * a fixed IEEE expression shape (both engines execute the identical
  * operation sequence on identical doubles), and the ONE
  * libm-dependent step — ln — snaps to the 1e-6 grid immediately
  * ([[TextStats.unigramLogProb]]'s measured-zero-straddle precedent).
  * Per-doc log-prob sums are exact long arithmetic; the per-token
  * rate is an exact half-away integer division to the 1e-9 grid; the
  * tercile cuts come from [[graft.stats.Quantiles.exactQuantiles]]
  * (distinct-value histogram + two-level prefix sum — percentile_disc
  * semantics, engine-exact on the integer rate key).
  *
  * Scale design (100 TB contract): the model tables are bounded by
  * the reference vocabulary, not the scored corpus; candidate
  * generation is three equi-joins (bigram, context, continuation) +
  * one broadcast scalar row; the per-doc aggregate is a map-side
  * combinable long sum; the tercile pass rides the exact-quantiles
  * histogram (distinct rate values, two-level prefix sum — no
  * corpus-wide window). No driver collects.
  */
object LmPerplexity {

  /** (doc_id, w1, w2): the document's bigram stream with a `<s>` BOS
    * context on the first token; token-less docs contribute nothing. */
  def bigrams(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        posexplode(col("__toks")).as(Seq("__pos", "w2")))
      .select(col("doc_id"),
        when(col("__pos") === 0, lit("<s>"))
          .otherwise(element_at(col("__toks"), col("__pos"))).as("w1"),
        col("w2"))

  /** Per-document KN-bigram score against the `train` reference:
    * (doc_id, n_bigrams, lp_micro, ppl) for every document with at
    * least one token — `lp_micro` the exact 1e-6-grid log-prob sum,
    * `ppl` = exp(−lp/n) snapped at 1e-6. */
  def score(train: DataFrame, docs: DataFrame, d: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(d > 0 && d < 1, s"discount must be in (0,1), got $d")
    val trbg = bigrams(train, textCol, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("__c12"))
    val ctx = trbg.groupBy("w1")
      .agg(sum(col("__c12")).as("__c1"), count(lit(1)).as("__n1p"))
    val cont = trbg.groupBy("w2").agg(count(lit(1)).as("__nc"))
    val tot = trbg.agg(count(lit(1)).as("__nn"),
      countDistinct(col("w2")).as("__v"))

    val pc = (coalesce(col("__nc"), lit(0L)) + lit(1L)).cast("double") /
      (col("__nn") + col("__v") + lit(1L))
    val seen = (greatest(
        coalesce(col("__c12"), lit(0L)).cast("double") - lit(d), lit(0.0)) +
      lit(d) * col("__n1p") * pc) / col("__c1")
    val p = when(col("__c1").isNotNull, seen).otherwise(pc)

    bigrams(docs, textCol, idCol)
      .join(trbg, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        // the one libm step, snapped immediately (ln-snap precedent)
        round(log(p) * lit(1e6), 0).cast("long").as("__lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("lp_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("lp_micro"),
        round(exp(col("lp_micro").cast("double") * lit(-1.0) / lit(1e6) /
          col("n_bigrams")), 6).as("ppl"))
  }

  /** Vocabulary pruning — the transform that makes an LM DEPLOYABLE:
    * tokens outside the top-`v` by corpus frequency (ties broken by
    * token, ascending) are replaced with `<unk>` everywhere, so the
    * trained model's size is bounded by the KEPT vocabulary instead of
    * the corpus (CCNet ships a pruned KenLM for the same reason).
    * Applied to BOTH the reference and the scored corpus, the
    * join-based [[score]] and the broadcast stateless scorer see the
    * identical token streams. One aggregate + a broadcast semi-join
    * keyed membership test; the rewrite is a pure projection. */
  /** The kept vocabulary itself (driver-side, bounded by `v` —
    * the model artifact a deployment ships). */
  def topVocab(docs: DataFrame, v: Int, textCol: String = "text"): Array[String] = {
    require(v >= 1, s"vocab size must be >= 1, got $v")
    docs.select(explode(TextOps.tokens(col(textCol))).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__t"))
      .limit(v)
      .collect().map(_.getString(0)) // bounded: v rows
  }

  def pruneVocab(docs: DataFrame, vocab: Array[String],
      textCol: String = "text"): DataFrame =
    docs.withColumn(textCol,
      concat_ws(" ", transform(TextOps.tokens(col(textCol)),
        t => when(array_contains(typedlit(vocab.toSeq), t), t)
          .otherwise(lit("<unk>")))))

  /** [[pruneVocab]] with the kept-set as a REAL Spark broadcast — the
    * scale path: O(1) per token via one hash probe (the literal
    * `array_contains` scans the whole vocabulary per token and bloats
    * every task binary at shipped-LM sizes), identical output
    * (LmPerplexitySpec pins venue equality). */
  def pruneVocabBcast(docs: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[java.util.HashSet[String]],
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    docs.withColumn(textCol, concat_ws(" ", column(
      graft.functions.VocabPruneBcast(
        expression(TextOps.tokens(col(textCol))), bc))))
  }

  /** Broadcast a kept vocabulary for [[pruneVocabBcast]]. */
  def broadcastVocab(spark: org.apache.spark.sql.SparkSession,
      vocab: Array[String])
      : org.apache.spark.broadcast.Broadcast[java.util.HashSet[String]] = {
    val set = new java.util.HashSet[String]()
    vocab.foreach(set.add)
    spark.sparkContext.broadcast(set)
  }

  /** Driver-collected KN model for BROADCAST stateless scoring — the
    * deployable artifact: bounded by the (pruned) reference
    * vocabulary, never by the scored corpus. Bigrams key on
    * `w1 + " " + w2` — collision-free because tokens cannot contain
    * spaces (the tokenizer splits on them). */
  final class LmModel(
      val big: java.util.HashMap[String, java.lang.Long],
      val ctx: java.util.HashMap[String, Array[Long]], // w1 -> [c1, n1p]
      val cont: java.util.HashMap[String, java.lang.Long],
      val nn: Long,
      val v: Long,
      val d: Double) extends Serializable

  /** Conf key bounding the driver-collected bigram table (default 5M
    * rows ≈ a few hundred MB of strings — the [[CalendarIndex]]
    * fail-fast pattern). */
  val MaxModelRowsKey = "spark.graft.lm.maxModelRows"
  val MaxModelRowsDefault = 5000000

  /** Collect the KN model tables to the driver. BOUNDED ONLY IF the
    * training corpus is vocabulary-pruned ([[pruneVocab]]) — the
    * contract every shipped LM honors; the join-based [[score]] has no
    * such requirement and stays fully distributed. The bigram-table
    * size is enforced against [[MaxModelRowsKey]] before any collect,
    * so an un-pruned corpus fails fast instead of OOMing the driver. */
  def collectModel(train: DataFrame, d: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): LmModel = {
    require(d > 0 && d < 1, s"discount must be in (0,1), got $d")
    val trbg = bigrams(train, textCol, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("__c12"))
      .persist()
    try {
      val max = train.sparkSession.conf
        .get(MaxModelRowsKey, MaxModelRowsDefault.toString).toLong
      val nBig = trbg.limit(
        (max + 1).min(Int.MaxValue.toLong).toInt).count()
      if (nBig > max)
        throw new IllegalArgumentException(
          s"KN bigram table has more than $max distinct bigrams; " +
            s"collectModel is driver-bounded by $MaxModelRowsKey " +
            "(prune the training vocabulary with pruneVocab, or use " +
            "the fully distributed join-based score instead)")
      val big = new java.util.HashMap[String, java.lang.Long]()
      trbg.collect().foreach(r => big.put(
        r.getString(0) + " " + r.getString(1),
        java.lang.Long.valueOf(r.getAs[Long]("__c12"))))
      val ctx = new java.util.HashMap[String, Array[Long]]()
      trbg.groupBy("w1")
        .agg(sum(col("__c12")).as("__c1"), count(lit(1)).as("__n1p"))
        .collect().foreach(r => ctx.put(r.getString(0),
          Array(r.getAs[Long]("__c1"), r.getAs[Long]("__n1p"))))
      val cont = new java.util.HashMap[String, java.lang.Long]()
      trbg.groupBy("w2").agg(count(lit(1)).as("__nc"))
        .collect().foreach(r => cont.put(r.getString(0),
          java.lang.Long.valueOf(r.getAs[Long]("__nc"))))
      val tot = trbg.agg(count(lit(1)).as("__nn"),
        countDistinct(col("w2")).as("__v")).collect().head
      new LmModel(big, ctx, cont, tot.getAs[Long]("__nn"),
        tot.getAs[Long]("__v"), d)
    } finally trbg.unpersist()
  }

  /** The TRIGRAM deployable artifact: the bigram model (the shared
    * backoff floor) plus the trigram count table and (w1,w2) context
    * fan-outs. Keys join tokens with single spaces — collision-free
    * because tokens cannot contain spaces. */
  final class LmModel3(
      val bi: LmModel,
      val tri: java.util.HashMap[String, java.lang.Long], // "w1 w2 w3" -> c123
      val ctx3: java.util.HashMap[String, Array[Long]]) // "w1 w2" -> [c12, n3p]
    extends Serializable

  /** Collect the TRIGRAM KN model ([[score3]]'s tables) to the driver
    * — bounded only if the training corpus is vocabulary-pruned, like
    * [[collectModel]]; BOTH the bigram and trigram table sizes are
    * enforced against [[MaxModelRowsKey]] before any collect. */
  def collectModel3(train: DataFrame, d: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): LmModel3 = {
    val bi = collectModel(train, d, textCol, idCol)
    val trtg = trigrams(train, textCol, idCol)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("__c123"))
      .persist()
    try {
      val max = train.sparkSession.conf
        .get(MaxModelRowsKey, MaxModelRowsDefault.toString).toLong
      val nTri = trtg.limit(
        (max + 1).min(Int.MaxValue.toLong).toInt).count()
      if (nTri > max)
        throw new IllegalArgumentException(
          s"KN trigram table has more than $max distinct trigrams; " +
            s"collectModel3 is driver-bounded by $MaxModelRowsKey " +
            "(prune the training vocabulary with pruneVocab, or use " +
            "the fully distributed join-based score3 instead)")
      val tri = new java.util.HashMap[String, java.lang.Long]()
      trtg.collect().foreach(r => tri.put(
        r.getString(0) + " " + r.getString(1) + " " + r.getString(2),
        java.lang.Long.valueOf(r.getAs[Long]("__c123"))))
      val ctx3 = new java.util.HashMap[String, Array[Long]]()
      trtg.groupBy("w1", "w2")
        .agg(sum(col("__c123")).as("__c12"), count(lit(1)).as("__n3p"))
        .collect().foreach(r => ctx3.put(
          r.getString(0) + " " + r.getString(1),
          Array(r.getAs[Long]("__c12"), r.getAs[Long]("__n3p"))))
      new LmModel3(bi, tri, ctx3)
    } finally trtg.unpersist()
  }

  /** [[score]] + CCNet's head/middle/tail corpus split by EXACT
    * perplexity terciles: the cut keys are per-token log-prob rates on
    * the 1e-9 integer grid (exact half-away division), the cuts are
    * percentile_disc picks from [[graft.stats.Quantiles]], and docs at
    * a cut fall to the worse bucket (deterministic by value). Every
    * document comes back: token-less docs carry the sentinel row
    * (n_bigrams 0, lp_micro 0, ppl −1, bucket 'empty').
    * @return (doc_id, n_bigrams, lp_micro, ppl, bucket) */
  def buckets(train: DataFrame, docs: DataFrame, d: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bucketTail(score(train, docs, d, textCol, idCol), "n_bigrams",
      docs, idCol)

  /** The shared tercile tail of [[buckets]] / [[buckets3]]: exact
    * 1e-9-grid per-event rate, percentile_disc cuts, worse-bucket
    * tie rule, token-less sentinel rows. */
  private def bucketTail(scored0: DataFrame, nCol: String,
      docs: DataFrame, idCol: String): DataFrame = {
    val scored = scored0
      // exact per-token rate: sign · (2·|lp·1000| + n) div (2n) — the
      // unigramLogProb half-away-division pattern, 1e-9 grid
      .withColumn("__rate",
        when(col("lp_micro") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr(s"(2 * abs(lp_micro * 1000) + $nCol) div (2 * $nCol)"))
      // the scored table is consumed TWICE (tercile cuts + the bucketed
      // output); materialize the doc-sized result once so the whole
      // scoring chain — model tables and all — is not evaluated twice.
      // Two constraints this checkpoint imposes downstream: (1) it
      // erases size stats (LogicalRDD -> defaultSizeInBytes), so a
      // future consumer joining the scored table as the SMALL side will
      // not auto-broadcast it; (2) the checkpointed blocks live in the
      // block manager until the returned DataFrame's RDD is
      // garbage-collected (ContextCleaner unpersists it then) — a
      // session that constructs many bucket frames and keeps references
      // to them retains one doc-sized block set per frame
      .localCheckpoint()
    val cuts = graft.stats.Quantiles.exactQuantiles(scored, "__rate", 3)
      .agg(max(when(col("j") === 1, col("__rate"))).as("__c33"),
        max(when(col("j") === 2, col("__rate"))).as("__c67"))
    val bucketed = scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col(nCol), col("lp_micro"), col("ppl"),
        when(col("__rate") <= col("__c33"), lit("tail"))
          .when(col("__rate") <= col("__c67"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
    docs.select(col(idCol).as("doc_id")).join(bucketed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col(nCol), lit(0L)).as(nCol),
        coalesce(col("lp_micro"), lit(0L)).as("lp_micro"),
        coalesce(col("ppl"), lit(-1.0)).as("ppl"),
        coalesce(col("bucket"), lit("empty")).as("bucket"))
  }

  /** (doc_id, w1, w2, w3): the document's trigram stream with a
    * double-`<s>` BOS pad (w1 = two back, w2 = one back, w3 = the
    * token), so every document contributes exactly one event per
    * token — the same event count as [[bigrams]], which keeps
    * per-token rates and perplexities directly comparable across
    * orders. */
  def trigrams(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        posexplode(col("__toks")).as(Seq("__pos", "w3")))
      .select(col("doc_id"),
        when(col("__pos") <= 1, lit("<s>"))
          .otherwise(element_at(col("__toks"), col("__pos") - 1)).as("w1"),
        when(col("__pos") === 0, lit("<s>"))
          .otherwise(element_at(col("__toks"), col("__pos"))).as("w2"),
        col("w3"))

  /** Per-document interpolated Kneser-Ney TRIGRAM score (round 13 —
    * the CCNet-realism tier above the bigram; Wenzek 2020 trains a
    * 5-gram KenLM, and a trigram with the same backoff/snap
    * discipline closes most of that gap while every quantity stays a
    * ratio of integer reference counts):
    *
    *  - seen trigram context (w1,w2): P3(w3|w1,w2) =
    *    (max(c123 − D, 0) + D · N1+(w1,w2,·) · P2(w3|w2)) / c12 —
    *    absolute discounting with the freed mass re-spent on the
    *    BIGRAM model;
    *  - unseen trigram context: P3 = P2(w3|w2) — where P2 is
    *    EXACTLY [[score]]'s interpolated KN bigram (same tables, same
    *    add-one continuation floor), so both backoff paths bottom out
    *    in the identical distribution;
    *  - the one libm step (ln) snaps at 1e-6, doc sums are exact
    *    longs — the bit-reproducibility discipline of [[score]].
    *
    * The model tables stay bounded by the reference vocabulary
    * (trigram table ≤ reference trigram types); scoring is four
    * equi-joins + one broadcast scalar row, map-side combinable sum.
    * @return (doc_id, n_trigrams, lp_micro, ppl) */
  def score3(train: DataFrame, docs: DataFrame, d: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(d > 0 && d < 1, s"discount must be in (0,1), got $d")
    val trtg = trigrams(train, textCol, idCol)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("__c123"))
    val ctx3 = trtg.groupBy("w1", "w2")
      .agg(sum(col("__c123")).as("__c12"), count(lit(1)).as("__n3p"))
    // the bigram backoff tables — identical to [[score]]'s (the
    // trigram stream's (w2, w3) pairs ARE the bigram stream: w2 is
    // the previous token or <s>), so the bigram counts cascade from
    // the trigram table by an exact long sum instead of a second
    // corpus-sized pass over the training stream
    val trbg = trtg.groupBy(col("w2").as("w1"), col("w3").as("w2"))
      .agg(sum(col("__c123")).as("__c23"))
    val ctx2 = trbg.groupBy("w1")
      .agg(sum(col("__c23")).as("__c1"), count(lit(1)).as("__n1p"))
    val cont = trbg.groupBy("w2").agg(count(lit(1)).as("__nc"))
    val tot = trbg.agg(count(lit(1)).as("__nn"),
      countDistinct(col("w2")).as("__v"))

    val pc = (coalesce(col("__nc"), lit(0L)) + lit(1L)).cast("double") /
      (col("__nn") + col("__v") + lit(1L))
    val p2seen = (greatest(
        coalesce(col("__c23"), lit(0L)).cast("double") - lit(d), lit(0.0)) +
      lit(d) * col("__n1p") * pc) / col("__c1")
    val p2 = when(col("__c1").isNotNull, p2seen).otherwise(pc)
    val p3seen = (greatest(
        coalesce(col("__c123"), lit(0L)).cast("double") - lit(d), lit(0.0)) +
      lit(d) * col("__n3p") * p2) / col("__c12")
    val p3 = when(col("__c12").isNotNull, p3seen).otherwise(p2)

    trigrams(docs, textCol, idCol)
      .join(trtg, Seq("w1", "w2", "w3"), "left")
      .join(ctx3, Seq("w1", "w2"), "left")
      .join(trbg.select(col("w1").as("w2"), col("w2").as("w3"),
        col("__c23")), Seq("w2", "w3"), "left")
      .join(ctx2.select(col("w1").as("w2"), col("__c1"), col("__n1p")),
        Seq("w2"), "left")
      .join(cont.select(col("w2").as("w3"), col("__nc")), Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        // the one libm step, snapped immediately (ln-snap precedent)
        round(log(p3) * lit(1e6), 0).cast("long").as("__lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum(col("__lp")).as("lp_micro"))
      .select(col("doc_id"), col("n_trigrams"), col("lp_micro"),
        round(exp(col("lp_micro").cast("double") * lit(-1.0) / lit(1e6) /
          col("n_trigrams")), 6).as("ppl"))
  }

  /** [[score3]] + the head/middle/tail tercile split — the trigram
    * twin of [[buckets]], same exact-grid tail.
    * @return (doc_id, n_trigrams, lp_micro, ppl, bucket) */
  def buckets3(train: DataFrame, docs: DataFrame, d: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bucketTail(score3(train, docs, d, textCol, idCol), "n_trigrams",
      docs, idCol)

  /** (doc_id, w1..wn): the document's order-`n` event stream with an
    * (n−1)-deep `<s>` BOS pad — w_j is the token (n−j) back, or `<s>`
    * when the document starts later; w_n is the token itself. Every
    * document contributes exactly one event per token (the
    * [[bigrams]]/[[trigrams]] convention), keeping per-token rates and
    * perplexities directly comparable across orders. */
  def ngrams(docs: DataFrame, n: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(n >= 2, s"order must be >= 2, got $n")
    val base = docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        posexplode(col("__toks")).as(Seq("__pos", s"w$n")))
    val wcols = (1 until n).map { j =>
      val shift = n - j // tokens back from the current one
      when(col("__pos") <= shift - 1, lit("<s>"))
        .otherwise(element_at(col("__toks"), col("__pos") - (shift - 1)))
        .as(s"w$j")
    }
    base.select((col("doc_id") +: wcols :+ col(s"w$n")): _*)
  }

  /** Per-document interpolated Kneser-Ney score at ANY order `n`
    * (round 14 — the CCNet-published stage is a 5-gram KenLM; this
    * generalizes [[score3]]'s backoff chain with the identical
    * discount / continuation / 1e-6 ln-snap discipline, so
    * `scoreN(_, _, 2) ≡ score` and `scoreN(_, _, 3) ≡ score3`
    * bitwise — LmPerplexitySpec pins both):
    *
    *  - for each order m in n..3, seen context: P_m =
    *    (max(c_m − D, 0) + D · N1+(ctx_m,·) · P_{m−1}) / c(ctx_m),
    *    unseen context: P_m = P_{m−1};
    *  - the chain bottoms in [[score]]'s interpolated KN bigram with
    *    the add-one continuation floor, so every backoff depth ends
    *    in the identical distribution;
    *  - the lower-order count tables are the ORDER-m streams' own
    *    counts: the last m columns of the order-n stream ARE the
    *    order-m stream (the BOS pad telescopes), so one training
    *    stream feeds every table.
    *
    * Scale design: model tables bounded by the reference's order-m
    * gram types (enforce with [[pruneVocab]] exactly as at lower
    * orders); scoring is 2(n−1)+1 bounded equi-joins + one broadcast
    * scalar row; the per-doc aggregate is a map-side combinable long
    * sum. No driver collects at any order.
    * @return (doc_id, n_events, lp_micro, ppl) */
  def scoreN(train: DataFrame, docs: DataFrame, n: Int, d: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(d > 0 && d < 1, s"discount must be in (0,1), got $d")
    require(n >= 2 && n <= 8, s"order must be in [2,8], got $n")
    def gcols(m: Int): Seq[String] = ((n - m + 1) to n).map(j => s"w$j")
    val tr = ngrams(train, n, textCol, idCol)
    // the order-m gram counts CASCADE from order m+1: each stream
    // position contributes one order-(m+1) row whose trailing m columns
    // are the order-m gram at that position (the BOS pad telescopes),
    // so summing the (m+1)-counts grouped by the trailing m columns IS
    // the order-m count — exact long sums, bitwise the same table as
    // re-aggregating the stream, for ONE corpus-sized pass over the
    // training stream instead of n−1
    val gram = {
      val top = tr.groupBy(gcols(n).map(col): _*)
        .agg(count(lit(1)).as(s"__g$n"))
      (n - 1 to 2 by -1).foldLeft(Map(n -> top)) { (acc, m) =>
        acc + (m -> acc(m + 1).groupBy(gcols(m).map(col): _*)
          .agg(sum(col(s"__g${m + 1}")).as(s"__g$m")))
      }
    }
    val ctx = (2 to n).map { m =>
      m -> gram(m).groupBy(gcols(m).dropRight(1).map(col): _*)
        .agg(sum(col(s"__g$m")).as(s"__c$m"),
          count(lit(1)).as(s"__np$m"))
    }.toMap
    val cont = gram(2).groupBy(s"w$n").agg(count(lit(1)).as("__nc"))
    val tot = gram(2).agg(count(lit(1)).as("__nn"),
      countDistinct(col(s"w$n")).as("__v"))

    // the backoff chain, bottom-up — the same IEEE expression shapes
    // as score/score3 so the orders agree bitwise where they overlap
    val pc = (coalesce(col("__nc"), lit(0L)) + lit(1L)).cast("double") /
      (col("__nn") + col("__v") + lit(1L))
    val p2seen = (greatest(
        coalesce(col("__g2"), lit(0L)).cast("double") - lit(d), lit(0.0)) +
      lit(d) * col("__np2") * pc) / col("__c2")
    var p = when(col("__c2").isNotNull, p2seen).otherwise(pc)
    (3 to n).foreach { m =>
      val seen = (greatest(
          coalesce(col(s"__g$m"), lit(0L)).cast("double") - lit(d),
          lit(0.0)) +
        lit(d) * col(s"__np$m") * p) / col(s"__c$m")
      p = when(col(s"__c$m").isNotNull, seen).otherwise(p)
    }

    var j = ngrams(docs, textCol = textCol, idCol = idCol, n = n)
    (2 to n).foreach { m =>
      j = j.join(gram(m), gcols(m), "left")
        .join(ctx(m), gcols(m).dropRight(1), "left")
    }
    j.join(cont, Seq(s"w$n"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        // the one libm step, snapped immediately (ln-snap precedent)
        round(log(p) * lit(1e6), 0).cast("long").as("__lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_events"), sum(col("__lp")).as("lp_micro"))
      .select(col("doc_id"), col("n_events"), col("lp_micro"),
        round(exp(col("lp_micro").cast("double") * lit(-1.0) / lit(1e6) /
          col("n_events")), 6).as("ppl"))
  }

  /** [[scoreN]] + the head/middle/tail tercile split — the order-n
    * twin of [[buckets]], same exact-grid tail.
    * @return (doc_id, n_events, lp_micro, ppl, bucket) */
  def bucketsN(train: DataFrame, docs: DataFrame, n: Int,
      d: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    bucketTail(scoreN(train, docs, n, d, textCol, idCol), "n_events",
      docs, idCol)

  /** The ORDER-n deployable artifact (round 14 — [[collectModel3]]
    * generalized): the bigram floor plus, for each order m in 3..n,
    * the gram-count and context-fan-out tables at slot m−3. Keys join
    * tokens with single spaces — collision-free because tokens cannot
    * contain spaces. */
  final class LmModelN(
      val n: Int,
      val bi: LmModel,
      val grams: Array[java.util.HashMap[String, java.lang.Long]],
      val ctxs: Array[java.util.HashMap[String, Array[Long]]])
    extends Serializable {
    require(n >= 2 && grams.length == n - 2 && ctxs.length == n - 2)
  }

  /** Collect the order-n KN model ([[scoreN]]'s tables) to the driver
    * — bounded only if the training corpus is vocabulary-pruned, like
    * [[collectModel]]; EVERY order's gram-table size is enforced
    * against [[MaxModelRowsKey]] BEFORE any collect, so the failure
    * mode names the conf and the offending order, never a driver
    * OOM. */
  def collectModelN(train: DataFrame, n: Int, d: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): LmModelN = {
    require(n >= 2 && n <= 8, s"order must be in [2,8], got $n")
    val bi = collectModel(train, d, textCol, idCol)
    if (n == 2)
      return new LmModelN(2, bi, Array.empty, Array.empty)
    val tr = ngrams(train, n, textCol, idCol).persist()
    try {
      val max = train.sparkSession.conf
        .get(MaxModelRowsKey, MaxModelRowsDefault.toString).toLong
      val grams = new Array[java.util.HashMap[String, java.lang.Long]](n - 2)
      val ctxs = new Array[java.util.HashMap[String, Array[Long]]](n - 2)
      (3 to n).foreach { m =>
        val ks = ((n - m + 1) to n).map(j => s"w$j")
        val gm = tr.groupBy(ks.map(col): _*)
          .agg(count(lit(1)).as("__g")).persist()
        try {
          val nG = gm.limit(
            (max + 1).min(Int.MaxValue.toLong).toInt).count()
          if (nG > max)
            throw new IllegalArgumentException(
              s"KN order-$m gram table has more than $max distinct " +
                s"grams; collectModelN is driver-bounded by " +
                s"$MaxModelRowsKey per order (prune the training " +
                "vocabulary with pruneVocab, or use the fully " +
                "distributed join-based scoreN instead)")
          val g = new java.util.HashMap[String, java.lang.Long]()
          gm.collect().foreach { r =>
            g.put(ks.indices.map(r.getString).mkString(" "),
              java.lang.Long.valueOf(r.getAs[Long]("__g")))
          }
          grams(m - 3) = g
          val cx = new java.util.HashMap[String, Array[Long]]()
          gm.groupBy(ks.dropRight(1).map(col): _*)
            .agg(sum(col("__g")).as("__c"), count(lit(1)).as("__np"))
            .collect().foreach { r =>
              cx.put((0 until ks.length - 1).map(r.getString).mkString(" "),
                Array(r.getAs[Long]("__c"), r.getAs[Long]("__np")))
            }
          ctxs(m - 3) = cx
        } finally gm.unpersist()
      }
      new LmModelN(n, bi, grams, ctxs)
    } finally tr.unpersist()
  }
}
