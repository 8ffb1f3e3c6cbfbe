package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps._

/** Collocation / co-occurrence statistics — the embedding-prep and
  * phrase-mining side of a text pipeline (PMI over windowed token
  * pairs is the classic word-association measure: skip-gram training
  * data, multi-word-expression detection, domain-vocabulary drift).
  *
  * Scale design (the 100 TB contract): pair generation is an in-row
  * window expansion (≤ window · tokens rows per doc, no join), counts
  * are map-side-combinable hash aggregates, the final selection is a
  * bounded top-k (TakeOrderedAndProject) — no corpus-wide windows, no
  * driver-side state beyond three scalars.
  *
  * Determinism: counts are exact integers; the single ln per pair is
  * snapped to the 1e-6 grid as a scaled long immediately (the
  * [[TextStats.unigramLogProb]] precedent), with the ln argument built
  * by an EXPLICIT operation order both engines replay identically. */
object Collocations {

  /** Unordered co-occurring token pairs within a ±`window` positional
    * distance, one row per occurrence: (doc_id, a, b) with a <= b
    * lexicographically. */
  def cooccurrencePairs(
      docs: DataFrame,
      window: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = tokens(col(textCol))
    // in-row expansion: for every position i and offset d in [1, w],
    // the pair (t_i, t_{i+d}) — flatten over offsets, no self-join
    docs.select(col(idCol).as("doc_id"), toks.as("__t"))
      .where(size(col("__t")) > 1)
      .select(col("doc_id"), explode(flatten(transform(
        sequence(lit(1), lit(window)),
        d => zip_with(col("__t"), slice(col("__t"), d + lit(1), size(col("__t"))),
          (x, y) => when(y.isNotNull,
            struct(least(x, y).as("a"), greatest(x, y).as("b")))))))
        .as("__p"))
      .where(col("__p").isNotNull)
      .select(col("doc_id"), col("__p.a").as("a"), col("__p.b").as("b"))
  }

  /** Top-`k` collocations by pointwise mutual information:
    * PMI(a,b) = ln( (c_ab / P) / ((c_a / N) * (c_b / N)) ), computed as
    * ln(((c_ab * N) * N) / (((P * c_a)) * c_b)) — that exact operation
    * order — and snapped to the 1e-6 grid as a scaled long. Pairs below
    * `minCount` are dropped (rare-pair PMI is noise). Ties break on
    * (a, b).
    * @return (a, b, n_pairs, pmi_scaled, pmi) */
  def pmiTopK(
      docs: DataFrame,
      k: Int = 200,
      window: Int = 2,
      minCount: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = cooccurrencePairs(docs, window, textCol, idCol)
    val pairCounts = pairs.groupBy("a", "b").agg(count(lit(1)).as("__cab"))
    val tokCounts = docs
      .select(explode(tokens(col(textCol))).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__c"))
    val scalars = pairCounts.agg(sum(col("__cab")).as("p"))
      .crossJoin(tokCounts.agg(sum(col("__c")).as("n")))
      .head() // two scalars — bounded
    val (totalPairs, totalToks) = (scalars.getLong(0), scalars.getLong(1))
    pairCounts
      .where(col("__cab") >= minCount)
      // vocab-sized side: plain equi-joins (a vocabulary does not fit a
      // broadcast at 100 TB; Catalyst still broadcasts small ones)
      .join(tokCounts.select(col("__tok").as("a"), col("__c").as("__ca")), Seq("a"))
      .join(tokCounts.select(col("__tok").as("b"), col("__c").as("__cb")), Seq("b"))
      .select(col("a"), col("b"), col("__cab").as("n_pairs"),
        round(log(
          (col("__cab").cast("double") * lit(totalToks.toDouble) * lit(totalToks.toDouble)) /
            (lit(totalPairs.toDouble) * col("__ca").cast("double") * col("__cb").cast("double")))
          * lit(1e6), 0).cast("long").as("pmi_scaled"))
      .withColumn("pmi", col("pmi_scaled").cast("double") / lit(1e6))
      .orderBy(col("pmi_scaled").desc, col("a"), col("b"))
      .limit(k)
  }
}
