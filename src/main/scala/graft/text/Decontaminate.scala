package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Benchmark decontamination: flag training documents whose n-grams
  * overlap a held-out/benchmark corpus — the standard guard against
  * test-set leakage in LLM training-data pipelines (n-gram overlap
  * checks as popularized by the GPT-3/PaLM data cards).
  *
  * Scale design: candidate generation is an equi-join on a 56-bit
  * n-gram hash. The benchmark side is tiny relative to the corpus
  * (test sets are thousands of documents, the corpus is billions), so
  * Catalyst broadcasts it; at extreme benchmark sizes the join
  * degrades gracefully to a shuffled hash join on the gram hash. The
  * per-document state is one distinct-shingle set (O(doc length));
  * nothing is ever collected to the driver.
  */
object Decontaminate {

  /** Per-document overlap statistics against `bench`.
    *
    * @param n shingle width in tokens (real pipelines use 8-13; small
    *          synthetic corpora need smaller n for any signal)
    * @param threshold contaminated iff matched-gram fraction >= this
    * @return (doc_id, n_grams, n_matched, n_bench_docs, contam_frac,
    *         contaminated 0/1), one row per input doc with >= 1 gram
    */
  def contamination(
      docs: DataFrame,
      bench: DataFrame,
      n: Int = 8,
      threshold: Double = 0.1,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    contaminationFromSets(
      Dedup.shingleSets(docs, textCol, idCol, n),
      Dedup.shingleSets(bench, textCol, idCol, n),
      threshold)

  /** [[contamination]] over precomputed [[Dedup.shingleSets]] tables —
    * callers fanning several corpus operators over one corpus should
    * persist ONE sets table and slice train/bench out of it (the §3
    * "cache the prefix" lifecycle).
    *
    * Shape (vs the naive left-join + double count-distinct): n_matched
    * comes from a LEFT SEMI join against the distinct benchmark gram
    * hashes (each doc gram matches at most once — no fan-out on hot
    * grams, no count-distinct EXPAND), and n_bench_docs from the
    * (doc, bench-doc) pair distinct after the inner gram join. Both
    * bench sides are benchmark-sized (tiny vs the corpus), so Catalyst
    * broadcasts them and the only corpus-wide exchanges are the final
    * per-doc aggregates. */
  def contaminationFromSets(
      docSets: DataFrame,
      benchSets: DataFrame,
      threshold: Double = 0.1): DataFrame = {
    val dg = docSets.select(col("__id").as("doc_id"),
        explode(col("__set")).as("__g"))
      .select(col("doc_id"), hash56(col("__g")).as("__h"))
    val bPairs = benchSets.select(col("__id").as("__bid"),
        explode(col("__set")).as("__g"))
      .select(col("__bid"), hash56(col("__g")).as("__h"))
    val bHash = bPairs.select("__h").distinct()
    // distinct matched grams per doc: dg rows are (doc, gram)-distinct
    // already, so the semi-join count IS the distinct matched count
    val matched = dg.join(bHash, Seq("__h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_matched"))
    val benchDocs = dg.join(bPairs, Seq("__h"))
      .select("doc_id", "__bid").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_bench_docs"))
    docSets.select(col("__id").as("doc_id"), col("__sz").cast("long").as("n_grams"))
      .join(matched, Seq("doc_id"), "left")
      .join(benchDocs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(col("n_bench_docs"), lit(0L)).as("n_bench_docs"))
      .withColumn("contam_frac",
        round(col("n_matched").cast("double") / col("n_grams"), 9))
      .withColumn("contaminated",
        when(col("contam_frac") >= threshold, lit(1L)).otherwise(lit(0L)))
  }
}
