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
      idCol: String = "doc_id"): DataFrame = {
    def gramHash(g: Column) = hash56(g)
    val dg = docs.select(col(idCol).as("doc_id"),
        shingles(tokens(col(textCol)), n).as("__gs"))
      .withColumn("n_grams", size(col("__gs")).cast("long"))
      .filter(col("n_grams") > 0)
      .select(col("doc_id"), col("n_grams"),
        explode(col("__gs")).as("__g"))
      .withColumn("__h", gramHash(col("__g"))).drop("__g")
    val bg = bench.select(col(idCol).as("__bid"),
        explode(shingles(tokens(col(textCol)), n)).as("__g"))
      .select(col("__bid"), gramHash(col("__g")).as("__h"))
      .distinct()
    dg.join(bg, Seq("__h"), "left")
      .groupBy("doc_id")
      .agg(
        first(col("n_grams")).as("n_grams"),
        countDistinct(when(col("__bid").isNotNull, col("__h"))).as("n_matched"),
        countDistinct(col("__bid")).as("n_bench_docs"))
      .withColumn("contam_frac",
        round(col("n_matched").cast("double") / col("n_grams"), 9))
      .withColumn("contaminated",
        when(col("contam_frac") >= threshold, lit(1L)).otherwise(lit(0L)))
  }
}
