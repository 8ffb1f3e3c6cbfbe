package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation verdict — the standard LLM pretraining
  * recipe (C4/Gopher/FineWeb shape) as ONE composable operator:
  * rule-based quality filtering, exact dedup, near-duplicate
  * clustering, and benchmark decontamination, each surfaced as an
  * independent 0/1 flag plus the conjunction `kept`.
  *
  * Flags are computed independently (not sequentially staged), so the
  * four signals parallelize as separate DAG branches over one corpus
  * scan each, ablations don't re-run the pipeline, and the keep
  * decision stays a pure conjunction: a doc survives iff it passes
  * quality, is the minimum-id member of both its exact-hash group and
  * its near-dup cluster, and does not overlap the benchmark.
  *
  * Scale design: every branch is the already-bounded operator it
  * composes ([[TextStats.gopherRules]], hash groupBy,
  * [[Dedup.duplicateClusters]] over the df-capped pair graph,
  * [[Decontaminate.contaminationFromSets]]); the final assembly is
  * four left equi-joins on doc_id against aggregate-sized sides.
  * Callers with a persisted [[Dedup.shingleSets]] table should pass it
  * via `sets` so the Jaccard and contamination branches share it.
  */
object Curate {

  /** Per-document curation verdict.
    *
    * @param docs  corpus (idCol, textCol)
    * @param bench held-out benchmark corpus to decontaminate against
    * @param sets  optional precomputed shingle sets of `docs`
    *              ([[Dedup.shingleSets]] schema) — pass the shared
    *              persisted table when fanning out multiple operators
    * @param containmentThreshold when set, adds a quote/subset-dedup
    *              stage: connected components over
    *              [[Dedup.containmentPairsFromSets]] at this threshold;
    *              each cluster KEEPS its largest shingle set (the
    *              superset/full document — tie-break min id) and flags
    *              every other member `is_quote_dup`, unlike the
    *              symmetric near-dup stage where members are
    *              interchangeable and min id wins
    * @param relevanceQueries when set, adds a BM25 relevance stage: a
    *              doc passes iff its best [[Search.bm25Scores]] score
    *              against this bounded query batch (query_id, qtext) is
    *              >= `minRelevance`; docs matching no query term fail
    * @param bm25Index optional prebuilt (ideally persisted)
    *              [[Search.Bm25Index]] of `docs` — like `sets`/`pairs`,
    *              pass the shared index when fanning out so the
    *              relevance stage skips the corpus re-index
    * @return (doc_id, pass_quality, is_exact_dup, is_near_dup,
    *         is_contaminated[, is_quote_dup][, pass_relevance], kept) —
    *         one row per input doc; `kept` is the conjunction of every
    *         ENABLED stage
    */
  def curateVerdicts(
      docs: DataFrame,
      bench: DataFrame,
      minJaccard: Double = 0.3,
      maxDf: Int = 100,
      contamThreshold: Double = 0.1,
      n: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      sets: Option[DataFrame] = None,
      pairs: Option[DataFrame] = None,
      containmentThreshold: Option[Double] = None,
      relevanceQueries: Option[DataFrame] = None,
      minRelevance: Double = 0.0,
      bm25Index: Option[Search.Bm25Index] = None): DataFrame = {
    val theSets = sets.getOrElse(Dedup.shingleSets(docs, textCol, idCol, n))
    val quality = TextStats.gopherRules(docs, textCol, idCol)
      .select(col("doc_id"), col("quality_pass").as("pass_quality"))
    val hashed = docs.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("__h"))
    val exact = hashed
      .join(hashed.groupBy("__h").agg(min(col("doc_id")).as("__keep")), Seq("__h"))
      .select(col("doc_id"),
        when(col("doc_id") =!= col("__keep"), 1L).otherwise(0L)
          .as("is_exact_dup"))
    val clusters = Dedup.duplicateClusters(
      pairs.getOrElse(Dedup.jaccardPairsFromSets(theSets, minJaccard, maxDf))
        .select("doc_a", "doc_b"))
      .select(col("doc_id"),
        when(col("cluster_id") =!= col("doc_id"), 1L).otherwise(0L)
          .as("is_near_dup"))
    val contam = Decontaminate.contaminationFromSets(
      theSets, Dedup.shingleSets(bench, textCol, idCol, n), contamThreshold)
      .select(col("doc_id"), col("contaminated").as("is_contaminated"))
    // optional stages: each is (flag table, flag name, pass predicate,
    // default when absent) — absent rows default to the FAILING side for
    // relevance (no term match = irrelevant) and to not-a-dup for quotes
    // containment clusters keep the SUPERSET, not the min id: a quote is
    // a (near-)subset of the full document, so the conventional keep is
    // the largest shingle set per cluster (tie-break min id) — min-id
    // would drop the full article whenever a short quote happens to have
    // the lower id. (Symmetric near-dup keeps min id; there the members
    // are interchangeable.)
    val quoteDup = containmentThreshold.map { thr =>
      val cl = Dedup.duplicateClusters(
        Dedup.containmentPairsFromSets(theSets, thr, maxDf)
          .select("doc_a", "doc_b"))
      val sized = cl.join(
        theSets.select(col("__id").as("doc_id"), col("__sz")), Seq("doc_id"))
      val keeps = sized.groupBy("cluster_id").agg(
        max_by(col("doc_id"),
          struct(col("__sz"), (-col("doc_id")).as("__nid"))).as("__keep"))
      sized.join(keeps, Seq("cluster_id"))
        .select(col("doc_id"),
          when(col("doc_id") =!= col("__keep"), 1L).otherwise(0L)
            .as("is_quote_dup"))
    }
    val relevance = relevanceQueries.map { qs =>
      val idx = bm25Index.getOrElse(Search.buildIndex(docs, textCol, idCol))
      Search.bm25ScoresFromIndex(idx, qs)
        .groupBy("doc_id").agg(max(col("score")).as("__best"))
        .select(col("doc_id"),
          when(col("__best") >= minRelevance, 1L).otherwise(0L)
            .as("pass_relevance"))
    }
    val base = docs.select(col(idCol).as("doc_id"))
      .join(quality, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .join(clusters, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
    val joined = (quoteDup.toSeq ++ relevance.toSeq)
      .foldLeft(base)((d, f) => d.join(f, Seq("doc_id"), "left"))
    val flagCols = Seq(
      col("doc_id"),
      coalesce(col("pass_quality"), lit(0L)).as("pass_quality"),
      coalesce(col("is_exact_dup"), lit(0L)).as("is_exact_dup"),
      coalesce(col("is_near_dup"), lit(0L)).as("is_near_dup"),
      coalesce(col("is_contaminated"), lit(0L)).as("is_contaminated")) ++
      quoteDup.map(_ =>
        coalesce(col("is_quote_dup"), lit(0L)).as("is_quote_dup")) ++
      relevance.map(_ =>
        coalesce(col("pass_relevance"), lit(0L)).as("pass_relevance"))
    val keptCond = Seq(
      col("pass_quality") === 1L, col("is_exact_dup") === 0L,
      col("is_near_dup") === 0L, col("is_contaminated") === 0L) ++
      quoteDup.map(_ => col("is_quote_dup") === 0L) ++
      relevance.map(_ => col("pass_relevance") === 1L)
    joined.select(flagCols: _*)
      .withColumn("kept",
        when(keptCond.reduce(_ && _), 1L).otherwise(0L))
  }
}
