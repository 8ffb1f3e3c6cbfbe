package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps._

/** Full-text relevance search over a document corpus: Okapi BM25
  * scoring against an inverted index, with a top-k retrieval wrapper —
  * the query capability a corpus engine needs for eval-set mining,
  * targeted decontamination, and "find documents about X" curation.
  *
  * Scale design: the inverted index is one hash aggregate over the
  * exploded corpus (map-side combinable); document length rides along
  * as a window over the doc partition (no second corpus scan); corpus
  * constants (N, total length) are a one-row cross join; the query
  * batch is bounded and broadcast. Scoring touches only postings whose
  * term appears in some query — the term equi-join prunes the rest.
  *
  * Determinism: the one engine-dependent operation (ln in idf) is
  * snapped to the 1e-9 grid per TERM before entering any product, and
  * the per-(query, doc) sum runs over term-sorted arrays via the
  * `aggregate` HOF — a deterministic left-to-right accumulation, so
  * scores are bitwise reproducible across runs, partitionings, and
  * engines (the DuckDB oracle mirrors with `list_reduce` over
  * `list(... ORDER BY term)`).
  */
object Search {

  /** A built BM25 inverted index: per-(doc, term) postings with doc
    * length, per-term document frequencies, and the one-row corpus
    * constants. Build once, persist the pieces, and serve many query
    * batches via [[bm25ScoresFromIndex]] — the same build-once/fan-out
    * lifecycle as [[Dedup.shingleSets]]. */
  final case class Bm25Index(postings: DataFrame, df: DataFrame, stats: DataFrame)

  /** Construct the [[Bm25Index]] for a corpus. */
  def buildIndex(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): Bm25Index = {
    val postings = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("__t"))
      .groupBy("doc_id", "__t").agg(count(lit(1)).as("__tf"))
      // doc length = sum of term frequencies; a window over the doc
      // partition reuses the aggregate's rows instead of re-scanning
      // the corpus for size(tokens)
      .withColumn("__dl", sum(col("__tf")).over(Window.partitionBy("doc_id")))
    // df and the corpus constants are separate narrow scans of the
    // corpus rather than branches off `postings` — a diamond over the
    // uncached explode+aggregate subtree would re-run it once per
    // branch; the df scan aggregates distinct terms directly and the
    // stats scan never explodes at all
    val df = docs
      .select(explode(array_distinct(tokens(col(textCol)))).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__df"))
    // N = docs with at least one token (empty docs index nothing);
    // one row, broadcast into the scoring join
    val stats = docs.select(size(tokens(col(textCol))).as("__len"))
      .filter(col("__len") > 0)
      .agg(count(lit(1)).as("__n"), sum(col("__len")).as("__s"))
    Bm25Index(postings, df, stats)
  }

  /** BM25 scores for every (query, document) pair with at least one
    * matching term.
    *
    * @param docs    corpus (idCol, textCol)
    * @param queries bounded query batch (queryIdCol, queryTextCol);
    *                query text is tokenized like documents, duplicate
    *                terms collapsed (standard bag-of-words queries)
    * @return (query_id, doc_id, score) — score rounded to 1e-9
    */
  def bm25Scores(
      docs: DataFrame,
      queries: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id",
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext"): DataFrame =
    bm25ScoresFromIndex(buildIndex(docs, textCol, idCol), queries, k1, b,
      queryIdCol, queryTextCol)

  /** [[bm25Scores]] over a prebuilt (ideally persisted) [[Bm25Index]]. */
  def bm25ScoresFromIndex(
      index: Bm25Index,
      queries: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext"): DataFrame = {
    val Bm25Index(postings, df, stats) = index
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(tokens(col(queryTextCol)))).as("__t"))

    // idf = ln(1 + (N - df + .5)/(df + .5)), snapped to the 1e-9 grid
    // (ln is the only op the two engines may disagree on, by 1 ulp);
    // the tf saturation w is pure rational arithmetic on identical
    // operands — bitwise equal without rounding
    val idf = round(log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))), 9)
    val w = (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("__dl") / (col("__s").cast("double") / col("__n"))))

    val contribs = broadcast(qterms).join(postings, Seq("__t"))
      .join(df, Seq("__t"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        col("__t"), (idf * w).as("__c"))
    contribs.groupBy("query_id", "doc_id")
      .agg(aggregate(array_sort(collect_list(struct(col("__t"), col("__c")))),
        lit(0.0), (acc, x) => acc + x.getField("__c")).as("score"))
      .withColumn("score", round(col("score"), 9))
  }

  /** Top-k BM25 retrieval: the k highest-scoring documents per query,
    * ranked by (score desc, doc_id) — the id tie-break keeps the cut
    * deterministic. Plans as one window over the bounded scored set.
    * Output: (query_id, rank, doc_id, score). */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id",
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext"): DataFrame =
    bm25TopKFromIndex(buildIndex(docs, textCol, idCol), queries, k, k1, b,
      queryIdCol, queryTextCol)

  /** [[bm25TopK]] over a prebuilt (ideally persisted) [[Bm25Index]]. */
  def bm25TopKFromIndex(
      index: Bm25Index,
      queries: DataFrame,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      queryIdCol: String = "query_id",
      queryTextCol: String = "qtext"): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    bm25ScoresFromIndex(index, queries, k1, b, queryIdCol, queryTextCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score")
      .orderBy("query_id", "rank")
  }

  /** Reciprocal-rank fusion of two per-query rankings (Cormack &
    * Clarke SIGIR '09): score(d) = Σ_arms 1/(k0 + rank_arm(d)), absent
    * arms contribute 0 — the standard hybrid-retrieval combiner for
    * lexical (BM25) + dense (cosine) arms, robust because it consumes
    * RANKS, never the arms' incomparable score scales. Deterministic:
    * 1/(k0 + rank) is one IEEE division on integer operands and the
    * two-arm sum is a fixed-order add, so fused scores are bitwise
    * engine-reproducible given agreeing input ranks.
    *
    * Both inputs carry (queryIdCol, docIdCol, rankCol). The fused
    * top-k per query is picked by the partial-heap operator
    * ([[graft.plans.TopKPerKey]]) — candidate lists are per-query
    * bounded, so the heaps never see more than both arms' k's.
    *
    * @return (query_id, rank, doc_id, rrf) — rrf on the round-9 grid
    */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      k: Int = 10,
      k0: Int = 60,
      queryIdCol: String = "query_id",
      docIdCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    def arm(df: DataFrame, out: String) = df.select(
      col(queryIdCol).as("query_id"), col(docIdCol).as("doc_id"),
      col(rankCol).cast("long").as(out))
    val fused = arm(a, "__ra").join(arm(b, "__rb"),
        Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(k0.toDouble) + col("__ra")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(k0.toDouble) + col("__rb")), lit(0.0)))
          .as("__rrf"))
    val top = graft.plans.TopKPerKey.topKPerKey(fused, Seq("query_id"),
      Seq(("__rrf", false), ("doc_id", true)), k)
    top
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("__rrf").desc, col("doc_id"))).cast("long"))
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("__rrf"), 9).as("rrf"))
      .orderBy("query_id", "rank")
  }

  /** POSITIONAL postings — one row per (term, doc_id, pos) token
    * occurrence: the index layer phrase queries need that the
    * frequency-only [[Bm25Index]] cannot serve. Build once and persist
    * partitioned/sorted by term so a phrase's `term IN (...)` probe
    * prunes to its own posting files. */
  def buildPositionalIndex(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "term")))

  /** Partition count for persisted positional indexes: one directory
    * per TERM would explode at real vocabularies, so terms hash into
    * a fixed bucket fan-out — wide enough that a phrase probe reads a
    * few files, narrow enough that listing stays cheap. */
  val IndexBuckets = 256

  /** The persisted-index partition key of a term. Foldable on a
    * literal, so a phrase probe's bucket predicate constant-folds and
    * reaches the scan as a PARTITION filter (directory pruning). */
  def termBucket(term: Column): Column =
    pmod(hash56(term), lit(IndexBuckets.toLong))

  /** Persist a positional index hash-bucketed by term: a phrase probe
    * then prunes to its terms' bucket directories before any row is
    * read ([[phraseOccurrences]] adds the bucket predicate whenever
    * the column is present). */
  def savePositionalIndex(postings: DataFrame, path: String): Unit =
    postings.withColumn("term_bucket", termBucket(col("term")))
      .write.mode("overwrite").partitionBy("term_bucket").parquet(path)

  def loadPositionalIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Exact phrase occurrences over a positional index — the classic
    * search-engine phrase walk, distributed: candidate starts come
    * from the RAREST phrase term's postings (term frequencies among
    * just the phrase's terms are one bounded aggregate; a term absent
    * from the corpus anchors immediately-empty), and every other
    * (term, offset) slot is verified with a left-semi equi-join on
    * (doc_id, start). Only the phrase terms' postings are ever
    * touched — the `isin` filter reaches the index scan — and each
    * join is bounded by a term's posting count, never the corpus.
    * Duplicate terms in the phrase verify once per SLOT, so "a b a"
    * requires the anchor term at both offsets.
    *
    * Output: (doc_id, start) — every occurrence, overlaps included. */
  /** Postings restricted to `terms`, with directory pruning when the
    * frame is a persisted index (the term_bucket partition key): the
    * bucket predicate constant-folds (termBucket of a literal) and
    * prunes before the term filter touches any row. */
  private def prunedPostings(
      postings: DataFrame, terms: Seq[String]): DataFrame = {
    val bucketed =
      if (postings.columns.contains("term_bucket"))
        postings.filter(terms
          .map(t => col("term_bucket") === termBucket(lit(t)))
          .reduce(_ || _))
      else postings
    bucketed.filter(col("term").isin(terms: _*))
  }

  def phraseOccurrences(
      postings: DataFrame,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val sub = prunedPostings(postings, phrase.distinct)
    val counts = sub.groupBy("term").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val slots = phrase.zipWithIndex
    val anchor = slots.minBy { case (t, i) => (counts.getOrElse(t, 0L), i) }
    def starts(slot: (String, Int)) =
      sub.filter(col("term") === slot._1)
        .select(col("doc_id"),
          (col("pos").cast("long") - slot._2).as("start"))
    var cur = starts(anchor).filter(col("start") >= 0)
    slots.filterNot(_ == anchor).foreach { slot =>
      cur = cur.join(starts(slot), Seq("doc_id", "start"), "left_semi")
    }
    cur
  }

  /** A bounded phrase SET probed in ONE pass over the positional
    * index — the decontamination shape (every eval-set n-gram vs the
    * corpus at once): the slot table (phrase_id, term, offset) is
    * broadcast against the postings restricted to the UNION of phrase
    * terms, each matching posting votes for
    * (phrase_id, doc_id, start = pos − offset), and a start is an
    * occurrence iff all of its phrase's slots voted — one equi-join +
    * one map-side-combinable count, independent of how many phrases
    * (the per-phrase walk would pay `k` joins PER phrase). Duplicate
    * terms within a phrase vote once per SLOT (offsets are distinct,
    * and a posting matches a slot at exactly one start), so the count
    * test is exact. Output: (phrase_id, doc_id, start). */
  def phraseOccurrencesBatch(
      postings: DataFrame,
      phrases: Seq[Seq[String]]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      "phrases must be a non-empty set of non-empty phrases")
    val spark = postings.sparkSession
    import spark.implicits._
    val slots = phrases.zipWithIndex.flatMap { case (p, pid) =>
      p.zipWithIndex.map { case (t, off) =>
        (pid.toLong, t, off.toLong, p.length.toLong)
      }
    }.toDF("phrase_id", "term", "__off", "__k")
    prunedPostings(postings, phrases.flatten.distinct)
      .join(broadcast(slots), Seq("term"))
      .select(col("phrase_id"), col("doc_id"),
        (col("pos").cast("long") - col("__off")).as("start"), col("__k"))
      .filter(col("start") >= 0)
      .groupBy("phrase_id", "doc_id", "start")
      .agg(count(lit(1)).as("__n"), max("__k").as("__k"))
      .filter(col("__n") === col("__k"))
      .select("phrase_id", "doc_id", "start")
  }

  /** [[phraseOccurrences]] with the index built inline. */
  def phraseSearch(
      docs: DataFrame,
      phrase: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    phraseOccurrences(buildPositionalIndex(docs, textCol, idCol), phrase)

  /** The phrase's start positions computed IN-ROW from a document's
    * own token array — one `filter` HOF pass over the candidate
    * starts, no index, no join, no shuffle. The gate spelling of
    * [[phraseOccurrences]]: right when each arriving document is
    * judged alone (ingest-time streams, per-doc gates), while the
    * index walk is right when one phrase probes a persisted corpus.
    * Same start values (spec pins equality). */
  def phraseStartsCol(toks: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val hits = filter(
      sequence(lit(0), size(toks) - phrase.length),
      p => phrase.zipWithIndex
        .map { case (t, i) => element_at(toks, p + i + 1) === lit(t) }
        .reduce(_ && _))
    // guard the sequence: with size < phrase length it would run
    // DOWNWARD (sequence infers a negative step) instead of empty
    when(size(toks) >= phrase.length, hits.cast("array<bigint>"))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Per-document phrase verdicts: `phrase_starts` (all occurrence
    * positions, overlaps included) and `has_phrase`, as one stateless
    * projection — runs unchanged on a stream
    * ([[graft.streaming.Streaming.streamingPhraseGate]]). */
  def phraseGate(
      docs: DataFrame,
      phrase: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.withColumn("phrase_starts",
        phraseStartsCol(tokens(col(textCol)), phrase))
      .withColumn("has_phrase", size(col("phrase_starts")) > 0)

  /** Per-document verdicts for a PHRASE SET in one stateless pass —
    * the gate form of [[phraseOccurrencesBatch]]: the set rides one
    * broadcast handle through the
    * [[graft.functions.PhraseSetHitsBcast]] kernel (one token-array
    * walk per row regardless of phrase count; a per-phrase HOF column
    * would re-scan per phrase and grow the plan with the set), then
    * posexplode emits one (doc, phrase_id, n_hits) row per pair —
    * zero-hit pairs included, so the output shape is docs x phrases.
    * No index, no join, no aggregation: runs unchanged on a stream
    * ([[graft.streaming.Streaming.streamingPhraseSetGate]]). */
  def phraseSetGate(
      docs: DataFrame,
      phrases: Seq[Seq[String]],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      "phrases must be a non-empty set of non-empty phrases")
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(phrases.map(_.toArray).toArray)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val hitsCol = column(graft.functions.PhraseSetHitsBcast(
      expression(tokens(col(textCol))), bc))
    docs.withColumn("__hits", hitsCol)
      .select(col(idCol), posexplode(col("__hits")).as(Seq("phrase_id", "n_hits")))
      .select(col(idCol), col("phrase_id").cast("long").as("phrase_id"),
        col("n_hits"), (col("n_hits") > 0).as("has_phrase"))
  }

  /** DECONTAMINATION verdicts through the batch walk — the one-pass
    * composite of the q_contamination semantics: every eval-set
    * phrase probes the corpus index via [[phraseOccurrencesBatch]]
    * (one join + one count for the WHOLE set), occurrences collapse
    * to per-document totals, and every corpus document comes back
    * with (n_eval_hits, n_eval_phrases matched, contaminated). */
  def decontaminationVerdicts(
      docs: DataFrame,
      phrases: Seq[Seq[String]],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val occ = phraseOccurrencesBatch(
        buildPositionalIndex(docs, textCol, idCol), phrases)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_hits"),
        countDistinct(col("phrase_id")).as("n_eval_phrases"))
    docs.select(col(idCol).as("doc_id"))
      .join(occ, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        coalesce(col("n_eval_phrases"), lit(0L)).as("n_eval_phrases"))
      .withColumn("contaminated", col("n_eval_hits") > 0)
  }
}
