package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Corpus-wide text REWRITE operators — the removal/cleanup family of a
  * training-data pipeline. Unlike the [[Dedup]] / [[TextStats]] family
  * (which flag, score, or select whole documents), these rewrite the
  * text itself: exact chunk-level deduplication (a duplicated span
  * survives only at its first corpus occurrence — the span-granular
  * cousin of C4's three-sentence dedup and of exact-substring dedup à
  * la Lee et al. 2021) and boilerplate stripping (spans occurring in
  * more than `maxDf` distinct documents are dropped everywhere —
  * headers, footers, navigation chrome).
  *
  * Text is segmented into NON-OVERLAPPING `k`-token chunks (the final
  * partial chunk included), so every token belongs to exactly one
  * chunk and reassembly is a deterministic order-preserving join of the
  * surviving chunks.
  *
  * Scale design (the 100 TB contract):
  *  - keeper selection is a hash aggregate on the chunk string with
  *    map-side partial `min` / partial distinct-count — a boilerplate
  *    chunk duplicated 10^9 times combines to one row per map task, so
  *    hot chunks cannot blow up a reducer (the reason this is a
  *    groupBy+join and NOT a `row_number() over (partition by chunk)`
  *    window, which would sort every occurrence of a hot chunk in one
  *    partition);
  *  - the join back to occurrences is a bounded equi-join on
  *    (chunk, doc_id, chunk_idx); at 100 TB the shuffle key would be a
  *    128-bit content hash of the chunk instead of the raw string
  *    (slimmer exchange, collision-negligible) — kept as the raw
  *    string here so the DuckDB oracle compares exact text semantics;
  *  - reassembly state is O(document length) per group, independent of
  *    corpus size; no driver-side collects anywhere. */
object Rewrite {

  /** One row per (doc, chunk position): `chunk` is the space-joined
    * k-token span. Docs with no tokens produce no rows (restored at
    * reassembly with empty text). `extraCols` are passed through
    * unchanged (e.g. an event-time column for the streaming mirror). */
  def chunkOccurrences(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3,
      extraCols: Seq[String] = Nil): DataFrame = {
    require(k > 0, s"chunk width must be positive, got $k")
    val toks = tokens(col(textCol))
    docs.select(col(idCol).as("doc_id") +: toks.as("__toks") +:
        extraCols.map(col): _*)
      .where(size(col("__toks")) > 0)
      .select(col("doc_id") +: extraCols.map(col) :+ posexplode(
        transform(
          sequence(lit(0), nChunks(size(col("__toks")), k) - 1),
          i => array_join(slice(col("__toks"), i * k + lit(1), lit(k)), " "))): _*)
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
  }

  /** ceil(nTokens / k) as an integral column (Column `/` is double
    * division; `sequence` needs integral bounds). */
  private def nChunks(nTokens: Column, k: Int): Column =
    floor((nTokens + lit(k - 1)) / lit(k)).cast("int")

  /** Order-preserving reassembly of surviving chunks + restoration of
    * docs that lost everything (or had no tokens): (doc_id, text,
    * n_kept, n_chunks). */
  private def reassemble(
      docs: DataFrame, surviving: DataFrame,
      textCol: String, idCol: String, k: Int): DataFrame = {
    val rebuilt = surviving.groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
            s => s.getField("chunk")),
          " ").as("__text"),
        count(lit(1)).as("__kept"))
    val totals = docs.select(col(idCol).as("doc_id"),
      nChunks(size(tokens(col(textCol))), k).as("n_chunks"))
    totals.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__text"), lit("")).as("text"),
        coalesce(col("__kept"), lit(0L)).as("n_kept"),
        col("n_chunks"))
  }

  /** Exact corpus-wide chunk dedup: a chunk survives only at its FIRST
    * corpus occurrence (minimum (doc_id, chunk_idx)); every later
    * occurrence — in other documents or repeated within one — is
    * removed, and each document's text is rebuilt from its surviving
    * chunks in order. */
  def chunkDedup(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3): DataFrame = {
    val occ = chunkOccurrences(docs, textCol, idCol, k)
    val keepers = occ
      .groupBy("chunk")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("__first"))
      .select(col("chunk"),
        col("__first.doc_id").as("doc_id"),
        col("__first.chunk_idx").as("chunk_idx"))
    reassemble(docs, occ.join(keepers, Seq("chunk", "doc_id", "chunk_idx")),
      textCol, idCol, k)
  }

  /** Exact-substring span dedup, ALIGNMENT-FREE: removes every token
    * that lies inside a duplicated span of >= `k` tokens, wherever that
    * span starts — the gap [[chunkDedup]] cannot close, because its
    * non-overlapping chunk grid misses a duplicate offset from the
    * grid by even one token. This is the property Lee et al. 2021's
    * exact-substring dedup establishes with a corpus suffix array; the
    * distributed equivalence used here: a token belongs to a
    * duplicated >=k-token span iff some stride-1 k-token shingle
    * covering it occurs >= 2 times in the corpus, so
    *
    *  1. emit every OVERLAPPING k-token shingle occurrence
    *     (doc, start) — one row per token position, not per chunk;
    *  2. per shingle, a map-side-combinable `min(struct(doc_id,
    *     start))` + count picks the FIRST corpus occurrence (same
    *     skew-safe groupBy+join shape as [[chunkDedup]] — a viral
    *     shingle combines map-side, never sorts in one reducer);
    *  3. every NON-first occurrence of a shingle seen >= 2 times marks
    *     its k covered token positions removed (bounded k-row
    *     explosion per occurrence, then a map-side-combinable
    *     distinct);
    *  4. tokens survive via a left-anti join on (doc_id, pos) and each
    *     document is rebuilt in token order.
    *
    * First occurrences keep their text unless another duplicated span
    * covers them. Documents shorter than `k` tokens cannot contain a
    * >=k-token span and pass through untouched. At 100 TB the shuffle
    * key would be a 128-bit content hash of the shingle (slimmer
    * exchange; the raw string is kept here so the DuckDB oracle
    * compares exact text semantics).
    *
    * Output: (doc_id, text, n_kept, n_tokens) — kept-token count and
    * total token count per document. */
  def spanDedup(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 5): DataFrame = {
    require(k > 0, s"span width must be positive, got $k")
    val base = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("__toks"))
    val tokRows = base.where(size(col("__toks")) > 0)
      .select(col("doc_id"), posexplode(col("__toks")).as(Seq("pos", "token")))
    val occ = base.where(size(col("__toks")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("__toks")) - lit(k)),
        i => array_join(slice(col("__toks"), i + lit(1), lit(k)), " ")))
        .as(Seq("start", "shingle")))
    val dups = occ.groupBy("shingle")
      .agg(min(struct(col("doc_id"), col("start"))).as("__first"),
        count(lit(1)).as("__cnt"))
      .where(col("__cnt") >= 2)
      .select(col("shingle"), col("__first.doc_id").as("__fd"),
        col("__first.start").as("__fs"))
    val removedPos = occ.join(dups, Seq("shingle"))
      .where(!(col("doc_id") === col("__fd") && col("start") === col("__fs")))
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + lit(k - 1))).as("pos"))
      .distinct()
    cutPositions(docs, tokRows, removedPos, textCol, idCol)
  }

  /** Shared rebuild tail of the span-cut family: drop `removedPos`
    * (doc_id, pos) from `tokRows` (doc_id, pos, token) and reassemble
    * each document in token order; docs losing every token (or with no
    * tokens at all) come back with empty text via the left join. */
  private def cutPositions(
      docs: DataFrame,
      tokRows: DataFrame,
      removedPos: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val rebuilt = tokRows.join(removedPos, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("token")))),
            s => s.getField("token")),
          " ").as("__text"),
        count(lit(1)).as("__kept"))
    docs.select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__text"), lit("")).as("text"),
        coalesce(col("__kept"), lit(0L)).as("n_kept"),
        col("n_tokens"))
  }

  /** [[spanDedup]] recomputed from the SUFFIX ARRAY — the span-CUT
    * composition of [[graft.operators.SuffixRank.repeatMarks]]'
    * machinery, i.e. Lee et al. '22's exact substring dedup as
    * published: all occurrences of one >= `minLen`-token substring are
    * CONTIGUOUS in global suffix order (a maximal run of consecutive
    * lcp_prev >= minLen), so
    *
    *  1. block id = running count of lcp_prev < minLen boundaries over
    *     the suffix order — one bounded [[graft.operators.PrefixSum]]
    *     pass, no corpus-wide window;
    *  2. per block with >= 2 members, `min(struct(doc_id, pos))` picks
    *     the FIRST corpus occurrence (map-side combinable — a viral
    *     block never sorts in one reducer);
    *  3. every other member cuts its minLen covered positions, and the
    *     shared rebuild tail reassembles survivors in token order.
    *
    * Blocks partition positions by equality of their minLen-token
    * window (equal windows are adjacent in suffix order; capped LCP
    * keeps sub-minLen tails out), so the output is BIT-IDENTICAL to
    * [[spanDedup]] at k = minLen — RewriteSpec pins the parity, and
    * the two paths trade differently at scale: spanDedup shuffles one
    * row per (position, shingle string); this path shuffles the
    * suffix-array build (log(max doc length) bounded-histogram rounds)
    * and never materializes shingle strings at all — the win when
    * minLen is large (shingle bytes ~ minLen x corpus) or when the
    * suffix array already exists for repeat mining. */
  def spanDedupSA(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minLen: Int = 5,
      numParts: Int = 0): DataFrame =
    spanDedupSAFromSa(
      graft.operators.SuffixRank.suffixArrayWithLcp(
        docs, textCol, idCol, numParts),
      docs, textCol, idCol, minLen, numParts)

  /** [[spanDedupSA]] over a PREBUILT (ideally persisted)
    * suffix-array-with-LCP frame for the SAME `docs` — the SA is the
    * expensive artifact; repeat mining and the cut share one
    * materialization (the Bm25Index lifecycle; `sa` MUST be
    * `SuffixRank.suffixArrayWithLcp(docs, textCol, idCol)` or the cut
    * is meaningless). */
  def spanDedupSAFromSa(
      sa: DataFrame,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minLen: Int = 5,
      numParts: Int = 0): DataFrame = {
    require(minLen >= 1, s"span width must be positive, got $minLen")
    val marked = sa.select(col("seq"), col("doc_id"), col("pos"),
      when(col("lcp_prev") < minLen, lit(1L)).otherwise(lit(0L)).as("__c"))
    val blocks = graft.operators.PrefixSum.rowsBefore(marked, "seq", numParts)
      .select(col("doc_id"), col("pos"),
        (col("__rb") + col("__c")).as("__blk"))
    val groups = blocks.groupBy("__blk")
      .agg(min(struct(col("doc_id"), col("pos"))).as("__first"),
        count(lit(1)).as("__cnt"))
      .where(col("__cnt") >= 2)
      .select(col("__blk"), col("__first.doc_id").as("__fd"),
        col("__first.pos").as("__fs"))
    val removedPos = blocks.join(groups, Seq("__blk"))
      .where(!(col("doc_id") === col("__fd") && col("pos") === col("__fs")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(minLen - 1))).as("pos"))
      .distinct()
    val tokRows = docs
      .select(col(idCol).cast("long").as("doc_id"), tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col("doc_id"), posexplode(col("__toks")).as(Seq("pos", "token")))
    cutPositions(docs, tokRows, removedPos, textCol, idCol)
  }

  /** Boilerplate strip: chunks occurring in MORE than `maxDf` distinct
    * documents are dropped from every document (headers, footers,
    * cookie banners); everything else is kept in place. */
  def stripBoilerplate(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3,
      maxDf: Int = 4): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val occ = chunkOccurrences(docs, textCol, idCol, k)
    val kept = occ.groupBy("chunk")
      .agg(countDistinct(col("doc_id")).as("__df"))
      .where(col("__df") <= maxDf)
      .select("chunk")
    reassemble(docs, occ.join(kept, Seq("chunk")), textCol, idCol, k)
  }
}
