package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Text-analysis operators for LLM-training-data pipelines: token
  * counting, quality scoring, and language identification.
  *
  * All built from codegen'd Spark built-ins (no UDFs), each a single
  * narrow projection over the corpus — embarrassingly parallel, no
  * shuffle, scales linearly to any corpus size.
  */
object TextStats {

  /** Per-document descriptive statistics + a composite quality score.
    *
    * Columns: n_chars, n_tokens, n_types (distinct tokens),
    * type_token_ratio, avg_token_len, stopword_ratio (English stopword
    * heuristic), digit_ratio, alpha_ratio, quality_score. All ratios are
    * exact rational arithmetic over integer counts, rounded to 1e-9 for
    * cross-engine comparability.
    */
  def textStats(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val nTypes = size(array_distinct(toks)).cast("double")
    val stopHits = size(filter(toks, t => t.isin(EnglishStopwords: _*))).cast("double")
    val nDigit = (nChars - length(regexp_replace(col(textCol), "[0-9]", ""))).cast("double")
    val nAlpha = (nChars - length(regexp_replace(col(textCol), "[a-zA-Z]", ""))).cast("double")
    val avgTokLen = (nChars - (nTok - 1.0)) / nTok // chars minus separators
    val ttr = nTypes / nTok
    val stopR = stopHits / nTok
    val digitR = nDigit / nChars
    val alphaR = nAlpha / nChars
    // Composite quality heuristic (Gopher/C4-style fitness bands): token
    // count in [10, 100k], mean token length in [2, 12], some stopwords,
    // mostly alphabetic. Each sub-score in [0,1]; product keeps it [0,1].
    val qLen = when(nTok >= 10.0 && nTok <= 100000.0, 1.0).otherwise(0.25)
    val qTokLen = when(avgTokLen >= 2.0 && avgTokLen <= 12.0, 1.0).otherwise(0.5)
    val qStop = when(stopR >= 0.01, 1.0).otherwise(0.5)
    val qAlpha = when(alphaR >= 0.6, 1.0).otherwise(0.5)
    docs.select(
      col(idCol),
      nChars.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      nTypes.cast("long").as("n_types"),
      round(ttr, 9).as("type_token_ratio"),
      round(avgTokLen, 9).as("avg_token_len"),
      round(stopR, 9).as("stopword_ratio"),
      round(digitR, 9).as("digit_ratio"),
      round(alphaR, 9).as("alpha_ratio"),
      round(qLen * qTokLen * qStop * qAlpha, 9).as("quality_score"))
  }

  /** Gopher-style n-gram repetition signals: per document and n, the
    * occurrence count of the most frequent positional n-gram, the total
    * n-gram count, and their ratio — the standard "fraction of content
    * in the most common n-gram" filter for machine-generated /
    * boilerplate text. One explode + two hash aggregates per n; docs
    * shorter than n tokens are absent (no n-grams). Output:
    * (doc_id, n, top_count, total, top_frac). */
  def repetitionStats(
      docs: DataFrame,
      ns: Seq[Int] = Seq(2, 3),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    ns.map { n =>
      docs.select(col(idCol).as("doc_id"),
          explode(TextOps.shingleSeq(TextOps.tokens(col(textCol)), n)).as("__g"))
        .groupBy("doc_id", "__g").agg(count(lit(1)).as("__c"))
        .groupBy("doc_id").agg(
          first(lit(n)).as("n"),
          max(col("__c")).as("top_count"),
          sum(col("__c")).as("total"),
          (max(col("__c")).cast("double") / sum(col("__c"))).as("top_frac"))
    }.reduce(_.unionByName(_))
      .select("doc_id", "n", "top_count", "total", "top_frac")
      .orderBy("doc_id", "n")

  /** Corpus-level top-k positional n-grams — vocabulary statistics for
    * tokenizer training / boilerplate discovery: per n-gram the total
    * occurrence count and the document frequency, ordered by
    * (count desc, ngram) with the unique ngram as the final tie-break
    * so the top-k cut is deterministic.
    *
    * Two chained hash aggregates (per-doc counts, then global sums —
    * both map-side combinable; no distinct-count expand) and a global
    * top-k that plans as TakeOrderedAndProject: only k rows ever reach
    * the driver-side collect limit, regardless of vocabulary size.
    * Output: (ngram, n_docs, count). */
  def topNgrams(
      docs: DataFrame,
      n: Int = 2,
      k: Int = 100,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("__id"),
        explode(TextOps.shingleSeq(TextOps.tokens(col(textCol)), n)).as("ngram"))
      .groupBy("__id", "ngram").agg(count(lit(1)).as("__c"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_docs"), sum(col("__c")).as("count"))
      .orderBy(col("count").desc, col("ngram"))
      .limit(k)

  /** Whitespace token count plus a BPE-ish subword estimate: runs of
    * letters (split every 4 chars, the empirical ~chars-per-BPE-token),
    * digits individually, and any other non-space character one each. */
  def tokenCounts(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val letterRuns = filter(split(col(textCol), "[^a-zA-Z]"), t => t =!= "")
    val subwordFromRuns = aggregate(letterRuns, lit(0L),
      (acc, r) => acc + ceil(length(r).cast("double") / 4.0).cast("long"))
    val nDigit = length(col(textCol)) - length(regexp_replace(col(textCol), "[0-9]", ""))
    docs.select(
      col(idCol),
      size(toks).cast("long").as("ws_tokens"),
      (subwordFromRuns + nDigit +
        (length(regexp_replace(col(textCol), "[a-zA-Z0-9\\s]", "")))).as("bpe_tokens"))
  }

  /** Small English stopword list for the quality heuristic. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
    "for", "on", "as", "with", "was", "at", "by", "be", "this", "are")

  /** Per-language marker-token profiles for the n-gram/stopword
    * language-ID heuristic. Latin-script languages score by marker-token
    * hit ratio; zh scores by CJK character ratio. */
  val DefaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "se", "un", "por"),
    "fr" -> Seq("le", "les", "et", "des", "une", "du", "est", "dans", "pour", "sur"))

  /** Language identification: per-language marker-hit ratio (plus a CJK
    * character-ratio channel for zh), prediction = argmax with
    * deterministic lexicographic tie-break.
    *
    * Output: (id, score_<lang>..., score_zh, pred_lang). One projection,
    * no shuffle. */
  def languageId(
      docs: DataFrame,
      profiles: Map[String, Seq[String]] = DefaultProfiles,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = greatest(size(toks).cast("double"), lit(1.0))
    val langs = profiles.keys.toSeq.sorted
    val scoreCols: Seq[(String, Column)] = langs.map { l =>
      val hits = size(filter(toks, t => t.isin(profiles(l): _*))).cast("double")
      l -> round(hits / nTok, 9)
    } :+ ("zh" -> {
      val nChars = greatest(length(col(textCol)).cast("double"), lit(1.0))
      val cjk = nChars - length(regexp_replace(col(textCol), "[\\x{4e00}-\\x{9fff}]", ""))
      round(cjk / nChars, 9)
    })
    val allLangs = scoreCols.map(_._1)
    // argmax with lexicographic tie-break: fold over (score, lang) pairs.
    val pred = allLangs.sorted.reverse.foldLeft(lit("und")) { (acc, l) =>
      when(col(s"score_$l") >= coalesce(
        greatest(allLangs.map(x => col(s"score_$x")): _*), lit(0.0))
        && col(s"score_$l") > 0.0, lit(l)).otherwise(acc)
    }
    val withScores = scoreCols.foldLeft(docs.select(col(idCol), col(textCol))) {
      case (d, (l, c)) => d.withColumn(s"score_$l", c)
    }
    withScores
      .withColumn("pred_lang", pred)
      .drop(textCol)
  }
}
