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

  /** Gopher-style rule-based quality filter (Rae et al. 2021,
    * MassiveText §A.1.1): each document gets the raw signal columns,
    * one 0/1 flag per rule, and the conjunction `quality_pass` —
    * pipelines keep the flags so filter ablations don't re-scan the
    * corpus. Line-shape rules (bullet/ellipsis lines) are omitted: the
    * corpus is single-space normalized with no line structure.
    *
    * Rules: 50 <= word count <= 100k; mean word length in [3, 10];
    * symbol-to-word ratio ('#' or '...') <= 0.1; >= 80% of words
    * contain an alphabetic character; >= 2 distinct stopwords
    * (harmful-boilerplate guard); top-2-gram fraction <= 0.20
    * (repetition guard).
    *
    * One narrow projection plus the 2-gram repetition aggregate
    * (explode + two map-side-combinable hash aggs) joined back per
    * doc — no other shuffle. All ratios are exact integer rationals
    * rounded to 1e-9 (cross-engine stable). */
  def gopherRules(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val meanLen = (nChars - (nTok - 1.0)) / nTok
    val alphaWords = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double")
    val stopDistinct = size(array_intersect(array_distinct(toks),
      array(EnglishStopwords.map(lit): _*)))
    val nHash = nChars - length(regexp_replace(col(textCol), "#", ""))
    val nEllipsis = (nChars -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3.0
    val symbolRatio = (nHash + nEllipsis) / nTok
    val base = docs.select(
      col(idCol).as("doc_id"),
      nTok.cast("long").as("n_words"),
      round(meanLen, 9).as("mean_word_len"),
      round(alphaWords / nTok, 9).as("frac_alpha_words"),
      stopDistinct.cast("long").as("n_stop_distinct"),
      round(symbolRatio, 9).as("symbol_word_ratio"))
    val rep2 = docs.select(col(idCol).as("doc_id"),
        explode(TextOps.shingleSeq(toks, 2)).as("__g"))
      .groupBy("doc_id", "__g").agg(count(lit(1)).as("__c"))
      .groupBy("doc_id").agg(
        (max(col("__c")).cast("double") / sum(col("__c"))).as("__tf"))
    def flag(c: Column): Column = when(c, 1L).otherwise(0L)
    base.join(rep2, Seq("doc_id"), "left")
      .withColumn("top2gram_frac", round(coalesce(col("__tf"), lit(0.0)), 9))
      .withColumn("r_wordcount",
        flag(col("n_words") >= 50 && col("n_words") <= 100000))
      .withColumn("r_wordlen",
        flag(col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0))
      .withColumn("r_symbol", flag(col("symbol_word_ratio") <= 0.1))
      .withColumn("r_alpha", flag(col("frac_alpha_words") >= 0.8))
      .withColumn("r_stop", flag(col("n_stop_distinct") >= 2))
      .withColumn("r_rep", flag(col("top2gram_frac") <= 0.2))
      .withColumn("quality_pass",
        col("r_wordcount") * col("r_wordlen") * col("r_symbol") *
          col("r_alpha") * col("r_stop") * col("r_rep"))
      .drop("__tf")
  }

  /** [[gopherRules]] as a PURE PER-ROW PROJECTION — no groupBy, no
    * join — so it runs unchanged on an unbounded stream (the
    * [[graft.streaming.Streaming.streamingGopherRules]] gate) and on
    * any batch frame. The only aggregated quantity in gopherRules is
    * the top-2-gram share; here it is the maximum run length of the
    * SORTED in-row 2-gram sequence over the gram count (integer
    * max-run == integer max-count, total == size — identical doubles,
    * identical 1e-9 round), computed with an `aggregate` HOF.
    * Output is column-for-column identical to [[gopherRules]] (pinned
    * by TextStatsSpec and the streaming replay test). `extraCols` pass
    * through (e.g. the event-time column of a stream). */
  def gopherRulesStateless(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      extraCols: Seq[String] = Nil): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val meanLen = (nChars - (nTok - 1.0)) / nTok
    val alphaWords = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double")
    val stopDistinct = size(array_intersect(array_distinct(toks),
      array(EnglishStopwords.map(lit): _*)))
    val nHash = nChars - length(regexp_replace(col(textCol), "#", ""))
    val nEllipsis = (nChars -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3.0
    val symbolRatio = (nHash + nEllipsis) / nTok
    // max run of the sorted 2-gram sequence == max per-gram count
    val sortedGrams = array_sort(TextOps.shingleSeq(toks, 2))
    val maxRun = aggregate(sortedGrams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val tf = when(size(sortedGrams) > 0,
      maxRun.cast("double") / size(sortedGrams).cast("double"))
      .otherwise(lit(0.0))
    def flag(c: Column): Column = when(c, 1L).otherwise(0L)
    docs.select(col(idCol).as("doc_id") +: extraCols.map(col) :+
        nTok.cast("long").as("n_words") :+
        round(meanLen, 9).as("mean_word_len") :+
        round(alphaWords / nTok, 9).as("frac_alpha_words") :+
        stopDistinct.cast("long").as("n_stop_distinct") :+
        round(symbolRatio, 9).as("symbol_word_ratio") :+
        round(tf, 9).as("top2gram_frac"): _*)
      .withColumn("r_wordcount",
        flag(col("n_words") >= 50 && col("n_words") <= 100000))
      .withColumn("r_wordlen",
        flag(col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0))
      .withColumn("r_symbol", flag(col("symbol_word_ratio") <= 0.1))
      .withColumn("r_alpha", flag(col("frac_alpha_words") >= 0.8))
      .withColumn("r_stop", flag(col("n_stop_distinct") >= 2))
      .withColumn("r_rep", flag(col("top2gram_frac") <= 0.2))
      .withColumn("quality_pass",
        col("r_wordcount") * col("r_wordlen") * col("r_symbol") *
          col("r_alpha") * col("r_stop") * col("r_rep"))
  }

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

  /** Class-based TF-IDF keywords (c-TF-IDF — BERTopic's topic-labeling
    * formula, Grootendorst 2022 §3.3; round 10): per class c and term
    * t, W(t,c) = tf(t,c) · ln(1 + A / f(t)) where f(t) is the corpus
    * term frequency and A the mean token mass per class — the IDF
    * analogue at class granularity, so terms concentrated in one class
    * outrank the corpus-wide commons. The standard "what is this
    * cluster about" readout over any grouping (domains, k-means cells,
    * dedup clusters).
    *
    * Exactness: tf and f are integers; the one libm step snaps —
    * score_micro = tf · round(1e6·ln(1 + A/f)) is an exact long, and
    * the per-class top-k orders by (score_micro desc, term asc).
    *
    * Scale: two map-side-combinable aggregates (class-term counts,
    * corpus term counts), a term equi-join (vocabulary-sized side —
    * broadcast when it fits), a 1-row constants join, and a
    * per-CLASS rank window (vocabulary-bounded partitions).
    *
    * @return (group, token, tf, score_micro, rank), rank <= topK */
  def classTfidf(
      docs: DataFrame,
      groupCol: String = "source",
      topK: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(groupCol).as("group"),
      explode(tokens(col(textCol))).as("token"))
    val tfc = tok.groupBy("group", "token").agg(count(lit(1)).as("tf"))
    val ft = tfc.groupBy("token").agg(sum(col("tf")).as("__f"))
    val consts = broadcast(tfc.agg(sum(col("tf")).as("__tot"),
      countDistinct(col("group")).as("__ncl")))
    val scored = tfc.join(ft, Seq("token")).crossJoin(consts)
      .withColumn("score_micro", col("tf") *
        round(log(lit(1.0) +
          col("__tot").cast("double") / col("__ncl") / col("__f")) * lit(1e6), 0)
          .cast("long"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("score_micro").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("group"), col("token"), col("tf"), col("score_micro"),
        col("rank"))
  }

  /** Corpus-unigram language-model score per document — the CCNet-style
    * perplexity-proxy quality signal: train a unigram LM on the corpus
    * itself (term frequency / total tokens) and score each document by
    * its mean per-token log-probability. Documents of rare/garbled
    * vocabulary score low; repetitive common-word boilerplate scores
    * high — both tails are filter candidates.
    *
    * Two hash aggregates (per-doc term counts, corpus term counts — both
    * map-side combinable), a term equi-join (vocabulary-sized right
    * side; the planner broadcasts when it fits), and a one-row
    * constants join. Documents with no tokens are absent (no LM mass).
    *
    * Determinism: ln(cf/C) — the only engine-divergent op — is snapped
    * to the 1e-8 grid per TERM (vocabulary entries, not rows; 1e-8
    * rather than 1e-9 because a true value within 1 ulp of a rounding
    * boundary straddles engines — observed ~1/5000 docs at 1e-9 on
    * sf0.1 — and a 10x coarser grid cuts the boundary-hit odds 10x
    * while staying far below any quality-scoring significance), and the
    * per-doc accumulation runs term-sorted through the `aggregate` HOF
    * (left-to-right), so scores are bitwise reproducible across
    * engines; the final mean is rounded to 1e-9.
    * Output: (doc_id, n_tokens, logprob). */
  def unigramLogProb(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("__t"))
      .groupBy("doc_id", "__t").agg(count(lit(1)).as("__tf"))
    val cf = tf.groupBy("__t").agg(sum(col("__tf")).as("__cf"))
    val total = cf.agg(sum(col("__cf")).as("__c"))
    // per-term ln SNAP at 1e-6 — kept as a SCALED LONG: the JVM's and
    // other engines' ln differ by 1 ulp on some inputs, so a term
    // whose ln sits within an ulp of a grid boundary flips the cell
    // cross-engine. At 1e-8 the straddle rate was ~1/5500 docs at the
    // 50k-doc probe (SURVEY §5); 1e-6 divides that by 100 (measured: 0
    // straddles) and still leaves logprobs far more precision than
    // quality filtering uses. Integerizing the snapped value (instead
    // of a rounded double) makes the per-doc sum ORDER-FREE exact
    // arithmetic — no sorted fold needed — and the final 1e-9 rounding
    // an exact integer half-away division: the round-7 probe caught
    // the previous double-path round(s/n, 9) diverging between engines
    // on EXACT .5e-9 ties (a 1e-6-grid sum over an even token count
    // lands on half-grid quotients, where DuckDB's float-path round
    // and the JVM's decimal-path round disagree — 30/50k docs).
    val contribs = tf.join(cf, Seq("__t")).crossJoin(broadcast(total))
      .select(col("doc_id"),
        (col("__tf") *
          round(log(col("__cf").cast("double") / col("__c")) * lit(1e6), 0)
            .cast("long")).as("__lps"))
    contribs.groupBy("doc_id")
      .agg(sum(col("__lps")).as("__S"))
      .join(tf.groupBy("doc_id").agg(sum(col("__tf")).as("n_tokens")), Seq("doc_id"))
      .withColumn("__num", col("__S") * lit(1000L))
      .select(col("doc_id"), col("n_tokens"),
        ((when(col("__num") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("(2 * abs(__num) + n_tokens) div (2 * n_tokens)"))
          .cast("double") / lit(1e9)).as("logprob"))
  }

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

  /** Feature-hashing vectorizer (Weinberger et al. 2009): each
    * document becomes a `dim`-wide integer vector — every token adds
    * ±1 (sign from one hash bit, bucket from the hash modulus) — the
    * model-free way to give text the vector-space operators (ANN,
    * clustering, int8 codes, SemDeDup) when no embedding model is in
    * the loop. Collision noise is the standard trade; signs keep the
    * expectation unbiased.
    *
    * One explode + one hash aggregate keyed on (doc, dim) — map-side
    * combinable, output bounded by |docs| x dim. All-integer, so the
    * vectors are bitwise engine-reproducible.
    *
    * @return (doc_id, dim, value) — only non-zero dims are emitted
    */
  def hashVectorize(
      docs: DataFrame,
      dim: Int = 64,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("__t"))
      .select(col("doc_id"), hash56(col("__t")).as("__h"))
      .groupBy(col("doc_id"), (col("__h") % dim).cast("long").as("dim"))
      .agg(sum(when(shiftright(col("__h"), 32) % 2 === 0, 1L)
        .otherwise(-1L)).as("value"))
      .filter(col("value") =!= 0L)

  /** PII detection + redaction: count and mask email addresses,
    * SSN-shaped, and US-phone-shaped numbers — the standard pre-release
    * scrubbing stage of public training corpora. Patterns are kept to
    * the portable regex core (char classes + bounded repetition) so
    * Java regex and RE2-family engines agree token-for-token;
    * replacement is left-to-right non-overlapping in both.
    *
    * A pure projection — no shuffle, scales linearly.
    *
    * @return (doc_id, n_emails, n_ssns, n_phones, redacted)
    */
  def redactPii(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
    val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
    val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    def cnt(c: Column, pat: String): Column =
      (size(split(c, pat, -1)) - 1).cast("long")
    // redact emails first: an email's local part can contain digits but
    // the dashed number shapes cannot contain '@', so the order only
    // matters for emails vs the rest
    val r1 = regexp_replace(col(textCol), email, "<EMAIL>")
    val r2 = regexp_replace(r1, ssn, "<SSN>")
    val r3 = regexp_replace(r2, phone, "<PHONE>")
    docs.select(
      col(idCol).as("doc_id"),
      cnt(col(textCol), email).as("n_emails"),
      cnt(regexp_replace(col(textCol), email, " "), ssn).as("n_ssns"),
      cnt(regexp_replace(regexp_replace(col(textCol), email, " "), ssn, " "),
        phone).as("n_phones"),
      r3.as("redacted"))
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
