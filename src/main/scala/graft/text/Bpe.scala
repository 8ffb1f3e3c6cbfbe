package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextOps._

/** Byte-pair-encoding subword tokenization (Sennrich et al. 2016) —
  * the tokenizer-construction step of an LLM data pipeline: learn the
  * merge table from corpus statistics, then segment every token into
  * subwords with it.
  *
  * Scale design (the 100 TB contract): the corpus is touched ONCE (a
  * word-frequency aggregate, map-side combinable); training then runs
  * on the VOCABULARY table, whose size is the distinct-word count,
  * independent of corpus row count. A vocabulary under `vocabCap`
  * collects once and the merge loop runs DRIVER-LOCAL — one Spark job
  * total for any number of merges (a 32k-merge run would otherwise be
  * 32k sequential jobs). Above the cap the loop stays distributed:
  * pair counts weighted by word frequency, one (count, pair)-max
  * collect (a single row) and a per-word merge application per
  * iteration, lineage cut with localCheckpoint (the [[Dedup]]
  * label-propagation precedent) and the superseded iteration's
  * checkpoint blocks released each round. Encoding broadcasts the
  * merge list and memoizes per-word segmentations per partition.
  *
  * Determinism: pair counts are exact integers and the best-pair
  * selection tie-breaks lexicographically, so the learned merge table
  * is reproducible across runs and partitionings. No end-of-word
  * marker is used (documented simplification; merges never cross
  * whitespace-token boundaries either way). */
object Bpe {

  /** Left-to-right non-overlapping application of one merge. */
  private[graft] def applyMerge(
      syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Segment one word with an ordered merge list (Sennrich: apply each
    * merge in learned order). */
  private[graft] def segment(
      word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = word.toCharArray.map(_.toString)
    merges.foreach { case (a, b) =>
      if (syms.length > 1) syms = applyMerge(syms, a, b)
    }
    syms
  }

  /** Spark's string ordering is UTF8String's unsigned BYTE comparison;
    * the driver venue must tie-break identically, so it compares
    * UTF-8 byte arrays, not UTF-16 `compareTo`. */
  private def utf8Lt(x: String, y: String): Boolean =
    java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Driver-local merge loop over a collected (cnt, syms) vocabulary —
    * the venue for capped vocabularies: ONE collect total instead of
    * one Spark job per merge (a realistic 32k-merge run is 32k
    * sequential jobs in the distributed venue). Arithmetic and
    * tie-breaks are token-identical to the distributed SQL
    * (exact integer pair counts; max n, then lexicographically
    * smallest (a, b) in UTF-8 byte order), pinned by the
    * venue-equivalence test. */
  private[graft] def trainLocal(
      vocab0: Array[(Long, Array[String])],
      numMerges: Int): Seq[(String, String)] = {
    var vocab = vocab0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 1 to numMerges if !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (cnt, syms) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + cnt)
          i += 1
        }
      }
      var best: ((String, String), Long) = null
      counts.foreach { case e @ ((a, b), n) =>
        if (n >= 2 && (best == null || n > best._2 ||
          (n == best._2 && (utf8Lt(a, best._1._1) ||
            (a == best._1._1 && utf8Lt(b, best._1._2))))))
          best = e
      }
      if (best == null) exhausted = true
      else {
        val (a, b) = best._1
        merges += ((a, b))
        vocab = vocab.map { case (cnt, syms) =>
          (cnt, if (syms.length > 1) applyMerge(syms, a, b) else syms)
        }
      }
    }
    merges.toSeq
  }

  /** Learn `numMerges` merges from the corpus' word-frequency table.
    * Returns the ordered merge list (may be shorter if the vocabulary
    * runs out of repeated pairs).
    *
    * Venue switch (the [[graft.vector.Ivf]] Lloyd precedent): the one
    * corpus pass always runs distributed; if the resulting DISTINCT-
    * WORD vocabulary fits `vocabCap` rows it is collected once and the
    * merge loop runs driver-local — one Spark job total instead of one
    * per merge. Above the cap (or with `vocabCap <= 0`) the loop runs
    * distributed on the vocabulary table, one pair-count job + one
    * eager localCheckpoint per merge, releasing the superseded
    * iteration's checkpoint blocks each round. Both venues share the
    * exact integer arithmetic and UTF-8-byte tie-break, so the learned
    * merge tables are identical (venue-equivalence pinned in BpeSpec). */
  def train(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
      vocabCap: Int = 1 << 16): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus pass: word frequencies
    val wordFreq = docs
      .select(explode(tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cnt"))
    val vocab0 = wordFreq
      .select(col("__cnt"),
        expr("transform(sequence(1, length(__w)), i -> substring(__w, i, 1))")
          .as("__syms"))
      .as[(Long, Array[String])]
    if (vocabCap > 0) {
      // bounded probe: <= cap+1 rows cross the driver, never more
      val capped = vocab0.limit(vocabCap + 1).collect()
      if (capped.length <= vocabCap) return trainLocal(capped, numMerges)
    }
    // Distributed venue, BATCHED (round 9): one pair-count job used to
    // buy ONE merge — a realistic 32k-merge vocabulary was 32k
    // sequential jobs. Each pass now collects the top candidates
    // (bounded: <= 257 rows) and applies the longest prefix that
    // provably matches the one-merge-at-a-time trajectory:
    //  - accepted pairs are pairwise NON-INTERACTING — no symbol of a
    //    later pair equals a component or the concatenation of an
    //    earlier accepted pair — so applying earlier pairs leaves every
    //    later accepted pair's adjacency count untouched;
    //  - the prefix stops at the first interacting candidate, and only
    //    pairs whose count is STRICTLY above the first excluded
    //    candidate's count t are kept. Any pair a sequential step could
    //    newly create is bounded by the prior count of a pair that
    //    interacts with the applied merge — which is excluded, hence
    //    <= t — and existing non-accepted pairs only decrease; strict
    //    inequality also settles count ties a new pair could otherwise
    //    win lexicographically. So at every intermediate step the
    //    sequential argmax is exactly the next accepted pair, and the
    //    batched merge table is bitwise the classic one (BpeSpec pins
    //    venue equivalence and the job-count economy).
    var vocab = vocab0
    var prevCkpt: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val want = numMerges - merges.size
      val batchCap = math.min(want, 256)
      val cands = vocab.toDF("__cnt", "__syms")
        .select(col("__cnt"), explode(
          zip_with(col("__syms"),
            slice(col("__syms"), lit(2), size(col("__syms"))),
            (x, y) => when(y.isNotNull, struct(x.as("a"), y.as("b")))))
          .as("__p"))
        .where(col("__p").isNotNull)
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum(col("__cnt")).as("n"))
        .where(col("n") >= 2) // a pair seen once carries no signal
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(batchCap + 1).collect()
        .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
          r.getAs[Long]("n")))
      if (cands.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.HashSet.empty[String]
        val accepted =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        var stop = false
        while (i < math.min(cands.length, batchCap) && !stop) {
          val (a, b, n) = cands(i)
          if (used(a) || used(b) || used(a + b)) stop = true
          else { accepted += ((a, b, n)); used += a; used += b; used += (a + b); i += 1 }
        }
        // t = count of the first candidate NOT accepted (interacting,
        // or past the batch cap); a complete list with no exclusions
        // leaves t = 0 — nothing a step creates can then reach n >= 2
        val t = if (i < cands.length) cands(i)._3 else 0L
        val safe = accepted.takeWhile(_._3 > t)
        // a tie between the top candidate and its first excluded rival
        // degenerates the batch: fall back to the always-exact single
        // merge (classic behavior)
        val kept = (if (safe.isEmpty) accepted.take(1) else safe)
          .map { case (a, b, _) => (a, b) }.toSeq
        merges ++= kept
        val next = vocab.map { case (cnt, syms) =>
          var cur = syms
          kept.foreach { case (a, b) =>
            if (cur.length > 1) cur = applyMerge(cur, a, b)
          }
          (cnt, cur)
        }.toDF("__cnt", "__syms").localCheckpoint(true)
        // the new checkpoint is materialized (eager), so the superseded
        // iteration's blocks can go — Dataset.unpersist cannot reach
        // them, hence the bridge (see unpersistLocalCheckpoint)
        prevCkpt.foreach(
          org.apache.spark.sql.graftbridge.ColumnBridge.unpersistLocalCheckpoint)
        prevCkpt = Some(next)
        vocab = next.as[(Long, Array[String])]
      }
    }
    prevCkpt.foreach(
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistLocalCheckpoint)
    merges.toSeq
  }

  /** Segment every token of every document with a learned merge list:
    * (doc_id, token, subwords, n_subwords). Broadcast merges, per-
    * partition word-segmentation memo, no shuffle beyond the explode. */
  def encode(
      docs: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, tok) =>
          val subs = memo.getOrElseUpdate(tok, segment(tok, bc.value))
          (id, tok, subs, subs.length)
        }
      }
      .toDF("doc_id", "token", "subwords", "n_subwords")
  }
}
