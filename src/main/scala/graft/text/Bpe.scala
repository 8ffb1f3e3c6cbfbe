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
  * word-frequency aggregate, map-side combinable); every training
  * iteration then runs on the VOCABULARY table — pair counts weighted
  * by word frequency, one (count, pair)-max collect (a single row),
  * and a per-word merge application — whose size is the distinct-word
  * count, independent of corpus row count. Lineage is cut per
  * iteration with localCheckpoint (the [[Dedup]] label-propagation
  * precedent). Encoding broadcasts the merge list and memoizes
  * per-word segmentations per partition.
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

  /** Learn `numMerges` merges from the corpus' word-frequency table.
    * Returns the ordered merge list (may be shorter if the vocabulary
    * runs out of repeated pairs). */
  def train(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus pass: word frequencies
    var vocab = docs
      .select(explode(tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cnt"))
      .select(col("__cnt"),
        expr("transform(sequence(1, length(__w)), i -> substring(__w, i, 1))")
          .as("__syms"))
      .as[(Long, Array[String])]
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (_ <- 1 to numMerges if !exhausted) {
      val best = vocab.toDF("__cnt", "__syms")
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
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best.head.getAs[String]("a"), best.head.getAs[String]("b"))
        merges += ((a, b))
        vocab = vocab.map { case (cnt, syms) =>
          (cnt, if (syms.length > 1) applyMerge(syms, a, b) else syms)
        }.toDF("__cnt", "__syms").localCheckpoint(true)
          .as[(Long, Array[String])]
      }
    }
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
