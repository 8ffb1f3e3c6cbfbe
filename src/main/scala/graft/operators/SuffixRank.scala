package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Distributed suffix ranking by prefix doubling (Manber–Myers over a
  * document corpus) — the suffix-array strategy behind exact
  * substring-level dedup (Lee et al. 2022 "Deduplicating Training
  * Data Makes Language Models Better" builds exactly this structure;
  * [[graft.text.Rewrite]]'s spanDedup covers the dedup SEMANTICS with
  * a sliding-window form — this operator is the scalable SA-ranking
  * strategy itself, exposed because downstream tooling wants the
  * global suffix order: maximal-repeat mining, LCP statistics,
  * substring search layout).
  *
  * Algorithm: every token position starts with the rows-before rank
  * of its token (one distinct-histogram [[PrefixSum]] pass); each
  * round h = 1, 2, 4, … re-keys position p by the pair
  * (rank(p), rank(p+h)) — rank −1 past the suffix end, so shorter
  * suffixes sort first, matching lexicographic order — and re-ranks
  * the pairs with one composite-key [[PrefixSum]] pass. After
  * ⌈log₂(max doc length)⌉ rounds every rank covers its whole suffix;
  * positions whose suffixes are genuinely EQUAL (cross-document
  * repeats) share a rank forever, so the loop exits on
  * max-multiplicity 1 OR the length bound, never spins on ties.
  *
  * Scale shape: suffixes never cross documents, so rounds are
  * log(max DOC length), not log(corpus); each round is one
  * equi-join on (doc, pos+h) + one bounded-histogram prefix sum —
  * no corpus-wide single-partition window, no driver-side state but
  * two scalar convergence reads. Rank frames are localCheckpoint'ed
  * per round (each is referenced twice the next round — the
  * iterative-lineage guard).
  *
  * Output: (doc_id, pos, suffix_rank) — suffix_rank is the 0-based
  * count of corpus suffixes strictly smaller than the suffix starting
  * at (doc_id, pos); equal suffixes share a rank (the DuckDB oracle
  * replays it as `rank() OVER (ORDER BY suffix_text) - 1`).
  */
object SuffixRank {

  def suffixRanks(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numParts: Int = 32): DataFrame = {
    val positions = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "__tok")))
      .localCheckpoint()

    // base: rank positions by token (rows-before over the vocab histogram)
    val tokHist = positions.groupBy("__tok").agg(count(lit(1)).as("__c"))
    val tokRank = PrefixSum.rowsBefore(tokHist, "__tok", numParts)
      .select(col("__tok"), col("__rb"))
    var ranks = positions.join(tokRank, Seq("__tok"))
      .select(col("doc_id"), col("pos"), col("__rb").as("__rank"))
      .localCheckpoint()

    val maxLenRow = positions.groupBy("doc_id").agg(count(lit(1)).as("__n"))
      .agg(max("__n")).collect()(0)
    val maxLen = if (maxLenRow.isNullAt(0)) 0L else maxLenRow.getLong(0)
    var h = 1L
    var maxMult = Long.MaxValue
    while (h < maxLen && maxMult > 1L) {
      // rank(p + h), seen from p; -1 past the suffix end (sorts first:
      // the shorter-suffix-is-prefix case)
      val shifted = ranks.select(col("doc_id"), (col("pos") - h).as("pos"),
        col("__rank").as("__r2"))
      val keyed = ranks.join(shifted, Seq("doc_id", "pos"), "left")
        .withColumn("__r2", coalesce(col("__r2"), lit(-1L)))
      val pairHist = keyed.groupBy("__rank", "__r2").agg(count(lit(1)).as("__c"))
      val pairRank = PrefixSum.rowsBefore(pairHist, Seq("__rank", "__r2"), numParts)
      val next = keyed.join(pairRank, Seq("__rank", "__r2"))
        .select(col("doc_id"), col("pos"), col("__rb").as("__rank"),
          col("__c"))
        .localCheckpoint()
      maxMult = next.agg(max("__c")).collect()(0).getLong(0)
      ranks = next.drop("__c")
      h *= 2L
    }
    ranks.select(col("doc_id"), col("pos"), col("__rank").as("suffix_rank"))
      .orderBy("doc_id", "pos")
  }
}
