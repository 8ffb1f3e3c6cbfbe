package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Corpus-level organization operators for training-data pipelines:
  * deterministic split assignment and domain-mixture sampling weights.
  * Both are single-pass, shuffle-minimal, and driver-free.
  */
object CorpusOps {

  /** Deterministic train/valid/test assignment by content-independent
    * id hash: bucket = hash56(salt:id) mod 1000, split by cumulative
    * fraction thresholds. Reproducible across runs/engines (md5-based),
    * stable under corpus growth (a document's split never changes when
    * other documents are added — the property random sampling lacks).
    *
    * @param splits (name, fraction) in order; fractions sum to ~1
    * @return input columns + (bucket, split)
    */
  def hashSplit(
      docs: DataFrame,
      splits: Seq[(String, Double)] = Seq("train" -> 0.9, "valid" -> 0.05,
        "test" -> 0.05),
      salt: String = "graft",
      idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    val bucket = hash56(concat_ws(":", lit(salt), col(idCol).cast("string"))) % 1000
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val thresholds = splits.map(_._1).zip(cum.map(f => (f * 1000).round))
    val expr = thresholds.init.foldRight(lit(thresholds.last._1)) {
      case ((name, hi), acc) => when(col("bucket") < hi, lit(name)).otherwise(acc)
    }
    docs.withColumn("bucket", bucket).withColumn("split", expr)
  }

  /** Leakage-safe split assignment: every member of a duplicate
    * CLUSTER lands in the same split (near-duplicates straddling a
    * train/test boundary leak evaluation data into training — the
    * contamination mode plain per-document splitting cannot prevent).
    * The split key is the document's cluster id when it has one
    * (from [[Dedup.duplicateClusters]]' min-label components) and its
    * own id otherwise, then [[hashSplit]]'s salted-hash thresholds
    * apply to the key. Same determinism and growth-stability
    * guarantees; a left join against the (pair-graph-sized, typically
    * small) cluster table is the only added cost.
    * @return input columns + (split_key, bucket, split) */
  def leakageSafeSplit(
      docs: DataFrame,
      clusters: DataFrame,
      splits: Seq[(String, Double)] = Seq("train" -> 0.9, "valid" -> 0.05,
        "test" -> 0.05),
      salt: String = "graft",
      idCol: String = "doc_id"): DataFrame = {
    val keyed = docs.join(
        clusters.select(col("doc_id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("split_key",
        coalesce(col("cluster_id"), col(idCol).cast("long")))
      .drop("cluster_id")
    hashSplit(keyed, splits, salt, idCol = "split_key")
  }

  /** Deterministic per-domain Bernoulli sampling — the op that APPLIES a
    * mixture (e.g. [[mixtureWeights]] rescaled to acceptance rates): a
    * document survives iff its salted id hash, mapped uniformly into
    * [0, 1) on a 1e-6 grid, falls below its domain's rate. Content- and
    * order-independent (same keep set on any cluster, any partitioning,
    * any engine) and growth-stable, unlike `df.sample`.
    *
    * @param rates (domainCol, rate) — tiny, broadcast
    * @return input columns + u (the unit-interval hash draw)
    */
  def sampleByRate(
      docs: DataFrame,
      rates: DataFrame,
      salt: String = "graft",
      idCol: String = "doc_id",
      domainCol: String = "source"): DataFrame = {
    val u = (hash56(concat_ws(":", lit("sample"), lit(salt),
      col(idCol).cast("string"))) % 1000000L).cast("double") / lit(1e6)
    docs
      .join(broadcast(rates), Seq(domainCol))
      .withColumn("u", u)
      .filter(col("u") < col("rate"))
  }

  /** Deterministic k-per-group sample: rank each group's documents by
    * a salted id hash (ties by id — total order) and keep the first k.
    * The hash order is a reproducible shuffle, so this is uniform
    * sampling that is stable across runs, engines, and corpus growth
    * within a group's surviving members — the standard way to carve
    * fixed-size eval/inspection sets per domain.
    *
    * One shuffle (by group) + a streaming row_number window; per-group
    * partitions stream, they are never buffered. */
  def sampleKPerGroup(
      docs: DataFrame,
      k: Int,
      salt: String = "graft",
      idCol: String = "doc_id",
      groupCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hash56(concat_ws(":", lit("pick"), lit(salt),
      col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    docs.withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= k)
  }

  /** Greedy fixed-length sequence packing — the pretraining dataloader
    * layout: documents concatenate in id order into one global token
    * stream that is cut into `seqLen`-token training sequences
    * (documents straddle cuts, the standard GPT-style packing). Each
    * document gets its global token offset and the sequence span it
    * lands in.
    *
    * Scale design: the global offset is a DISTRIBUTED prefix sum — a
    * per-block aggregate (block = id div `blockSize`), a prefix window
    * over the block-sum table (bounded: nDocs / blockSize rows — size
    * blockSize so this stays ~1e6 at target scale), and an intra-block
    * running sum partitioned by block. No corpus-wide single-partition
    * window, no driver collect. Requires non-negative ids (id div
    * blockSize must be monotone).
    *
    * @return (doc_id, n_tokens, token_offset, start_seq, start_offset,
    *         end_seq, n_seqs) for docs with >= 1 token
    */
  def packSequences(
      docs: DataFrame,
      seqLen: Int = 2048,
      blockSize: Long = 1L << 20,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      // `div` (integral), not `/` (double division truncates wrongly
      // past 2^53 and costs a round-trip through floating point)
      .withColumn("__blk", expr(s"cast(doc_id as bigint) div ${blockSize}"))
    val blockSums = t.groupBy("__blk")
      .agg(sum(col("n_tokens")).as("__bsum"))
      .withColumn("__bpre", coalesce(sum(col("__bsum")).over(
        Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__blk", "__bpre")
    val intra = Window.partitionBy("__blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(blockSums), Seq("__blk"))
      .withColumn("token_offset",
        col("__bpre") + coalesce(sum(col("n_tokens")).over(intra), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("token_offset"),
        expr(s"token_offset div ${seqLen}").as("start_seq"),
        (col("token_offset") % seqLen).as("start_offset"),
        expr(s"(token_offset + n_tokens - 1) div ${seqLen}").as("end_seq"))
      .withColumn("n_seqs", col("end_seq") - col("start_seq") + 1)
  }

  /** Deterministic per-epoch global shuffle + round-robin sharding —
    * the other half of the pretraining dataloader layout next to
    * [[packSequences]]: every epoch needs the corpus in a fresh
    * pseudorandom order, cut into `nShards` equal reader shards, and
    * the order must be REPRODUCIBLE (resume a crashed run, audit which
    * examples step 31337 saw) and engine-replayable. The order key is
    * the salted content-independent hash h = hash56("gs<epoch>:" || id)
    * (the [[hashSplit]] family), global position = rank by (h, id),
    * shard = pos mod nShards (a round-robin deal off a shuffled deck:
    * shard sizes differ by at most 1 and every shard is itself a
    * uniform subsample), position-in-shard = pos div nShards.
    *
    * Scale shape: the rank is a TWO-LEVEL prefix sum, never a global
    * single-partition window — the hash is uniform on [0, 2^56), so
    * its top `blockBits` bits give ~equal-sized blocks; per-block
    * row_numbers run in parallel and one bounded window over the
    * 2^blockBits block counts broadcasts the offsets back (the
    * [[graft.operators.Zorder.rankBuckets]] shape keyed by hash range
    * instead of value range). Partitioning-independent: rank is
    * defined by the (h, id) order alone (CorpusOpsSpec pins it).
    *
    * @return (id, shard, pos) — shard in [0, nShards), pos the
    *         0-based position within the shard
    */
  /** STRATIFIED sampling with EXACT largest-remainder (Hamilton)
    * apportionment — the balanced-eval-set construction: group g
    * receives floor(k·n_g/N) draws plus one of the k − Σfloor top-ups,
    * awarded to the largest remainders (k·n_g mod N, ties by group
    * ascending) — all integer arithmetic, so the allocation is
    * engine-exact and sums to exactly k whenever every group can fill
    * its quota (a group smaller than its allocation keeps all its rows;
    * no redistribution — the documented small-stratum behavior).
    * Within each group the winners are the salted-hash rank order (the
    * [[sampleKPerGroup]] pick, same determinism/growth stability).
    *
    * Scale: one count aggregate (rows = #groups), two windows over the
    * #groups-row allocation table (bounded — the Zorder numParts-window
    * precedent), one broadcast join of the allocation back onto the
    * per-group rank pick.
    *
    * @return winners as (id, group, pick_rank, alloc) */
  def stratifiedSample(
      docs: DataFrame,
      k: Int,
      groupCol: String = "source",
      salt: String = "graft",
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val cnt = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__ng"))
    val tot = broadcast(cnt.agg(sum(col("__ng")).as("__nn")))
    val al = cnt.crossJoin(tot)
      .withColumn("__base", expr(s"($k * __ng) div __nn"))
      .withColumn("__rem", expr(s"($k * __ng) % __nn"))
    // both windows run over #groups rows — bounded by construction
    val wRem = Window.orderBy(col("__rem").desc, col(groupCol))
    val alloc = al
      .withColumn("__rr", row_number().over(wRem))
      .withColumn("__bs", sum(col("__base")).over(
        Window.partitionBy(lit(1))))
      .withColumn("alloc", col("__base") +
        when(col("__rr") <= lit(k.toLong) - col("__bs"), 1L).otherwise(0L))
      .select(col(groupCol), col("alloc"))
    val h = hash56(concat_ws(":", lit("pick"), lit(salt),
      col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    docs.withColumn("pick_rank", row_number().over(w))
      .join(broadcast(alloc), Seq(groupCol))
      .filter(col("pick_rank") <= col("alloc"))
      .select(col(idCol), col(groupCol), col("pick_rank"), col("alloc"))
  }

  /** WEIGHTED sampling without replacement — Efraimidis-Spirakis
    * reservoir keys (Efraimidis & Spirakis 2006): each item draws
    * u ~ U(0,1) and the k largest u^(1/w) win, which is exactly
    * probability-proportional-to-weight sampling without replacement.
    * Maximizing u^(1/w) ≡ maximizing ln(u)/w, so the key never
    * overflows and one global top-k suffices.
    *
    * Deterministic and engine-exact: u = (hash56(salt:id) + 1) /
    * (2^56 + 1) ∈ (0,1) — both numerator and denominator pass through
    * the identical IEEE long→double rounding in every engine — and
    * the ONE libm step (ln) snaps to the 1e-6 grid immediately
    * ([[TextStats.unigramLogProb]] precedent); the sort key
    * `ln_micro / w` is then one IEEE division of exactly-agreed
    * values, tie-broken by id. Weights must be positive integers
    * (corpus weights — chars, tokens, dup counts — are); w <= 0 rows
    * are excluded, the A-ES domain.
    *
    * Scale: one projection + a global top-k (per-partition TakeOrdered
    * k, then a k-row merge — no full sort, no corpus-wide window).
    *
    * @return the k winners as (id, weight, key), key descending ==
    *         inclusion order */
  def weightedSample(
      docs: DataFrame,
      weightCol: String,
      k: Int,
      salt: String = "graft",
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = hash56(concat_ws(":", lit("ws"), lit(salt),
      col(idCol).cast("string")))
    // (h+1)/(2^56+1): both sides round long->double identically
    val u = (h + lit(1L)) / lit(72057594037927937L)
    val lnu = round(log(u) * lit(1e6), 0).cast("long")
    docs.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("weight"),
        lnu.as("__lnu"))
      .withColumn("key",
        col("__lnu").cast("double") / col("weight"))
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("weight"), col("key"))
  }

  def epochShard(
      docs: DataFrame,
      epoch: Int,
      nShards: Int,
      idCol: String = "doc_id",
      blockBits: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(blockBits >= 1 && blockBits <= 20,
      s"blockBits must be in [1, 20], got $blockBits")
    val h = hash56(concat(lit(s"gs$epoch:"), col(idCol).cast("string")))
    val t = docs.select(col(idCol), h.as("__h"))
      .withColumn("__blk", shiftright(col("__h"), 56 - blockBits))
    val blockOffsets = t.groupBy("__blk")
      .agg(count(lit(1)).as("__bc"))
      .withColumn("__bpre", coalesce(sum("__bc").over(
        Window.orderBy("__blk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__blk", "__bpre")
    val intra = Window.partitionBy("__blk").orderBy(col("__h"), col(idCol))
    t.join(broadcast(blockOffsets), Seq("__blk"))
      .withColumn("__gp",
        col("__bpre") + row_number().over(intra).cast("long") - 1L)
      .select(col(idCol),
        (col("__gp") % nShards).as("shard"),
        expr(s"__gp div $nShards").as("pos"))
  }

  /** Deterministic negative sampling for contrastive training pairs —
    * WITHOUT the anchor × candidate cross join that naive sampling
    * implies: each anchor draws `n * oversample` pseudo-random probes
    * (probe j targets the candidate at permutation position
    * hash56("neg<epoch>:" + anchor + ":" + j) mod N), the probes
    * equi-join the [[epochShard]] position permutation, collisions
    * with the anchor itself or its positives are dropped (plus
    * duplicate draws collapsed to their first probe), and the first
    * `n` survivors in probe order are kept. Everything is equi-joins
    * over bounded probe sets — corpus-size-independent per anchor —
    * and fully deterministic: same epoch, same corpus, same negatives,
    * exactly replayable by the oracle.
    *
    * With `oversample * n` probes against ≤ (1 + positives-per-anchor)
    * excluded candidates, anchors receive fewer than `n` negatives
    * only when the candidate pool itself is tiny; callers needing a
    * hard guarantee raise `oversample`.
    *
    * @param positives (anchorCol, positiveCol) pairs
    * @param candidates the pool, one row per idCol
    * @return (anchorCol, neg_rank 1..n, negative_id)
    */
  def negativeSample(
      positives: DataFrame,
      candidates: DataFrame,
      n: Int,
      oversample: Int = 3,
      epoch: Int = 0,
      anchorCol: String = "anchor_id",
      positiveCol: String = "positive_id",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n must be >= 1, got $n")
    require(oversample >= 2, s"oversample must be >= 2, got $oversample")
    val probes = n * oversample
    val pos = epochShard(candidates, epoch, nShards = 1, idCol = idCol)
      .select(col(idCol).as("__cand"), col("pos").as("__gp"))
    val nRow = candidates.agg(count(lit(1)).as("__N"))
    val drawn = positives.select(col(anchorCol)).distinct()
      .crossJoin(broadcast(nRow))
      .select(col(anchorCol),
        explode(sequence(lit(0), lit(probes - 1))).as("__j"), col("__N"))
      .withColumn("__tgp",
        hash56(concat(lit(s"neg$epoch:"), col(anchorCol).cast("string"),
          lit(":"), col("__j").cast("string"))) % col("__N"))
      .join(pos, col("__tgp") === col("__gp"))
    val excluded = positives.select(col(anchorCol), col(positiveCol).as("__cand"))
    val valid = drawn
      .filter(col("__cand") =!= col(anchorCol))
      .join(excluded, Seq(anchorCol, "__cand"), "left_anti")
      .groupBy(col(anchorCol), col("__cand"))
      .agg(min(col("__j")).as("__fj"))
    val w = Window.partitionBy(anchorCol).orderBy(col("__fj"), col("__cand"))
    valid.withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= n)
      .select(col(anchorCol), col("neg_rank"), col("__cand").as("negative_id"))
      .orderBy(anchorCol, "neg_rank")
  }

  /** Corpus snapshot AS OF an event time — time travel over an
    * append-only change log, the read-side twin of [[mergeCorpus]]:
    * training runs pin `asOfTs` and get the identical corpus forever,
    * regardless of how much log has accumulated since. The winner per
    * id is `max(struct(ts, tombstone, payload))` over events with
    * `ts <= asOfTs`; tombstone winners drop out (the document was
    * deleted as of that time). Ties at equal ts break toward the
    * tombstone, then the lexicographically larger payload — arbitrary
    * but deterministic and engine-replayable.
    *
    * Scale shape: the ts predicate is a plain pushed-down filter (a
    * time-partitioned log prunes files before any work), and the
    * winner is the same map-side-combinable struct-max as
    * [[mergeCorpus]] — no window, hot re-crawled ids combine in the
    * map stage.
    *
    * @param log  the change log: (id, ts, payload, deleted)
    * @return the corpus as of `asOfTs`: (id, ts, payload)
    */
  def corpusAsOf(
      log: DataFrame,
      asOfTs: Long,
      idCol: String = "doc_id",
      tsCol: String = "ts",
      payloadCol: String = "text",
      tombstoneCol: String = "deleted"): DataFrame =
    log.filter(col(tsCol).cast("long") <= asOfTs)
      .select(col(idCol), col(tsCol).cast("long").as("__ts"),
        col(payloadCol).as("__p"),
        coalesce(col(tombstoneCol), lit(false)).as("__del"))
      .groupBy(idCol)
      .agg(max(struct(col("__ts"), col("__del"), col("__p"))).as("__w"))
      .filter(!col("__w.__del"))
      .select(col(idCol), col("__w.__ts").as(tsCol),
        col("__w.__p").as(payloadCol))

  /** Corpus MERGE (upsert with tombstones) — continuous-ingest
    * maintenance of a living corpus, the batch analogue of Delta/
    * Iceberg MERGE INTO without a table format: a refreshed crawl
    * carries new documents, re-fetches of existing ones, and deletion
    * tombstones; latest timestamp wins per id (ties: the update side),
    * tombstone winners drop out, and every surviving row carries an
    * audit verdict (`inserted` / `updated` / `kept`).
    *
    * Scale shape: ONE map-side-combinable aggregate per id — the
    * winner is `max(struct(ts, side, tombstone, payload))`
    * (lexicographic struct max: associative, commutative, partial-agg
    * friendly), NOT a row_number window, so a pathologically re-crawled
    * hot id combines map-side instead of sorting in one reducer (the
    * Rewrite-family keeper argument). Presence flags aggregate in the
    * same pass, so no second join recovers "did this id exist before".
    *
    * @param current  the corpus so far: (id, ts, payload)
    * @param updates  the new batch: (id, ts, payload, deleted)
    * @return merged corpus (id, ts, payload, verdict)
    */
  def mergeCorpus(
      current: DataFrame,
      updates: DataFrame,
      idCol: String = "doc_id",
      tsCol: String = "ts",
      payloadCol: String = "text",
      tombstoneCol: String = "deleted"): DataFrame = {
    val cur = current.select(col(idCol), col(tsCol).cast("long").as("__ts"),
      col(payloadCol).as("__p"), lit(0).as("__side"), lit(false).as("__del"))
    val upd = updates.select(col(idCol), col(tsCol).cast("long").as("__ts"),
      col(payloadCol).as("__p"), lit(1).as("__side"),
      coalesce(col(tombstoneCol), lit(false)).as("__del"))
    cur.unionByName(upd)
      .groupBy(idCol)
      .agg(
        max(struct(col("__ts"), col("__side"), col("__del"), col("__p")))
          .as("__w"),
        max(when(col("__side") === 0, lit(1)).otherwise(lit(0)))
          .as("__hadCur"))
      .filter(!col("__w.__del"))
      .select(col(idCol),
        col("__w.__ts").as(tsCol),
        col("__w.__p").as(payloadCol),
        when(col("__hadCur") === 0, lit("inserted"))
          .when(col("__w.__side") === 1, lit("updated"))
          .otherwise(lit("kept")).as("verdict"))
  }

  /** Mixture BUDGET allocation — the planning table a training run
    * derives from [[mixtureWeights]] (the Muennighoff et al. 2023
    * "Scaling Data-Constrained LMs" repeat-epochs question): each
    * source's token target is weight·budget, capped at `maxRepeat`
    * epochs of what the source actually has (repeating data past ~4
    * epochs stops helping), with an HONEST deficit column — capped
    * sources under-deliver and the gap is reported, not silently
    * redistributed (redistribution changes the mixture the weights
    * encode; callers who want it re-run on the uncapped remainder).
    *
    * All columns are integer-exact except the 1e-9-rounded weight and
    * epochs: targets/caps snap through round-half-away (the shared
    * Spark/DuckDB grid), so the table replays bitwise.
    *
    * @return (source, n_docs, n_tokens, weight, target_tokens,
    *         achieved_tokens, deficit_tokens, epochs)
    */
  def mixtureAllocation(
      docs: DataFrame,
      budgetTokens: Long,
      alpha: Double = 0.5,
      maxRepeat: Double = 4.0,
      textCol: String = "text",
      domainCol: String = "source"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(maxRepeat > 0, s"maxRepeat must be > 0, got $maxRepeat")
    mixtureWeights(docs, alpha, textCol, domainCol)
      .withColumn("target_tokens",
        round(col("weight") * lit(budgetTokens.toDouble), 0).cast("long"))
      .withColumn("__cap",
        round(lit(maxRepeat) * col("n_tokens").cast("double"), 0).cast("long"))
      .withColumn("achieved_tokens", least(col("target_tokens"), col("__cap")))
      .withColumn("deficit_tokens",
        col("target_tokens") - col("achieved_tokens"))
      .withColumn("epochs",
        round(col("achieved_tokens").cast("double") /
          col("n_tokens").cast("double"), 9))
      .select("source", "n_docs", "n_tokens", "weight", "target_tokens",
        "achieved_tokens", "deficit_tokens", "epochs")
  }

  /** [[mixtureAllocation]] under a DIVERSITY cap — the per-domain
    * diversity knob of a crawl pipeline: a source's achievable tokens
    * are bounded by its `kPerSource` hash-picked documents (the
    * [[sampleKPerGroup]] pick — deterministic, growth-stable) at
    * `maxRepeat` epochs each, instead of by the source's FULL token
    * mass. A domain that is huge because it is repetitive (mirrors,
    * templated pages) no longer converts bulk into budget: its cap
    * reflects what k diverse documents can supply. Weights still come
    * from the full corpus (the natural distribution); only the cap
    * changes. `epochs` reports achieved tokens over the PICKED token
    * mass — the repeat factor the k retained documents actually train.
    *
    * Scale shape: one window-ranked pick per source (bounded per-group
    * output), one bounded per-source aggregate over the picks, one
    * broadcast-sized join onto the tens-of-rows domain table.
    *
    * @return (source, n_docs, n_tokens, weight, target_tokens,
    *         cap_docs, cap_tokens, achieved_tokens, deficit_tokens,
    *         epochs) */
  def mixtureDiversityCap(
      docs: DataFrame,
      budgetTokens: Long,
      kPerSource: Int,
      alpha: Double = 0.5,
      maxRepeat: Double = 4.0,
      salt: String = "graft",
      textCol: String = "text",
      idCol: String = "doc_id",
      domainCol: String = "source"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    require(kPerSource > 0, s"kPerSource must be > 0, got $kPerSource")
    require(maxRepeat > 0, s"maxRepeat must be > 0, got $maxRepeat")
    val picked =
      sampleKPerGroup(docs, kPerSource, salt, idCol, domainCol)
        .select(col(domainCol).as("source"),
          size(tokens(col(textCol))).cast("long").as("__t"))
        .groupBy("source")
        .agg(count(lit(1)).as("cap_docs"), sum("__t").as("__pickTok"))
    mixtureWeights(docs, alpha, textCol, domainCol)
      .join(picked, Seq("source"))
      .withColumn("target_tokens",
        round(col("weight") * lit(budgetTokens.toDouble), 0).cast("long"))
      .withColumn("cap_tokens",
        round(lit(maxRepeat) * col("__pickTok").cast("double"), 0).cast("long"))
      .withColumn("achieved_tokens", least(col("target_tokens"), col("cap_tokens")))
      .withColumn("deficit_tokens",
        col("target_tokens") - col("achieved_tokens"))
      .withColumn("epochs",
        when(col("__pickTok") > 0L,
          round(col("achieved_tokens").cast("double") /
            col("__pickTok").cast("double"), 9)))
      .select("source", "n_docs", "n_tokens", "weight", "target_tokens",
        "cap_docs", "cap_tokens", "achieved_tokens", "deficit_tokens",
        "epochs")
  }

  /** EXACT water-filling mixture allocation — the redistribution
    * [[mixtureAllocation]] deliberately omits, solved in closed form
    * instead of iteratively: find the water level t such that
    * Σ min(cap_d, t·w_d·B) = B, i.e. capped sources keep their caps
    * and the remaining budget is re-split proportionally among the
    * uncapped. Sources cap in increasing order of r_d = cap_d/(w_d·B),
    * so the level is found by ONE sorted prefix-sum pass over the
    * bounded domain table: for the k smallest-r sources capped,
    * t_k = (B−C_k)·S / (B·(S−W_k)) with C_k/W_k the cap/weight prefix
    * sums and S the total fixed-point weight mass; the unique valid k
    * has r_k <= t_k < r_{k+1}. Every selection COMPARISON is
    * cross-multiplied onto exact integers (cap·(S−W_k) vs (B−C_k)·w9 —
    * the 1e-9 fixed-point weights make weight sums integral), so the
    * chosen level is bit-deterministic; only the reported level and
    * the final per-source allocation are IEEE ops on those integers.
    * If Σcap <= B every source caps and the level is null (surplus
    * budget reported by the allocation gap).
    *
    * @return (source, n_docs, n_tokens, weight, cap_tokens,
    *         water_level, alloc_tokens, capped) */
  def mixtureWaterfill(
      docs: DataFrame,
      budgetTokens: Long,
      alpha: Double = 0.5,
      maxRepeat: Double = 4.0,
      textCol: String = "text",
      domainCol: String = "source"): DataFrame = {
    require(budgetTokens > 0 && budgetTokens < 9000000000000000L,
      s"budgetTokens must be in (0, 9e15) so it stays exact as a " +
        s"double, got $budgetTokens")
    require(maxRepeat > 0, s"maxRepeat must be > 0, got $maxRepeat")
    import org.apache.spark.sql.expressions.Window
    val B = budgetTokens
    val base = mixtureWeights(docs, alpha, textCol, domainCol)
      .withColumn("cap_tokens",
        round(lit(maxRepeat) * col("n_tokens").cast("double"), 0).cast("long"))
      .withColumn("__w9", round(col("weight") * 1e9, 0).cast("long"))
      .withColumn("__r",
        col("cap_tokens").cast("double") * 1e9 /
          (col("__w9").cast("double") * lit(B.toDouble)))
    // bounded windows: the domain table is tens of rows
    val all = Window.partitionBy()
    val ord = Window.orderBy("__r", domainCol)
    val pre = base
      .withColumn("__S", sum("__w9").over(all))
      .withColumn("__Ck", sum("cap_tokens").over(ord))
      .withColumn("__Wk", sum("__w9").over(ord))
      .withColumn("__capNext", lead("cap_tokens", 1).over(ord))
      .withColumn("__w9Next", lead("__w9", 1).over(ord))
    // validity of level k, all EXACT decimal cross-products:
    //   r_k <= t_k   <=> cap_k·(S−W_k) <= (B−C_k)·w9_k
    //   r_{k+1} > t_k <=> capNext·(S−W_k) > (B−C_k)·w9Next (or last row)
    // W_k == S (last row) means every source capped: valid iff C_k <= B
    import org.apache.spark.sql.types.DecimalType
    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val lhsK = dec(col("cap_tokens")) * dec(col("__S") - col("__Wk"))
    val rhsK = dec(lit(B) - col("__Ck")) * dec(col("__w9"))
    val lhsN = dec(col("__capNext")) * dec(col("__S") - col("__Wk"))
    val rhsN = dec(lit(B) - col("__Ck")) * dec(col("__w9Next"))
    val valid =
      when(col("__Wk") === col("__S"), col("__Ck") <= B)
        .otherwise(lhsK <= rhsK &&
          (col("__capNext").isNull || lhsN > rhsN))
    // the level of the unique valid row (null when all sources cap);
    // pure double arithmetic on exactly representable integers
    val tK = when(col("__Wk") === col("__S"), lit(null).cast("double"))
      .otherwise(
        (lit(B) - col("__Ck")).cast("double") * col("__S").cast("double") /
          (lit(B.toDouble) * (col("__S") - col("__Wk")).cast("double")))
    // no source capped at t = 1: min r > 1 <=> cap·S > w9·B everywhere
    val capsAtOne =
      dec(col("cap_tokens")) * dec(col("__S")) <= dec(col("__w9")) * dec(lit(B))
    val levelRow = pre
      .withColumn("__anyCapAt1", max(capsAtOne.cast("int")).over(all))
      .withColumn("__t",
        when(col("__anyCapAt1") === 0, lit(1.0))
          .otherwise(max(when(valid, tK)).over(all)))
      .withColumn("__allCapped",
        max(when(valid && col("__Wk") === col("__S"), 1).otherwise(0))
          .over(all))
    levelRow.select(col(domainCol), col("n_docs"), col("n_tokens"),
        col("weight"), col("cap_tokens"),
        when(col("__allCapped") === 1 && col("__anyCapAt1") === 1,
          lit(null).cast("double"))
          .otherwise(round(col("__t"), 9)).as("water_level"),
        when(col("__allCapped") === 1 && col("__anyCapAt1") === 1,
          col("cap_tokens"))
          .otherwise(least(col("cap_tokens"),
            round(col("__t") *
              (col("__w9").cast("double") * lit(B.toDouble)) /
              col("__S").cast("double"), 0).cast("long")))
          .as("alloc_tokens"))
      .withColumn("capped", col("alloc_tokens") === col("cap_tokens"))
      .orderBy(domainCol)
  }

  /** Temperature-scaled domain mixture weights: per domain (source),
    * token share p_d = tokens_d / total, sampling weight
    * w_d = p_d^alpha / sum(p^alpha) — alpha < 1 upsamples small
    * domains (multilingual/data-mixing practice). alpha = 0.5 is
    * computed with sqrt (IEEE-exact, engine-portable); other alphas
    * use pow. One hash aggregate over the corpus; the domain table is
    * tiny, so the normalization window is bounded.
    *
    * @return (source, n_docs, n_tokens, token_share, weight)
    */
  def mixtureWeights(
      docs: DataFrame,
      alpha: Double = 0.5,
      textCol: String = "text",
      domainCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val byDomain = docs
      .select(col(domainCol).as("source"),
        size(tokens(col(textCol))).cast("long").as("__t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("n_tokens"))
    // the window spans the domain table (tens of rows), not the corpus
    val w = Window.partitionBy()
    // token_share's denominator is an exact integer sum; the weight
    // denominator would be a FLOAT sum whose value depends on partition
    // order (WindowExec accumulates in row order), so the scaled shares
    // are snapped to a 1e15 fixed-point grid first — integer summation
    // makes the weights reproducible across runs, partitionings, and
    // engines (invisible at any sane output precision: 1e-15 relative)
    val share = col("n_tokens").cast("double") /
      sum(col("n_tokens")).over(w).cast("double")
    val scaled =
      if (alpha == 0.5) sqrt(col("token_share"))
      else pow(col("token_share"), alpha)
    byDomain
      .withColumn("token_share", share)
      .withColumn("__m", round(scaled * lit(1e15), 0).cast(DecimalType(38, 0)))
      .withColumn("weight",
        col("__m").cast("double") / sum(col("__m")).over(w).cast("double"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("token_share"), 9).as("token_share"),
        round(col("weight"), 9).as("weight"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per-document
    * log importance = sum over token occurrences of
    * ln P_target(tok) - ln P_raw(tok), under add-1-smoothed unigram
    * LMs of the target subset (`targetCol` = 0/1) and the whole
    * corpus. Documents whose vocabulary looks like the target score
    * high; resampling by this weight shifts the corpus mixture toward
    * the target distribution without hand-written rules.
    *
    * Determinism: each per-token ln is snapped to the 1e-6 grid as a
    * scaled long IMMEDIATELY ([[TextStats.unigramLogProb]]'s ln-snap
    * precedent), so per-doc sums are exact integer arithmetic —
    * bitwise reproducible across runs, partitionings, and engines.
    *
    * Scale design: one map-side-combinable token-count aggregate (the
    * target count rides the same pass as a conditional sum), a
    * 3-scalar driver collect, one vocab equi-join back, one per-doc
    * aggregate — no corpus-sized driver state, no windows. Token-less
    * documents have no occurrences and thus no row (they carry no
    * distributional evidence either way).
    *
    * @return (doc_id, n_tokens, lw_scaled, log_weight) — lw_scaled is
    *         the exact 1e6-scaled integer; log_weight = lw_scaled/1e6
    */
  def dsirWeights(
      docs: DataFrame,
      targetCol: String,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      col(targetCol).cast("long").as("__t"),
      explode(tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok")
      .agg(count(lit(1)).as("__cr"), sum(col("__t")).as("__ct"))
    val totals = counts
      .agg(sum(col("__cr")).as("nr"), sum(col("__ct")).as("nt"),
        count(lit(1)).as("v"))
      .head() // three scalars — bounded, corpus-size-independent
    val (nr, nt, v) =
      (totals.getLong(0), totals.getLong(1), totals.getLong(2))
    def lnScaled(c: Column, denom: Long): Column =
      round(log(c.cast("double") / lit(denom.toDouble)) * lit(1e6), 0)
        .cast("long")
    val tokenWeights = counts.select(col("tok"),
      (lnScaled(col("__ct") + 1, nt + v) - lnScaled(col("__cr") + 1, nr + v))
        .as("__lw"))
    toks.join(tokenWeights, Seq("tok"))
      .groupBy("doc_id")
      .agg(sum(col("__lw")).as("lw_scaled"), count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("lw_scaled"),
        (col("lw_scaled").cast("double") / lit(1e6)).as("log_weight"))
  }

  /** Deterministic DSIR selection: the `k` documents most like the
    * target, ordered by exact scaled weight (doc_id tie-break). A
    * bounded-k top-k (TakeOrderedAndProject — per-partition heads
    * merged on the driver, never a global sort). */
  def dsirSample(
      docs: DataFrame,
      targetCol: String,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    dsirWeights(docs, targetCol, textCol, idCol)
      .orderBy(col("lw_scaled").desc, col("doc_id"))
      .limit(k)
  }
}
