package graft.text

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter incremental dedup: membership-test a new batch against
  * an existing corpus WITHOUT joining it.
  *
  * The 100 TB story: continuous ingest dedups each incoming crawl
  * against everything already accepted. A join against the full corpus
  * re-shuffles N rows per batch; a Bloom filter compresses the corpus
  * key set into a fixed m-bit array built by ONE map-side-combinable
  * aggregate pass ([[graft.functions.BloomBitsAgg]] — one 4 KB..16 MB
  * buffer per task, word-wise OR merge), after which every probe is a
  * scan-local bit test: no shuffle, no join, no state on the probe
  * side. False-positive rate is the classic (1 - e^{-kn/m})^k;
  * false negatives are impossible, so "not seen" verdicts are exact —
  * the filter may only over-drop, never under-drop, and a second exact
  * pass over the tiny maybe-seen slice settles the difference (the
  * [[HeavyHitters]] prefilter-then-exact shape).
  *
  * Determinism across engines: positions use the classic
  * Kirsch-Mitzenmacher double hashing pos_i = (h1 + i*h2) mod m with
  * h1/h2 from two domain-separated md5-56 hashes ([[TextOps.hash56]]),
  * so the DuckDB oracle replays the bit math verbatim ("bloom contains
  * x" == "all k positions of x appear in the corpus position set").
  * Everything — including false positives — is bit-reproducible.
  *
  * The alphalens reference has no incremental operators (batch-only
  * panels, SURVEY §2.9); this extends the dedup family
  * (reference-adjacent: utils.py:591-663 ingests a closed panel) to
  * continuous ingest.
  */
object Bloom {

  /** Classic sizing: the (mBits, k) pair hitting `targetFp` for `n`
    * expected keys — m = ceil(-n ln fp / ln^2 2) rounded up to a whole
    * word, k = round(m/n * ln 2) clamped to [1, 64]. A 10^9-key corpus
    * at 1% fp is ~1.2 GB — past a broadcastable filter, partition the
    * KEY SPACE (one filter per key-hash shard) rather than growing m. */
  def sizeFor(n: Long, targetFp: Double): (Int, Int) = {
    require(n > 0 && targetFp > 0 && targetFp < 1,
      s"need n > 0 and fp in (0,1), got n=$n fp=$targetFp")
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-n * math.log(targetFp) / (ln2 * ln2))
    val m = (((mRaw.toLong + 63) / 64) * 64).min(Int.MaxValue.toLong).toInt
    val k = math.round(m.toDouble / n * ln2).toInt.max(1).min(64)
    (m, k)
  }

  /** The k bit positions of one key: pos_i = (h1 % m + i * h2') % m,
    * h1 = hash56("gb1:" || key), h2' = 1 + hash56("gb2:" || key) % (m-1)
    * (h2' never 0 so the k probes never collapse to one bit). All
    * builtin codegen'd functions — the oracle replays this verbatim. */
  def positions(key: Column, mBits: Int, k: Int): Column = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val h1 = TextOps.hash56(concat(lit("gb1:"), key)) % mBits
    val h2 = lit(1L) + TextOps.hash56(concat(lit("gb2:"), key)) % (mBits - 1)
    transform(sequence(lit(0L), lit((k - 1).toLong)),
      i => (h1 + i * h2) % mBits)
  }

  /** One aggregate pass over `existing`: the m-bit filter as ascending
    * 64-bit words. The single collected row is the filter itself —
    * bounded by construction (m/8 bytes), corpus-size-independent. */
  def buildFilter(existing: DataFrame, keyCol: String, mBits: Int,
      k: Int): Array[Long] =
    buildFilterWith(existing, positions(col(keyCol), mBits, k), mBits)

  private[graft] def buildFilterWith(existing: DataFrame,
      positionsCol: Column, mBits: Int): Array[Long] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val agg = column(graft.functions.BloomBitsAgg(
      expression(positionsCol), mBits)
      .toAggregateExpression())
    val bytes = existing.agg(agg.as("filter")).head.getAs[Array[Byte]](0)
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(mBits / 64)(bb.getLong())
  }

  /** Adds `maybe_seen`: true iff every one of the key's k bits is set
    * in `filter`. Pure scan-local projection — no join, no shuffle
    * (BloomSpec pins the exchange-free plan). The filter rides the
    * plan as an array literal; past ~2^18 words (m = 2^24 bits, 2 MB)
    * prefer [[probeBcast]], which ships it once per executor as a real
    * Spark broadcast instead of once per task binary (the
    * [[graft.functions.CellDistsBcast]] lesson). */
  def probe(incoming: DataFrame, keyCol: String, filter: Array[Long],
      mBits: Int, k: Int, out: String = "maybe_seen"): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    // UNROLLED bit tests — same h1/h2 double-hash positions as
    // [[positions]] token-for-token (the built filters and the DuckDB
    // replays depend on the bits), but as k scalar conjuncts instead
    // of sequence+transform+forall: no per-row array allocations in
    // the hot probe, and codegen's subexpression elimination computes
    // h1/h2 once. A null key yields a null verdict, as before.
    val h1 = TextOps.hash56(concat(lit("gb1:"), col(keyCol))) % mBits
    val h2 = lit(1L) + TextOps.hash56(concat(lit("gb2:"), col(keyCol))) % (mBits - 1)
    incoming.withColumn(out, bitTestConjuncts(h1, h2, filter, mBits, k))
  }

  /** Shared unrolled verdict: k bit-test conjuncts from a (h1, h2)
    * double-hash pair against a literal word array. */
  private def bitTestConjuncts(h1: Column, h2: Column,
      filter: Array[Long], mBits: Int, k: Int): Column = {
    val words = typedLit(filter.toSeq)
    (0 until k).map { i =>
      val p = (h1 + lit(i.toLong) * h2) % mBits
      element_at(words, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** [[positions]] for INTEGRAL keys — the same double-hash scheme
    * over `xxhash64` of the RAW long, skipping the per-row string
    * materialization entirely. Used only where the contract is
    * composition-only (the semi-join prefilter: any hash family
    * preserves no-false-negatives); the string path stays the
    * engine-replayable form the dedup oracles pin bit-for-bit. */
  private[graft] def positionsLong(key: Column, mBits: Int, k: Int): Column = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val h1 = pmod(xxhash64(lit("gb1"), key), lit(mBits.toLong))
    val h2 = lit(1L) +
      pmod(xxhash64(lit("gb2"), key), lit((mBits - 1).toLong))
    transform(sequence(lit(0L), lit((k - 1).toLong)),
      i => pmod(h1 + i * h2, lit(mBits.toLong)))
  }

  /** [[probe]] for INTEGRAL keys against a [[positionsLong]]-built
    * filter — the same unrolled scalar conjuncts, xxhash64 hashes. */
  private[graft] def probeLong(incoming: DataFrame, keyCol: String,
      filter: Array[Long], mBits: Int, k: Int, out: String): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val key = col(keyCol)
    val h1 = pmod(xxhash64(lit("gb1"), key), lit(mBits.toLong))
    val h2 = lit(1L) +
      pmod(xxhash64(lit("gb2"), key), lit((mBits - 1).toLong))
    incoming.withColumn(out, bitTestConjuncts(h1, h2, filter, mBits, k))
  }

  // One broadcast per filter ARRAY, not per probe call: a gate probing
  // many batches against the same snapshot would otherwise pile up
  // multi-MB handles reclaimed only when the ContextCleaner GCs them.
  // Weak on BOTH sides (see BcastMemo) so dropped filters actually
  // release their broadcast blocks (advice r8).
  private val bcastMemo = new graft.functions.BcastMemo[Array[Long]]

  /** [[probe]] with the filter as a real Spark broadcast: the scale
    * path for big filters (m = 2^24..2^30 bits, 2 MB..128 MB), where a
    * plan literal would be serialized into every task. Bit-identical
    * verdicts to [[probe]] (BloomSpec pins parity); the broadcast
    * handle is memoized per filter instance. */
  def probeBcast(incoming: DataFrame, keyCol: String, filter: Array[Long],
      mBits: Int, k: Int, out: String = "maybe_seen"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val bc = bcastMemo.getOrBroadcast(
      incoming.sparkSession.sparkContext, filter)
    val contains = column(graft.functions.BloomContainsBcast(
      expression(positions(col(keyCol), mBits, k)), bc))
    incoming.withColumn(out, contains)
  }

  /** Incremental dedup verdicts for a new batch against an existing
    * corpus: one filter build over `existing`, then scan-local probes.
    * `maybe_seen=false` is exact (no false negatives); `maybe_seen=true`
    * is settled by re-checking just that slice exactly when the caller
    * needs certainty. */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame,
      keyCol: String, mBits: Int, k: Int): DataFrame = {
    val filter = buildFilter(existing, keyCol, mBits, k)
    probe(incoming, keyCol, filter, mBits, k)
  }

  /** Bloom RUNTIME FILTER ahead of a selective join: when `small`'s
    * key set matches only a sliver of `big`, a plain shuffled join
    * still moves ALL of `big` across the wire before dropping the
    * misses on the reduce side. Filtering `big` scan-locally through a
    * Bloom of `small`'s keys first cuts the shuffled volume to the
    * matches plus an eps of false positives — which the real join then
    * removes, so the COMPOSITION is exactly the plain join (that is
    * what makes it oracle-able, q_bloom_semijoin). No false negatives
    * means no lost matches, ever.
    *
    * Spark's optimizer has an automatic cousin
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, cost-gated
    * and plan-shape-dependent); this is the explicit, always-on,
    * engine-replayable form — the filter artifact can also be built
    * once and reused across many queries against the same dim table
    * (the [[buildFilter]]/[[probeBcast]] snapshot pattern).
    *
    * CONTRACT (advice r8): the composition equals the plain join for
    * INNER / LEFT SEMI joins on `bigKey` only. Null-keyed `big` rows
    * are dropped by the prefilter (a null probe yields a null verdict)
    * — correct for those join types, where a null key can never match
    * — but an outer-join caller would lose its null/unmatched orphans;
    * prefilter only the match side, or don't prefilter, for outer
    * shapes. q_bloom_semijoin pins the inner composition. */
  def semiJoinPrefilter(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String, mBits: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    // collision-safe temp key: never silently overwrite a caller column
    val kc = Iterator.from(0).map(i => s"__sjk$i")
      .find(n => !big.columns.contains(n) && !small.columns.contains(n)).get
    val mc = Iterator.from(0).map(i => s"__sjm$i")
      .find(n => !big.columns.contains(n)).get
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    val bothIntegral =
      integral(big.schema(bigKey).dataType) &&
        integral(small.schema(smallKey).dataType)
    if (bothIntegral && mBits < (1 << 24)) {
      // INTEGRAL fast path: xxhash64 on the raw long — no per-row
      // string materialization. Sound because this operator's contract
      // is composition-only (any hash family keeps no-false-negatives);
      // both sides cast to LONG so int/long keys hash identically.
      val filter = buildFilterWith(
        small.select(col(smallKey).cast("long").as(kc)),
        positionsLong(col(kc), mBits, k), mBits)
      val probed = probeLong(big.withColumn(kc, col(bigKey).cast("long")),
        kc, filter, mBits, k, out = mc)
      // xxhash64 skips null children, so a null key would get a
      // non-null position set here — gate on the key so both paths
      // agree on dropping null-keyed rows (advice r11).
      probed.filter(col(kc).isNotNull && col(mc)).drop(kc, mc)
    } else {
      val filter = buildFilter(
        small.select(col(smallKey).cast("string").as(kc)), kc, mBits, k)
      val probed =
        if (mBits >= (1 << 24))
          probeBcast(big.withColumn(kc, col(bigKey).cast("string")),
            kc, filter, mBits, k, out = mc)
        else
          probe(big.withColumn(kc, col(bigKey).cast("string")),
            kc, filter, mBits, k, out = mc)
      probed.filter(col(mc)).drop(kc, mc)
    }
  }
}
