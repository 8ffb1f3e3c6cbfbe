package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual skew tool for the
  * case the automatic ones don't cover.
  *
  * A shuffled equi-join hashes rows to reducers BY KEY, so one hot key
  * (the empty-string language tag, the null user, the boilerplate
  * template hash) lands its entire row population in one task: the
  * straggler that holds a 1000-executor stage hostage. Spark's own
  * remedies come first — `broadcast(small)` removes the shuffle
  * entirely, and AQE's skew-join split (`spark.sql.adaptive.skewJoin`)
  * re-splits oversized SORT-MERGE partitions at runtime. The gap this
  * operator fills: the small side is too big to broadcast, and the
  * plan isn't an AQE-splittable shape (shuffled-hash joins, or
  * pre-AQE engines downstream of this library's plans).
  *
  * Mechanics: the big side gets a salt in [0, salts) — spread
  * uniformly WITHIN each hot key by hashing a per-row discriminator
  * (physical row id by default: duplicate rows of one key must not
  * share a salt, or the hot key just moves) — and joins on
  * (key, salt); the small side is replicated once per salt value by an
  * `explode(sequence)` (salts × |small| rows, the price of the trick —
  * keep salts near the stage's task-skew factor, not in the hundreds).
  * The RESULT is exactly the plain join — salting only re-shapes the
  * shuffle — which is what makes it oracle-able (q_salted_join pins
  * output equality; SaltedJoinSpec pins the (key, salt) join shape,
  * the per-key salt spread, and row-multiset equality incl.
  * duplicates).
  */
object SaltedJoin {

  /** Inner/left equi-join of `big` ⋈ `small` on `key`, shuffle-salted
    * `salts` ways. `discriminator` defaults to the physical row id —
    * any per-row-distinct column works and a stable unique id column
    * (when the table has one) makes the salt assignment itself
    * deterministic across runs; the OUTPUT is identical either way. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner",
      discriminator: Option[Column] = None): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(joinType == "inner" || joinType == "left",
      s"salting supports inner/left joins, got $joinType")
    val disc = discriminator.getOrElse(monotonically_increasing_id())
    val saltedBig = big.withColumn("__salt",
      pmod(hash(disc), lit(salts)).cast("int"))
    // sequence(int, int) is already array<int>; a cast around explode
    // would nest the generator, which Spark rejects
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Per-key salt counts from ONE Misra-Gries pass over the big side
    * (round-9; advice: compose the sketches the engine already has).
    * Fixed-salt joins replicate the small side `salts`x for EVERY key;
    * here only keys whose estimated share of the big side exceeds
    * `heavyFrac` get salts at all, scaled to their share and clamped to
    * `maxSalts` — the tail joins unsalted and the small side's
    * replication cost is proportional to actual skew. MG undercounts by
    * at most N/(k+1) with capacity k = 2/heavyFrac, so a truly
    * heavyFrac-heavy key cannot be missed entirely (it may get a
    * slightly conservative salt count — correctness is unaffected,
    * salting only re-shapes the shuffle). Null keys are ignored: they
    * match nothing in an equi-join, so they never need spreading.
    * @return (key-as-string, nSalts >= 2) for the heavy keys only */
  def sketchSaltCounts(
      big: DataFrame,
      key: String,
      maxSalts: Int,
      heavyFrac: Double = 1.0 / 256): Seq[(String, Int)] = {
    require(maxSalts >= 1, s"maxSalts must be >= 1, got $maxSalts")
    require(heavyFrac > 0 && heavyFrac < 1,
      s"heavyFrac must be in (0,1), got $heavyFrac")
    val spark = big.sparkSession
    import spark.implicits._
    val k = math.max(64L, math.ceil(2.0 / heavyFrac).toLong)
      .min(1L << 20).toInt
    val keys = big.select(col(key).cast("string").as("__k"))
      .filter(col("__k").isNotNull).as[String]
    val sketch = graft.text.HeavyHitters.mgCandidates(keys, k)
    val total = sketch.n
    sketch.counters.toSeq.collect {
      case (t, c) if total > 0 && c.toDouble >= heavyFrac * total =>
        t -> math.min(maxSalts.toLong,
          math.max(2L, math.ceil(c.toDouble / (heavyFrac * total)).toLong)).toInt
    }
  }

  /** [[saltedJoin]] with sketch-driven PER-KEY salt counts: heavy keys
    * (per [[sketchSaltCounts]]) spread across their own salt range;
    * every other key keeps salt 0 and the small side is replicated only
    * for the bounded heavy-key set. The result is exactly the plain
    * join (SaltedJoinSpec pins multiset equality incl. duplicates and
    * left-join orphans). */
  def adaptiveSaltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      maxSalts: Int,
      heavyFrac: Double = 1.0 / 256,
      joinType: String = "inner",
      discriminator: Option[Column] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salting supports inner/left joins, got $joinType")
    val spark = big.sparkSession
    import spark.implicits._
    val counts = sketchSaltCounts(big, key, maxSalts, heavyFrac)
    val disc = discriminator.getOrElse(monotonically_increasing_id())
    val hmap = broadcast(counts.toDF("__hk", "__ns"))
    val saltedBig = big
      .join(hmap, col(key).cast("string") === col("__hk"), "left")
      .withColumn("__salt",
        pmod(hash(disc), coalesce(col("__ns"), lit(1))).cast("int"))
      .drop("__hk", "__ns")
    val saltedSmall = small
      .join(hmap, col(key).cast("string") === col("__hk"), "left")
      .withColumn("__salt",
        explode(sequence(lit(0), coalesce(col("__ns"), lit(1)) - 1)))
      .drop("__hk", "__ns")
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
