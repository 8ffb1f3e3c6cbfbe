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
}
