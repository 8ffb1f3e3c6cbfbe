package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate in
  * front of every corpus/table ingest ("don't train on a batch whose
  * null rate exploded"): a rule set is evaluated in ONE wide aggregate
  * pass over the table (every rule's violation count is an integer
  * aggregate, so the scan is single and map-side combinable), then
  * melted into one verdict row per rule.
  *
  * Exactness: every measure is an exact integer count — no float
  * aggregation anywhere — so verdicts are engine-reproducible by
  * construction and the DuckDB oracle replays them as plain SQL
  * aggregates.
  *
  * Rule vocabulary (the standard expectation families):
  *  - [[Expectations.notNull]] — violations = null count;
  *  - [[Expectations.between]] — violations = rows outside [lo, hi]
  *    (nulls are NOT violations here; pair with notNull to insist);
  *  - [[Expectations.acceptedValues]] — violations = rows whose value
  *    is non-null and outside the accepted set;
  *  - [[Expectations.unique]] — violations = rows beyond the first of
  *    each duplicated key group under NULL-SAFE grouping: NULL keys
  *    form one group like SQL DISTINCT, so a lone all-null key is not
  *    a violation but a second one is (needs its own aggregate pass:
  *    the one rule that is a groupBy, kept exact rather than
  *    sketched);
  *  - [[Expectations.rowCountAtLeast]] — measured = total rows,
  *    violations = shortfall below the floor.
  *
  * A rule PASSES iff violations == 0. The output is the long verdict
  * table (rule, measured, violations, passed), deterministic in rule
  * order.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** Column must never be null. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null:$col"
  }
  /** Non-null values must lie in [lo, hi]. */
  final case class Between(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"between:$col:[$lo,$hi]"
  }
  /** Non-null values must come from `accepted`. */
  final case class AcceptedValues(col: String, accepted: Seq[String]) extends Rule {
    val name = s"accepted:$col:{${accepted.mkString("|")}}"
  }
  /** The key must be unique across the table. */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique:${cols.mkString(",")}"
  }
  /** The table must hold at least `n` rows. */
  final case class RowCountAtLeast(n: Long) extends Rule {
    val name = s"row_count_at_least:$n"
  }

  def notNull(col: String): Rule = NotNull(col)
  def between(col: String, lo: Double, hi: Double): Rule = Between(col, lo, hi)
  def acceptedValues(col: String, accepted: Seq[String]): Rule =
    AcceptedValues(col, accepted)
  def unique(cols: String*): Rule = Unique(cols)
  def rowCountAtLeast(n: Long): Rule = RowCountAtLeast(n)

  // one wide aggregate: every non-unique rule is a sum/count column,
  // aliased by POSITION (rule names carry dots/brackets that column
  // references would mis-parse)
  private def scanAggCols(scanRules: Seq[Rule]): Seq[Column] =
    count(lit(1)).as("__n") +: scanRules.zipWithIndex.map {
      case (NotNull(c), i) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__v$i")
      case (Between(c, lo, hi), i) =>
        sum(when(col(c).isNotNull &&
            (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L))
          .as(s"__v$i")
      case (AcceptedValues(c, vs), i) =>
        sum(when(col(c).isNotNull &&
            !col(c).cast("string").isin(vs.map(lit(_)): _*), 1L)
          .otherwise(0L)).as(s"__v$i")
      case (_: RowCountAtLeast, i) => lit(0L).as(s"__v$i")
      case (u: Unique, _) => throw new IllegalStateException(u.name)
    }

  // melt the wide aggregate row into (rule, measured, violations)
  private def meltCol(scanRules: Seq[Rule]): Column = explode(array(
    scanRules.zipWithIndex.map {
      case (r @ RowCountAtLeast(n), _) =>
        struct(lit(r.name).as("rule"), col("__n").as("measured"),
          greatest(lit(0L), lit(n) - col("__n")).as("violations"))
      case (r, i) => struct(lit(r.name).as("rule"),
        coalesce(col(s"__v$i"), lit(0L)).as("measured"),
        coalesce(col(s"__v$i"), lit(0L)).as("violations"))
    }: _*))

  /** Grouped variant for the scan-rule families: one wide aggregate
    * per group, melted to (groupCols..., rule, measured, violations,
    * passed). [[Unique]] rules are rejected — their distinct pass
    * does not fold into the shared scan (and has no bounded streaming
    * form; see [[graft.streaming.Streaming.streamingExpectations]]). */
  def checkGrouped(
      df: DataFrame, groupCols: Seq[String], rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(!rules.exists(_.isInstanceOf[Unique]),
      "unique rules are not supported in the grouped gate")
    require(groupCols.nonEmpty, "at least one group column")
    val aggCols = scanAggCols(rules)
    df.groupBy(groupCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .select(groupCols.map(col) :+ meltCol(rules).as("__r"): _*)
      .select(groupCols.map(col) :+ col("__r.rule") :+ col("__r.measured") :+
        col("__r.violations") :+
        (col("__r.violations") === 0L).as("passed"): _*)
  }

  /** One verdict row per rule: (rule, measured, violations, passed).
    * `measured` is the rule's magnitude (total rows for the count
    * floor, violation count otherwise). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val scanRules = rules.filter(!_.isInstanceOf[Unique])
    val scanVerdicts = scanRules.headOption.map { _ =>
      val aggCols = scanAggCols(scanRules)
      df.agg(aggCols.head, aggCols.tail: _*)
        .select(meltCol(scanRules).as("__r"))
        .select("__r.*")
    }
    // uniqueness rules: duplicates = rows beyond the first of each key
    // group, via NULL-SAFE grouping (GROUP BY keeps one NULL group) —
    // NOT count(*) - countDistinct(...), whose countDistinct skips any
    // row with a NULL key column and would count all-null-key rows as
    // violations, diverging from SQL DISTINCT semantics on nullable
    // keys. An all-null key occurring twice IS one duplicate here.
    val uniqVerdicts = rules.collect { case u @ Unique(cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cnt"))
        .agg(coalesce(sum(col("__cnt") - 1L), lit(0L)).as("violations"))
        .select(lit(u.name).as("rule"), col("violations").as("measured"),
          col("violations"))
    }
    val legs = scanVerdicts.toSeq ++ uniqVerdicts
    val all = legs.reduce(_.unionByName(_))
    // deterministic output order = rule-name order
    all.withColumn("passed", col("violations") === 0L).orderBy("rule")
  }
}
