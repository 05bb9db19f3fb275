package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint auditing — the expectation-suite surface
  * (uniqueness, referential integrity, nullability, ranges, set
  * membership) every production table carries next to its pipeline.
  * Each check is ONE aggregate (or one anti-join + aggregate for
  * referential checks) emitting an exact-integer one-row report
  * `(rule, n_checked, n_violations)`; [[audit]] unions the reports —
  * n independent map-side-combined jobs, no check ever rescans
  * another's work, and nothing here is approximate, so the report is
  * oracle-verifiable and diffable between runs.
  *
  * At 100 TB: every check is a single pass with a tiny output; the
  * FK check shuffles only the (distinct) key columns; run the audit
  * where the data lives rather than sampling it out.
  */
object Quality {

  private def report(rule: String, checked: Column, violations: Column,
                     df: DataFrame): DataFrame =
    df.agg(checked.cast("long").as("n_checked"),
        violations.cast("long").as("n_violations"))
      .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))

  /** Duplicate-key violations: rows beyond the first per key value.
    * NULL keys are counted by the null check, not this one. */
  def uniqueCheck(df: DataFrame, cols: Seq[String], rule: String): DataFrame =
    report(rule, count(lit(1)),
      count(lit(1)) - count_distinct(struct(cols.map(col): _*)),
      df.na.drop(cols))

  /** Referential-integrity violations: child rows whose key has no
    * match in the parent's key set. One anti-join on the key only. */
  def referentialCheck(child: DataFrame, childKey: String,
                       parent: DataFrame, parentKey: String,
                       rule: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
    val total = child.agg(count(lit(1)).cast("long").as("n_checked"))
    total.crossJoin(
        orphans.agg(count(lit(1)).cast("long").as("n_violations")))
      .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))
  }

  /** NULL-value violations in a column. */
  def notNullCheck(df: DataFrame, c: String, rule: String): DataFrame =
    report(rule, count(lit(1)), sum(col(c).isNull.cast("long")), df)

  /** Out-of-range violations (inclusive bounds; NULLs don't count —
    * they are the null check's finding). */
  def rangeCheck(df: DataFrame, c: String, lo: Column, hi: Column,
                 rule: String): DataFrame =
    report(rule, count(lit(1)),
      sum((col(c).isNotNull && !col(c).between(lo, hi)).cast("long")), df)

  /** Set-membership violations (NULLs don't count). */
  def inSetCheck(df: DataFrame, c: String, allowed: Seq[String],
                 rule: String): DataFrame =
    report(rule, count(lit(1)),
      sum((col(c).isNotNull && !col(c).isin(allowed: _*)).cast("long")), df)

  /** Custom-predicate violations: rows where `mustHold` is false. */
  def predicateCheck(df: DataFrame, mustHold: Column, rule: String): DataFrame =
    report(rule, count(lit(1)), sum((!mustHold).cast("long")), df)

  /** Union of check reports, ordered by rule name. Callers that build
    * the check list dynamically (e.g. filtering by batch schema) can
    * legitimately end up with zero checks — fail with a clear message
    * rather than `reduce`'s bare UnsupportedOperationException. */
  def audit(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "Quality.audit needs at least one check")
    checks.reduce(_ unionByName _).orderBy("rule")
  }
}
