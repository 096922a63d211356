package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test / deequ-style
  * validation gate a pipeline runs before trusting (or publishing) a
  * table: each rule yields one row (rule, n_violations, pass), so the
  * whole contract is a small frame a scheduler can assert on.
  *
  * Scale shape: every ROW-level rule (not-null, range, accepted values,
  * arbitrary predicate) folds into ONE map-side-combined aggregation
  * over one scan — checking 20 rules costs one pass, not 20. Key
  * uniqueness is one groupBy on the key (partial counts; a hot
  * duplicate key sends one row per partition) and referential integrity
  * is an anti-join against the dimension (broadcast when small) — each
  * contributes its own 1-row aggregate, unioned onto the report.
  *
  * The reference pipeline validates per-message shape only
  * (`src/processor.js` null checks); table-level contracts are
  * warehouse surface.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Rule {
    def name = s"${col}_not_null"
  }

  /** Non-null values of `col` must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"${col}_in_range"
  }

  /** Non-null values of `col` must be one of `values`. */
  final case class Accepted(col: String, values: Seq[String]) extends Rule {
    def name = s"${col}_accepted"
  }

  /** Rows where `violation` is true fail the rule (escape hatch for
    * arbitrary row contracts — still fused into the single pass).
    */
  final case class Predicate(name: String, violation: Column) extends Rule

  /** `cols` must be a unique key: violations = surplus rows beyond the
    * first per duplicated key.
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"${cols.mkString("_")}_unique"
  }

  /** Every non-null `col` must exist in `dim.dimCol` (foreign key). */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
      extends Rule {
    def name = s"${col}_ref_integrity"
  }

  private def rowViolation(df: DataFrame, r: Rule): Option[Column] = r match {
    case NotNull(c) => Some(col(c).isNull)
    case InRange(c, lo, hi) =>
      Some(col(c).isNotNull && (col(c).cast("double") < lo ||
        col(c).cast("double") > hi))
    case Accepted(c, vs) =>
      Some(col(c).isNotNull && !col(c).cast("string").isin(vs: _*))
    case Predicate(_, v) => Some(v)
    case _ => None
  }

  /** Run the contract: one (rule, n_violations, pass) row per rule.
    * Row-level rules (NotNull/InRange/Accepted/Predicate) come first —
    * fused into ONE aggregation pass, in their relative order — then
    * Unique and RefIntegrity rules in theirs; an interleaved rule list
    * is re-grouped by kind, not emitted in the literal input order.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules to check")
    val rowRules = rules.flatMap(r => rowViolation(df, r).map(r.name -> _))
    val rowReport: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        val aggs = rowRules.map { case (n, v) =>
          sum(when(v, 1L).otherwise(0L)).as(n) }
        val one = df.agg(aggs.head, aggs.tail: _*)
        // unpivot the 1-row aggregate into (rule, n_violations)
        Some(one.select(explode(array(rowRules.map { case (n, _) =>
          struct(lit(n).as("rule"), coalesce(col(n), lit(0L)).as("n_violations"))
        }: _*)).as("e")).select(col("e.rule"), col("e.n_violations")))
      }
    val otherReports = rules.collect {
      case u @ Unique(cols0) =>
        df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(when(col("__c") > 1, col("__c") - 1)
            .otherwise(0L)), lit(0L)).as("n_violations"))
          .select(lit(u.name).as("rule"), col("n_violations"))
      case r @ RefIntegrity(c, dim, dimCol) =>
        df.select(col(c).as("__k")).filter(col("__k").isNotNull)
          .join(dim.select(col(dimCol).as("__k")), Seq("__k"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
    }
    val all = (rowReport.toSeq ++ otherReports).reduce(_ union _)
    all.withColumn("pass", col("n_violations") === 0L)
  }
}
