package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass table profiling — the data-quality primitive every pipeline
  * runs before trusting a new drop: per-column row/null/distinct counts
  * and numeric min/max, computed in a SINGLE aggregation over one scan
  * (profiling a 100 TB table with one pass per column would be N scans).
  *
  * Exact distinct counts are kept because the driver oracle checks them;
  * at extreme cardinalities swap `countDistinct` for
  * `approx_count_distinct` — the operator shape (one agg, then unpivot
  * via `stack`) is unchanged.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"),
        (if (isNum) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__min_$c"),
        (if (isNum) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row into one row per column
    val stacked = cols.map { c =>
      s"'$c', __n - __cnt_$c, __ndv_$c, __min_$c, __max_$c"
    }.mkString(", ")
    one.select(col("__n"), expr(
      s"stack(${cols.length}, $stacked) AS " +
        "(col_name, n_nulls, n_distinct, min_num, max_num)"))
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"))
  }
}
