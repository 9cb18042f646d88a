package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * right.ts <= left.ts and equal key (the point-in-time lookup every
  * event/feature pipeline needs; DuckDB/kdb call it ASOF JOIN).
  *
  * Composed from built-ins — union + per-key window with a carried-forward
  * last value — rather than a custom SparkPlan: one shuffle on the key, sort
  * within partitions, no row explosion. Ties (equal ts) resolve to the right
  * row (<= semantics), via the source tag in the ordering.
  */
object AsOfJoin {

  /** leftDf(keyCol, tsCol, ...) ⟕asof rightDf(keyCol, tsCol, payload...).
    * Returns left rows + right payload columns (null when no prior right row).
    * Right payload columns must not collide with left column names. */
  def asofLeft(leftDf: DataFrame, rightDf: DataFrame,
               keyCol: String, tsCol: String): DataFrame = {
    val payload = rightDf.columns.filterNot(c => c == keyCol || c == tsCol)
    val leftCols = leftDf.columns
    // Carry ONE struct of all payload columns with a single last(ignoreNulls)
    // — not one last() per column — so every payload field comes from the
    // same latest right row. Per-column carry would mix rows whenever the
    // latest right row holds NULL in one field (real ASOF attaches the whole
    // row, nulls included). Left rows get a NULL struct so ignoreNulls skips
    // them as a unit.
    val l = leftDf.withColumn("_src", lit(1))
      .select(col(keyCol) +: col(tsCol) +: col("_src") +:
        (leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) :+
          when(lit(false), struct(payload.map(c =>
            lit(null).cast(rightDf.schema(c).dataType).as(c)): _*)).as("_payload")): _*)
    val r = rightDf.withColumn("_src", lit(0))
      .select(col(keyCol) +: col(tsCol) +: col("_src") +:
        (leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(leftDf.schema(c).dataType).as(c)) :+
          struct(payload.map(col): _*).as("_payload")): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
    carried.filter(col("_src") === 1)
      .select((leftCols.map(col) ++ payload.map(c => col(s"_payload.`$c`").as(c))): _*)
  }
}
