package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap repair over event streams — the
  * last-observation-carried-forward fill a telemetry or metrics table
  * needs before windowed analysis (a gauge that only reports on change,
  * a sensor with dropped samples).
  */
object Timeseries {

  /** Forward-fill: every null in `valueCol` takes the most recent
    * non-null value within its partition, in `(orderCols…)` order — rows
    * before the first observation stay null (there is nothing to carry).
    * The order must be a TOTAL order within each partition (pass a
    * tiebreak column, e.g. the event id); under ties the fill would be
    * nondeterministic and silently partition-layout-dependent.
    *
    * Scale shape: one window pass — a single range-partitioned sort per
    * partition key (the q7/ql1 class), with `last(ignoreNulls)` over the
    * unbounded-preceding frame evaluated incrementally (no per-row
    * rescans). Nothing else shuffles.
    */
  def locf(df: DataFrame, valueCol: String, partitionCols: Seq[String],
      orderCols: Seq[String], filledCol: String = "filled"): DataFrame = {
    require(orderCols.nonEmpty, "locf needs at least one order column")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(filledCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** The gap marker a fill is usually paired with: true where the row's
    * value was carried (null before the fill), false where observed.
    */
  def carriedMarker(valueCol: String): Column = col(valueCol).isNull
}
