package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators the reference lacks entirely
  * (SURVEY §2.4 "no semi/anti/range/as-of joins").
  *
  * Per the build-brief preference order these COMPOSE existing operators
  * (option a) rather than adding a custom SparkPlan: the as-of join is
  * the classic union + keyed-window backward-fill, which Catalyst
  * executes as one shuffle on the key plus a window sort — the same cost
  * a dedicated as-of SMJ variant would pay, with AQE/skew handling for
  * free.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, the most recent right row of
    * the same `key` with `right.ts <= left.ts` (inclusive). Left rows
    * with no prior right row keep nulls — left-outer semantics.
    *
    * `rightValCols` are the right-side columns carried over (emitted with
    * their own names; they must not collide with left column names).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightValCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == key || c == ts).toSeq
    // union schema: key, ts, side (right sorts before left on ts ties →
    // equal-timestamp right rows are visible to the left row), left
    // payload (null on right rows), right payload (null on left rows)
    val lSel = left.select(
      (col(key) +: col(ts) +: lit(1).as("__side") +:
        leftPayload.map(col)) ++
        rightValCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rSel = right.select(
      (col(key) +: col(ts) +: lit(0).as("__side") +:
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        rightValCols.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lSel.union(rSel)
      .select(
        (col(key) +: col(ts) +: col("__side") +: leftPayload.map(col)) ++
          rightValCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** Range join: pairs with equal `key` and `right.ts` within
    * `[left.ts - windowBefore, left.ts]`. The equality key makes Catalyst
    * plan a shuffled equi-join with the range as a post-condition (not a
    * cartesian product); at scale the shuffle is on `key` only.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      windowBeforeSeconds: Long): DataFrame = {
    val l = left.as("l")
    val r = right.as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$ts") >= col(s"l.$ts") - expr(s"INTERVAL $windowBeforeSeconds SECONDS") &&
        col(s"r.$ts") <= col(s"l.$ts"),
      "left_outer")
  }
}
