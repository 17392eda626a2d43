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
    // payload (null on right rows), and the right values as ONE struct.
    // The struct is load-bearing: the backward-fill must carry the whole
    // most-recent right ROW — per-column ignoreNulls fills would skip a
    // genuinely-null right value (carrying a stale older one forward)
    // and could even assemble different columns from different right
    // rows. The struct is non-null for every right row even when all its
    // fields are null, so ignoreNulls only skips the LEFT placeholders.
    val rvType = org.apache.spark.sql.types.StructType(
      rightValCols.map(c => right.schema(c)).toArray)
    val lSel = left.select(
      (col(key) +: col(ts) +: lit(1).as("__side") +:
        leftPayload.map(col)) :+
        lit(null).cast(rvType).as("__rvals"): _*)
    val rSel = right.select(
      (col(key) +: col(ts) +: lit(0).as("__side") +:
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c))) :+
        struct(rightValCols.map(col): _*).as("__rvals"): _*)
    // the value struct is the final sort key so right rows tied on
    // (key, ts) order deterministically — "most recent" stays replayable
    // across partitionings and retries
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__rvals"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lSel.union(rSel)
      .withColumn("__filled", last(col("__rvals"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (col(key) +: col(ts) +: leftPayload.map(col)) ++
          rightValCols.map(c => col(s"__filled.$c").as(c)): _*)
  }

  /** Range join: pairs with equal `key` and `right.ts` within
    * `[left.ts - windowBefore, left.ts]`; LEFT-OUTER — an unmatched left
    * row survives with a null right side. The equality key makes Catalyst
    * plan a shuffled equi-join with the range as a post-condition (not a
    * cartesian product); at scale the shuffle is on `key` only.
    *
    * Output keeps BOTH sides' columns under the `l`/`r` aliases — `key`
    * and `ts` appear twice, so reference them qualified
    * (`col("l.ts")`/`col("r.ts")`); an unqualified select is ambiguous.
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
