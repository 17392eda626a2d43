package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality expectations — the contract checks a continuously-fed
  * training corpus runs before a batch is admitted (the dbt-test /
  * Great-Expectations niche, Spark-native): each check is ONE small
  * aggregate over the table returning a (check, metric, ok) row, so a
  * suite of checks is a union of scan-stage aggregates Catalyst can
  * collapse over shared scans.
  *
  * Scale shape: every check is a map-side-combined aggregate (count /
  * countDistinct / conditional count) — shuffle traffic is partial-
  * aggregate-sized, never row-sized; the FK orphan check is one
  * key-partitioned anti-join semantically but is expressed as a
  * left-join count so AQE broadcasts the parent's key set when small.
  */
object Expect {

  /** Key uniqueness: metric = duplicate rows (n_rows − n_distinct). */
  def uniqueKey(df: DataFrame, keyCol: String): DataFrame =
    df.agg((count(lit(1)) - countDistinct(col(keyCol))).as("metric"))
      .select(lit(s"unique:$keyCol").as("check_name"), col("metric"),
        (col("metric") === 0).as("ok"))

  /** Null fraction bound: metric = null count; ok iff fraction ≤ maxFrac. */
  def notNull(df: DataFrame, c: String, maxFrac: Double = 0.0): DataFrame =
    df.agg(count(when(col(c).isNull, 1)).as("metric"), count(lit(1)).as("__n"))
      .select(lit(s"not_null:$c").as("check_name"), col("metric"),
        (col("metric") <= col("__n") * maxFrac).as("ok"))

  /** Referential integrity: metric = child rows whose key has no parent. */
  def foreignKey(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey).as("__ck"))
      .join(parent.select(col(parentKey).as("__pk")).distinct(),
        col("__ck") === col("__pk"), "left")
      .agg(count(when(col("__pk").isNull, 1)).as("metric"))
      .select(lit(s"fk:$childKey->$parentKey").as("check_name"), col("metric"),
        (col("metric") === 0).as("ok"))

  /** Closed value range: metric = out-of-range (or null) rows. */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    df.agg(count(when(col(c).isNull || col(c) < lo || col(c) > hi, 1)).as("metric"))
      .select(lit(s"range:$c[$lo,$hi]").as("check_name"), col("metric"),
        (col("metric") === 0).as("ok"))

  /** Row-count bound: metric = observed rows. */
  def rowCountAtLeast(df: DataFrame, atLeast: Long): DataFrame =
    df.agg(count(lit(1)).as("metric"))
      .select(lit(s"rows>=$atLeast").as("check_name"), col("metric"),
        (col("metric") >= atLeast).as("ok"))

  /** A suite: union of check rows (one plan; shared scans collapse). */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
