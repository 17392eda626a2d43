package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the contract checks a continuously-fed
  * training corpus runs before a batch is admitted (the dbt-test /
  * Great-Expectations niche, Spark-native).
  *
  * Scale shape: ALL scan checks against one table fuse into a SINGLE
  * multi-aggregate pass over that table ([[checkTable]]) — one scan no
  * matter how many checks, unpivoted to (check_name, metric, ok) rows
  * after the agg. This matters at 100 TB: Catalyst does NOT dedupe
  * identical scans across union branches (no cross-branch CSE; exchange
  * reuse doesn't apply to leaf scans), so a union of k single-aggregate
  * plans pays k corpus scans where the fused pass pays 1. Every metric is
  * a map-side-combined aggregate — shuffle traffic is partial-aggregate-
  * sized, never row-sized. The FK orphan check is the exception that
  * genuinely needs a second table: one key-partitioned left join whose
  * parent key set AQE broadcasts when small.
  */
object Expect {

  /** A check evaluated inside one fused scan of a single table. */
  sealed trait TableCheck
  /** Key uniqueness: metric = duplicate rows (n_rows − n_distinct). */
  final case class UniqueKey(keyCol: String) extends TableCheck
  /** Null fraction bound: metric = null count; ok iff fraction ≤ maxFrac. */
  final case class NotNull(col: String, maxFrac: Double = 0.0) extends TableCheck
  /** Closed value range: metric = out-of-range (or null) rows. */
  final case class InRange(col: String, lo: Double, hi: Double) extends TableCheck
  /** Row-count floor: metric = observed rows. */
  final case class RowCountAtLeast(atLeast: Long) extends TableCheck

  /** All scan checks over one table in ONE multi-aggregate pass: the agg
    * computes every metric (plus the shared row count) in a single scan,
    * then the one-row result unpivots to (check_name, metric, ok) rows.
    */
  def checkTable(df: DataFrame, checks: Seq[TableCheck]): DataFrame = {
    require(checks.nonEmpty, "checkTable: at least one check required")
    val metricExprs: Seq[Column] = checks.zipWithIndex.map { case (c, i) =>
      val m = c match {
        case UniqueKey(k)       => count(lit(1)) - countDistinct(col(k))
        case NotNull(c0, _)     => count(when(col(c0).isNull, 1))
        case InRange(c0, lo, hi) =>
          count(when(col(c0).isNull || col(c0) < lo || col(c0) > hi, 1))
        case RowCountAtLeast(_) => count(lit(1))
      }
      m.cast("long").as(s"__m$i")
    }
    val aggd = df.agg(metricExprs.head,
      (metricExprs.tail :+ count(lit(1)).as("__n")): _*)
    val rows: Seq[Column] = checks.zipWithIndex.map { case (c, i) =>
      val metric = col(s"__m$i")
      val (name, ok) = c match {
        case UniqueKey(k)        => (s"unique:$k", metric === 0)
        case NotNull(c0, f)      => (s"not_null:$c0", metric <= col("__n") * f)
        case InRange(c0, lo, hi) => (s"range:$c0[$lo,$hi]", metric === 0)
        case RowCountAtLeast(n)  => (s"rows>=$n", metric >= n)
      }
      struct(lit(name).as("check_name"), metric.as("metric"), ok.as("ok"))
    }
    aggd.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Key uniqueness as a standalone frame (single-check convenience). */
  def uniqueKey(df: DataFrame, keyCol: String): DataFrame =
    checkTable(df, Seq(UniqueKey(keyCol)))

  /** Null fraction bound as a standalone frame. */
  def notNull(df: DataFrame, c: String, maxFrac: Double = 0.0): DataFrame =
    checkTable(df, Seq(NotNull(c, maxFrac)))

  /** Closed value range as a standalone frame. */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    checkTable(df, Seq(InRange(c, lo, hi)))

  /** Row-count floor as a standalone frame. */
  def rowCountAtLeast(df: DataFrame, atLeast: Long): DataFrame =
    checkTable(df, Seq(RowCountAtLeast(atLeast)))

  /** Referential integrity: metric = child rows whose key has no parent.
    * Genuinely two-table — stays a join (AQE broadcasts a small parent
    * key set), never fused into a scan pass.
    */
  def foreignKey(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey).as("__ck"))
      .join(parent.select(col(parentKey).as("__pk")).distinct(),
        col("__ck") === col("__pk"), "left")
      .agg(count(when(col("__pk").isNull, 1)).cast("long").as("metric"))
      .select(lit(s"fk:$childKey->$parentKey").as("check_name"), col("metric"),
        (col("metric") === 0).as("ok"))

  /** A suite: union of check frames. Branches do NOT share scans — group
    * same-table checks into one [[checkTable]] frame first; use the union
    * only across distinct tables and for [[foreignKey]] joins.
    */
  def suite(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty,
      "Expect.suite: empty expectation suite — a dynamically built check list " +
        "filtered everything out")
    checks.reduce(_ unionByName _)
  }
}
