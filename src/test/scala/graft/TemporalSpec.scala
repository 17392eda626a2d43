package graft

import org.apache.spark.sql.functions._

import graft.dset.DSet
import graft.dset.DSet._
import graft.operators.TemporalJoins

class TemporalSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks most recent right row at-or-before, null when none") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:03:00"), 200.0)
    ).toDF("k", "ts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:02:00"), "t1"), // → 100.0
      (1L, ts("2024-01-01 10:05:00"), "t2"), // equal ts inclusive → 101.0
      (2L, ts("2024-01-01 10:01:00"), "t3"), // before any quote → null
      (3L, ts("2024-01-01 10:10:00"), "t4")  // no quotes for key → null
    ).toDF("k", "ts", "trade_id")
    val got = TemporalJoins.asofJoin(trades, quotes, "k", "ts", Seq("price"))
      .select("trade_id", "price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == Map("t1" -> Some(100.0), "t2" -> Some(101.0), "t3" -> None, "t4" -> None))
  }

  test("rangeJoin keeps only right rows in the window before left") {
    val left = Seq((1L, ts("2024-01-01 10:10:00"), "e1")).toDF("k", "ts", "id")
    val right = Seq(
      (1L, ts("2024-01-01 10:06:00"), "in"),
      (1L, ts("2024-01-01 10:04:00"), "before-window"),
      (1L, ts("2024-01-01 10:11:00"), "after")
    ).toDF("k", "ts", "rid")
    val got = TemporalJoins.rangeJoin(left, right, "k", "ts", 300)
      .select(col("rid")).collect().map(r => Option(r.getString(0))).toSet
    assert(got == Set(Some("in")))
  }

  test("groupByKeySalted equals plain groupByKey") {
    // negative values exercise negative hashCodes through the salt
    val kv = DSet.distribute(spark, (-250 until 250).map(i => (math.floorMod(i, 3), i)), 4)
    val plain = kv.groupByKey.toArray.toMap.view.mapValues(_.sorted).toMap
    val salted = kv.groupByKeySalted(8).toArray.toMap.view.mapValues(_.sorted).toMap
    assert(salted == plain)
  }

  test("salt domain is exactly [0, saltParts) incl. negative hashCodes") {
    val parts = 8
    val salts = (-1000 until 1000).map(v => DSet.salt(v, parts)).toSet
    assert(salts == (0 until parts).toSet)
  }

  test("registered SQL functions work from sql text") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()
    assert(r.head.getDouble(0) == 11.0)
    val sh = spark.sql("SELECT size(word_shingle_hashes('a b c d')) AS n").collect()
    assert(sh.head.getInt(0) == 2)
  }

  test("locf carries the last observation forward within partitions; leading gaps stay null") {
    import graft.operators.Timeseries
    val df = Seq(
      (1L, 1, Some(5.0)), (1L, 2, None), (1L, 3, None), (1L, 4, Some(7.0)), (1L, 5, None),
      (2L, 1, None), (2L, 2, Some(3.0))
    ).toDF("u", "t", "v")
    val got = Timeseries.locf(df, "v", Seq("u"), Seq("t"))
      .select(col("u"), col("t"), col("filled"), Timeseries.carriedMarker("v").as("c"))
      .as[(Long, Int, Option[Double], Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1, Some(5.0), false), (1L, 2, Some(5.0), true), (1L, 3, Some(5.0), true),
      (1L, 4, Some(7.0), false), (1L, 5, Some(7.0), true),
      (2L, 1, None, true), (2L, 2, Some(3.0), false)))
    // the fill is independent of input partitioning (the window imposes
    // the total order)
    val shuffled = Timeseries.locf(df.repartition(7), "v", Seq("u"), Seq("t"))
      .select(col("u"), col("t"), col("filled"))
      .as[(Long, Int, Option[Double])].collect().toSet
    assert(shuffled == got.map(r => (r._1, r._2, r._3)))
    intercept[IllegalArgumentException](Timeseries.locf(df, "v", Seq("u"), Seq.empty))
  }
}
