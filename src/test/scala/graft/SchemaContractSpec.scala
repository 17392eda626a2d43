package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema contract for the driver-generated testdata (TESTDATA.md).
  *
  * The driver has regenerated the parquet files with different physical
  * encodings across rounds (events.ts: TIMESTAMP(NANOS)-as-INT64, then
  * timestamp[us] → TIMESTAMP_NTZ). `Tables.load` normalizes type-driven;
  * this spec pins the POST-normalization contract at every scale factor so
  * the next silent format change fails here, by name, instead of breaking
  * three streaming gates downstream.
  */
class SchemaContractSpec extends SparkSuite {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("events.ts normalizes to session-zoned TIMESTAMP at every sf") {
    sfs.foreach { dir =>
      val ev = Tables.load(spark, dir, "events")
      val tsField = ev.schema("ts")
      assert(tsField.dataType == TimestampType,
        s"$dir/events.parquet: ts must normalize to TIMESTAMP, got ${tsField.dataType}")
      // value sanity: the synthesized event horizon is within [2023, 2026)
      // under the UTC session — a wrong-zone or wrong-unit conversion
      // shifts or explodes this range
      val Array(row) = ev.agg(
        min(col("ts")).cast("string").as("lo"),
        max(col("ts")).cast("string").as("hi")).collect()
      val (lo, hi) = (row.getString(0), row.getString(1))
      assert(lo >= "2023-01-01" && hi < "2026-01-01", s"$dir ts range [$lo, $hi] out of contract")
      // Row accessor contract: TimestampType surfaces java.sql.Timestamp
      val first = ev.select(col("ts")).limit(1).collect()(0).get(0)
      assert(first.isInstanceOf[java.sql.Timestamp],
        s"$dir ts row value is ${first.getClass.getName}, expected java.sql.Timestamp")
    }
  }

  test("normalizeTs handles every historical encoding") {
    import spark.implicits._
    // nanos-as-long encoding (rounds ≤7): INT64 column named ts
    val asLong = Seq((1L, 1700000000000000000L)).toDF("id", "ts")
    val fromLong = Tables.normalizeTs(asLong)
    assert(fromLong.schema("ts").dataType == TimestampType)
    assert(fromLong.select(col("ts").cast("string")).collect()(0).getString(0)
      == "2023-11-14 22:13:20")
    // µs-NTZ encoding (round 8+)
    val asNtz = asLong.select(col("id"),
      expr("make_timestamp_ntz(2023, 11, 14, 22, 13, 20)").as("ts"))
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    val fromNtz = Tables.normalizeTs(asNtz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(col("ts").cast("string")).collect()(0).getString(0)
      == "2023-11-14 22:13:20")
    // already-normalized frames pass through unchanged
    val same = Tables.normalizeTs(fromNtz)
    assert(same.schema("ts").dataType == TimestampType)
  }

  test("every table loads with a non-empty schema at every sf") {
    sfs.foreach { dir =>
      Tables.names.foreach { n =>
        val df = Tables.load(spark, dir, n)
        assert(df.schema.fields.nonEmpty, s"$dir/$n: empty schema")
        // `ts` feeds tz-sensitive streaming ops (unix_micros, watermarks)
        // and MUST be zoned; o_orderdate/l_shipdate are naive date-like
        // columns that only ever face equality/range predicates, where
        // NTZ is oracle-compatible (8 rounds of green hashes) — pin them
        // so an encoding change is caught here, by name.
        df.schema.fields.foreach { f =>
          if (f.name == "ts")
            assert(f.dataType == TimestampType, s"$dir/$n.ts: ${f.dataType}")
          else if (f.name == "o_orderdate" || f.name == "l_shipdate")
            assert(f.dataType == TimestampNTZType || f.dataType == TimestampType || f.dataType == DateType,
              s"$dir/$n.${f.name}: unexpected encoding ${f.dataType}")
          else
            assert(f.dataType != TimestampNTZType && f.dataType != TimestampType,
              s"$dir/$n.${f.name}: new datetime column outside the schema contract — extend Tables.normalizeTs/this spec deliberately")
        }
      }
    }
  }

  test("stageParquet tolerates both file- and directory-shaped sources") {
    val stage1 = java.nio.file.Files.createTempDirectory("stage-file").toString
    graft.queries.QueryTmp.stageParquet(s"$sf0001/events.parquet", stage1, "ev.parquet")
    assert(spark.read.parquet(stage1).count() ==
      spark.read.parquet(s"$sf0001/events.parquet").count())

    // directory-shaped: a multi-part dataset written by Spark
    val srcDir = java.nio.file.Files.createTempDirectory("stage-src").toString + "/ds"
    spark.read.parquet(s"$sf0001/events.parquet").repartition(3)
      .write.mode("overwrite").parquet(srcDir)
    val stage2 = java.nio.file.Files.createTempDirectory("stage-dir").toString
    graft.queries.QueryTmp.stageParquet(srcDir, stage2, "ev.parquet")
    assert(spark.read.parquet(stage2).count() ==
      spark.read.parquet(s"$sf0001/events.parquet").count())
  }
}
