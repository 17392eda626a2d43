package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session bootstrap for the graft engine.
  *
  * Mirrors the reference's cluster bootstrap (`Cluster("local[2]")`,
  * reference `src/CoreLib/cluster.fs:843-888`) as a `SparkSession` builder
  * with scale-appropriate defaults: AQE on (runtime re-planning, skew-join
  * handling), shuffle partitions sized for the local core count rather than
  * the 200 default, UTC session time zone for oracle parity.
  */
object GraftSession {
  def builder(master: String = "local[32]", appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read as long and convert in Tables.load (micros, floored —
      // matching DuckDB's ns→µs truncation).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32): SparkSession = {
    val spark = builder(s"local[$cores]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Stands in for the reference's dataset catalog — `(name, version)`
  * metadata binding via `DSet.loadSource()` (reference
  * `src/CoreLib/DSetGenerics.fs:367-378`) — with parquet's self-describing
  * schema replacing the metadata files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // TIMESTAMP(NANOS) columns arrive as long (nanosAsLong); convert to a
    // real timestamp via integer division (ns beyond 2^53 would lose
    // precision through a double).
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        acc.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case (acc, _) => acc
    }
  }

  /** Register every table as a temp view so `spark.sql` matches the
    * DuckDB oracle's table naming.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
