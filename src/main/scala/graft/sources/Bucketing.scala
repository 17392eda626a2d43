package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed tables: pre-partition data on the join/agg key at write time
  * so later equi-joins and aggregations on that key run WITHOUT a
  * shuffle — the 100 TB answer to "this join shuffles every time"
  * (SURVEY build brief: "bucketing for co-located joins").
  *
  * Spark only supports bucketing through the catalog (`saveAsTable`);
  * two tables bucketed on the same key with the same bucket count join
  * with zero Exchange nodes (asserted in ScaleOpsSpec).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
      path: Option[String] = None): Unit = {
    // repartition on the bucket column first: without it every write task
    // emits one file per bucket it holds rows for — up to tasks×buckets
    // small files (a 1000-task write with 256 buckets → 256k fragments),
    // defeating the co-located-join benefit the table exists for. After
    // the repartition each bucket's rows live in exactly one task.
    val w = df.repartition(numBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def readTable(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}
