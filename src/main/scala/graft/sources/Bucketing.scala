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
    val w = df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def readTable(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}
