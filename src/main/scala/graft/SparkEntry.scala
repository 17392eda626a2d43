package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query packs; each query has a DuckDB oracle
  * where its semantics are ANSI-SQL-expressible (driver hash-compares),
  * and a rows-only check otherwise.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Lazy val, not
    * def: Bench/Explain look entries up in per-query loops, and a def
    * would rebuild the 8-pack merged map on every lookup.
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.TextQueries.queries ++
      graft.queries.VectorQueries.queries ++ graft.queries.MultimodalQueries.queries ++
      graft.queries.PipelineQueries.queries ++ graft.queries.CurationQueries.queries ++
      graft.queries.FacadeQueries.queries ++ graft.queries.SketchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  lazy val oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.TextQueries.oracles ++
      graft.queries.VectorQueries.oracles ++ graft.queries.MultimodalQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++ graft.queries.CurationQueries.oracles ++
      graft.queries.FacadeQueries.oracles ++ graft.queries.SketchQueries.oracles
}
