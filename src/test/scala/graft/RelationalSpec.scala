package graft

/** Smoke + spot-value tests for the relational query pack at sf0.001.
  * Hash-exact validation against DuckDB runs via tools/oracle_check.py
  * and the driver's own gate; these specs keep `sbt test` self-contained.
  */
class RelationalSpec extends SparkSuite {

  test("every declared query runs and yields a sane schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every declared oracle names an existing query") {
    // Key-level guard only: oracle keys must be a subset of query names.
    // COLUMN-name parity (the driver hash-fails on a name mismatch even
    // when values agree) is NOT checked here — that is the external
    // oracle gate's job (tools/oracle_check.py compares schemas).
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracles without queries: $undeclared")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 spot values: group count and total row conservation") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length >= 4 && rows.length <= 8) // 2-3 flags × 2-3 statuses
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val liCount = Tables.load(spark, sf0001, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <= "1998-09-02").count()
    assert(total == liCount)
  }

  test("q12 top-k is ordered descending by totalprice") {
    val rows = SparkEntry.queries("q12_topk_orders")(spark, sf0001).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
