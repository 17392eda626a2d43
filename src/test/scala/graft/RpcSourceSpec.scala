package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.RpcSource

/** RPC contract-dial source: an RPC-sourced frame must equal the batch
  * frame it mirrors (the `DSet.import` parity contract — reference
  * `DSetGenerics.fs:788-836`), across multiple endpoints, with nulls,
  * and under column pruning.
  */
class RpcSourceSpec extends SparkSuite {
  import spark.implicits._

  private val ddl = "id BIGINT, name STRING, score DOUBLE, ok BOOLEAN"

  test("rpc frame equals the batch frame it mirrors (multi-endpoint, parallel dial)") {
    val batch = Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -0.25, false),
      (3L, "gamma", 42.0, true),
      (4L, "delta", 0.0, false)).toDF("id", "name", "score", "ok")
    def tsv(rows: Seq[(Long, String, Double, Boolean)]) =
      rows.map { case (i, n, s, o) => s"$i\t$n\t$s\t$o" }
    // two shards, one contract name — each endpoint becomes one partition
    val (p1, close1) = RpcSource.serve(0, Map("t" -> tsv(Seq((1L, "alpha", 1.5, true), (2L, "beta", -0.25, false)))))
    val (p2, close2) = RpcSource.serve(0, Map("t" -> tsv(Seq((3L, "gamma", 42.0, true), (4L, "delta", 0.0, false)))))
    try {
      val rpc = RpcSource.readRpc(spark, Seq(s"localhost:$p1", s"localhost:$p2"), ddl, "t")
      assert(rpc.rdd.getNumPartitions == 2, "each endpoint must be its own input partition")
      // DDL schemas are nullable; compare names + types (batch toDF marks
      // primitive columns non-nullable)
      assert(rpc.schema.map(f => (f.name, f.dataType)) == batch.schema.map(f => (f.name, f.dataType)))
      assert(rpc.collect().map(_.toSeq).toSet == batch.collect().map(_.toSeq).toSet)
    } finally { close1(); close2() }
  }

  test("nulls, unknown contract, and repeated dials") {
    val (p, close) = RpcSource.serve(0, Map("t" -> Seq("1\t\\N\t\\N\t\\N")))
    try {
      val rpc = RpcSource.readRpc(spark, Seq(s"localhost:$p"), ddl, "t")
      val r = rpc.collect()
      assert(r.length == 1 && r(0).getLong(0) == 1L && r(0).isNullAt(1) && r(0).isNullAt(2) && r(0).isNullAt(3))
      // a second action re-dials the same endpoint (server must answer again)
      assert(rpc.count() == 1L)
      // unknown contract = zero rows, not an error
      assert(RpcSource.readRpc(spark, Seq(s"localhost:$p"), ddl, "nope").count() == 0L)
    } finally close()
  }

  test("column pruning reaches the scan (readSchema = projected columns only)") {
    val (p, close) = RpcSource.serve(0, Map("t" -> Seq("7\tzeta\t3.5\ttrue")))
    try {
      val pruned = RpcSource.readRpc(spark, Seq(s"localhost:$p"), ddl, "t").select("name", "id")
      val scans = pruned.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty)
      assert(scans.head.scan.readSchema().fieldNames.toSet == Set("id", "name"))
      assert(pruned.collect().map(_.toSeq).toSeq == Seq(Seq("zeta", 7L)))
    } finally close()
  }

  test("timestamp fields parse in the SESSION timezone, not the JVM default") {
    val (p, close) = RpcSource.serve(0, Map("t" -> Seq("1\t2026-01-15 10:30:00.123")))
    try {
      val rpc = RpcSource.readRpc(spark, Seq(s"localhost:$p"), "id BIGINT, ts TIMESTAMP", "t")
      val got = rpc.select(col("ts")).as[java.sql.Timestamp].collect()
      // expected instant computed in the session zone explicitly — the
      // assertion must hold even when the JVM default zone differs
      val tz = spark.conf.get("spark.sql.session.timeZone")
      val expected = java.sql.Timestamp.from(
        java.time.LocalDateTime.parse("2026-01-15T10:30:00.123")
          .atZone(java.time.ZoneId.of(tz)).toInstant)
      assert(got.toSeq == Seq(expected))
    } finally close()
  }

  test("wire roundtrip property: randomized rows (nulls included) survive serve -> scan") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cell = Gen.option(Gen.alphaNumStr.map(_.take(8)))
    val rowGen = Gen.zip(Gen.chooseNum(0L, 1L << 40), cell,
      Gen.option(Gen.chooseNum(-1e6, 1e6)), Gen.option(Gen.oneOf(true, false)))
    val rowsGen = Gen.listOfN(25, rowGen)
    (0 until 4).foreach { i =>
      val rows = rowsGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      def f(o: Option[Any]) = o.map(_.toString).getOrElse("\\N")
      val lines = rows.map { case (id, s, d, b) => s"$id\t${f(s)}\t${f(d)}\t${f(b)}" }
      val (p, close) = RpcSource.serve(0, Map("t" -> lines))
      try {
        val got = RpcSource.readRpc(spark, Seq(s"localhost:$p"), ddl, "t")
          .collect().map(r => (r.getLong(0),
            Option(r.get(1)).map(_.toString),
            Option(r.get(2)).map(_.asInstanceOf[Double]),
            Option(r.get(3)).map(_.asInstanceOf[Boolean]))).toSet
        // doubles roundtrip via toString exactly (shortest repr parses back)
        assert(got == rows.toSet, s"seed ${7 + i}")
      } finally close()
    }
  }

  test("malformed endpoints fail with a clear validation error") {
    val ex = intercept[Exception] {
      RpcSource.readRpc(spark, Seq("localhost9000"), ddl, "t").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).flatMap(c => Option(c.getMessage)).exists(_.contains("malformed endpoint")))
  }
}
