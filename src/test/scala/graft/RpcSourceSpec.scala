package graft

import org.apache.spark.sql.functions._

import graft.sources.RpcSource
import graft.sources.RpcSource.RpcContract

/** RPC contract-dial source: an RPC-sourced frame must equal the batch
  * frame it mirrors (the `DSet.import` parity contract — reference
  * `DSetGenerics.fs:788-836`), across multiple endpoints, with nulls,
  * under column pruning — and the pruning must reach the SERVICE: the
  * request carries the projected column list, so pruned columns never
  * cross the wire.
  */
class RpcSourceSpec extends SparkSuite {
  import spark.implicits._

  private val ddl = "id BIGINT, name STRING, score DOUBLE, ok BOOLEAN"

  private def contract(rows: Seq[(Long, String, Double, Boolean)]): RpcContract =
    RpcContract(Seq("id", "name", "score", "ok"),
      rows.map { case (i, n, s, o) => Seq(i.toString, n, s.toString, o.toString) })

  test("rpc frame equals the batch frame it mirrors (multi-endpoint, parallel dial)") {
    val batch = Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -0.25, false),
      (3L, "gamma", 42.0, true),
      (4L, "delta", 0.0, false)).toDF("id", "name", "score", "ok")
    // two shards, one contract name — each endpoint becomes one partition
    val s1 = RpcSource.serve(0, Map("t" -> contract(Seq((1L, "alpha", 1.5, true), (2L, "beta", -0.25, false)))))
    val s2 = RpcSource.serve(0, Map("t" -> contract(Seq((3L, "gamma", 42.0, true), (4L, "delta", 0.0, false)))))
    try {
      val rpc = RpcSource.readRpc(spark, Seq(s"localhost:${s1.port}", s"localhost:${s2.port}"), ddl, "t")
      assert(rpc.rdd.getNumPartitions == 2, "each endpoint must be its own input partition")
      // DDL schemas are nullable; compare names + types (batch toDF marks
      // primitive columns non-nullable)
      assert(rpc.schema.map(f => (f.name, f.dataType)) == batch.schema.map(f => (f.name, f.dataType)))
      assert(rpc.collect().map(_.toSeq).toSet == batch.collect().map(_.toSeq).toSet)
    } finally { s1.close(); s2.close() }
  }

  test("nulls, unknown contract, and repeated dials") {
    val srv = RpcSource.serve(0,
      Map("t" -> RpcContract(Seq("id", "name", "score", "ok"), Seq(Seq("1", null, null, null)))))
    try {
      val rpc = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"), ddl, "t")
      val r = rpc.collect()
      assert(r.length == 1 && r(0).getLong(0) == 1L && r(0).isNullAt(1) && r(0).isNullAt(2) && r(0).isNullAt(3))
      // a second action re-dials the same endpoint (server must answer again)
      assert(rpc.count() == 1L)
      // unknown contract = zero rows, not an error
      assert(RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"), ddl, "nope").count() == 0L)
    } finally srv.close()
  }

  test("projection pushes to the service: pruned columns never cross the wire") {
    // a fat column dominates the payload; a scan that projects it away
    // must not pay for it on the wire
    val fat = "x" * 4096
    val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id", "name", "blob"),
      (1L to 50L).map(i => Seq(i.toString, s"n$i", fat)))))
    try {
      val pruned = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"),
        "id BIGINT, name STRING, blob STRING", "t").select("name", "id")
      val scans = pruned.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty)
      assert(scans.head.scan.readSchema().fieldNames.toSet == Set("id", "name"))
      assert(pruned.collect().length == 50)
      // the request named only the projected columns…
      val reqs = srv.requests.toArray(Array.empty[String])
      assert(reqs.nonEmpty && reqs.forall(_ == "GET t id,name"), reqs.mkString("; "))
      // …and the payload stayed far below one fat field, let alone 50
      assert(srv.bytesSent < fat.length, s"wire payload ${srv.bytesSent}")
    } finally srv.close()
  }

  test("filters push to the service: dropped rows never cross the wire") {
    val fat = "x" * 4096
    // 50 rows, only 3 match score > 100 — the other 47 fat blobs must
    // not be paid for on the wire
    val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id", "score", "blob"),
      (1L to 50L).map(i => Seq(i.toString, (if (i <= 3) 1000.0 else i.toDouble).toString, fat)))))
    try {
      val df = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"),
        "id BIGINT, score DOUBLE, blob STRING", "t")
        .filter(col("score") > 100.0)
        .select("id", "blob")
      // the filter shows in the scan node's description as pushed…
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty && scans.head.scan.description().contains("filters="),
        scans.map(_.scan.description()).mkString("; "))
      assert(scans.head.scan.description().matches(".*filters=[1-9].*"),
        scans.head.scan.description())
      assert(df.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
      // …the request carried filter conjuncts…
      val reqs = srv.requests.toArray(Array.empty[String])
      assert(reqs.nonEmpty && reqs.forall(_.matches("GET t [a-z,]+ .+")), reqs.mkString("; "))
      // …and only the 3 matching fat rows crossed the wire
      assert(srv.bytesSent < 5L * fat.length, s"wire payload ${srv.bytesSent}")
    } finally srv.close()
  }

  test("pushed filters stay residual: a service that ignores them is still correct") {
    // legacy-shaped service: answers the whole contract regardless of the
    // filter token (simulated by a filter on a column the service does
    // not have mapped — rowPredicate treats unknown columns as vacuous)
    val keepAll = RpcSource.rowPredicate("eq bm90YWNvbA== MQ==", Seq("id", "name"))
    assert(keepAll(Seq("1", "x")) && keepAll(Seq("2", null)))
    // garbage conjuncts are vacuous too, never throw
    val garbage = RpcSource.rowPredicate("zz !!notb64!! ?\teq onlytwo", Seq("id"))
    assert(garbage(Seq("7")))
    // end-to-end: Spark re-applies the filter on whatever arrives
    val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id", "name"),
      (1L to 10L).map(i => Seq(i.toString, s"n$i")))))
    try {
      val got = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"),
        "id BIGINT, name STRING", "t")
        .filter(col("id") <= 4L && col("name") =!= "n2")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(1L, 3L, 4L))
    } finally srv.close()
  }

  test("filter column need not be projected; numeric vs lexical compare is type-aware") {
    // select name where id >= 10: id crosses the wire only because Spark
    // keeps the residual; the serving side compares 9 < 10 NUMERICALLY
    // (lexically "9" > "10" would wrongly pass row 9)
    val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id", "name"),
      (1L to 12L).map(i => Seq(i.toString, s"n$i")))))
    try {
      val got = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"),
        "id BIGINT, name STRING", "t")
        .filter(col("id") >= 10L).select("name")
        .collect().map(_.getString(0)).toSet
      assert(got == Set("n10", "n11", "n12"))
      // and string comparisons stay lexical: null fails non-null ops
      val p = RpcSource.rowPredicate(
        RpcSource.encodeFilter(org.apache.spark.sql.sources.EqualTo("name", "n3")).get,
        Seq("id", "name"))
      assert(p(Seq("3", "n3")) && !p(Seq("4", "n4")) && !p(Seq("5", null)))
    } finally srv.close()
  }

  test("count(*) scan requests row markers only ('-' column list)") {
    val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id", "blob"),
      (1L to 40L).map(i => Seq(i.toString, "y" * 1024)))))
    try {
      val n = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"),
        "id BIGINT, blob STRING", "t").count()
      assert(n == 40L)
      val reqs = srv.requests.toArray(Array.empty[String])
      assert(reqs.nonEmpty && reqs.forall(_ == "GET t -"), reqs.mkString("; "))
      assert(srv.bytesSent < 200, s"wire payload ${srv.bytesSent}") // OK + 40 bare newlines
    } finally srv.close()
  }

  test("framed fields: tabs, newlines, CRs, backslashes, and a literal \\N survive the wire") {
    val tricky = Seq(
      "tab\there", "line\nbreak", "cr\rhere", "back\\slash", "\\N",
      "mix\t\\\n\r\\N end", "")
    val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id", "name"),
      tricky.zipWithIndex.map { case (s, i) => Seq(i.toString, s) })))
    try {
      val got = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"),
        "id BIGINT, name STRING", "t")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      tricky.zipWithIndex.foreach { case (s, i) =>
        assert(got(i.toLong) == s, s"row $i: got '${got(i.toLong)}'")
      }
      // the escaped literal "\N" string is distinct from SQL NULL
      assert(got(4L) == "\\N" && got.values.forall(_ != null))
    } finally srv.close()
  }

  test("unknown projected column is refused with a clear error") {
    val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id"), Seq(Seq("1")))))
    try {
      val ex = intercept[Exception] {
        RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"), "id BIGINT, nope STRING", "t")
          .collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      val msgs = causes(ex).flatMap(c => Option(c.getMessage))
      assert(msgs.exists(m => m.contains("unknown column") && m.contains("nope")), msgs.mkString("; "))
    } finally srv.close()
  }

  test("parse failures carry endpoint, contract, and the offending line") {
    // serve text where the declared BIGINT column holds a word
    val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id"), Seq(Seq("notanumber")))))
    try {
      val ex = intercept[Exception] {
        RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"), "id BIGINT", "t").collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      val msgs = causes(ex).flatMap(c => Option(c.getMessage))
      assert(msgs.exists(m => m.contains(s"localhost:${srv.port}") &&
        m.contains("contract 't'") && m.contains("notanumber")), msgs.mkString("; "))
    } finally srv.close()
  }

  test("timestamp fields parse in the SESSION timezone, not the JVM default") {
    val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id", "ts"),
      Seq(Seq("1", "2026-01-15 10:30:00.123")))))
    try {
      val rpc = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"), "id BIGINT, ts TIMESTAMP", "t")
      val got = rpc.select(col("ts")).as[java.sql.Timestamp].collect()
      // expected instant computed in the session zone explicitly — the
      // assertion must hold even when the JVM default zone differs
      val tz = spark.conf.get("spark.sql.session.timeZone")
      val expected = java.sql.Timestamp.from(
        java.time.LocalDateTime.parse("2026-01-15T10:30:00.123")
          .atZone(java.time.ZoneId.of(tz)).toInstant)
      assert(got.toSeq == Seq(expected))
    } finally srv.close()
  }

  test("wire roundtrip property: randomized rows (nulls included) survive serve -> scan") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // strings drawn from a pool including every escape-relevant character
    val cell = Gen.option(Gen.listOfN(8,
      Gen.oneOf(('a' to 'e') ++ Seq('\t', '\n', '\r', '\\', 'N', ' '))).map(_.mkString))
    val rowGen = Gen.zip(Gen.chooseNum(0L, 1L << 40), cell,
      Gen.option(Gen.chooseNum(-1e6, 1e6)), Gen.option(Gen.oneOf(true, false)))
    val rowsGen = Gen.listOfN(25, rowGen)
    (0 until 4).foreach { i =>
      val rows = rowsGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      def f(o: Option[Any]) = o.map(_.toString).orNull
      val srv = RpcSource.serve(0, Map("t" -> RpcContract(Seq("id", "name", "score", "ok"),
        rows.map { case (id, s, d, b) => Seq(id.toString, f(s), f(d), f(b)) })))
      try {
        val got = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"), ddl, "t")
          .collect().map(r => (r.getLong(0),
            Option(r.get(1)).map(_.toString),
            Option(r.get(2)).map(_.asInstanceOf[Double]),
            Option(r.get(3)).map(_.asInstanceOf[Boolean]))).toSet
        // doubles roundtrip via toString exactly (shortest repr parses back)
        assert(got == rows.toSet, s"seed ${7 + i}")
      } finally srv.close()
    }
  }

  test("partitionsPerEndpoint: N disjoint exhaustive slices per endpoint (importN parity)") {
    val rows = (1L to 20L).map(i => (i, s"n$i", i * 0.5, i % 2 == 0))
    val srv = RpcSource.serve(0, Map("t" -> contract(rows)))
    try {
      val rpc = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"), ddl, "t",
        partitionsPerEndpoint = 3)
      assert(rpc.rdd.getNumPartitions == 3, "one endpoint split into 3 input partitions")
      // disjoint + exhaustive: union of slices == the contract, exactly
      assert(rpc.collect().map(_.getLong(0)).sorted.toSeq == (1L to 20L))
      // the service acked and did the slicing: each request carries a
      // slice conjunct, and total bytes sent ≈ one copy of the data
      import scala.jdk.CollectionConverters._
      val reqs = srv.requests.asScala.toSeq
      assert(reqs.count(_.contains("slice ")) == 3, s"3 sliced dials, got: $reqs")
    } finally srv.close()
  }

  test("partitionsPerEndpoint composes with pushed filters (slice is post-filter)") {
    val rows = (1L to 30L).map(i => (i, s"n$i", i * 1.0, true))
    val srv = RpcSource.serve(0, Map("t" -> contract(rows)))
    try {
      val rpc = RpcSource.readRpc(spark, Seq(s"localhost:${srv.port}"), ddl, "t",
        partitionsPerEndpoint = 4)
        .filter(col("id") > 10L)
      assert(rpc.collect().map(_.getLong(0)).sorted.toSeq == (11L to 30L))
    } finally srv.close()
  }

  test("legacy service without slice support: reader slices client-side, exactly") {
    // a minimal legacy responder: answers plain OK and streams EVERY row,
    // ignoring all filter conjuncts (the pre-slice-protocol generation)
    val rows = (1L to 17L).map(i => Seq(i.toString, s"n$i", (i * 0.5).toString, "true"))
    val server = new java.net.ServerSocket(0)
    @volatile var stop = false
    val t = new Thread(() => {
      while (!stop) {
        try {
          val sock = server.accept()
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
          in.readLine() // request, ignored beyond consuming it
          val os = sock.getOutputStream
          val payload = ("OK\n" + rows.map(_.mkString("\t")).mkString("\n") + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          os.write(payload); os.flush(); sock.close()
        } catch { case _: Exception => () }
      }
    }, "legacy-rpc-fixture")
    t.setDaemon(true); t.start()
    try {
      val rpc = RpcSource.readRpc(spark, Seq(s"localhost:${server.getLocalPort}"), ddl, "t",
        partitionsPerEndpoint = 3)
      assert(rpc.rdd.getNumPartitions == 3)
      assert(rpc.collect().map(_.getLong(0)).sorted.toSeq == (1L to 17L),
        "client-side fallback must keep slices disjoint and exhaustive")
    } finally { stop = true; server.close() }
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
