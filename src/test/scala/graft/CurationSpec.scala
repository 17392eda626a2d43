package graft

import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.operators.{Dedup, Packing, Sampling, TfIdf}

class CurationSpec extends SparkSuite {
  import spark.implicits._

  // ---- deterministic sampling ----

  test("hashBucket expression matches the JVM twin and is partitioning-independent") {
    val ids = (0L until 2000L).toDF("id")
    val got1 = Sampling.hashSample(ids.repartition(1), "id", 0.3).as[Long].collect().toSet
    val got32 = Sampling.hashSample(ids.repartition(32), "id", 0.3).as[Long].collect().toSet
    assert(got1 == got32, "keep set must not depend on partitioning")
    val expected = (0L until 2000L)
      .filter(HashFunctions.bucketOf(_, Sampling.Buckets) < 300000L).toSet
    assert(got1 == expected, "expression must equal the JVM reference implementation")
  }

  test("hashSample keeps ~rate of rows and different seeds give different samples") {
    val ids = (0L until 20000L).toDF("id")
    val n = Sampling.hashSample(ids, "id", 0.1).count()
    assert(n > 1600 && n < 2400, s"~10% of 20k expected, got $n")
    val a = Sampling.hashSample(ids, "id", 0.1, seed = 1L).as[Long].collect().toSet
    val b = Sampling.hashSample(ids, "id", 0.1, seed = 2L).as[Long].collect().toSet
    assert(a != b)
  }

  test("stratifiedHashSample applies per-stratum rates; default drops unknown strata") {
    val df = (0L until 6000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "xx"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedHashSample(df, "id", "lang", Seq("en" -> 0.0, "zh" -> 1.0))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!kept.contains("en") && !kept.contains("xx"), s"en/xx must be dropped: $kept")
    assert(kept("zh") == 2000L, s"zh rate 1.0 keeps all: $kept")
  }

  test("trainEvalSplit is disjoint, complete, and stable under corpus growth") {
    val small = (0L until 1000L).toDF("id")
    val big = (0L until 2000L).toDF("id")
    val (tr, ev) = Sampling.trainEvalSplit(small, "id", 0.2)
    val trS = tr.as[Long].collect().toSet
    val evS = ev.as[Long].collect().toSet
    assert((trS & evS).isEmpty && (trS | evS) == (0L until 1000L).toSet)
    val evBig = Sampling.trainEvalSplit(big, "id", 0.2)._2.as[Long].collect().toSet
    assert(evBig.filter(_ < 1000L) == evS, "membership must not migrate when new data arrives")
  }

  // ---- sequence packing ----

  test("packChunks: bin/offset are the token prefix-sum; offsets stay below capacity") {
    val docs = Seq((0L, "g", 100L), (1L, "g", 50L), (2L, "g", 30L), (3L, "g", 200L))
      .toDF("id", "grp", "toks")
    val got = Packing.packChunks(docs, "grp", "id", "toks", 128L)
      .select("id", "bin", "offset").as[(Long, Long, Long)].collect().sortBy(_._1)
    // starts: 0, 100, 150, 180 → bins 0,0,1,1; offsets 0,100,22,52
    assert(got.toSeq == Seq((0L, 0L, 0L), (1L, 0L, 100L), (2L, 1L, 22L), (3L, 1L, 52L)))
    assert(got.forall(_._3 < 128L))
  }

  test("packChunks bin stays integer-exact past the 2^53 double boundary") {
    // __start = 9007199254740999 (> 2^53): as a double it rounds UP to
    // ...741000, so floor(start / 1000.0) = 9007199254741 — one bin past
    // the exact integer quotient 9007199254740. The DIV formulation must
    // agree with the oracle's exact integer `//`.
    val docs = Seq((0L, "g", 9007199254740999L), (1L, "g", 5L)).toDF("id", "grp", "toks")
    val got = Packing.packChunks(docs, "grp", "id", "toks", 1000L)
      .select("id", "bin", "offset").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L, 0L), (1L, 9007199254740L, 999L)),
      s"expected exact integer bin past 2^53, got ${got.toSeq}")
  }

  test("packChunksGlobal equals the single-window formulation") {
    val docs = (0L until 500L).map(i => (i, 1L + (i * 37) % 90)).toDF("id", "toks")
      .withColumn("grp", lit("all"))
    val viaWindow = Packing.packChunks(docs, "grp", "id", "toks", 64L)
      .select("id", "bin", "offset").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val viaGlobal = Packing.packChunksGlobal(docs, "id", "toks", 64L, partitions = 7)
      .select("id", "bin", "offset").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaGlobal == viaWindow)
  }

  // ---- boilerplate removal ----

  test("removeRepeatedLines strips cross-doc frequent lines, keeps order, retains emptied docs") {
    val docs = Seq(
      (0L, "cookie banner\nunique alpha\ncookie banner\nunique beta"),
      (1L, "cookie banner\nunique gamma"),
      (2L, "cookie banner\nfooter"),
      (3L, "cookie banner"),
      (4L, "footer\nunique delta")
    ).toDF("doc_id", "text")
    // "cookie banner" in 4/5 docs (80%), "footer" in 2/5 (40%) — threshold 0.5
    val got = Dedup.removeRepeatedLines(docs, "doc_id", "text", "\n", 0.5)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, "unique alpha\nunique beta", 2L),
      (1L, "unique gamma", 1L),
      (2L, "footer", 1L),
      (3L, "", 0L),
      (4L, "footer\nunique delta", 2L)))
  }

  // ---- decontamination ----

  test("contaminationReport flags shared n-grams; decontaminate drops flagged docs; short docs safe") {
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val train = Seq(
      (0L, s"prefix $eight suffix"),          // contains the eval 8-gram
      (1L, "totally different words here that never overlap with anything"),
      (2L, "short doc")                        // < 8 tokens: no grams, no descending-sequence blowup
    ).toDF("doc_id", "text")
    val eval = Seq((100L, s"$eight trailing tail")).toDF("doc_id", "text")
    val report = graft.operators.Decontaminate.contaminationReport(train, eval, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(report.keySet == Set(0L) && report(0L) == 1L, s"got $report")
    val kept = graft.operators.Decontaminate.decontaminate(train, eval, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("evalContamination reports per-example dirty fractions; short docs NULL, clean docs 0") {
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val train = Seq(
      (0L, s"prefix $eight suffix"),
      (1L, "totally different words here that never overlap with anything")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, s"$eight x9"),                        // grams: [w1..w8], [w2..x9] → 1 of 2 dirty
      (101L, "clean eval example words that training never mentions once"),
      (102L, "too short")                          // < 8 tokens: no grams
    ).toDF("doc_id", "text")
    val got = graft.operators.Decontaminate.evalContamination(train, eval, "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got(100L) == ((2L, 1L, Some(0.5))), got(100L).toString)
    assert(got(101L)._2 == 0L && got(101L)._3 == Some(0.0), got(101L).toString)
    // a gramless doc is UNDEFINED (NULL), never silently clean or dropped
    assert(got(102L) == ((0L, 0L, None)), got(102L).toString)
    assert(got.size == 3)
  }

  // ---- robustness ----

  test("removeRepeatedLines and tfidf tolerate null text (doc retained, zero tokens)") {
    val docs = Seq((0L, "alpha beta"), (1L, null), (2L, "alpha"))
      .toDF("doc_id", "text")
    val cleaned = Dedup.removeRepeatedLines(docs, "doc_id", "text", " ", 0.6)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // "alpha" in 2/3 docs (67% > 60%) → dropped; null doc survives emptied
    assert(cleaned == Seq((0L, "beta", 1L), (1L, "", 0L), (2L, "", 0L)))
    val tf = TfIdf.tfidfTopTerms(docs, "doc_id", "text", 3)
    assert(!tf.select("doc_id").as[Long].collect().contains(1L))
  }

  // ---- streaming parity ----

  test("sampling + token filters are stateless: streaming result equals batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-curation-stream").toString
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    // three separate files so the stream sees multiple micro-batches
    docs.repartition(3).write.mode("overwrite").parquet(dir)

    def curate(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashSample(df, "doc_id", 0.3)
        .filter(graft.functions.TextFunctions.tokenCount(col("text")) >= 10)
        .select(col("doc_id"), col("lang"))

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = curate(stream).writeStream
      .outputMode("append").format("memory").queryName("curation_stream").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("curation_stream")
      .as[(Long, String)].collect().toSet
    val batch = curate(docs).as[(Long, String)].collect().toSet
    assert(streamed == batch && batch.nonEmpty,
      s"streaming kept ${streamed.size}, batch kept ${batch.size}")
  }

  test("full per-row cleaning chain is stateless: streaming result equals batch") {
    // the round-6 narrow ops composed: within-doc segment dedup →
    // repetition keep decision → PII redaction → hash sample. All per-row,
    // so a file-source stream must produce the identical row set.
    val dir = java.nio.file.Files.createTempDirectory("graft-clean-stream").toString
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    docs.repartition(3).write.mode("overwrite").parquet(dir)

    def clean(df: org.apache.spark.sql.DataFrame) = {
      val deduped = df.select(col("doc_id"),
        graft.functions.TextFunctions.dedupSegments(col("text")).getField("clean").as("text"))
      val sampled = Sampling.hashSample(deduped, "doc_id", 0.5)
      val redacted = graft.operators.Redact.redact(sampled, "text")
        .select(col("doc_id"), col("redacted").as("text"))
      graft.operators.QualityFilters.repetitionStats(redacted, "doc_id", "text")
        .withColumn("keep", graft.operators.QualityFilters.keepDecision(0.9, 0.5, 0.5).cast("int"))
    }

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = clean(stream).writeStream
      .outputMode("append").format("memory").queryName("clean_stream").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("clean_stream").collect().map(_.toString).toSet
    val batch = clean(docs).collect().map(_.toString).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"streaming kept ${streamed.size}, batch kept ${batch.size}")
  }

  // ---- tf-idf ----

  test("tfidfTopTerms broadcasts the 1-row corpus count (no cartesian plan)") {
    // the Aggregate's size estimate propagates from its corpus-sized
    // child, so without the explicit broadcast hint the planner can pick
    // CartesianProductExec for the corpus-sized left side — catastrophic
    // at the 100 TB design point
    val plan = TfIdf.tfidfTopTerms(
      Tables.load(spark, sf001, "documents"), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected BNLJ for the 1-row count:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in the tfidf plan:\n$plan")
  }

  test("tfidfTopTerms ranks rare-but-frequent terms first with deterministic tiebreak") {
    val docs = Seq(
      (0L, "common rare rare"),
      (1L, "common other"),
      (2L, "common other")
    ).toDF("doc_id", "text")
    val got = TfIdf.tfidfTopTerms(docs, "doc_id", "text", 2)
      .select("doc_id", "term", "rank").as[(Long, String, Int)].collect().toSet
    // doc 0: rare tf=2 df=1 → 2·ln3 ≈ 2.197 beats common (ln1 = 0)
    assert(got.contains((0L, "rare", 1)))
    // common appears in all docs → idf 0 → score 0; "other" (df 2) wins rank 1 in docs 1/2
    assert(got.contains((1L, "other", 1)) && got.contains((2L, "other", 1)))
    assert(got.contains((0L, "common", 2)), s"zero-idf term still ranked by tiebreak: $got")
  }

  // ---- exact-k per-group sampling (s4) ----

  test("cluster-balanced sample: exactly k per k-means cluster (s6 composition)") {
    import graft.operators.{KMeans, Sampling}
    // two well-separated blobs of unequal size — a diversity sample must
    // draw the same count from each regardless of the 9:1 imbalance
    val vecs = ((0L until 90L).map(i => (i, Array(0.0 + (i % 3) * 0.01, 0.0))) ++
      (90L until 100L).map(i => (i, Array(10.0, 10.0 + (i % 2) * 0.01))))
      .toDF("vec_id", "embedding")
    val model = KMeans.fit(vecs, "vec_id", "embedding", k = 2, maxIters = 5)
    val assigned = KMeans.assign(vecs, "vec_id", "embedding", model)
    val got = Sampling.reservoirPerGroup(assigned, "vec_id", "cluster", k = 3)
      .as[(Long, String)].collect()
    assert(got.length == 6, s"3 per cluster × 2 clusters: ${got.mkString(",")}")
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.values.forall(_.size == 3), s"$byCluster")
    // the two blobs never mix: one cluster's sample is all small ids,
    // the other's all large
    assert(byCluster.values.exists(_.forall(_ < 90L)) &&
      byCluster.values.exists(_.forall(_ >= 90L)), s"$byCluster")
  }

  test("reservoirPerGroup returns exactly k per group, deterministic, hash-ordered") {
    val df = (0L until 3000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    val got = Sampling.reservoirPerGroup(df, "id", "g", 7).as[(Long, String)].collect()
    assert(got.count(_._2 == "a") == 7 && got.count(_._2 == "b") == 7)
    // membership = the k smallest (bucket, id) per group — replay on the driver
    val expected = (0L until 3000L).groupBy(i => if (i % 2 == 0) "a" else "b")
      .flatMap { case (g, ids) =>
        ids.map(i => (HashFunctions.bucketOf(i, Sampling.Buckets), i))
          .sorted.take(7).map(t => (t._2, g))
      }.toSet
    assert(got.toSet == expected)
    // independent of partitioning
    val got32 = Sampling.reservoirPerGroup(df.repartition(32), "id", "g", 7)
      .as[(Long, String)].collect().toSet
    assert(got32 == expected)
  }

  test("reservoirPerGroup with k larger than the group keeps the whole group") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val got = Sampling.reservoirPerGroup(df, "id", "g", 10).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "a"), (3L, "b")))
  }

  // ---- keyed upsert (mg1) ----

  test("upsertByKey replaces matched keys, keeps others, inserts new ones") {
    import graft.operators.Upsert
    val existing = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("id", "v")
    val batch = Seq((2L, "new2"), (9L, "new9")).toDF("id", "v")
    val got = Upsert.upsertByKey(existing, batch, "id").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "old1"), (2L, "new2"), (3L, "old3"), (9L, "new9")))
  }

  test("upsertByKey aligns batch columns by name, not position") {
    import graft.operators.Upsert
    val existing = Seq((1L, "old1", 10L)).toDF("id", "v", "w")
    val batch = Seq((99L, 1L, "new1")).toDF("w", "id", "v") // shuffled column order
    val got = Upsert.upsertByKey(existing, batch, "id")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "new1", 99L)))
  }

  test("upsertByKeyBloom equals the plain upsert (Bloom only routes, never decides)") {
    import graft.operators.Upsert
    val existing = (0L until 5000L).map(i => (i, s"old$i")).toDF("id", "v")
    val batch = ((0L until 50L).map(i => (i * 100, s"new${i * 100}")) ++
      Seq((999999L, "insert"))).toDF("id", "v")
    val plain = Upsert.upsertByKey(existing, batch, "id")
      .as[(Long, String)].collect().toSet
    val bloomed = Upsert.upsertByKeyBloom(existing, batch, "id", fpp = 0.2)
      .as[(Long, String)].collect().toSet // high fpp: force false positives through the join
    assert(bloomed == plain)
  }

  test("composite-key upsert joins on BOTH columns: same id, new source inserts") {
    import graft.operators.Upsert
    val existing = Seq(("web", 1L, "w1"), ("book", 1L, "b1"), ("web", 2L, "w2"))
      .toDF("source", "id", "v")
    val batch = Seq(
      ("web", 1L, "w1-v2"),  // true revision: composite key matches
      ("book", 2L, "b2")     // same id as web/2 but new source: MUST insert
    ).toDF("source", "id", "v")
    val expected = Set(
      ("web", 1L, "w1-v2"), ("book", 1L, "b1"), ("web", 2L, "w2"), ("book", 2L, "b2"))
    val plain = Upsert.upsertByKey(existing, batch, Seq("source", "id"))
      .as[(String, Long, String)].collect().toSet
    assert(plain == expected)
    val bloomed = Upsert.upsertByKeyBloom(existing, batch, Seq("source", "id"), 0.2)
      .as[(String, Long, String)].collect().toSet
    assert(bloomed == expected)
  }

  // ---- plan shapes (the 100 TB arguments, asserted) ----

  test("reservoirPerGroup plan: heap partials before ONE exchange, no window sort") {
    val df = (0L until 10000L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val out = Sampling.reservoirPerGroup(df, "id", "g", 3)
    out.collect()
    // AQE's toString prints Final AND Initial plan — count the final only
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), s"window sort crept in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
    assert(exchanges <= 1, s"expected at most one exchange, got $exchanges:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"typed heap agg expected:\n$plan")
  }

  test("upsertByKey takes the broadcast anti-join path for increment-sized batches") {
    import graft.operators.Upsert
    val existing = spark.range(0, 50000).select(col("id"), (col("id") * 2).as("v"))
    val batch = spark.range(0, 100).select(col("id"), lit(-1L).as("v"))
    val merged = Upsert.upsertByKey(existing, batch, "id")
    assert(merged.count() == 50000)
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus side must not shuffle:\n$plan")
  }
}
