package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class InvertedIndexSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (0L, "red fox jumps"),
    (1L, "red red dog"),
    (2L, "blue fox"),
    (3L, "")
  ).toDF("doc_id", "text")

  test("topGramByDf picks the top doc-frequency bigram; empty corpus fails loudly") {
    // "red fox"=1(doc0) "fox jumps"=1 "red red"=1 "red dog"=1 "blue fox"=1 —
    // DuckDB-style tie toward the lexicographically smallest gram
    assert(InvertedIndex.topGramByDf(docs, "text", 2) == Seq("blue", "fox"))
    val ex = intercept[IllegalArgumentException](
      InvertedIndex.topGramByDf(Seq((9L, "one")).toDF("doc_id", "text"), "text", 2))
    assert(ex.getMessage.contains("no document holds"), ex.getMessage)
  }

  test("build emits one posting per distinct token per doc, empty tokens dropped") {
    val got = InvertedIndex.build(docs, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(got == Set(
      (0L, "red"), (0L, "fox"), (0L, "jumps"),
      (1L, "red"), (1L, "dog"),
      (2L, "blue"), (2L, "fox")))
  }

  test("searchAll is AND semantics; topTokensByDf is deterministic with tiebreak") {
    val p = InvertedIndex.build(docs, "doc_id", "text")
    assert(InvertedIndex.topTokensByDf(p, 2) == Seq("fox", "red")) // df 2 vs 2 tie → token asc
    assert(InvertedIndex.searchAll(p, "doc_id", Seq("red", "fox"))
      .as[Long].collect().toSet == Set(0L))
    assert(InvertedIndex.searchAll(p, "doc_id", Seq("fox"))
      .as[Long].collect().toSet == Set(0L, 2L))
    assert(InvertedIndex.searchAll(p, "doc_id", Seq("missing")).count() == 0)
    // duplicate probes must not raise the AND bar
    assert(InvertedIndex.searchAll(p, "doc_id", Seq("red", "red"))
      .as[Long].collect().toSet == Set(0L, 1L))
  }

  test("buildPositional assigns 0-based positions over the filtered sequence") {
    val one = Seq((7L, " red  fox ")).toDF("doc_id", "text") // extra spaces dropped
    val got = InvertedIndex.buildPositional(one, "doc_id", "text")
      .select("doc_id", "pos", "token").as[(Long, Int, String)].collect().toSet
    assert(got == Set((7L, 0, "red"), (7L, 1, "fox")))
  }

  test("searchPhrase matches adjacency in order only") {
    val p = InvertedIndex.buildPositional(docs, "doc_id", "text")
    assert(InvertedIndex.searchPhrase(p, "doc_id", Seq("red", "fox"))
      .as[Long].collect().toSet == Set(0L)) // doc 2 has fox but not "red fox"
    assert(InvertedIndex.searchPhrase(p, "doc_id", Seq("fox", "red")).count() == 0)
    assert(InvertedIndex.searchPhrase(p, "doc_id", Seq("red", "red"))
      .as[Long].collect().toSet == Set(1L)) // repeated-token phrase
    assert(InvertedIndex.searchPhrase(p, "doc_id", Seq("red", "fox", "jumps"))
      .as[Long].collect().toSet == Set(0L)) // 3-token fold
    assert(InvertedIndex.searchPhrase(p, "doc_id", Seq("blue"))
      .as[Long].collect().toSet == Set(2L)) // single token degenerates to lookup
  }

  test("appendTo: incrementally-appended index equals scratch rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ii-app").toString
    val existing = docs.filter(col("doc_id") < 2)
    val batch = docs.filter(col("doc_id") >= 2)
    InvertedIndex.build(existing, "doc_id", "text").write.parquet(s"$dir/p")
    InvertedIndex.appendTo(batch, "doc_id", "text", s"$dir/p")
    // sorted-seq compare, not toSet: a double-append (or lost
    // array_distinct) would duplicate (doc, token) rows in the artifact
    // and collapse invisibly under set equality
    val appended = spark.read.parquet(s"$dir/p").as[(Long, String)].collect().sorted.toSeq
    val scratch = InvertedIndex.build(docs, "doc_id", "text")
      .as[(Long, String)].collect().sorted.toSeq
    assert(appended == scratch)
  }

  test("searchAllBatch equals N independent searchAll calls") {
    val p = InvertedIndex.build(docs, "doc_id", "text")
    // shared tokens across queries, a duplicate probe, and a no-hit
    // query — each query's AND bar must be its own distinct count
    val queries = Seq(
      Seq("red", "fox"), Seq("fox"), Seq("red", "red"), Seq("red", "missing"))
    val got = InvertedIndex.searchAllBatch(p, "doc_id", queries)
      .as[(Int, Long)].collect().toSet
    val expected = queries.zipWithIndex.flatMap { case (q, ix) =>
      InvertedIndex.searchAll(p, "doc_id", q).as[Long].collect().map(id => (ix, id))
    }.toSet
    assert(got == expected, s"got=$got expected=$expected")
    assert(got == Set((0, 0L), (1, 0L), (1, 2L), (2, 0L), (2, 1L)))
    intercept[IllegalArgumentException](
      InvertedIndex.searchAllBatch(p, "doc_id", Seq.empty))
    intercept[IllegalArgumentException](
      InvertedIndex.searchAllBatch(p, "doc_id", Seq(Seq("red"), Seq.empty)))
  }

  test("searchPhraseBatch equals N independent searchPhrase calls") {
    val p = InvertedIndex.buildPositional(docs, "doc_id", "text")
    // mixed lengths, a repeated-token phrase, shared tokens across
    // phrases, and a no-hit phrase — per-phrase votes must not leak
    val phrases = Seq(
      Seq("red", "fox"), Seq("red", "red"), Seq("red", "fox", "jumps"),
      Seq("blue"), Seq("fox", "red"))
    val got = InvertedIndex.searchPhraseBatch(p, "doc_id", phrases)
      .as[(Int, Long)].collect().toSet
    val expected = phrases.zipWithIndex.flatMap { case (ph, ix) =>
      InvertedIndex.searchPhrase(p, "doc_id", ph)
        .as[Long].collect().map(id => (ix, id))
    }.toSet
    assert(got == expected, s"got=$got expected=$expected")
    assert(got == Set((0, 0L), (1, 1L), (2, 0L), (3, 2L))) // phrase 4 has no hits
    // empty inputs fail loudly
    intercept[IllegalArgumentException](
      InvertedIndex.searchPhraseBatch(p, "doc_id", Seq.empty))
    intercept[IllegalArgumentException](
      InvertedIndex.searchPhraseBatch(p, "doc_id", Seq(Seq("red"), Seq.empty)))
  }

  test("buildScored carries tf and doc length; corpusStats sees tokenized docs only") {
    val scored = InvertedIndex.buildScored(docs, "doc_id", "text")
      .select("doc_id", "token", "tf", "dl").as[(Long, String, Long, Long)].collect().toSet
    assert(scored == Set(
      (0L, "red", 1L, 3L), (0L, "fox", 1L, 3L), (0L, "jumps", 1L, 3L),
      (1L, "red", 2L, 3L), (1L, "dog", 1L, 3L),
      (2L, "blue", 1L, 2L), (2L, "fox", 1L, 2L)))
    // the empty doc has no postings, so it is invisible to N/avgdl (it
    // can never match a query either — consistent)
    val (n, avgdl) = InvertedIndex.corpusStats(
      InvertedIndex.buildScored(docs, "doc_id", "text"), "doc_id")
    assert(n == 3L && math.abs(avgdl - 8.0 / 3) < 1e-12)
  }

  test("searchBm25 ranks by the standard idf·tf-saturation score, ties on doc id") {
    val scored = InvertedIndex.buildScored(docs, "doc_id", "text")
    // hand arithmetic: N=3, avgdl=8/3, df(red)=df(fox)=2 → idf=ln(1.6);
    // tfn(tf,dl) = tf·2.2 / (tf + 1.2·(0.25 + 0.75·dl/avgdl))
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    def tfn(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8.0 / 3)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Map(
      0L -> r6(idf * tfn(1, 3) * 2),     // red + fox, one each
      1L -> r6(idf * tfn(2, 3)),         // red twice — saturation, not 2×
      2L -> r6(idf * tfn(1, 2)))         // fox in a shorter doc
    val got = InvertedIndex.searchBm25(scored, "doc_id", Seq("red", "fox"), topK = 3)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L), got.mkString(","))
    got.foreach { case (id, s) => assert(math.abs(s - expected(id)) < 1e-9, s"$id: $s") }
    // top-k cut respects the ranking
    assert(InvertedIndex.searchBm25(scored, "doc_id", Seq("red", "fox"), topK = 2)
      .as[(Long, Double)].collect().map(_._1).toSeq == Seq(0L, 1L))
    // an unknown probe token contributes nothing (no NaN, no row loss)
    assert(InvertedIndex.searchBm25(scored, "doc_id", Seq("red", "zzz"), topK = 3)
      .as[(Long, Double)].collect().toSet ==
      InvertedIndex.searchBm25(scored, "doc_id", Seq("red"), topK = 3)
        .as[(Long, Double)].collect().toSet)
    // duplicate probes must not double-score
    assert(InvertedIndex.searchBm25(scored, "doc_id", Seq("red", "red"), topK = 3)
      .as[(Long, Double)].collect().toSet ==
      InvertedIndex.searchBm25(scored, "doc_id", Seq("red"), topK = 3)
        .as[(Long, Double)].collect().toSet)
    // precomputed stats short-circuit the corpus pass and agree
    val stats = InvertedIndex.corpusStats(scored, "doc_id")
    assert(InvertedIndex.searchBm25(scored, "doc_id", Seq("red", "fox"), 3, stats = Some(stats))
      .as[(Long, Double)].collect().toSet == got.toSet)
  }

  test("searchBm25Batch equals N independent searchBm25 calls, incl. shared tokens") {
    val scored = InvertedIndex.buildScored(docs, "doc_id", "text")
    // three queries; "red" and "fox" are SHARED across queries — the
    // union-pruned df must still be per-token document frequency, never
    // inflated by the probe join's row multiplication
    val queries = Seq(Seq("red", "fox"), Seq("red"), Seq("fox", "dog", "zzz"))
    val got = InvertedIndex.searchBm25Batch(scored, "doc_id", queries, topK = 3)
      .as[(Int, Long, Double)].collect().toSet
    val expected = queries.zipWithIndex.flatMap { case (q, i) =>
      InvertedIndex.searchBm25(scored, "doc_id", q, topK = 3)
        .as[(Long, Double)].collect().map { case (id, s) => (i, id, s) }
    }.toSet
    assert(got == expected, s"got=$got expected=$expected")
    // per-query top-k cut is per query, not global: topK=1 keeps exactly
    // the best row of EACH query
    val top1 = InvertedIndex.searchBm25Batch(scored, "doc_id", queries, topK = 1)
      .as[(Int, Long, Double)].collect()
    assert(top1.map(_._1).sorted.toSeq == Seq(0, 1, 2), top1.mkString(","))
    // duplicate probes within one query must not double-score (the
    // searchBm25 convention, applied per query)
    assert(InvertedIndex.searchBm25Batch(scored, "doc_id", Seq(Seq("red", "red")), 3)
      .as[(Int, Long, Double)].collect().toSet ==
      InvertedIndex.searchBm25Batch(scored, "doc_id", Seq(Seq("red")), 3)
        .as[(Int, Long, Double)].collect().toSet)
    // precomputed stats agree
    val stats = InvertedIndex.corpusStats(scored, "doc_id")
    assert(InvertedIndex.searchBm25Batch(scored, "doc_id", queries, 3, stats = Some(stats))
      .as[(Int, Long, Double)].collect().toSet == got)
    // empty inputs fail loudly
    intercept[IllegalArgumentException](
      InvertedIndex.searchBm25Batch(scored, "doc_id", Seq.empty, 3))
    intercept[IllegalArgumentException](
      InvertedIndex.searchBm25Batch(scored, "doc_id", Seq(Seq("red"), Seq.empty), 3))
  }

  test("appendPositional: appended positional index equals scratch rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ii11").toString
    InvertedIndex.buildPositional(docs.filter(col("doc_id") < 2), "doc_id", "text")
      .write.parquet(s"$dir/p")
    InvertedIndex.appendPositional(
      docs.filter(col("doc_id") >= 2), "doc_id", "text", s"$dir/p")
    // sorted-seq compare (the appendTo convention): a double append
    // would duplicate (doc, pos, token) rows invisibly under set equality
    val appended = spark.read.parquet(s"$dir/p").select("doc_id", "pos", "token")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val scratch = InvertedIndex.buildPositional(docs, "doc_id", "text")
      .select("doc_id", "pos", "token").as[(Long, Int, String)].collect().sorted.toSeq
    assert(appended == scratch)
    // phrase search off the appended artifact matches the rebuild's
    assert(InvertedIndex.searchPhrase(spark.read.parquet(s"$dir/p"), "doc_id",
      Seq("red", "fox")).as[Long].collect().toSet == Set(0L))
  }

  test("membership/positional appends carry the crash marker + lock hardening (the scored-path envelope)") {
    // a successful append leaves NO marker; a crashed one (simulated by
    // touching the marker) flips appendInProgress so maintaining
    // consumers refuse loudly — previously only the SCORED layout had
    // this, and a crashed positional append could silently serve
    // partial phrase postings
    val dir = java.nio.file.Files.createTempDirectory("graft-iimark").toString
    InvertedIndex.appendTo(docs.filter(col("doc_id") < 2), "doc_id", "text", s"$dir/m")
    assert(!InvertedIndex.appendInProgress(s"$dir/m"))
    InvertedIndex.appendPositional(
      docs.filter(col("doc_id") < 2), "doc_id", "text", s"$dir/p")
    assert(!InvertedIndex.appendInProgress(s"$dir/p"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/p", "._graft_bm25_appending"),
      Array.emptyByteArray)
    assert(InvertedIndex.appendInProgress(s"$dir/p"))
    // the next successful append clears a stale crash marker (the
    // appendScored convention: the append is the recovery)
    InvertedIndex.appendPositional(
      docs.filter(col("doc_id") >= 2), "doc_id", "text", s"$dir/p")
    assert(!InvertedIndex.appendInProgress(s"$dir/p"))
  }

  test("a no-commit append failure clears the marker; a partial commit keeps it") {
    // transient job failure (a failing expression aborts the write before
    // any data file publishes): the clean-failure path must clear the
    // marker — and restore the scored sidecar — instead of escalating a
    // retryable error into the marker-tripwire's full-rebuild recovery
    val dir = java.nio.file.Files.createTempDirectory("graft-iitransient").toString
    val bomb = udf((s: String) => {
      if (s != null) throw new RuntimeException("transient executor loss"); s
    })
    // positional layout (the appendGuarded envelope)
    InvertedIndex.appendPositional(docs.filter(col("doc_id") < 2), "doc_id", "text", s"$dir/p")
    val badP = docs.filter(col("doc_id") >= 2).withColumn("text", bomb(col("text")))
    intercept[Exception](InvertedIndex.appendPositional(badP, "doc_id", "text", s"$dir/p"))
    assert(!InvertedIndex.appendInProgress(s"$dir/p"),
      "no data file landed — the marker must not demand a rebuild")
    // scored layout: marker cleared AND the totals sidecar restored
    InvertedIndex.materializeScored(docs.filter(col("doc_id") < 2), "doc_id", "text", s"$dir/s"): Unit
    val priorTotals = InvertedIndex.readTotals(s"$dir/s")
    intercept[Exception](InvertedIndex.appendScored(badP, "doc_id", "text", s"$dir/s"))
    assert(!InvertedIndex.appendInProgress(s"$dir/s"))
    assert(InvertedIndex.readTotals(s"$dir/s") == priorTotals,
      "a no-commit failure must not cost the artifact its sidecar")
    // a PARTIAL commit (a data file appeared inside the failing append's
    // window) keeps the tripwire up: this bomb plants a part-named file
    // into the artifact before throwing — local[32] tasks share the
    // filesystem, so the failure path's re-listing sees a new data file
    // and must conservatively leave the marker. The plant is a VALID
    // schema-compatible parquet file, so the NEXT leg's prior-totals
    // heal can read the directory and actually reach the guarded code
    // (a garbage plant would fail that heal read BEFORE the code under
    // test runs, making the next leg vacuous).
    Seq((100L, "tok", 1L, 1L)).toDF("doc_id", "token", "tf", "dl")
      .coalesce(1).write.parquet(s"$dir/plant-src")
    val plantSrc = new java.io.File(s"$dir/plant-src").listFiles()
      .map(_.getName).find(_.startsWith("part-")).map(n => s"$dir/plant-src/$n").get
    val planting = udf((s: String) => {
      if (s != null) {
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(plantSrc),
          java.nio.file.Paths.get(s"$dir/s", "part-99999-planted.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        throw new RuntimeException("died mid-commit")
      }
      s
    })
    val badPartial = docs.filter(col("doc_id") >= 2).withColumn("text", planting(col("text")))
    intercept[Exception](InvertedIndex.appendScored(badPartial, "doc_id", "text", s"$dir/s"))
    assert(InvertedIndex.appendInProgress(s"$dir/s"),
      "a crash that DID commit keeps demanding recovery")
    assert(InvertedIndex.readTotals(s"$dir/s").isEmpty,
      "a partial commit must not restore a sidecar")
    // a PRE-EXISTING marker (an EARLIER crash's tripwire) must survive a
    // later clean failure: the clean-failure recovery may only clear a
    // marker THIS call raised, never erase evidence of the prior crash
    // (whose partial postings the tripwire exists to flag) — and must
    // not heal-persist a sidecar computed over those partial postings.
    // This call HEALS its prior from the directory (sidecar is gone; the
    // planted file reads fine), raises the marker over the already-up
    // one, then fails cleanly — markerWasUp must suppress both the
    // marker clear and the totals restore.
    intercept[Exception](InvertedIndex.appendScored(badP, "doc_id", "text", s"$dir/s"))
    assert(InvertedIndex.appendInProgress(s"$dir/s"),
      "an earlier crash's marker must survive a later clean failure")
    assert(InvertedIndex.readTotals(s"$dir/s").isEmpty,
      "no sidecar may be persisted while the earlier crash's marker is up")
    // and both artifacts still serve/append correctly after the recovery
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/s", "._graft_bm25_appending"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/s", "part-99999-planted.parquet"))
    InvertedIndex.appendScored(docs.filter(col("doc_id") >= 2), "doc_id", "text", s"$dir/s"): Unit
    assert(!InvertedIndex.appendInProgress(s"$dir/s"))
  }

  test("appendScored: appended index + merged stats equal scratch rebuild exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ii5").toString
    val existing = docs.filter(col("doc_id") < 2)
    val batch = docs.filter(col("doc_id") >= 2) // includes the empty doc 3
    InvertedIndex.buildScored(existing, "doc_id", "text").write.parquet(s"$dir/p")
    val totals0 = InvertedIndex.corpusTotals(spark.read.parquet(s"$dir/p"), "doc_id")
    assert(totals0 == (2L, 6L)) // docs 0,1 — 3 tokens each
    val delta = InvertedIndex.appendScored(batch, "doc_id", "text", s"$dir/p")
    assert(delta == (1L, 2L)) // doc 2 only: the empty doc contributes nothing
    // postings: appended artifact row-identical to a scratch rebuild
    // (sorted-seq compare — a double append would collapse under toSet)
    val appended = spark.read.parquet(s"$dir/p")
      .select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    val scratch = InvertedIndex.buildScored(docs, "doc_id", "text")
      .select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    assert(appended == scratch)
    // stats: the merged delta equals the rebuild's recompute BIT-exactly
    val merged = InvertedIndex.statsOf(InvertedIndex.mergeTotals(totals0, delta))
    val rebuilt = InvertedIndex.corpusStats(
      InvertedIndex.buildScored(docs, "doc_id", "text"), "doc_id")
    assert(merged == rebuilt, s"merged $merged vs rebuilt $rebuilt")
    // and the search served off the appended artifact with merged stats
    // equals the rebuild-then-search ranking
    val viaAppend = InvertedIndex.searchBm25(spark.read.parquet(s"$dir/p"), "doc_id",
      Seq("red", "fox"), topK = 3, stats = Some(merged))
      .as[(Long, Double)].collect().toSeq
    val viaRebuild = InvertedIndex.searchBm25(
      InvertedIndex.buildScored(docs, "doc_id", "text"), "doc_id",
      Seq("red", "fox"), topK = 3)
      .as[(Long, Double)].collect().toSeq
    assert(viaAppend == viaRebuild)
    // the stale-stats failure mode this API closes: searching the
    // appended index with the PRE-append stats mis-scores
    val stale = InvertedIndex.searchBm25(spark.read.parquet(s"$dir/p"), "doc_id",
      Seq("red", "fox"), topK = 3, stats = Some(InvertedIndex.statsOf(totals0)))
      .as[(Long, Double)].collect().toSeq
    assert(stale != viaRebuild, "pre-append stats should visibly mis-score this corpus")
    // statsOf refuses an empty corpus instead of dividing by zero
    val ex = intercept[IllegalArgumentException](InvertedIndex.statsOf((0L, 0L)))
    assert(ex.getMessage.contains("empty corpus"))
  }

  test("totals sidecar: reattach-then-search equals rebuild-then-search across sessions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ii-sc").toString
    val existing = docs.filter(col("doc_id") < 2)
    val batch = docs.filter(col("doc_id") >= 2)
    // build writes the sidecar; append folds the delta into it
    InvertedIndex.materializeScored(existing, "doc_id", "text", s"$dir/p")
    assert(InvertedIndex.readTotals(s"$dir/p").contains((2L, 6L)))
    InvertedIndex.appendScored(batch, "doc_id", "text", s"$dir/p")
    assert(InvertedIndex.readTotals(s"$dir/p").contains((3L, 8L)))
    // the "new session" boundary: attach reads stats from DISK (no
    // in-memory totals involved) and the served ranking equals a scratch
    // rebuild's — the fx16 two-session contract for the index artifact
    val (scored, stats) = InvertedIndex.attachScored(spark, s"$dir/p", "doc_id")
    assert(stats == InvertedIndex.corpusStats(
      InvertedIndex.buildScored(docs, "doc_id", "text"), "doc_id"))
    val viaAttach = InvertedIndex.searchBm25(scored, "doc_id",
      Seq("red", "fox"), topK = 3, stats = Some(stats))
      .as[(Long, Double)].collect().toSeq
    val viaRebuild = InvertedIndex.searchBm25(
      InvertedIndex.buildScored(docs, "doc_id", "text"), "doc_id",
      Seq("red", "fox"), topK = 3)
      .as[(Long, Double)].collect().toSeq
    assert(viaAttach == viaRebuild)
    // healing: a pre-sidecar artifact (or interrupted append) attaches
    // with one exact recompute, persisted for the next session
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/p", "_graft_bm25_totals"))
    val (_, healed) = InvertedIndex.attachScored(spark, s"$dir/p", "doc_id")
    assert(healed == stats)
    assert(InvertedIndex.readTotals(s"$dir/p").contains((3L, 8L)))
    // appendScored onto a pre-sidecar artifact heals prior totals BEFORE
    // appending (never double-counts the batch)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/p", "_graft_bm25_totals"))
    val extra = Seq((4L, "green fox")).toDF("doc_id", "text")
    InvertedIndex.appendScored(extra, "doc_id", "text", s"$dir/p")
    assert(InvertedIndex.readTotals(s"$dir/p").contains((4L, 10L)))
    // first append into an empty path starts totals from zero
    InvertedIndex.appendScored(existing, "doc_id", "text", s"$dir/fresh")
    assert(InvertedIndex.readTotals(s"$dir/fresh").contains((2L, 6L)))
  }

  test("corrupt totals sidecar degrades like a missing one: attach heals, append proceeds") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-ii-corrupt").toString
    InvertedIndex.materializeScored(docs.filter(col("doc_id") < 2), "doc_id", "text", s"$dir/p")
    // three corruption classes: non-numeric, wrong field count, empty
    for (garbage <- Seq("not numbers", "1 2 3", "")) {
      Files.write(Paths.get(s"$dir/p", "_graft_bm25_totals"), garbage.getBytes("UTF-8"))
      assert(InvertedIndex.readTotals(s"$dir/p").isEmpty, s"'$garbage' should read as None")
      val (_, stats) = InvertedIndex.attachScored(spark, s"$dir/p", "doc_id")
      assert(stats == (2L, 3.0)) // healed exactly, and re-persisted
      assert(InvertedIndex.readTotals(s"$dir/p").contains((2L, 6L)))
    }
    // append onto a corrupt sidecar heals the prior instead of throwing
    Files.write(Paths.get(s"$dir/p", "_graft_bm25_totals"), "junk".getBytes("UTF-8"))
    InvertedIndex.appendScored(Seq((4L, "green fox")).toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/p")
    assert(InvertedIndex.readTotals(s"$dir/p").contains((3L, 8L)))
  }

  test("attachScored never heal-persists while an append is in flight (marker window)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-ii-marker").toString
    InvertedIndex.materializeScored(docs.filter(col("doc_id") < 2), "doc_id", "text", s"$dir/p")
    // simulate the append window: marker present, sidecar deleted
    Files.write(Paths.get(s"$dir/p", "._graft_bm25_appending"), Array.emptyByteArray)
    Files.delete(Paths.get(s"$dir/p", "_graft_bm25_totals"))
    val (_, stats) = InvertedIndex.attachScored(spark, s"$dir/p", "doc_id")
    assert(stats == (2L, 3.0)) // computed exactly from what's committed...
    assert(InvertedIndex.readTotals(s"$dir/p").isEmpty,
      "...but NOT persisted: a crash of the in-flight appender would orphan it as stale")
    // the next successful append clears the marker and heals durably
    InvertedIndex.appendScored(Seq((4L, "green fox")).toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/p")
    assert(!Files.exists(Paths.get(s"$dir/p", "._graft_bm25_appending")))
    assert(InvertedIndex.readTotals(s"$dir/p").contains((3L, 8L)))
    val (_, after) = InvertedIndex.attachScored(spark, s"$dir/p", "doc_id")
    assert(after == (3L, 8.0 / 3.0))
  }

  test("attachScored skips the heal-persist while another writer holds the append lock") {
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val dir = Files.createTempDirectory("graft-ii-lockheal").toString
    InvertedIndex.materializeScored(docs.filter(col("doc_id") < 2), "doc_id", "text", s"$dir/p")
    Files.delete(Paths.get(s"$dir/p", "_graft_bm25_totals"))
    // hold the append lock the way a live appendScored does — the
    // unlocked-marker TOCTOU this pins: an append running end-to-end
    // during the attach's corpusTotals job must not have its fresh
    // sidecar clobbered by the attach's stale heal, so the heal-persist
    // takes a NON-BLOCKING grab of the same lock and skips when held
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(s"$dir/p", "._graft_totals.lock"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val lock = ch.lock()
    try {
      val (_, stats) = InvertedIndex.attachScored(spark, s"$dir/p", "doc_id")
      assert(stats == (2L, 3.0)) // computed exactly...
      assert(InvertedIndex.readTotals(s"$dir/p").isEmpty,
        "...but not persisted while a writer holds the lock")
    } finally { lock.release(); ch.close() }
    // lock released: the next attach heals durably
    val (_, after) = InvertedIndex.attachScored(spark, s"$dir/p", "doc_id")
    assert(after == (2L, 3.0))
    assert(InvertedIndex.readTotals(s"$dir/p").contains((2L, 6L)))
  }

  test("racing appendScored calls serialize under the append lock; totals stay exact") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-ii-race").toString
    InvertedIndex.buildScored(docs.filter(col("doc_id") < 2), "doc_id", "text")
      .write.parquet(s"$dir/p")
    // two concurrent appends of disjoint batches: without the lock each
    // would fold only its own delta over the same prior and the last
    // sidecar rename would win, silently missing the other's delta
    val batches = Seq(
      Seq((10L, "alpha beta"), (11L, "gamma")),
      Seq((20L, "delta epsilon zeta")))
    val threads = batches.map { b =>
      new Thread(() => {
        InvertedIndex.appendScored(b.toDF("doc_id", "text"), "doc_id", "text", s"$dir/p")
        ()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    // totals reflect BOTH deltas: 2 base docs (6 tokens) + 3 appended (6)
    assert(InvertedIndex.readTotals(s"$dir/p").contains((5L, 12L)))
    assert(InvertedIndex.corpusTotals(spark.read.parquet(s"$dir/p"), "doc_id") == (5L, 12L))
  }

  test("materialize roundtrips through parquet and searches off the artifact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ii").toString
    val p = InvertedIndex.materialize(docs, "doc_id", "text", s"$dir/postings")
    assert(p.count() == 7)
    assert(InvertedIndex.searchAll(p, "doc_id", Seq("red", "dog"))
      .as[Long].collect().toSet == Set(1L))
  }
}
