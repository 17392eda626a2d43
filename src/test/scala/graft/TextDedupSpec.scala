package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Specs for the LLM-pipeline text analysis and dedup operators. */
class TextDedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents").cache()

  test("simhash blocking refuses maxHamming > 3 and tolerates null text") {
    import graft.operators.Dedup
    intercept[IllegalArgumentException](
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 4))
    val withNull = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, null: String))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(withNull, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // null row dropped, no NPE
  }

  test("connectedComponents rejects non-integral id columns loudly") {
    import graft.operators.Dedup
    val strPairs = Seq(("a", "b")).toDF("x", "y")
    intercept[IllegalArgumentException](
      Dedup.connectedComponents(strPairs, "x", "y"))
  }

  test("tokenCount / distinctTokenCount / avgTokenLen match Scala oracle") {
    val rows = docs.select(col("text"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.distinctTokenCount(col("text")).as("d"),
      TextFunctions.avgTokenLen(col("text")).as("avg")).collect()
    rows.foreach { r =>
      val toks = r.getString(0).split(" ").filter(_.nonEmpty)
      assert(r.getInt(1) == toks.length)
      assert(r.getInt(2) == toks.distinct.length)
      assert(math.abs(r.getDouble(3) - toks.map(_.length).sum.toDouble / toks.length) < 1e-12)
    }
  }

  test("rollingHash matches Scala reference implementation") {
    def ref(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val rows = docs.limit(20).select(col("text"), TextFunctions.rollingHash(col("text")).as("fp")).collect()
    rows.foreach(r => assert(r.getLong(1) == ref(r.getString(0))))
  }

  test("rollingHash folds CODE POINTS — non-BMP chars match the oracle's per-codepoint split") {
    // DuckDB's string_split(text, '') yields one element per code point,
    // so a surrogate pair (emoji U+1F600) must contribute ONE term with
    // its full code point value, not two UTF-16 units.
    def refCp(s: String): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i); acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
    val samples = Seq("a😀b", "😀", "汉字 😀 mix", "plain ascii")
    val got = samples.toDF("text")
      .select(col("text"), TextFunctions.rollingHash(col("text")).as("fp")).collect()
    got.foreach(r => assert(r.getLong(1) == refCp(r.getString(0))))
    // and the emoji case genuinely differs from a UTF-16-unit fold
    def refUtf16(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    assert(refCp("😀") != refUtf16("😀"))
  }

  test("native token scans handle empty / multi-space / null edge cases") {
    val df = Seq[String]("", " ", "  a  a b ", "a", null).toDF("text").select(
      col("text"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.distinctTokenCount(col("text")).as("d"),
      TextFunctions.avgTokenLen(col("text")).as("avg"),
      TextFunctions.stopwordCount(col("text"), Seq("a", "the")).as("stop"),
      TextFunctions.rollingHash(col("text")).as("fp"))
    val got = df.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) -1 else r.getInt(1), if (r.isNullAt(2)) -1 else r.getInt(2),
      if (r.isNullAt(3)) -1.0 else r.getDouble(3), if (r.isNullAt(4)) -1 else r.getInt(4),
      if (r.isNullAt(5)) -1L else r.getLong(5))).toSeq
    def ref(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    assert(got(0) == (("", 0, 0, 0.0, 0, 0L)))
    assert(got(1) == ((" ", 0, 0, 0.0, 0, ref(" "))))
    assert(got(2) == (("  a  a b ", 3, 2, 1.0, 2, ref("  a  a b "))))
    assert(got(3) == (("a", 1, 1, 1.0, 1, ref("a"))))
    assert(got(4) == ((null, -1, -1, -1.0, -1, -1L))) // null in -> null out
  }

  test("wordShingles produce n-grams; short docs yield empty array") {
    val df = Seq("a b c d", "x y", "").toDF("text")
      .select(TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b c", "b c d"))
    assert(got(1) == Set.empty)
    assert(got(2) == Set.empty)
  }

  test("langId is deterministic and respects priority tie-break") {
    val df = Seq(
      "the cat is on the mat",     // en hits
      "der hund ist nicht da",     // de hits
      "xyzzy qwerty").toDF("text") // no hits -> und
      .select(TextFunctions.langId(col("text")).as("lang"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de", "und"))
  }

  test("exactDedup keeps min id and counts copies") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "k")
    val got = Dedup.exactDedup(df, "id", Seq("k")).select("k", "id", "n_copies")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("x", 1L, 2L), ("y", 3L, 1L)))
  }

  test("minhashNearDupPairs recovers planted near-dups with exact jaccard >= 0.8") {
    // Ground truth: brute-force exact jaccard over word 3-shingles.
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    // one shingle set per doc, NOT inside the all-pairs loop (binding
    // after the generators would re-tokenize ~2·C(n,2) times)
    val sh = texts.map { case (id, t) => id -> shingles(t) }.toMap
    val truth = (for {
      (ia, _) <- texts; (ib, _) <- texts if ia < ib
      sa = sh(ia); sb = sh(ib)
      if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.8
    } yield (ia, ib)).toSet

    val got = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == truth, s"minhash pairs ${got.size} vs truth ${truth.size}")
    assert(truth.nonEmpty, "test data should contain planted near-dups")
  }

  test("simhash is deterministic; near-dup pairs cover the exact duplicates") {
    assert(Dedup.simhash64("a b c") == Dedup.simhash64("a b c"))
    // identical docs must collide at hamming 0
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(df, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("hot-bucket guard drops oversized buckets and reports them via dropMetrics") {
    // 60 identical docs (every SimHash chunk bucket has 60 members) plus a
    // small genuine near-dup pair that must survive the guard — a non-empty
    // result also keeps AQE from pruning the CollectMetrics subtree (see
    // Dedup.observeDrops scaladoc)
    val hot = (1L to 60L).map(i => (i, "alpha beta gamma delta")) ++
      Seq((100L, "unique survivor words here"), (101L, "unique survivor words here"))
    val df = hot.toDF("doc_id", "text")
    val obs = org.apache.spark.sql.Observation()
    val guarded = Dedup.simhashNearDupPairs(df, "doc_id", "text",
      maxBucketSize = 50, dropMetrics = Some(obs))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(guarded == Set((100L, 101L)), s"got $guarded") // hot pairs dropped, survivor kept
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] == 4L, s"metrics=$m") // all 4 chunks hot
    assert(m("dropped_members").asInstanceOf[Long] == 240L, s"metrics=$m")

    // Int.MaxValue sentinel restores exact enumeration, and reports 0 drops
    val obs2 = org.apache.spark.sql.Observation()
    val exact = Dedup.simhashNearDupPairs(df, "doc_id", "text",
      maxBucketSize = Int.MaxValue, dropMetrics = Some(obs2))
    assert(exact.count() == 60L * 59 / 2 + 1)
    assert(obs2.get("dropped_buckets").asInstanceOf[Long] == 0L)
  }

  test("qualityScore stays in [0,1]") {
    val vals = docs.select(TextFunctions.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("bpeTokenCount chunks digits, splits punctuation runs, handles empties") {
    import spark.implicits._
    val rows = Seq(
      ("hello world", 2L),       // two letter runs
      ("12345", 2L),             // digit chunking: "123" + "45"
      ("a-b...c", 5L),           // a, -, b, ..., c
      ("", 0L),
      ("  ", 0L),
      ("don't stop", 4L)         // don, ', t, stop
    ).toDF("text", "expected")
    val got = rows.select(col("expected"),
      graft.functions.TextFunctions.bpeTokenCount(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(0), r.toString))
  }

  test("connectedComponents resolves chains and cliques to min-id labels") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3: needs multiple label passes), a
    // 3-clique with redundant edges, and an isolated pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val comp = graft.operators.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents on an empty pair list returns no rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.operators.Dedup.connectedComponents(empty, "doc_a", "doc_b").count() == 0)
  }

  test("dedupSegments keeps first occurrences in order; multi-space/empty/null edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a c b a"),
      (2L, "  x   x  "),
      (3L, "all unique words here"),
      (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val d = TextFunctions.dedupSegments(col("text"))
    val got = df.select(col("id"), d.getField("clean"), d.getField("n_dropped"))
      .as[(Long, Option[String], Option[Int])].collect().sortBy(_._1)
    assert(got(0) == ((1L, Some("a b c"), Some(3))))
    assert(got(1) == ((2L, Some("x"), Some(1))))
    assert(got(2) == ((3L, Some("all unique words here"), Some(0))))
    assert(got(3) == ((4L, Some(""), Some(0))))
    assert(got(4) == ((5L, None, None)))
  }

  test("canonicalKeep keeps the best-scoring cluster member, ties to min id") {
    val corpus = Seq(
      // cluster A: 1,2 identical; 3 is the LONGEST variant (J(1,3)=6/7)
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      // cluster B: identical texts — equal score, tie breaks to min id
      (10L, "one two three four five six seven"),
      (11L, "one two three four five six seven"),
      // unclustered — must not appear in the output
      (20L, "completely different standalone document nothing shared here")
    ).toDF("doc_id", "text")
    val out = Dedup.canonicalKeep(corpus, "doc_id", "text", length(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 10L -> 10L, 11L -> 10L), out.toString)
    // FRACTIONAL scores must not truncate: a [0,1) classifier score that
    // collapsed to long would tie every member and silently degrade to
    // the min-id keep (doc 1 instead of 2 here)
    val frac = Dedup.canonicalKeep(corpus, "doc_id", "text",
        when(col("doc_id") === 2L, 0.9).otherwise(0.1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(frac(1L) == 2L && frac(3L) == 2L, frac.toString)
  }

  test("incrementalNearDupKeep drops cross-side near-dups, keeps within-batch dups") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val old = Seq(
      (1L, base),
      (2L, "completely different words about something else entirely here now"),
      (3L, "short")).toDF("doc_id", "text")
    val fresh = Seq(
      (101L, base + " x"),                                  // near-dup of old 1 → dropped
      (102L, "a genuinely novel document with its own vocabulary and phrasing"),
      (103L, "a genuinely novel document with its own vocabulary and phrasing"), // dup of 102 WITHIN batch → both kept
      (104L, "hi")).toDF("doc_id", "text")                  // < shingleN tokens → no shingles → kept
    val kept = Dedup.incrementalNearDupKeep(fresh, old, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(102L, 103L, 104L))
  }

  test("bloom incremental exact dedup: exact result even at extreme fpp; bloom bytes roundtrip") {
    import spark.implicits._
    val old = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, null: String)).toDF("doc_id", "text")
    val fresh = Seq(
      (101L, "alpha"),  // exact dup of old 1 → dropped
      (102L, "ALPHA"),  // case differs → kept (exact equality)
      (103L, "delta"), (104L, "epsilon"),
      (105L, null: String)).toDF("doc_id", "text") // null never joins → kept
    // fpp = 0.5: roughly half the novel rows Bloom-collide — the
    // verification join must still produce the exact answer
    val bloom = Dedup.exactKeyBloom(old, Seq("text"), expectedItems = 4, fpp = 0.5)
    val kept = Dedup.incrementalExactKeep(fresh, old, Seq("text"), bloom)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(102L, 103L, 104L, 105L))
    // the serialized artifact is self-contained: a byte-copy screens the same
    val kept2 = Dedup.incrementalExactKeep(fresh, old, Seq("text"), bloom.clone())
      .select("doc_id").as[Long].collect().sorted
    assert(kept2.toSeq == kept.toSeq)
    // convenience overload (builds the bloom in place) agrees
    val kept3 = Dedup.incrementalExactKeep(fresh, old, Seq("text"), 0L, 0.01)
      .select("doc_id").as[Long].collect().sorted
    assert(kept3.toSeq == kept.toSeq)
  }

  test("bloom screen prunes: a never-seen batch reaches the corpus join with zero candidates") {
    import spark.implicits._
    val old = (1L to 200L).map(i => (i, s"existing doc number $i")).toDF("doc_id", "text")
    val fresh = (1001L to 1050L).map(i => (i, s"novel doc $i")).toDF("doc_id", "text")
    val bloom = Dedup.exactKeyBloom(old, Seq("text"), expectedItems = 200, fpp = 0.001)
    // at fpp=0.001 and 50 novel rows, P(any FP) ≈ 5% — assert the probe
    // itself: candidate count is what the corpus-side semi join sees
    val candidates = fresh.filter(graft.operators.Dedup
      .bloomMightContain(bloom, Seq("text"))).count()
    assert(candidates == 0L, s"expected zero Bloom candidates, got $candidates")
    val kept = Dedup.incrementalExactKeep(fresh, old, Seq("text"), bloom).count()
    assert(kept == 50L)
  }

  test("persisted minhash sketch: parquet-roundtripped sketch screens identically to direct incremental") {
    val docsAll = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val batch = docsAll.filter(col("doc_id") % 10 === 7)
    val existing = docsAll.filter(col("doc_id") % 10 =!= 7)
    val direct = Dedup.incrementalNearDupKeep(batch, existing, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // steady state: sketch the corpus once, save, read back, screen
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch").toString
    Dedup.minhashSketch(existing, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val viaSketch = Dedup.incrementalNearDupKeepWithSketch(
      batch, spark.read.parquet(dir), existing, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaSketch == direct)
    assert(direct.nonEmpty, "fixture must keep at least one batch doc")
  }

  test("releaseCheckpoints frees checkpoint storage embedded in a result plan") {
    import org.apache.spark.sql.graftbridge
    import org.apache.spark.storage.StorageLevel
    val ck = Seq(1L, 2L, 3L).toDF("v").localCheckpoint()
    // derived frame hides the checkpoint behind a mapPartitions lineage —
    // the walker must find the persisted PARENT, not just the plan leaf
    val derived = spark.createDataFrame(ck.rdd.mapPartitions(identity), ck.schema)
    // assert on THIS test's persisted ancestors specifically — suites run
    // in parallel, so a global getPersistentRDDs diff races other tests
    def persistedAncestors(r: org.apache.spark.rdd.RDD[_]): Seq[org.apache.spark.rdd.RDD[_]] =
      (if (r.getStorageLevel != StorageLevel.NONE) Seq(r) else Seq.empty) ++
        r.dependencies.flatMap(d => persistedAncestors(d.rdd))
    val roots = derived.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    val persisted = roots.flatMap(persistedAncestors)
    assert(persisted.nonEmpty, "localCheckpoint should have registered persistent storage")
    assert(graftbridge.releaseCheckpoints(derived) >= 1)
    persisted.foreach(r =>
      assert(r.getStorageLevel == StorageLevel.NONE,
        s"release should unpersist RDD ${r.id}"))
    // the consumed pipeline result releases its matched-id checkpoint too
    val oldDocs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val fresh = Seq((2L, "totally different tokens only here")).toDF("doc_id", "text")
    val res = Dedup.incrementalNearDupKeep(fresh, oldDocs, "doc_id", "text")
    res.collect()
    assert(graftbridge.releaseCheckpoints(res) >= 1)
  }

  test("sharedSpans finds cross-doc windows, skips short docs, counts occurrences") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over it"),   // shares "the quick brown fox" with 1
      (1L, "see the quick brown fox run"),
      (2L, "the quick brown fox the quick brown fox"), // span twice WITHIN one doc
      (3L, "short doc"),                            // < window → zero spans
      (4L, "completely unrelated words right here now")
    ).toDF("doc_id", "text")
    val got = Dedup.sharedSpans(docs, "doc_id", "text", window = 4, minDocs = 2)
      .select("span", "n_docs", "n_occurrences", "first_doc")
      .as[(String, Long, Long, Long)].collect().toSet
    // "the quick brown fox": docs 0, 1, 2 — doc 2 contributes TWO
    // occurrences (overlap-free repeat) but counts once in n_docs
    assert(got.contains(("the quick brown fox", 3L, 4L, 0L)), got.mkString("\n"))
    // spans inside only one document never report, whatever their count
    assert(!got.exists(_._1 == "the quick brown fox the"), "single-doc span leaked")
    // a doc shorter than the window contributes nothing (no descending
    // sequence ghost)
    assert(!got.exists(_._1.contains("short")), got.mkString("\n"))
  }

  test("sharedSpans hashed mode reports the same detections under xxhash64 keys") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "zz alpha beta gamma delta"),
      (2L, "unrelated tokens in this document entirely")
    ).toDF("doc_id", "text")
    val exact = Dedup.sharedSpans(docs, "doc_id", "text", window = 4, minDocs = 2)
      .select("n_docs", "n_occurrences", "first_doc")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val hashed = Dedup.sharedSpans(docs, "doc_id", "text", window = 4, minDocs = 2, hashed = true)
    assert(hashed.columns.contains("span_hash") && !hashed.columns.contains("span"))
    val hs = hashed.select("n_docs", "n_occurrences", "first_doc")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(hs == exact && exact.nonEmpty, s"exact=$exact hashed=$hs")
  }

  test("wordWindows drops empty tokens and joins with single spaces (oracle parity)") {
    // multi-space input: the window text must equal the filtered-token
    // join ("a b c"), NOT the raw char range ("a  b c") — exactly what
    // the DuckDB replay (string_split → filter '' → array_to_string)
    // produces
    val df = Seq((1L, "a  b c  d"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Dedup.wordWindows(col("text"), 3).as("w"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("a b c", "b c d"), got(1L).mkString("|"))
    assert(got(2L).isEmpty && got(3L).isEmpty, s"${got(2L)} ${got(3L)}")
  }

  test("sharedSpans rejects invalid window/minDocs") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Dedup.sharedSpans(df, "doc_id", "text", 0))
    intercept[IllegalArgumentException](Dedup.sharedSpans(df, "doc_id", "text", 2, minDocs = 1))
    intercept[IllegalArgumentException](
      Dedup.sharedSpans(df, "doc_id", "text", 2, hashed = true, hashBits = 96))
    // 128-bit keys without hashed mode is a contradiction — loud, not
    // a silently-ignored argument
    intercept[IllegalArgumentException](
      Dedup.sharedSpans(df, "doc_id", "text", 2, hashed = false, hashBits = 128))
  }

  test("autoBands encodes the weighted S-curve optimum (the autoBits analog)") {
    // pinned reference points at the recall-leaning default fnWeight 0.9
    assert(Dedup.autoBands(64, 0.8) == 8)
    assert(Dedup.autoBands(64, 0.5) == 16)
    assert(Dedup.autoBands(64, 0.9) == 4)
    assert(Dedup.autoBands(128, 0.8) == 16)
    // a LOWER verification threshold wants MORE bands, never fewer
    val bs = Seq(0.3, 0.5, 0.7, 0.9).map(Dedup.autoBands(64, _))
    assert(bs == Seq(32, 16, 16, 4), bs.toString)
    // the equal-weight optimum is precision-leaning vs the recall default
    assert(Dedup.autoBands(64, 0.8, fnWeight = 0.5) <= Dedup.autoBands(64, 0.8))
    // bands always divide numHashes (integral rows per band)
    Seq(16, 64, 128).foreach(nh => assert(nh % Dedup.autoBands(nh, 0.8) == 0))
    intercept[IllegalArgumentException](Dedup.autoBands(1, 0.8))
    intercept[IllegalArgumentException](Dedup.autoBands(64, 1.0))
    intercept[IllegalArgumentException](Dedup.autoBands(64, 0.8, fnWeight = 0.0))
  }

  test("AutoBands is the production default and resolves to the contract keying") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about something else entirely here"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today")
    ).toDF("doc_id", "text")
    // the DEFAULT call (no bands) must be row-identical to explicitly
    // passing the autoBands optimum — the contract IS the default now
    val viaDefault = Dedup.minhashNearDupPairs(corpus, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val viaContract = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
        bands = Dedup.autoBands(64, 0.8))
      .collect().map(_.toSeq).toSet
    assert(viaDefault == viaContract)
    assert(viaDefault.nonEmpty) // exercises the resolved path, not an empty no-op
    // the gates' pinned keying (bands = 16) is one step MORE
    // recall-leaning than the contract optimum — pin that relationship
    // so a silently-moved gate keying is loud
    assert(Dedup.autoBands(64, 0.8) == 8 && 16 > Dedup.autoBands(64, 0.8))
    // nearDedupKeep/canonicalKeep inherit the same default resolution
    val kept = Dedup.nearDedupKeep(corpus, "doc_id", "text")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == Set(1L, 3L), kept.toString) // cluster {1,2,4} keeps min id
    // threshold = 1.0 (exact-dup semantics) stays in the accepted domain
    // under the auto default: identical sets collide in every banding,
    // so auto resolves to ONE band of all hashes (cheapest correct key)
    val exactPairs = Dedup.minhashNearDupPairs(corpus, "doc_id", "text", threshold = 1.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exactPairs == Set((1L, 2L)), exactPairs.toString) // docs 1,2 identical; 4 differs
  }

  test("sharedSpans 128-bit keys agree with exact mode and refine the 64-bit keying") {
    // corpus with genuinely repeated spans AND near-miss spans (one char
    // apart — the planted-collision class a weak second hash would merge)
    val docs = Seq(
      (0L, "the quick brown fox jumps over it"),
      (1L, "see the quick brown fox run"),
      (2L, "the quick brown fox the quick brown fox"),
      (3L, "the quick brown fix jumps over it"),  // 1-char variant of doc 0
      (4L, "see the quick brown fix run"),
      (5L, "completely unrelated words right here now")
    ).toDF("doc_id", "text")
    val exact = Dedup.sharedSpans(docs, "doc_id", "text", window = 4, minDocs = 2)
      .select("n_docs", "n_occurrences", "first_doc")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val h128 = Dedup.sharedSpans(docs, "doc_id", "text", window = 4, minDocs = 2,
      hashed = true, hashBits = 128)
    // struct (h1, h2) key, named like the 64-bit production column
    assert(h128.columns.contains("span_hash") && !h128.columns.contains("span"))
    val hs = h128.select("n_docs", "n_occurrences", "first_doc")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(hs == exact && exact.nonEmpty, s"exact=$exact h128=$hs")
    // refinement contract: h1 of every 128-bit key IS the 64-bit FNV key
    // for the same window, so the 128-bit grouping can only SPLIT a
    // 64-bit false merge, never create one
    val k64 = docs.select(explode(Dedup.wordShingleHashesAll(col("text"), 4)).as("k"))
      .select("k").as[Long].collect().toSet
    val k128h1 = h128.select(col("span_hash.h1")).as[Long].collect().toSet
    assert(k128h1.subsetOf(k64), s"h1 keys not drawn from the 64-bit keying: ${k128h1.diff(k64)}")
    // h2 is INDEPENDENT of h1: across this corpus's distinct windows the
    // (h1 equal → h2 equal) implication must come only from identical
    // spans — near-miss variants differ in BOTH components
    val pairs = docs.select(explode(Dedup.wordWindowHashes128(col("text"), 4)).as("k"))
      .select(col("k.h1"), col("k.h2")).as[(Long, Long)].collect().toSet
    assert(pairs.groupBy(_._1).forall(_._2.size == 1), "same h1 mapped to two h2 values")
    assert(pairs.groupBy(_._2).forall(_._2.size == 1), "same h2 mapped to two h1 values")
  }
}
