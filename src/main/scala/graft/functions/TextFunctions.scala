package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Text-analysis column builders for large-scale training-data pipelines.
  *
  * The reference has no scalar function library — all row logic is user
  * lambdas (SURVEY §2.7) — so these are engine-native additions. The
  * scalar builders are backed by native Catalyst expressions with tight
  * primitive scan loops (CodegenFallback, same pattern as
  * [[graft.operators.Dedup.ShingleHashes]]): the higher-order-function
  * formulations (`filter`/`aggregate` with Column lambdas) interpret a
  * lambda per token/char, which the 10× scale probe showed becoming the
  * dominant per-row cost. Either way the shape survives a 100 TB scan —
  * per-row expressions, no shuffle, no driver involvement, column pruning
  * intact — the native bodies just make the scan compute-cheap.
  *
  * Tokenization semantics (all scalar functions): single-space splitting
  * with empty tokens removed — `filter(split(text, " "), _ =!= "")` — so
  * token character counts are exactly the non-space character count.
  */
object TextFunctions {

  /** Shared scan: invoke `f(start, end)` for each maximal non-space run. */
  private def eachToken(s: String)(f: (Int, Int) => Unit): Unit = {
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) != ' ') {
        var j = i
        while (j < n && s.charAt(j) != ' ') j += 1
        f(i, j)
        i = j
      } else i += 1
    }
  }

  /** Native token statistic over a text column — one pass, no per-token
    * lambda interpretation, no token array materialization (and for
    * `mode = Distinct` only, one substring per token into a hash set).
    */
  private[functions] object ScanMode {
    val Count = 0 // number of tokens
    val Distinct = 1 // number of distinct tokens (exact, string equality)
    val LenSum = 2 // sum of token lengths in CODE POINTS (DuckDB len()
    // counts code points, not UTF-16 units — same parity rule as
    // RollingHashExpr; equal for BMP-only text)
  }

  private[functions] case class TokenScan(child: Expression, mode: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = if (mode == ScanMode.LenSum) LongType else IntegerType
    override def prettyName: String = mode match {
      case ScanMode.Count => "token_count"
      case ScanMode.Distinct => "distinct_token_count"
      case _ => "token_len_sum"
    }

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      mode match {
        case ScanMode.Count =>
          var c = 0
          eachToken(s)((_, _) => c += 1)
          c
        case ScanMode.Distinct =>
          val seen = new java.util.HashSet[String]()
          eachToken(s)((i, j) => { seen.add(s.substring(i, j)): Unit })
          seen.size()
        case _ =>
          var c = 0L
          eachToken(s)((i, j) => c += s.codePointCount(i, j))
          c
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Native stopword-hit counter: per token one hash-set membership test
    * (vs an interpreted `isInCollection` lambda per token).
    */
  private[functions] case class StopwordHits(child: Expression, words: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "stopword_hits"

    @transient private lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var c = 0
      eachToken(s)((i, j) => if (set.contains(s.substring(i, j))) c += 1)
      c
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Native polynomial rolling hash over every character (spaces
    * included), `acc = (acc * 31 + codepoint) mod 1e9+7` — the same fold
    * the DuckDB oracle replays with `list_reduce` over
    * `string_split(text, '')`, which yields one element per CODE POINT.
    * The scan therefore iterates code points, not UTF-16 units: a
    * non-BMP character (emoji, CJK extension) is one term in both
    * engines. Accumulator < 2^30 and codepoint < 2^21, so
    * `acc * 31 + cp` stays far below 2^63.
    */
  private[functions] case class RollingHashExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct space-joined word n-grams in one scan — the
    * decontamination primitive. The HOF formulation
    * (`transform(sequence(...), i => array_join(slice(...)))`) interprets
    * four nested Column lambdas per gram; this builds each gram with one
    * StringBuilder pass over precomputed token boundaries (matches
    * `list_distinct(list_transform(range(...), i -> array_to_string(
    * ts[i:i+n-1], ' ')))` over empty-filtered tokens in the oracle).
    */
  case class WordNGrams(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, s"word_ngrams: n must be >= 1, got $n")
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String

    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def prettyName: String = "word_ngrams"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val starts = new scala.collection.mutable.ArrayBuffer[Int]
      val ends = new scala.collection.mutable.ArrayBuffer[Int]
      eachToken(s) { (a, b) => starts += a; ends += b }
      val m = starts.length - n + 1
      if (m <= 0) new GenericArrayData(Array.empty[Any])
      else {
        val seen = new java.util.HashSet[String](m * 2)
        val out = new scala.collection.mutable.ArrayBuffer[Any](m)
        var j = 0
        val sb = new java.lang.StringBuilder
        while (j < m) {
          sb.setLength(0)
          var t = j
          while (t < j + n) {
            if (t > j) sb.append(' ')
            sb.append(s, starts(t), ends(t))
            t += 1
          }
          val gram = sb.toString
          if (seen.add(gram)) out += UTF8String.fromString(gram)
          j += 1
        }
        new GenericArrayData(out.toArray)
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All six repetition counters in ONE pass over the text — the Gopher
    * quality signals are per-document, so no shuffle is ever needed: a
    * (doc, term) groupBy formulation would shuffle every distinct term
    * occurrence in the corpus just to compute row-local counts. One
    * per-row hash map (bounded by document length) replaces all of it.
    * Fields: n_words, n_distinct, top_cnt (max unigram multiplicity),
    * sum_len (non-space chars), n_bigrams, top_bi_cnt.
    */
  private[graft] case class RepetitionScan(child: Expression)
      extends UnaryExpression with CodegenFallback {
    import org.apache.spark.sql.types.StructField

    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("top_cnt", LongType, nullable = false),
      StructField("sum_len", LongType, nullable = false),
      StructField("n_bigrams", LongType, nullable = false),
      StructField("top_bi_cnt", LongType, nullable = false)))
    override def prettyName: String = "repetition_scan"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      val uni = new java.util.HashMap[String, Long]()
      val bi = new java.util.HashMap[String, Long]()
      var nWords = 0L
      var sumLen = 0L
      var topCnt = 0L
      var topBi = 0L
      var prev: String = null
      eachToken(s) { (a, b) =>
        val w = s.substring(a, b)
        nWords += 1
        sumLen += s.codePointCount(a, b) // code points — DuckDB len() parity
        val c = uni.merge(w, 1L, (x, y) => x + y)
        if (c > topCnt) topCnt = c
        if (prev != null) {
          val g = prev + " " + w
          val cb = bi.merge(g, 1L, (x, y) => x + y)
          if (cb > topBi) topBi = cb
        }
        prev = w
      }
      val nBigrams = if (nWords >= 2) nWords - 1 else 0L
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](nWords, uni.size.toLong, topCnt, sumLen, nBigrams, topBi))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Struct of repetition counters (see [[RepetitionScan]]). */
  def repetitionScan(text: Column): Column =
    graftbridge.column(RepetitionScan(graftbridge.expression(text)))

  /** Per-document n-gram → count map in ONE narrow pass (same tokenizer
    * as [[WordNGrams]]/[[RepetitionScan]]; n = 1 is plain tokens): the
    * upstream primitive for corpus-LM scoring
    * ([[graft.operators.QualityFilters.unigramLogProb]]), TF-IDF and
    * gram statistics. `explode`-ing the map is narrow, so per-doc
    * counts reach downstream aggregations WITHOUT the (doc, gram)
    * shuffle that an `explode(grams) → groupBy(doc, gram)` formulation
    * pays — and a per-gram doc frequency becomes a plain `count(*)`
    * instead of a `count(DISTINCT doc_id)` two-phase agg (each (doc,
    * gram) appears exactly once after the map-explode).
    */
  private[graft] case class TokenCountsScan(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, s"token_counts: n must be >= 1, got $n")
    import org.apache.spark.unsafe.types.UTF8String

    override def dataType: DataType =
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, LongType, valueContainsNull = false)
    override def prettyName: String = "token_counts"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val m = new java.util.LinkedHashMap[String, Long]()
      if (n == 1) {
        eachToken(s) { (a, b) => m.merge(s.substring(a, b), 1L, (x, y) => x + y): Unit }
      } else {
        val starts = new scala.collection.mutable.ArrayBuffer[Int]
        val ends = new scala.collection.mutable.ArrayBuffer[Int]
        eachToken(s) { (a, b) => starts += a; ends += b }
        val gmax = starts.length - n + 1
        var j = 0
        val sb = new java.lang.StringBuilder
        while (j < gmax) {
          sb.setLength(0)
          var t = j
          while (t < j + n) {
            if (t > j) sb.append(' ')
            sb.append(s, starts(t), ends(t))
            t += 1
          }
          m.merge(sb.toString, 1L, (x, y) => x + y)
          j += 1
        }
      }
      val keys = new Array[Any](m.size)
      val vals = new Array[Any](m.size)
      var i = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        keys(i) = UTF8String.fromString(e.getKey)
        vals(i) = e.getValue
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, vals)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** token → count map per document (see [[TokenCountsScan]]). */
  def tokenCounts(text: Column): Column =
    graftbridge.column(TokenCountsScan(graftbridge.expression(text), 1))

  /** space-joined word n-gram → count map per document. */
  def tokenGramCounts(text: Column, n: Int): Column =
    graftbridge.column(TokenCountsScan(graftbridge.expression(text), n))

  /** Within-document repeated-segment removal (Gopher-style "dedup lines
    * within a doc"): split on `delim`, keep each segment's FIRST
    * occurrence (order preserved), rejoin — plus the dropped-segment
    * count. One pass, one per-row LinkedHashSet; empty segments (runs of
    * the delimiter) are removed, matching the tokenizer's semantics.
    */
  private[graft] case class SegmentDedup(child: Expression, delim: Char)
      extends UnaryExpression with CodegenFallback {
    import org.apache.spark.sql.types.{IntegerType => IntT, StringType, StructField}
    import org.apache.spark.unsafe.types.UTF8String

    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      StructField("clean", StringType, nullable = false),
      StructField("n_dropped", IntT, nullable = false)))
    override def prettyName: String = "segment_dedup"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val seen = new java.util.LinkedHashSet[String]()
      var total = 0
      var i = 0
      val n = s.length
      while (i < n) {
        if (s.charAt(i) != delim) {
          var j = i
          while (j < n && s.charAt(j) != delim) j += 1
          total += 1
          seen.add(s.substring(i, j))
          i = j
        } else i += 1
      }
      val sb = new java.lang.StringBuilder
      val it = seen.iterator()
      while (it.hasNext) {
        if (sb.length > 0) sb.append(delim)
        sb.append(it.next())
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(sb.toString), total - seen.size))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Struct (clean, n_dropped) of [[SegmentDedup]] over `delim`. */
  def dedupSegments(text: Column, delim: Char = ' '): Column =
    graftbridge.column(SegmentDedup(graftbridge.expression(text), delim))

  def wordNGrams(text: Column, n: Int): Column =
    graftbridge.column(WordNGrams(graftbridge.expression(text), n))
  // (the former non-distinct wordNGramsAll variant is gone: multiplicity
  // consumers moved to [[tokenCounts]]/[[tokenGramCounts]], which carry
  // the count instead of repeating the gram)

  /** Whitespace tokens (empty tokens removed). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** BPE-style pre-tokenizer token count: letter runs, short digit runs
    * (BPE vocabularies chunk numbers), and punctuation runs — the
    * pattern uses only character classes so the RE2 (DuckDB oracle) and
    * Java (Spark) regex engines agree byte-for-byte. A real tokenizer's
    * merge table refines WITHIN these pre-tokens, so this count is the
    * standard pre-tokenization upper-bound used for corpus budgeting.
    */
  // whitespace class spelled explicitly: Java's \s includes vertical tab
  // (\x0B), RE2's (DuckDB's) does not — with \s in the pattern, any
  // document containing a VT diverges from the oracle
  val bpePattern = "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9 \\t\\n\\f\\r]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0))).cast("long")

  def tokenCount(text: Column): Column =
    graftbridge.column(TokenScan(graftbridge.expression(text), ScanMode.Count))

  def distinctTokenCount(text: Column): Column =
    graftbridge.column(TokenScan(graftbridge.expression(text), ScanMode.Distinct))

  /** Mean token length; null-safe for empty docs. */
  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(
        graftbridge.column(TokenScan(graftbridge.expression(text), ScanMode.LenSum))
          .cast("double") / n)
  }

  /** Count of tokens contained in `words` (stopword-list hit count). */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    graftbridge.column(StopwordHits(graftbridge.expression(text), words))

  /** Share of tokens that are stopwords — a standard quality signal. */
  def stopwordRatio(text: Column, words: Seq[String]): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(stopwordCount(text, words).cast("double") / n)
  }

  /** Deterministic polynomial rolling hash over characters,
    * `acc = (acc * 31 + codepoint) mod 1e9+7` — a document fingerprint
    * reproducible in any engine with 64-bit integer arithmetic (the DuckDB
    * oracle replays it with `list_reduce`).
    */
  def rollingHash(text: Column): Column =
    graftbridge.column(RollingHashExpr(graftbridge.expression(text)))

  /** Overlapping word n-gram shingles (distinct), the MinHash input.
    * Guarded for docs shorter than n tokens (Spark's `sequence` would
    * otherwise generate a descending range).
    */
  def wordShingles(text: Column, n: Int): Column = {
    // empty tokens filtered, per the module's tokenization contract —
    // raw split on a double/leading/trailing space yields "" tokens,
    // producing shingles the native WordNGrams path would never emit
    val ts = filter(split(text, " "), t => t =!= "")
    when(size(ts) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(ts) - (n - 1)), i => array_join(slice(ts, i, lit(n)), " "))))
  }

  /** Overlapping character n-gram shingles (distinct). */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), length(text) - (n - 1)), i => text.substr(i, lit(n)))))

  /** Exact Jaccard similarity of two pre-distinct string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Canonical text normalization — the preprocessing step ahead of
    * exact dedup / fingerprinting so trivially-different copies ("The
    * Cat." vs "the cat") collapse: lowercase, non-alphanumerics to
    * spaces, whitespace collapsed, trimmed. Pure Column expressions
    * (codegen'd, scan-stage, zero shuffles); the regexes are
    * char-class-only so Java and the DuckDB oracle agree exactly.
    * Unicode canonicalization (NFC) is deliberately out: ICU-version
    * parity across engines is not testable here.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  // ---- language identification (token-profile heuristic) ----

  /** Per-language stopword profiles. Deliberately small and fixed: the
    * heuristic is score = occurrences of the language's profile tokens,
    * argmax with a fixed priority tie-break — fully reproducible in SQL.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "los", "las", "y", "una", "es", "para", "como", "pero", "sus"),
    "fr" -> Seq("le", "les", "et", "est", "pour", "dans", "que", "qui", "pas", "vous"))

  /** Score columns for each profile, in [[langProfiles]] order. */
  def langScores(text: Column): Seq[(String, Column)] =
    langProfiles.map { case (lang, words) => lang -> stopwordCount(text, words) }

  /** Predicted language: first profile (in declaration order) whose score
    * is positive and >= all later profiles' scores; `und` when no profile
    * hits. The CASE chain is the spec — the oracle replays it verbatim.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val cols = scores.map(_._2)
    scores.zipWithIndex.foldRight(lit("und")) { case (((lang, s), i), elseCol) =>
      val geRest = cols.drop(i + 1).foldLeft(s > 0)((acc, other) => acc && s >= other)
      when(geRest, lit(lang)).otherwise(elseCol)
    }
  }

  /** Composite quality score in [0,1]:
    * `0.7 * min(n_tokens,100)/100 + 0.3 * en-stopword-ratio`, rounded to 4
    * decimals — a simple, reproducible stand-in for a trained quality
    * classifier.
    */
  def qualityScore(text: Column): Column = {
    val en = langProfiles.head._2
    round(
      least(tokenCount(text), lit(100)).cast("double") / 100 * 0.7 +
        stopwordRatio(text, en) * 0.3,
      4)
  }
}
