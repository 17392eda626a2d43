package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for large-scale training-data pipelines —
  * engine-native additions beyond the reference's surface (the reference
  * has no distinct/dedup operator at all, SURVEY §2.7).
  *
  * Scale design (100 TB): every method is a pure DataFrame pipeline —
  * exact dedup is one hash-shuffle on the group key; MinHash-LSH shuffles
  * only (band, bucket) keys and candidate id-pairs, never the O(n²)
  * product; verification joins are id-equi-joins that AQE can
  * broadcast/skew-split. No driver-side collection anywhere.
  */
object Dedup {

  /** Exact deduplication: one representative (min id) per duplicate group
    * of `keyCols`, with the group size. A single hash aggregation —
    * partial (map-side) combine makes this one shuffle of distinct keys.
    */
  def exactDedup(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  // ---- MinHash + LSH near-duplicate detection ----

  /** Prime just above 2^32 for the universal-hash family
    * `h_i(x) = (a_i * x + b_i) mod P` over 32-bit shingle hashes.
    */
  private val P = 4294967311L

  /** Deterministic (a, b) parameter pairs from a seed (xorshift64*).
    * `a` is capped below 2^31 so `a * h` (h < 2^32) stays under 2^63 —
    * Spark 4 runs ANSI mode and faults on long overflow.
    */
  private def hashParams(k: Int, seed: Long): Seq[(Long, Long)] = {
    var s = seed
    def next(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      math.abs(s * 0x2545F4914F6CDD1DL)
    }
    Seq.fill(k)((next() % ((1L << 31) - 1) + 1, next() % P))
  }

  /** MinHash signature (array of k longs) from a distinct-shingle array
    * column. Pure column expressions: 32-bit base hash per shingle, then
    * k affine min-hashes — O(k·|shingles|) per row, zero shuffle.
    */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column = {
    val base = transform(shingles, s => pmod(xxhash64(s), lit(4294967296L)))
    val sigs = hashParams(numHashes, seed).map { case (a, b) =>
      array_min(transform(base, h => pmod(h * a + b, lit(P))))
    }
    array(sigs: _*)
  }

  /** Banded LSH keys: split the signature into `bands` bands of
    * `numHashes / bands` rows; each band key is the joined slice. Two docs
    * collide when any band matches.
    */
  def bandKeys(sig: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    array((0 until bands).map(j => array_join(slice(sig, j * r + 1, r), ",")): _*)
  }

  /** Near-duplicate pairs by word-shingle MinHash-LSH with exact-Jaccard
    * verification.
    *
    * Pipeline: shingle → signature (narrow) → explode band keys → shuffle
    * on (band, key) → candidate id-pairs (bucket self-join, `a < b`,
    * distinct) → join shingle sets back by id → exact Jaccard filter.
    *
    * `maxBucketSize` drops degenerate buckets (boilerplate/spam clusters)
    * before the quadratic bucket join — the standard guard at scale; at
    * default parameters recall for pairs at `threshold` ≥ 0.8 is
    * 1-(1-j^4)^16 ≈ 1-4e-8 at j=0.9.
    *
    * Output: (doc_a, doc_b, jaccard rounded to 4).
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      maxBucketSize: Int = 1000): DataFrame = {
    val withSets = df
      .select(col(idCol).as("id"), TextFunctions.wordShingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)

    val banded = withSets
      .select(col("id"), posexplode(bandKeys(minhashSignature(col("sh"), numHashes), numHashes, bands)))
      .toDF("id", "band", "key")

    val bucketed = banded
      .groupBy("band", "key")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)

    val candidates = bucketed
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()

    val setsA = withSets.select(col("id").as("a"), col("sh").as("sh_a"))
    val setsB = withSets.select(col("id").as("b"), col("sh").as("sh_b"))
    candidates
      .join(setsA, "a")
      .join(setsB, "b")
      .withColumn("jaccard", TextFunctions.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Character-n-gram variant of [[minhashNearDupPairs]] — robust to word
    * re-segmentation; same LSH machinery over char shingles.
    */
  def ngramJaccardNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val withSets = df
      .select(col(idCol).as("id"), TextFunctions.charShingles(col(textCol), ngram).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = withSets
      .select(col("id"), posexplode(bandKeys(minhashSignature(col("sh"), numHashes), numHashes, bands)))
      .toDF("id", "band", "key")
    val pairs = banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band") && col("x.key") === col("y.key") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val setsA = withSets.select(col("id").as("a"), col("sh").as("sh_a"))
    val setsB = withSets.select(col("id").as("b"), col("sh").as("sh_b"))
    pairs
      .join(setsA, "a").join(setsB, "b")
      .withColumn("jaccard", TextFunctions.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- SimHash near-duplicate detection ----

  /** FNV-1a 64-bit — deterministic token hash for SimHash. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** 64-bit SimHash over whitespace tokens (term frequency weighted by
    * occurrence count through iteration).
    */
  def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    text.split(" ").foreach { t =>
      if (t.nonEmpty) {
        val h = fnv1a64(t)
        var i = 0
        while (i < 64) { if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1; i += 1 }
      }
    }
    var bits = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) bits |= (1L << i); i += 1 }
    bits
  }

  /** SimHash near-dup pairs: per-doc 64-bit sketch (narrow map), candidate
    * generation by blocking on the 4 16-bit chunks (Hamming ≤ 3 ⟹ at
    * least one chunk equal, pigeonhole), verification by `bit_count(xor)`.
    * Shuffles only (chunkIdx, chunkVal) keys — the SimHash analog of LSH
    * banding.
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketches = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, simhash64(text)) }
      .toDF("id", "sim")

    val chunked = sketches.select(
      col("id"), col("sim"),
      posexplode(array((0 until 4).map(j => shiftrightunsigned(col("sim"), j * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("id", "sim", "chunk", "val")

    chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.val") === col("y.val") && col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
