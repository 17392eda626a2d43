package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strided token-window chunking — the long-document splitter a RAG
  * index or a fixed-context pretraining pipeline runs before packing:
  * a document becomes overlapping chunks of at most `chunkSize` tokens,
  * each tagged with its chunk index and token count.
  *
  * Chunk i covers token offsets `[i·stride, min(i·stride + chunkSize,
  * n))`; starts are 0, stride, 2·stride, … while start < n, so every
  * token lands in at least one chunk and consecutive chunks overlap by
  * `chunkSize − stride` tokens. Tokens are the whitespace split
  * (TextFunctions' convention); chunk text re-joins with single spaces —
  * byte-exact against a list-slice replay (the d14 contract). Tokenless
  * documents produce no chunks.
  *
  * Scale shape: whole-stage codegen end to end — split, a ~n/stride
  * start sequence, explode, slice + array_join per chunk; builtins
  * suffice (no custom expression) because per-doc work is
  * O(n · chunkSize/stride), a bounded constant factor over the text —
  * unlike d14's stride-1 windows, which warranted the native one-pass
  * [[graft.functions.TextFunctions]] expression. Nothing shuffles.
  */
object Chunking {

  /** Fill-in-the-middle split — the FIM pretraining transform: each
    * document divides into (prefix, middle, suffix) token spans, the
    * middle chosen DETERMINISTICALLY from the document id (the
    * splitmix64 bucket SCALED onto the valid start range —
    * `bucket · range / 10^6`, which covers the WHOLE document at any
    * length with ≤ range/10^6 per-position granularity, where a plain
    * `bucket mod range` would hard-cap starts below the 10^6 bucket
    * space and never pick the second half of a very long document), so
    * the split is a pure function of (id, seed, middleLen): auditable,
    * stable under partitioning and re-runs, and replayable by any
    * engine — where an RNG-per-row transform would re-split differently
    * every run. The middle clamps to the document length; tokenless
    * documents are dropped (nothing to split). Empty prefix/suffix
    * (middle at either edge) come out as empty strings.
    *
    * Scale shape: one whole-stage-codegen span (split → hash → three
    * slices + joins), zero exchanges — the t10 class.
    */
  def fimSplit(df: DataFrame, idCol: String, textCol: String,
      middleLen: Int, seed: Long = 42L): DataFrame = {
    require(middleLen > 0, s"middleLen must be positive, got $middleLen")
    import graft.functions.HashFunctions.hashBucket
    val toks = filter(split(coalesce(col(textCol), lit("")), " "), t => t =!= "")
    val n = col("__n")
    val l = least(lit(middleLen), n)
    val start = (hashBucket(col(idCol), Sampling.Buckets, seed) * (n - l + 1)
      / Sampling.Buckets).cast("int")
    df.withColumn("__ts", toks)
      .withColumn("__n", size(col("__ts")))
      .filter(n > 0)
      .withColumn("__l", l)
      .withColumn("__st", start)
      .select(col(idCol),
        n.as("n_tokens"),
        col("__st").as("start"),
        array_join(slice(col("__ts"), lit(1), col("__st")), " ").as("prefix"),
        array_join(slice(col("__ts"), col("__st") + 1, col("__l")), " ").as("middle"),
        array_join(slice(col("__ts"), col("__st") + col("__l") + 1,
          n - col("__st") - col("__l")), " ").as("suffix"))
  }

  /** Returns (idCol, chunk_ix, n_tokens, chunkCol) rows, exploded in
    * the scan stage.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int, chunkCol: String = "chunk"): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks = filter(split(coalesce(col(textCol), lit("")), " "), t => t =!= "")
    val start = col("__ix") * stride
    df.withColumn("__ts", toks)
      .withColumn("__n", size(col("__ts")))
      .filter(col("__n") > 0)
      .withColumn("__ix",
        explode(sequence(lit(0), floor((col("__n") - 1) / lit(stride)).cast("int"))))
      .select(col(idCol),
        col("__ix").as("chunk_ix"),
        least(lit(chunkSize), col("__n") - start).as("n_tokens"),
        array_join(slice(col("__ts"), start + 1, lit(chunkSize)), " ").as(chunkCol))
  }
}
