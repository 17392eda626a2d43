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
