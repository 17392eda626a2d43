package graft.operators

import graft.SparkSuite

class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  test("chunkDocuments: hand-checked strided windows with a short tail") {
    val df = Seq((1L, "a b c d e f g")).toDF("id", "text")
    // size 3, stride 2 → starts 0/2/4/6: [a b c] [c d e] [e f g] [g]
    val out = Chunking.chunkDocuments(df, "id", "text", chunkSize = 3, stride = 2)
      .as[(Long, Int, Int, String)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "c d e"), (1L, 2, 3, "e f g"), (1L, 3, 1, "g")))
  }

  test("fimSplit: spans recombine to the original stream; start replays from the hash") {
    import org.apache.spark.sql.functions.col
    val texts = Map(1L -> "a b c d e f", 2L -> "x")
    val df = (texts.toSeq ++ Seq((3L, ""), (4L, null: String))).toDF("id", "text")
    val out = Chunking.fimSplit(df, "id", "text", middleLen = 3, seed = 7L)
      .as[(Long, Int, Int, String, String, String)].collect().map(r => r._1 -> r).toMap
    // tokenless docs emit nothing
    assert(out.keySet == Set(1L, 2L))
    out.values.foreach { case (id, n, st, p, m, sfx) =>
      // the three spans concatenate back to the exact token stream
      assert(Seq(p, m, sfx).filter(_.nonEmpty).mkString(" ") == texts(id))
      assert(n == texts(id).split(" ").length)
      val l = math.min(3, n)
      assert(m.split(" ").count(_.nonEmpty) == l && st >= 0 && st <= n - l)
    }
    // a single-token doc: the middle IS the doc, edges empty
    assert(out(2L)._4 == "" && out(2L)._5 == "x" && out(2L)._6 == "")
    // the start is the operator's own hash SCALED onto the valid range
    // (bucket · range / 10^6 — full-document coverage at any length) —
    // a pure function of (id, seed, len)
    val bucket = df.filter(col("id") === 1L)
      .select(graft.functions.HashFunctions.hashBucket(col("id"), Sampling.Buckets, 7L))
      .as[Long].head()
    assert(out(1L)._3 == (bucket * (6 - 3 + 1) / Sampling.Buckets).toInt)
    intercept[IllegalArgumentException](Chunking.fimSplit(df, "id", "text", 0))
  }

  test("chunkDocuments: stride == size partitions the tokens exactly; degenerate inputs") {
    val df = Seq((1L, "t1 t2 t3 t4 t5"), (2L, ""), (3L, null: String), (4L, "  "))
      .toDF("id", "text")
    val out = Chunking.chunkDocuments(df, "id", "text", chunkSize = 2, stride = 2)
      .as[(Long, Int, Int, String)].collect()
    // tokenless docs (empty, null, whitespace-only) produce no chunks
    assert(out.forall(_._1 == 1L))
    // disjoint chunks reassemble the original token stream
    assert(out.sortBy(_._2).map(_._4).mkString(" ") == "t1 t2 t3 t4 t5")
    assert(out.map(_._3).sum == 5)
    intercept[IllegalArgumentException](
      Chunking.chunkDocuments(df, "id", "text", chunkSize = 2, stride = 3))
  }
}
