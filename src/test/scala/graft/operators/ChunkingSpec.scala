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
