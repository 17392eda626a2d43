package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — the Spark UDAF surface for the reference's
  * fold-style aggregation (`fold(folder, aggrFunc, state)`, reference
  * `DSetGenerics.fs:392-433`; SURVEY §2.7 "fold = UDAF"). These run as
  * partial aggregates (map-side combine) inside Catalyst, unlike the
  * reference's whole-list grouping.
  */
object Aggregators {

  /** Sample variance via (n, Σx, Σx²) — mergeable, one pass. */
  class VarianceAgg extends Aggregator[Double, (Long, Double, Double), Double] {
    override def zero: (Long, Double, Double) = (0L, 0.0, 0.0)
    override def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) =
      (b._1 + 1, b._2 + x, b._3 + x * x)
    override def merge(a: (Long, Double, Double), b: (Long, Double, Double)): (Long, Double, Double) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    override def finish(r: (Long, Double, Double)): Double =
      if (r._1 < 2) Double.NaN
      else (r._3 - r._2 * r._2 / r._1) / (r._1 - 1)
    override def bufferEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k per group: the buffer never exceeds k elements, and
    * partial (map-side) aggregation trims before the shuffle — top-k per
    * key WITHOUT the per-partition full sort a window function pays.
    * At 100 TB this is the difference between shuffling k rows per key
    * and sorting every row of every partition.
    */
  class TopKAgg[V](k: Int, ord: Ordering[V])(implicit seqEnc: Encoder[Seq[V]])
      extends Aggregator[V, Seq[V], Seq[V]] {
    require(k > 0, s"TopKAgg needs k > 0, got $k") // reduce probes b.last once full
    // Invariant: the buffer is always sorted ascending by `ord` with ≤ k
    // elements, so a row that can't make the top-k is rejected in O(1)
    // (the overwhelmingly common case once the buffer is full) and an
    // accepted row binary-inserts in O(log k) compares.
    private def insertionIdx(b: Seq[V], v: V): Int = {
      var lo = 0; var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lt(b(mid), v)) lo = mid + 1 else hi = mid
      }
      lo
    }
    override def zero: Seq[V] = Vector.empty
    override def reduce(b: Seq[V], v: V): Seq[V] =
      if (b.length >= k && ord.gteq(v, b.last)) b
      else {
        val inserted = b.patch(insertionIdx(b, v), Seq(v), 0)
        if (inserted.length > k) inserted.dropRight(1) else inserted
      }
    override def merge(a: Seq[V], b: Seq[V]): Seq[V] = {
      // linear merge of two sorted buffers, stopping at k elements
      val out = Vector.newBuilder[V]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.length || j < b.length)) {
        if (j >= b.length || (i < a.length && ord.lteq(a(i), b(j)))) { out += a(i); i += 1 }
        else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }
    override def finish(r: Seq[V]): Seq[V] = r
    override def bufferEncoder: Encoder[Seq[V]] = seqEnc
    override def outputEncoder: Encoder[Seq[V]] = seqEnc
  }

  /** Misra-Gries heavy-hitters summary: a bounded (≤ k entries) counter
    * map whose partial aggregates merge correctly, so candidate
    * generation runs as map-side combine with NO (key, item) shuffle —
    * the shuffle carries ≤ k counters per group per partition. Guarantee:
    * every item with true frequency > N/(k+1) survives to the candidate
    * set (with under-counted estimates); the scale pattern is
    * candidates → exact recount of candidates only (sk3), which at
    * 100 TB replaces a full (group, item) aggregation with a bounded
    * sketch pass plus a broadcast-filtered recount.
    */
  class MisraGriesAgg(k: Int)
      extends Aggregator[String, java.util.HashMap[String, Long], Seq[String]] {
    require(k > 0, s"MisraGriesAgg needs k > 0, got $k")
    // Mutable buffer mutated in place (the MinHashUnionAgg pattern;
    // TypedImperativeAggregate keeps the object live per group and only
    // serializes at shuffle/spill): the hit path — the overwhelmingly
    // common case on a heavy-hitter stream — is one hash probe with no
    // allocation, vs an immutable Map.updated per token. The
    // decrement-all step is in-place O(k), and fires at most n/(k+1)
    // times total (each firing consumes k+1 units of accumulated count),
    // so the summary stays amortized O(1) per token.
    override def zero: java.util.HashMap[String, Long] = new java.util.HashMap[String, Long]()
    override def reduce(m: java.util.HashMap[String, Long], x: String): java.util.HashMap[String, Long] = {
      val c = m.get(x) // 0L when absent (primitive Long unboxing of null → 0)
      if (c > 0L || m.containsKey(x)) m.put(x, c + 1L)
      else if (m.size < k) m.put(x, 1L)
      else { // decrement-all step: drop zeros, x is absorbed
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > 1L) e.setValue(e.getValue - 1L) else it.remove()
        }
      }
      m
    }
    override def merge(a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
      b.forEach((t, c) => a.merge(t, c, (x: Long, y: Long) => x + y))
      if (a.size > k) {
        // subtract the (k+1)-th largest count from all, keep positives —
        // the standard mergeable-summaries reduction to ≤ k entries
        val counts = new Array[Long](a.size)
        var i = 0
        a.forEach((_, c) => { counts(i) = c; i += 1 })
        java.util.Arrays.sort(counts)
        val thresh = counts(counts.length - 1 - k)
        val it = a.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > thresh) e.setValue(e.getValue - thresh) else it.remove()
        }
      }
      a
    }
    override def finish(m: java.util.HashMap[String, Long]): Seq[String] = {
      import scala.jdk.CollectionConverters._
      m.keySet().asScala.toSeq.sorted
    }
    override def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
      Encoders.javaSerialization[java.util.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Per-group MinHash signature: element-wise min of row signatures —
    * a mergeable sketch aggregator (grouped near-dup sketching at scale).
    */
  class MinHashUnionAgg(numHashes: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)
    override def reduce(b: Array[Long], sig: Seq[Long]): Array[Long] = {
      // fail fast on a signature built with a different numHashes —
      // silently leaving Long.MaxValue sentinels in the tail would make
      // every short-signature group band-collide with every other
      require(sig.length == numHashes,
        s"MinHashUnionAgg($numHashes): row signature has ${sig.length} hashes")
      var i = 0
      while (i < numHashes) { if (sig(i) < b(i)) b(i) = sig(i); i += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = Encoders.javaSerialization[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
