package graft.dset

import org.scalatest.funsuite.AnyFunSuite

/** Claim semantics backing foldWithCommonStatePerNode's
  * exactly-once-or-loud retry contract (no Spark needed).
  */
class NodeStateSpec extends AnyFunSuite {

  test("begin/complete: completed retries skip, mid-fold retries throw") {
    val h = new NodeState.Holder[Long](() => 0L)
    assert(h.begin(0))
    h.fold(5L)((s, u) => s + u)
    h.complete(0)
    assert(!h.begin(0), "a completed partition's retry must SKIP re-folding")
    assert(h.begin(1))
    // partition 1 never completes (simulated dead attempt) — its retry
    // must fail loudly: the partial folds cannot be subtracted
    val ex = intercept[IllegalStateException](h.begin(1))
    assert(ex.getMessage.contains("partially folded"))
    val (_, count, started, completed) = h.snapshot
    assert(count == 1L && started == Set(0, 1) && completed == Set(0))
  }

  test("release frees the holder and marks the id for executor-side eviction") {
    val before = NodeState.retained
    NodeState.holder("inv-rel-1", () => 0L)
    assert(NodeState.retained == before + 1)
    NodeState.release("inv-rel-1")
    assert(NodeState.retained == before, "release must free the local holder")
    // a released id rides the snapshot into later invocations' closures…
    assert(NodeState.releasedSnapshot().contains("inv-rel-1"))
    // …and evict drops a holder an executor JVM still retains for it
    // (simulated: re-create the holder as if this JVM never saw release)
    NodeState.holder("inv-rel-1", () => 0L)
    assert(NodeState.retained == before + 1)
    NodeState.evict(NodeState.releasedSnapshot())
    assert(NodeState.retained == before,
      "evict must drop holders for driver-released invocations")
  }

  test("snapshot bytes deserialize to the folded state") {
    val h = new NodeState.Holder[java.util.ArrayList[Int]](() => new java.util.ArrayList[Int]())
    assert(h.begin(3))
    h.fold(7)((s, u) => { s.add(u); s })
    h.complete(3)
    val (bytes, count, _, _) = h.snapshot
    assert(count == 1L)
    val back = NodeState.deserialize[java.util.ArrayList[Int]](bytes)
    assert(back.size() == 1 && back.get(0) == 7)
  }
}
