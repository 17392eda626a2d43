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
    // membership-based assertions only: the registry is JVM-global and
    // other suites fold concurrently, so size equality would be flaky
    val id = java.util.UUID.randomUUID().toString
    var inits = 0
    def get() = NodeState.holder(id, () => { inits += 1; 0L })
    get(); get()
    assert(inits == 1, "one init per JVM while the holder is retained")
    NodeState.release(id)
    // a released id rides the snapshot into later invocations' closures…
    assert(NodeState.releasedSnapshot().contains(id))
    get()
    assert(inits == 2, "release must have freed the local holder")
    // …and evict drops a holder an executor JVM still retains for it
    // (the re-created holder stands in for one release() never reached)
    NodeState.evict(NodeState.releasedSnapshot())
    get()
    assert(inits == 3, "evict must drop holders for driver-released invocations")
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
