package graft.dset

/** Per-JVM shared-state registry backing
  * [[DSet.foldWithCommonStatePerNode]] (reference
  * `DSetGenerics.fs:410-411, 464`: one mutable state object per NODE,
  * shared by every partition task the node runs). On Spark the sharing
  * unit is the executor JVM — tasks land here via a plain object
  * (objects deserialize by module reference, so every task on a JVM
  * sees the same registry).
  */
private[dset] object NodeState {

  /** Identifies this JVM across all its tasks (fresh per process). */
  val jvmId: String = java.util.UUID.randomUUID().toString

  /** One shared state + fold counter, both guarded by the holder's
    * lock: `fold` mutates under the lock; `snapshot` SERIALIZES the
    * state under the same lock — a live reference would be torn by
    * Spark's task-result serialization racing later folds, and the
    * under-lock byte copy also makes the count↔content pairing exact
    * (the completeness argument in [[DSet.foldWithCommonStatePerNode]]).
    */
  final class Holder[S](init: () => S) {
    private var state: S = init()
    private var count: Long = 0L
    private val started = scala.collection.mutable.Set.empty[Int]
    private val completed = scala.collection.mutable.Set.empty[Int]

    /** Claim a partition before folding it. Returns false when this
      * partition already folded COMPLETELY on this JVM (a retried task
      * whose first attempt succeeded — e.g. lost task result — must not
      * double-fold). Throws when a previous attempt STARTED here but
      * never completed: its partial folds are already mixed into the
      * shared state and cannot be subtracted — failing loudly beats
      * returning a silently-wrong aggregate.
      */
    def begin(pid: Int): Boolean = synchronized {
      if (completed(pid)) false
      else if (started(pid)) throw new IllegalStateException(
        s"foldWithCommonStatePerNode: partition $pid was partially folded by a failed " +
          "task attempt on this executor — the shared node state is corrupted. " +
          "Rerun the action; for at-most-once task execution disable spark.speculation " +
          "for jobs using this operator.")
      else { started += pid; true }
    }

    def complete(pid: Int): Unit = synchronized { completed += pid: Unit }

    def fold[U](u: U)(folder: (S, U) => S): Unit = synchronized {
      state = folder(state, u)
      count += 1
    }

    def snapshot: (Array[Byte], Long, Set[Int], Set[Int]) = synchronized {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(state)
      oos.close()
      (bos.toByteArray, count, started.toSet, completed.toSet)
    }
  }

  /** Deserialize a snapshot with the context classloader (sbt/REPL
    * user classes are not visible to ObjectInputStream's default
    * latest-user-defined-loader resolution).
    */
  def deserialize[S](bytes: Array[Byte]): S = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes)) {
      override def resolveClass(desc: java.io.ObjectStreamClass): Class[_] =
        try Class.forName(desc.getName, false, Thread.currentThread().getContextClassLoader)
        catch { case _: ClassNotFoundException => super.resolveClass(desc) }
    }
    try in.readObject().asInstanceOf[S] finally in.close()
  }

  private val holders = new java.util.concurrent.ConcurrentHashMap[String, Holder[_]]()

  /** Invocation ids released on the driver, kept as a bounded ring.
    * Executor JVMs cannot observe a driver-side `release` directly, so
    * each later fold invocation ships a snapshot of this ring in its
    * task closure and tasks [[evict]] retained holders for those ids —
    * repeated `foldWithCommonStatePerNode` calls in a long-lived session
    * clean up after their predecessors instead of accumulating one
    * holder (full folded state) per invocation per executor until JVM
    * exit.
    */
  private val released = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val maxReleased = 4096

  /** Creation runs the user's `init()` at most once per invocation per
    * JVM via `computeIfAbsent` — which locks only the key's bin, not the
    * registry: a slow initializer (model load) for one invocation must
    * not stall task startup for every OTHER invocation on the executor,
    * which a registry-wide synchronized block did.
    */
  def holder[S](invocation: String, init: () => S): Holder[S] =
    holders.computeIfAbsent(invocation, _ => new Holder(init)).asInstanceOf[Holder[S]]

  def release(invocation: String): Unit = {
    holders.remove(invocation): Unit
    released.add(invocation): Unit
    while (released.size > maxReleased) released.poll()
  }

  /** Driver-side snapshot of released ids, closure-shipped to tasks. */
  def releasedSnapshot(): Array[String] = released.toArray(Array.empty[String])

  /** Executor-side: drop holders whose invocation the driver released. */
  def evict(releasedIds: Array[String]): Unit =
    releasedIds.foreach(id => holders.remove(id))
}
