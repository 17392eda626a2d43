package graft.examples

import graft.sources.ArtifactIo

/** Operator tool for the one manual step the Hadoop-store lock protocol
  * deliberately has (see [[graft.sources.ArtifactIo]]'s trait note and
  * SCALING.md's "Crashed-holder lock recovery" runbook): a holder that
  * CRASHED on an `hdfs://`-class store leaves its create-exclusive lock
  * file behind, and every later committer times out loudly until an
  * operator removes it. The protocol refuses mtime-expiry auto-stealing
  * by design — a heuristic can steal a LIVE slow holder's lock — so the
  * removal is a human decision, and this tool front-loads the evidence
  * that decision needs:
  *
  *   - prints the holder forensics the lock file carries (host, pid,
  *     acquisition epoch → age) so the operator can check whether that
  *     process is still alive before touching anything;
  *   - REFUSES to delete without `--force` (a bare run is always safe);
  *   - refuses empty lock files on `file:` outright even under
  *     `--force` — an empty inode there is the scheme-less protocol's
  *     persistent mutex (see the mixed-path-form tripwire), whose
  *     deletion would break OS-advisory mutual exclusion for every
  *     scheme-less writer.
  *
  * Usage:
  * {{{
  *   runMain graft.examples.BreakLock hdfs://nn/idx/._graft_totals.lock          # inspect
  *   runMain graft.examples.BreakLock hdfs://nn/idx/._graft_totals.lock --force  # delete
  * }}}
  */
object BreakLock {

  def main(args: Array[String]): Unit = {
    val paths = args.filter(!_.startsWith("--")).toSeq
    require(paths.length == 1,
      s"usage: BreakLock <lockPath> [--force] — got ${args.mkString(" ")}")
    val lockPath = paths.head
    val force = args.contains("--force")
    val io = ArtifactIo.forPath(lockPath)

    io.readBytes(lockPath) match {
      case None =>
        println(s"[breaklock] $lockPath: no lock file — nothing is held; nothing to do")
      case Some(bytes) =>
        val holder = new String(bytes, "UTF-8")
        val ageMs = io.mtimeMs(lockPath)
          .map(System.currentTimeMillis() - _)
        println(s"[breaklock] $lockPath")
        println(s"[breaklock]   holder : ${if (holder.isEmpty) "<empty file>" else holder}")
        println(s"[breaklock]   age    : ${ageMs.map(a => f"${a / 1000.0}%.1f s").getOrElse("unknown")}")
        // the empty-file refusal is LOCAL-ONLY: on file:/scheme-less
        // paths an empty inode is usually the scheme-less protocol's
        // persistent mutex (deleting it breaks OS-advisory mutual
        // exclusion); on a real remote store (hdfs://, abfss://) an
        // empty lock file is a holder that crashed in the
        // create→forensics window — exactly the crash class this tool
        // recovers, so --force proceeds there.
        if (holder.isEmpty && ArtifactIo.isLocalForm(lockPath)) {
          println("[breaklock]   EMPTY lock file on a local path form: usually the " +
            "SCHEME-LESS protocol's persistent mutex inode (deleting it breaks " +
            "OS-advisory mutual exclusion for scheme-less writers) or a holder " +
            "that crashed before writing forensics. Refusing to delete — " +
            "investigate the path-form mix first (SCALING.md runbook).")
          sys.exit(2)
        }
        if (holder.isEmpty)
          println("[breaklock]   empty lock file on a remote store: a holder that " +
            "crashed between its create-exclusive and its forensics write — no " +
            "host/pid to check; confirm no live committer targets this artifact " +
            "before --force.")
        if (!force) {
          println("[breaklock]   not deleting (no --force). Verify the holder process " +
            "above is DEAD (host + pid) before re-running with --force: deleting a " +
            "LIVE holder's lock puts two writers inside one critical section.")
        } else {
          io.delete(lockPath)
          println(s"[breaklock]   deleted. The next committer acquires normally.")
        }
    }
  }
}
