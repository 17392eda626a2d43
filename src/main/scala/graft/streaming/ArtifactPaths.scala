package graft.streaming

/** ONE copy of the artifact-path contract shared by the streaming ingest
  * loops ([[ScreenedIngest]], [[IndexIngest]]): their bootstrap /
  * redelivery-screen probes and the index/sketch append machinery route
  * through [[graft.sources.ArtifactIo]], which serves scheme-less paths
  * with local `java.nio` primitives (the historical behavior) and
  * rename-atomic scheme'd stores (`hdfs://`, `abfss://`, `file:`, …)
  * through Hadoop `FileSystem`. A scheme OUTSIDE that allowlist (s3a,
  * gs, wasb — rename-by-copy stores) fails LOUDLY at [[require]] time:
  * silently accepting one would let a start() overwrite an existing
  * remote artifact with an empty one the instant a probe misreads the
  * path (the pre-r17 failure mode this guard was born from), and the
  * append machinery's temp+rename commit protocol would tear. Route
  * object-store ingest through [[graft.sources.Snapshots]] versioned
  * tables instead (the ii6 composition).
  *
  * One path string must mean one location AND one lock protocol
  * everywhere it is read: `/data/x` (OS advisory locks) and
  * `file:/data/x` (create-exclusive lock files) are the same directory
  * under two protocols — all writers to one artifact must use the same
  * path form.
  */
private[streaming] object ArtifactPaths {

  /** Validate `path` against the artifact-store contract (see the object
    * note): scheme-less and allowlisted rename-atomic schemes pass;
    * anything else raises with the capability message. Delegates to
    * [[graft.sources.ArtifactIo.forPath]] — one allowlist, never two.
    */
  def requireStore(ctx: String, what: String, path: String): Unit =
    try graft.sources.ArtifactIo.forPath(path): Unit
    catch {
      case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"$ctx: $what ${e.getMessage}")
    }

  /** Whether `dir` holds any non-`_`/`.`-prefixed files — the "does an
    * artifact already live here" probe, on whichever store `dir` names.
    */
  def hasParquet(dir: String): Boolean =
    graft.sources.ArtifactIo.forPath(dir).hasDataFiles(dir)

  /** Whether `path` exists at all on its store (the day-zero bootstrap
    * probe).
    */
  def exists(path: String): Boolean =
    graft.sources.ArtifactIo.forPath(path).exists(path)
}
