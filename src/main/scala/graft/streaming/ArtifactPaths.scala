package graft.streaming

/** ONE copy of the local-filesystem artifact-path contract shared by the
  * streaming ingest loops ([[ScreenedIngest]], [[IndexIngest]]): their
  * bootstrap / redelivery-screen probes use `java.nio`, which is ALWAYS
  * false on a scheme'd URI (`hdfs://`, `s3a://`, …) — every start would
  * then silently overwrite an existing artifact with an empty one and
  * silently disable the id screen. Out-of-contract input fails LOUDLY
  * instead (the appendScored NFS-guidance convention). `file:` URIs are
  * rejected too: the Spark writes would honor them but the `java.nio`
  * probes would treat them as relative paths — one path string must
  * mean one location everywhere it is read.
  */
private[streaming] object ArtifactPaths {

  /** Reject scheme-prefixed paths (see the object note). The scheme
    * needs 2+ chars: a Windows drive-letter path ("C:/data") is a local
    * path, not a URI — every real filesystem scheme (hdfs, s3a, file,
    * abfss, gs, wasb) is at least two characters.
    */
  def requireLocal(ctx: String, what: String, path: String): Unit =
    require(!path.matches("^[A-Za-z][A-Za-z0-9+.-]+:/.*"),
      s"$ctx: $what must be a scheme-less local-filesystem path " +
        s"(got '$path') — the artifact machinery is single-filesystem by " +
        "contract; for distributed stores, run the batch operators over " +
        "your own FileSystem-checked paths")

  /** Whether `dir` holds any non-`_`/`.`-prefixed files — the "does an
    * artifact already live here" probe ([[graft.sources.FsUtil.hasDataFiles]],
    * the one shared copy).
    */
  def hasParquet(dir: String): Boolean = graft.sources.FsUtil.hasDataFiles(dir)
}
