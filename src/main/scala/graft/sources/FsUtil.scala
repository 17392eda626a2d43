package graft.sources

import java.nio.file.Path

/** Shared local-filesystem helpers for the artifact-managing sources
  * (plan cache, compaction, snapshots).
  */
private[graft] object FsUtil {

  /** Recursive delete; tolerates concurrent removals. */
  def deleteTree(p: Path): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(p.toFile)
  }
}
