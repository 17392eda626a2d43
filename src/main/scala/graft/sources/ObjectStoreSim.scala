package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** A local-disk-backed Hadoop filesystem that SIMULATES a rename-by-copy
  * object store (`mock3a:` scheme) — the proof vehicle for admitting
  * s3a-class stores into the plan cache (gate pc1, PlanCacheSpec): every
  * `rename` really is copy-then-delete (file by file, observably
  * non-atomic, exactly the s3a client's emulation), and
  * `create(overwrite = false)` keeps RawLocalFileSystem's non-atomic
  * check-then-create (no create-exclusive — why lock files are
  * unavailable on this class of store). Running the full PlanCache
  * lifecycle against it proves the manifest-last publish protocol
  * ([[PlanCache]]) never depends on the primitives these stores lack.
  *
  * Registration (what the gate/spec does):
  * {{{
  *   hadoopConf.set("fs.mock3a.impl", classOf[RenameByCopyMockFs].getName)
  *   hadoopConf.set(ArtifactIo.RenameByCopyExtraSchemesKey, "mock3a")
  * }}}
  * after which `mock3a:/some/local/dir` routes through
  * [[ObjectStoreArtifactIo]] in [[ArtifactIo.forCachePath]] and is
  * rejected by the strict [[ArtifactIo.forPath]] like any other
  * rename-by-copy scheme.
  */
final class RenameByCopyMockFs extends RawLocalFileSystem {

  override def getScheme: String = "mock3a"

  override def getUri: URI = URI.create("mock3a:///")

  /** Rename by copy+delete — the object-store emulation: a crash (or a
    * racing reader) mid-call observes BOTH names with partial content,
    * which is precisely why [[ArtifactIo.forPath]] keeps these stores
    * away from every rename-dependent commit protocol.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    // POSIX-mv semantics the FileSystem contract expects: an existing
    // directory destination receives src as a CHILD; an existing file
    // destination refuses
    val effectiveDst =
      if (exists(dst)) {
        if (!getFileStatus(dst).isDirectory) return false
        new Path(dst, src.getName)
      } else dst
    if (exists(effectiveDst) && !getFileStatus(effectiveDst).isDirectory) return false
    FileUtil.copy(this, src, this, effectiveDst,
      /* deleteSource = */ true, /* overwrite = */ true, getConf)
  }
}
