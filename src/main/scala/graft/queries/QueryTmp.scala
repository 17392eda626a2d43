package graft.queries

/** Temp directories for query-gate fixtures: created under the system
  * tmpdir and recursively deleted on JVM exit (`deleteOnExit` never
  * removes a non-empty directory). Bench invokes each gate 3× (warm-up
  * + 2 timed) — without the hook every run would strand parquet copies
  * in /tmp.
  */
private[queries] object QueryTmp {

  def dir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(d.toFile)
    }, s"graft-tmp-clean-$tag"))
    d.toString
  }
}
