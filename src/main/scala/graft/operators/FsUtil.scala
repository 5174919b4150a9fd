package graft.operators

/** Local-filesystem helpers shared by the fixture writers, bench caches and
  * the Prof harness (one tree-delete implementation instead of a copy per
  * call site).
  */
object FsUtil {

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  def deleteRecursively(p: java.nio.file.Path): Unit =
    deleteRecursively(p.toFile)

  /** Delete sibling directories of `keep` in `dir` whose name matches
    * `prefix` — but ONLY ones untouched for `minAgeMillis`, so a CONCURRENT
    * run's live directory (a different fingerprint built minutes ago) is
    * never pulled out from under its reader; only genuinely stale
    * generations accumulate-and-get-reaped.
    */
  def reapStaleSiblings(dir: java.io.File, prefix: String, keep: String,
                        minAgeMillis: Long = 6L * 3600 * 1000): Unit = {
    val cutoff = System.currentTimeMillis() - minAgeMillis
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(prefix) &&
                   d.getName != keep && d.lastModified < cutoff)
      .foreach(deleteRecursively)
  }
}
