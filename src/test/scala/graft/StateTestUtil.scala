package graft

/** Shared assertions for the state-table specs. */
object StateTestUtil {

  /** (relative dirs the given manifest references, bucket dirs on
    * disk) for a BucketedTable at `path`, parsed from the manifest
    * side file — the vacuum-left-no-garbage check the specs share,
    * held in one place so a manifest format change cannot leave one
    * spec silently testing a stale format.
    */
  def manifestRefsAndDisk(path: String,
      version: Long): (Set[String], Set[String]) = {
    val referenced = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$path/manifest_v$version")))
      .linesIterator.filter(_.nonEmpty)
      .map(l => l.substring(l.indexOf(',') + 1)).toSet
    val onDisk = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("c_"))
      .flatMap(cd => cd.listFiles()
        .filter(b => b.isDirectory && b.getName.startsWith("__bucket="))
        .map(b => s"${cd.getName}/${b.getName}"))
      .toSet
    (referenced, onDisk)
  }
}
