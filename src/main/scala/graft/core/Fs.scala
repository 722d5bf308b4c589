package graft.core

/** The one recursive-delete helper for store/index maintenance paths —
  * previously copied into GraphStore (×5), IncrementalDedup, and
  * IncrementalAnn; a behavior change in one copy (e.g. surfacing a
  * failed delete) would silently not propagate to the others. */
object Fs {
  def rm(f: java.io.File): Unit = {
    // never follow a symlink: isDirectory is true for a link TO a
    // directory, and recursing would delete the TARGET's contents (a
    // user-symlinked store subdir on another volume, say) — removing the
    // link itself is all a store cleanup may do
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
    ()
  }
}
