package graft.core

/** The one recursive-delete helper for store/index maintenance paths —
  * previously copied into GraphStore (×5), IncrementalDedup, and
  * IncrementalAnn; a behavior change in one copy (e.g. surfacing a
  * failed delete) would silently not propagate to the others. */
object Fs {
  def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
    ()
  }
}
