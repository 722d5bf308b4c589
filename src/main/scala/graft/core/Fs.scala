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

  /** Empty a directory WITHOUT removing it. The rm()+mkdirs() idiom has a
    * crash window in which the directory is MISSING — fatal when its
    * existence is itself a protocol marker (GraphStore's atoms_log dir is
    * the live-feed flag: appendTx stops mirroring silently and
    * Sync.atomFeed throws if it disappears, and StagedSwap.heal
    * deliberately never recreates optional dirs). Deleting only the
    * children keeps the marker present at every crash point; a crash
    * mid-clear leaves a subset of spent files, which the rerun clears.
    *
    * A SYMLINKED dir is cleared THROUGH the link (unlike [[rm]], which
    * must not follow): the link is the marker and survives; the target's
    * files are the spent log and must go — skipping them would leave the
    * whole pre-compact history for a restarted tail to replay as live
    * transactions. Nested entries still delete via [[rm]], which never
    * follows deeper links. */
  def clearDir(dir: java.io.File): Unit = {
    if (dir.isDirectory)
      Option(dir.listFiles()).foreach(_.foreach(rm))
    ()
  }
}
