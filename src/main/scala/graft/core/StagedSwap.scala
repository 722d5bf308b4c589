package graft.core

/** The staged-swap/heal idiom, unified: atomically replace a sub-table
  * directory under a store root with a freshly-written tree, and recover
  * from a crash anywhere in the protocol. Before round 12 this lived as
  * four divergent hand-rolled copies (GraphStore.compact, GraphStore
  * .purgeSlice, IncrementalDedup.compact, IncrementalAnn.compact) — an
  * idiom class that produced real data-loss bugs three rounds running
  * (index mid-swap loss, heal-deletes-__old wedging, crash-window replay
  * ghosts), because each fix landed in one copy and missed the others.
  *
  * Protocol for `swapIn(root, sub, retire)(write)`:
  *
  *  1. `write(root/<sub>__compacting)` — the new tree lands COMPLETELY
  *     beside the live one; a crash here leaves the original untouched.
  *  2. each retire dir `r` renames to `root/<r>__folded` — side trees
  *     whose contents the new tree absorbed (an ANN delta root) are
  *     staged aside BEFORE the live swap, so a crash anywhere shows
  *     either the original index or the folded one, never both copies
  *     of a row.
  *  3. `root/<sub>` renames to `root/<sub>__old` — the live tree is
  *     staged aside. Between 3 and 4 the sub-table briefly does not
  *     exist: batch readers must throw-and-retry, never repair (the
  *     same state is what a LIVE in-flight swap looks like — see
  *     GraphStore.assertNotMidSwap).
  *  4. `root/<sub>__compacting` renames to `root/<sub>` — the swap
  *     commits. rename(2) within a directory is atomic on POSIX and an
  *     atomic metadata op on HDFS; [[Fs.assertRenameContract]] rejects
  *     filesystems (object stores) where it is copy+delete.
  *  5. cleanup: `__old` and each `<r>__folded` are deleted; each retire
  *     dir is re-created EMPTY (its contents live in the new tree and
  *     append-side writers expect the dir to exist).
  *
  * [[heal]] is WRITER-SIDE ONLY (the process that owns the store's
  * maintenance): a reader that healed "helpfully" while a live swap was
  * mid-flight would delete the in-flight staging tree or un-rename
  * `__old` out from under the writer. Every crash window is
  * distinguishable from the surviving directories:
  *
  *  - live missing, `__old` present → crashed between renames 3 and 4:
  *    roll BACK (`__old` → live, un-stage each `<r>__folded`, drop
  *    staging).
  *  - live present, staging present → crashed before rename 3: roll
  *    BACK (drop staging, un-stage each `<r>__folded`).
  *  - live present, no staging → either the swap completed and cleanup
  *    crashed, or no crash at all: roll FORWARD (drop `__old` and each
  *    `<r>__folded` as garbage — the live tree is authoritative —
  *    re-create missing retire dirs empty).
  *  - neither live nor `__old` → the sub-table simply doesn't exist
  *    (optional trees like a graph store's tags/index): drop any
  *    staging leftover and move on.
  */
object StagedSwap {

  /** Atomically replace `root/<sub>` with the tree `write` produces at
    * the staging path it is handed. `retire` names sibling directories
    * the new tree absorbed — staged aside before the swap, deleted and
    * re-created empty after it. The caller must ensure `root/<sub>`
    * exists and no other writer is mid-swap (single-maintainer
    * discipline, same as every consumer's existing contract). */
  def swapIn(root: String, sub: String, retire: Seq[String] = Nil)
      (write: String => Unit): Unit = {
    Fs.assertRenameContract(root)
    val staging = s"$root/${sub}__compacting"
    write(staging)
    retire.foreach { r =>
      require(Fs.rename(s"$root/$r", s"$root/${r}__folded"),
        s"cannot stage $root/$r aside")
    }
    val live = s"$root/$sub"
    val old = s"$root/${sub}__old"
    require(Fs.rename(live, old), s"cannot stage $live aside")
    require(Fs.rename(staging, live), s"cannot swap new $sub into place")
    Fs.rm(old)
    retire.foreach { r =>
      Fs.rm(s"$root/${r}__folded")
      Fs.mkdirs(s"$root/$r")
    }
  }

  /** Writer-side recovery of one (sub, retire) swap unit — see the
    * window-by-window contract in the object doc. Safe to run when no
    * crash happened (a no-op) and idempotent. */
  def heal(root: String, sub: String, retire: Seq[String] = Nil): Unit = {
    Fs.assertRenameContract(root)
    val live = s"$root/$sub"
    val old = s"$root/${sub}__old"
    val staging = s"$root/${sub}__compacting"
    def unstageRetired(): Unit = retire.foreach { r =>
      val rLive = s"$root/$r"
      val rFolded = s"$root/${r}__folded"
      if (!Fs.exists(rLive) && Fs.exists(rFolded))
        require(Fs.rename(rFolded, rLive), s"cannot heal $rLive from __folded")
    }
    if (!Fs.exists(live) && Fs.exists(old)) {
      // crashed between the two live renames: roll back
      require(Fs.rename(old, live), s"cannot heal $live from __old")
      unstageRetired()
      Fs.rm(staging)
    } else if (Fs.exists(live) && Fs.exists(staging)) {
      // crashed before the live tree was staged aside: roll back
      Fs.rm(staging)
      unstageRetired()
    } else if (Fs.exists(live)) {
      // swap completed (or nothing happened): leftovers are garbage
      Fs.rm(old)
      retire.foreach { r =>
        Fs.rm(s"$root/${r}__folded")
        if (!Fs.exists(s"$root/$r")) Fs.mkdirs(s"$root/$r")
      }
    } else {
      // optional sub-table that was never written: only staging can linger
      Fs.rm(staging)
    }
  }

  /** Heal a list of independent (no retire) swap units — the common
    * GraphStore / IncrementalDedup shape. */
  def healAll(root: String, subs: Seq[String]): Unit =
    subs.foreach(heal(root, _))
}
