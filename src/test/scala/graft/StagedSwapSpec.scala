package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.core.StagedSwap

/** Crash-window matrix for the unified staged-swap/heal primitive —
  * the idiom previously hand-rolled in four divergent copies
  * (GraphStore.compact / GraphStore.purgeSlice / IncrementalDedup
  * .compact / IncrementalAnn.compact), each of which produced its own
  * data-loss bug class. Consumer-level coverage lives in
  * GraphStoreSpec ("crashed mid-swap"), IncrementalDedupSpec ("heal
  * un-stages"), IncrementalAnnSpec ("heal recovers every compact crash
  * window"); this spec pins the shared protocol itself, window by
  * window, with plain files (no Spark). */
class StagedSwapSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_swap").toString

  private def mkTree(root: String, name: String, marker: String): Unit = {
    val d = new File(s"$root/$name")
    assert(d.mkdirs() || d.isDirectory)
    Files.writeString(Paths.get(s"$root/$name/data.txt"), marker)
  }

  private def marker(root: String, name: String): Option[String] = {
    val p = Paths.get(s"$root/$name/data.txt")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  test("swapIn replaces the live tree atomically and leaves no debris") {
    val root = tmp()
    mkTree(root, "t", "v1")
    StagedSwap.swapIn(root, "t")(staging => mkTree(root, new File(staging).getName, "v2"))
    assert(marker(root, "t").contains("v2"))
    assert(!new File(s"$root/t__old").exists())
    assert(!new File(s"$root/t__compacting").exists())
  }

  test("swapIn with retire: the retired tree is dropped and re-created empty") {
    val root = tmp()
    mkTree(root, "seed", "v1")
    mkTree(root, "delta", "tick rows")
    StagedSwap.swapIn(root, "seed", retire = Seq("delta"))(staging =>
      mkTree(root, new File(staging).getName, "v1+delta"))
    assert(marker(root, "seed").contains("v1+delta"))
    val delta = new File(s"$root/delta")
    assert(delta.isDirectory && delta.listFiles().isEmpty,
      "retire dir must come back EMPTY (its rows live in the new tree)")
    assert(!new File(s"$root/delta__folded").exists())
  }

  test("crash BEFORE the live swap (staging written, retire staged): heal rolls back") {
    val root = tmp()
    mkTree(root, "seed", "v1")
    mkTree(root, "delta", "tick rows")
    // crash window: staging landed, delta staged aside, live untouched
    mkTree(root, "seed__compacting", "half-written")
    assert(new File(s"$root/delta").renameTo(new File(s"$root/delta__folded")))
    StagedSwap.heal(root, "seed", retire = Seq("delta"))
    assert(marker(root, "seed").contains("v1"), "original must survive")
    assert(marker(root, "delta").contains("tick rows"), "delta must be un-staged")
    assert(!new File(s"$root/seed__compacting").exists())
    assert(!new File(s"$root/delta__folded").exists())
  }

  test("crash INSIDE the swap (live staged aside): heal restores the original") {
    val root = tmp()
    mkTree(root, "seed", "v1")
    mkTree(root, "delta", "tick rows")
    mkTree(root, "seed__compacting", "complete-but-unswapped")
    assert(new File(s"$root/delta").renameTo(new File(s"$root/delta__folded")))
    assert(new File(s"$root/seed").renameTo(new File(s"$root/seed__old")))
    StagedSwap.heal(root, "seed", retire = Seq("delta"))
    assert(marker(root, "seed").contains("v1"), "roll back, not forward: the " +
      "staging tree may be complete but was never committed")
    assert(marker(root, "delta").contains("tick rows"))
    assert(!new File(s"$root/seed__old").exists())
    assert(!new File(s"$root/seed__compacting").exists())
  }

  test("crash AFTER the swap (cleanup unfinished): heal rolls forward") {
    val root = tmp()
    mkTree(root, "seed", "v2-committed") // the staging tree already renamed in
    mkTree(root, "seed__old", "v1-garbage")
    mkTree(root, "delta__folded", "absorbed rows")
    StagedSwap.heal(root, "seed", retire = Seq("delta"))
    assert(marker(root, "seed").contains("v2-committed"),
      "live tree is authoritative once the swap committed")
    assert(!new File(s"$root/seed__old").exists(),
      "leftover __old wedges every future swap (rename onto non-empty fails)")
    assert(!new File(s"$root/delta__folded").exists(),
      "folded delta rows are IN the new tree — keeping them would double rows")
    val delta = new File(s"$root/delta")
    assert(delta.isDirectory && delta.listFiles().isEmpty)
  }

  test("optional sub-table that never existed: heal drops staging only") {
    val root = tmp()
    mkTree(root, "tags__compacting", "half")
    StagedSwap.heal(root, "tags")
    assert(!new File(s"$root/tags__compacting").exists())
    assert(!new File(s"$root/tags").exists(),
      "heal must not invent an empty sub-table")
  }

  test("heal is idempotent across every window") {
    val root = tmp()
    mkTree(root, "seed", "v1")
    mkTree(root, "delta", "rows")
    mkTree(root, "seed__compacting", "x")
    assert(new File(s"$root/delta").renameTo(new File(s"$root/delta__folded")))
    assert(new File(s"$root/seed").renameTo(new File(s"$root/seed__old")))
    StagedSwap.heal(root, "seed", retire = Seq("delta"))
    val snap = (marker(root, "seed"), marker(root, "delta"))
    StagedSwap.heal(root, "seed", retire = Seq("delta"))
    StagedSwap.heal(root, "seed", retire = Seq("delta"))
    assert((marker(root, "seed"), marker(root, "delta")) == snap)
  }

  test("swapIn after a healed crash completes the interrupted maintenance") {
    val root = tmp()
    mkTree(root, "seed", "v1")
    // crashed inside the previous swap
    mkTree(root, "seed__compacting", "stale-staging")
    assert(new File(s"$root/seed").renameTo(new File(s"$root/seed__old")))
    StagedSwap.heal(root, "seed")
    StagedSwap.swapIn(root, "seed")(staging =>
      mkTree(root, new File(staging).getName, "v2"))
    assert(marker(root, "seed").contains("v2"))
    assert(!new File(s"$root/seed__old").exists())
    assert(!new File(s"$root/seed__compacting").exists())
  }
}
