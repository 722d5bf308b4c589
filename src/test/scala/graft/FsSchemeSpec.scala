package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.fx.Sync
import graft.wrangling.IncrementalDedup
import org.apache.spark.sql.functions._

/** The store substrate contract: every durable commit protocol (GraphStore
  * side-state, StagedSwap, Sync fencing, IncrementalDedup index) routes
  * through `graft.core.Fs` (Hadoop FileSystem API), so a store addressed
  * by a NON-BARE scheme — `file:/...`, Hadoop's RawLocalFileSystem — works
  * end to end. Before the port, side-state spoke `java.io` directly: a
  * schemed dir wrote its parquet remotely but its claims/markers to a
  * literal local `./file:` path, silently forking the log. */
class FsSchemeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** A scheme-QUALIFIED store dir ("file:/tmp/..."): java.io.File would
    * treat the whole string as a relative path; only the FileSystem API
    * resolves it. */
  private def schemed(prefix: String): String =
    "file:" + java.nio.file.Files.createTempDirectory(prefix).toString

  test("sync store lifecycle end-to-end on a file:-schemed dir") {
    val dir = schemed("fs_scheme_sync")
    val w0 = Sync.publish(Graph.empty(spark), dir)
    val (w1, _) = w0.transact(Seq(
      PutEntity("Person", "ada"), PutField("ada", "Score", 1.0),
      PutEntity("Person", "bob"), PutField("bob", "Score", 2.0)))
    val (w2, _) = w1.transact(Seq(AssignField("e:Person/ada", "Score", 7.5)))
    def scores(s: GraphSlice) = s.all("Person")
      .fieldValue("Score", "v_double", "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = Map("e:Person/ada" -> 7.5, "e:Person/bob" -> 2.0)
    assert(scores(w2.now) == want)

    // reader side: snapshot marker, closures, meta all resolved through
    // the scheme — open sees both transactions
    val r = Sync.open(spark, dir)
    assert(r.graph.maxSlice == 2 && scores(r.now) == want)
    assert(scores(r.at(1)) ==
      Map("e:Person/ada" -> 1.0, "e:Person/bob" -> 2.0))

    // maintenance: the staged-swap compact + heal run their renames on
    // the schemed filesystem; results unchanged
    GraphStore.compact(spark, dir)
    GraphStore.heal(dir)
    assert(scores(Sync.open(spark, dir).now) == want)

    // fencing: the slice claims landed under the SCHEMED path — a stale
    // writer still loses its claim race
    val stale = w1
    val e = intercept[IllegalStateException](
      stale.transact(Seq(AssignField("e:Person/bob", "Score", 9.9))))
    assert(e.getMessage.contains("already claimed"))

    // and nothing leaked into a literal "./file:" directory (the exact
    // pre-port failure shape)
    assert(!new java.io.File("file:").exists(),
      "side-state leaked to a literal ./file: path — scheme not honored")
  }

  test("incremental dedup index on a file:-schemed dir: ticks, adopt, compact") {
    import spark.implicits._
    val dir = schemed("fs_scheme_dedup")
    IncrementalDedup.publish(dir)
    val t1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (4L, "entirely different content about spark and scala"))
      .toDF("doc_id", "text")
    val t2 = Seq(
      (2L, "the quick brown fox jumps over the lazy cat"))
      .toDF("doc_id", "text")
    // tick 1 indexes; tick 2 must flag the cross-tick near-dup pair via
    // the write-then-adopt rename on the schemed filesystem
    assert(IncrementalDedup.ingestTick(spark, dir, t1,
      "doc_id", "text", 0.5, tick = 1) == 0L)
    assert(IncrementalDedup.ingestTick(spark, dir, t2,
      "doc_id", "text", 0.5, tick = 2) == 1L)
    val flags = IncrementalDedup.flags(spark, dir).collect()
    assert(flags.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    // maintenance swap + heal on the schemed dir; flags unchanged
    IncrementalDedup.compact(spark, dir)
    IncrementalDedup.heal(dir)
    assert(IncrementalDedup.flags(spark, dir).count() == 1L)
  }

  test("incremental ANN index on a file:-schemed dir: bootstrap, tick, compact") {
    import graft.wrangling.IncrementalAnn
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val seed = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val dir = schemed("fs_scheme_ann")
    // bootstrap's delta-root reset, the tick's Overwrite delta, and the
    // retire-staging compact all run their Fs ops on the schemed path
    val cents = IncrementalAnn.bootstrap(seed, dir, "vec_id", "embedding",
      k = 4, iters = 1)
    IncrementalAnn.ingestTick(rest, dir, "vec_id", "embedding", cents, 0L)
    val total = emb.count()
    assert(IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
      .count() == total)
    IncrementalAnn.compact(spark, dir, "vec_id", "embedding")
    IncrementalAnn.heal(dir)
    assert(IncrementalAnn.postings(spark, dir, "vec_id", "embedding")
      .count() == total)
  }

  test("object-store schemes are rejected with the contract, not a classpath error") {
    val e1 = intercept[IllegalArgumentException](
      Fs.assertRenameContract("s3a://bucket/store"))
    assert(e1.getMessage.contains("atomic rename"))
    // the memo must cache only PASSING schemes: the same bad scheme
    // rejects again instead of sailing through
    val e2 = intercept[IllegalArgumentException](
      Fs.assertRenameContract("s3a://bucket/other"))
    assert(e2.getMessage.contains("atomic rename"))
  }

  test("Fs.rename holds HDFS-strict semantics on the local filesystem") {
    // RawLocalFileSystem.rename falls back to copy+delete when renameTo
    // fails: an existing file dst is silently overwritten, src nests INTO
    // an existing non-empty dir dst, and a missing src throws. Each would
    // defeat StagedSwap's fail-loud dst-exists guards — Fs.rename must
    // return false instead, leaving both sides untouched.
    val root = java.nio.file.Files.createTempDirectory("fs_rename_strict")
    def p(n: String) = root.resolve(n)
    // dst exists (file): refused, dst content intact
    java.nio.file.Files.writeString(p("src1"), "new")
    java.nio.file.Files.writeString(p("dst1"), "old")
    assert(!Fs.rename(p("src1").toString, p("dst1").toString))
    assert(java.nio.file.Files.readString(p("dst1")) == "old")
    assert(java.nio.file.Files.exists(p("src1")))
    // dst exists (non-empty dir): refused, no nesting
    java.nio.file.Files.createDirectories(p("srcdir"))
    java.nio.file.Files.writeString(p("srcdir").resolve("a"), "x")
    java.nio.file.Files.createDirectories(p("dstdir"))
    java.nio.file.Files.writeString(p("dstdir").resolve("b"), "y")
    assert(!Fs.rename(p("srcdir").toString, p("dstdir").toString))
    assert(!java.nio.file.Files.exists(p("dstdir").resolve("srcdir")),
      "rename nested src into an existing dir dst")
    // missing src: false, not an exception
    assert(!Fs.rename(p("absent").toString, p("dst2").toString))
    // the good case still commits
    assert(Fs.rename(p("src1").toString, p("dst2").toString))
    assert(java.nio.file.Files.readString(p("dst2")) == "new")
    Fs.rm(root.toString)
  }

  test("Fs.rm on a local symlink removes the link, never the target's contents") {
    // the java.io implementation guaranteed this; the Hadoop-FS port must
    // keep it (FileUtil deletes a link as the link)
    val root = java.nio.file.Files.createTempDirectory("fs_scheme_ln")
    val target = root.resolve("target"); val inner = target.resolve("keep.txt")
    java.nio.file.Files.createDirectories(target)
    java.nio.file.Files.writeString(inner, "precious")
    val holder = root.resolve("holder")
    java.nio.file.Files.createDirectories(holder)
    val link = holder.resolve("link")
    java.nio.file.Files.createSymbolicLink(link, target)
    Fs.rm(holder.toString)
    assert(!java.nio.file.Files.exists(holder))
    assert(java.nio.file.Files.exists(inner),
      "rm followed a symlink into its target")
  }
}
