package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** The one filesystem chokepoint for store/index protocol paths —
  * GraphStore, StagedSwap, FieldIndex, Sync, IncrementalDedup,
  * IncrementalAnn all speak THIS API, which routes through
  * `org.apache.hadoop.fs.FileSystem`, so a store directory may live on any
  * Hadoop-compatible filesystem (`/local/path`, `file:/...`, `hdfs://...`),
  * not just the driver's local disk via `java.io.File`.
  *
  * SUBSTRATE CONTRACT (the durability fine print): the commit protocols
  * built on this API — StagedSwap's two-rename swap, IncrementalDedup's
  * single-file append + write-then-adopt flags, Sync's slice fencing —
  * assume an HDFS-COMPATIBLE filesystem:
  *
  *  - `rename` is ATOMIC and O(1) (POSIX rename(2); an HDFS metadata op).
  *    Object stores (S3A, GCS connector without hierarchical namespace)
  *    implement rename as copy+delete — NOT atomic, and O(data): the
  *    rename-commit protocols are unsafe there. Front an object store
  *    with a table-format/manifest layer instead of pointing these
  *    protocols at it raw.
  *  - [[createExclusive]] (create-fails-if-exists) is atomic — true on
  *    local (O_EXCL) and HDFS; S3-class stores need conditional puts or a
  *    real lock service (Sync.claimSlice's documented caveat).
  *  - directory listing is cheap. Protocol paths only ever list SMALL
  *    directories (tx markers, slice claims, staging dirs), never the
  *    data trees.
  *
  * [[assertRenameContract]] makes the assumption loud: protocol entry
  * points call it once per scheme and fail with this contract spelled out
  * rather than corrupting a store through a non-atomic rename. */
object Fs {

  /** The session's Hadoop conf (so `fs.defaultFS`, credentials and scheme
    * impls follow the deployment), or a bare default off-session
    * (driver-side maintenance CLIs before a session exists).
    * `getActiveSession` is THREAD-LOCAL — an Fs call from a non-session
    * thread (HTTP handler, stream listener, user Future) must fall through
    * to the JVM-global default session, not to a bare Configuration that
    * would silently re-point scheme-less store paths at the local fs. */
  private def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def resolve(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf), p)
  }

  /** Schemes with POSIX/HDFS rename semantics. Extend deliberately (e.g.
    * "viewfs", an HDFS federation) — never with an object-store scheme. */
  private val RenameSafeSchemes = Set("file", "hdfs", "viewfs")
  private val renameChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Fail loudly when `path`'s filesystem cannot honor the atomic-rename
    * commit contract (see the object doc). Once per scheme per JVM. The
    * scheme is read off the path URI (falling back to the configured
    * default FS for scheme-less paths) WITHOUT instantiating the
    * filesystem: an `s3a://` store must fail with this contract spelled
    * out, not with whatever classpath error the connector throws first. */
  def assertRenameContract(path: String): Unit = {
    val scheme = Option(new Path(path).toUri.getScheme)
      .getOrElse(FileSystem.getDefaultUri(conf).getScheme)
    // memoize only the PASS: caching a failed check would let the second
    // call against the same bad scheme sail through silently
    if (!renameChecked.contains(scheme)) {
      require(RenameSafeSchemes.contains(scheme),
        s"graft store protocols need atomic rename, which '$scheme' does " +
          "not provide (object stores rename by copy+delete): host the " +
          "store on a local/HDFS-class filesystem, or front the object " +
          "store with a manifest/table-format layer")
      renameChecked.add(scheme)
      ()
    }
  }

  def exists(path: String): Boolean = {
    val (fs, p) = resolve(path); fs.exists(p)
  }

  def isDir(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  def mkdirs(path: String): Unit = {
    val (fs, p) = resolve(path); fs.mkdirs(p); ()
  }

  /** Recursive delete; no-op when missing. On a LOCAL filesystem this
    * never follows a symlink into its target (Hadoop's FileUtil deletes a
    * link as the link): recursing through a user-symlinked store subdir
    * would delete the TARGET's contents on another volume — removing the
    * link itself is all a store cleanup may do (spec'd). */
  def rm(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
  def rm(f: java.io.File): Unit = rm(f.getPath)

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
    * transactions. Nested entries still delete via [[rm]]'s
    * never-follow-deeper-links rule. */
  def clearDir(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p) && fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).foreach(st => fs.delete(st.getPath, true))
    ()
  }
  def clearDir(f: java.io.File): Unit = clearDir(f.getPath)

  /** Atomic rename (the commit primitive — [[assertRenameContract]]).
    * HDFS-contract semantics: false when src is missing or dst exists —
    * ENFORCED here, because `FileSystem.rename` does not deliver them on
    * local: Hadoop's RawLocalFileSystem falls back to
    * `FileUtil.copy(deleteSource=true)` when `File.renameTo` fails, which
    * silently OVERWRITES an existing file dst, nests src INTO an existing
    * non-empty dir dst, and throws (instead of returning false) on a
    * missing src — each of which would defeat StagedSwap's fail-loud
    * dst-exists crash-state guards. The pre-checks are not atomic with the
    * rename, but every caller is inside a single-writer protocol window
    * (claimSlice fencing / save-swap ownership), where the only party that
    * could race the check is the caller itself. */
  def rename(src: String, dst: String): Boolean = {
    val (fs, s) = resolve(src)
    val d = new Path(dst)
    if (!fs.exists(s) || fs.exists(d)) false
    else fs.rename(s, d)
  }

  /** Child statuses; empty when the directory is missing. */
  def listStatus(path: String): Seq[FileStatus] = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.listStatus(p).toSeq else Nil
  }

  /** Child NAMES (no paths); empty when missing. */
  def listNames(path: String): Seq[String] =
    listStatus(path).map(_.getPath.getName)

  def readString(path: String): String = {
    val (fs, p) = resolve(path)
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Write-whole-file (overwrite). Protocol markers only — written once
    * at publish/save time, not a concurrent-commit primitive. */
  def writeString(path: String, s: String): Unit = {
    val (fs, p) = resolve(path)
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    ()
  }

  /** Atomic create-fails-if-exists — the slice-fencing primitive. Local
    * filesystems go through O_EXCL (`Files.createFile`): Hadoop's
    * RawLocalFileSystem check-then-creates, which would let two racing
    * writers both claim a slice. HDFS's create(overwrite=false) is
    * namenode-atomic. Throws [[java.nio.file.FileAlreadyExistsException]]
    * on a lost race either way. */
  def createExclusive(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.getScheme == "file") {
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(p.toUri.getPath))
      ()
    } else
      try fs.create(p, false).close()
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new java.nio.file.FileAlreadyExistsException(path)
      }
  }

  /** Total bytes under `path` (0 when missing) — bucket-count sizing
    * input. One metadata call (`getContentSummary`), no Spark job. */
  def dirBytes(path: String): Long = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }
}
