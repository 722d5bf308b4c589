package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan over the testdata tables plus (when
  * SQL-expressible) an equivalent ANSI SQL string the driver runs in DuckDB.
  *
  * Determinism contract (required for the driver's hash compare):
  *  - every output column is aliased identically in Spark and SQL;
  *  - a total ORDER BY on both sides (ties broken by a unique key);
  *  - floating aggregates rounded on both sides so accumulation-order
  *    differences between engines cannot flip a bit.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** SURVEY.md §2 operators this query demonstrates. */
    ops: Seq[String])

object Registry {
  /** Family label lives WITH its module: consumers (DocsGraph) must not
    * couple to positions in a parallel list that silently drops or
    * mislabels entries when a module is added or reordered. */
  def namedModules: Seq[(String, Seq[QueryDef])] = Seq(
    "relational" -> Relational.entries,
    "graph" -> GraphQueries.entries,
    "wrangling" -> Wrangling.entries,
    "training_prep" -> TrainingPrep.entries,
    "streaming" -> Streaming.entries,
    "dsl" -> DslQueries.entries,
    "extended" -> Extended.entries,
    "misc" -> Misc.entries)

  def modules: Seq[Seq[QueryDef]] = namedModules.map(_._2)

  lazy val entries: Seq[QueryDef] = {
    val all = modules.flatten
    // a repeated name would SILENTLY shadow one query in the Verify maps
    // (last wins) while Bench ran both — the shadowed query would count as
    // verified without ever being oracle-checked
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"Registry: duplicate query names: ${dups.mkString(", ")}")
    all
  }

  /** Collision-free /tmp staging key for an sfDir: the sanitized path
    * itself — the previous 32-bit `hashCode` key could collide two
    * different dirs and silently reuse the wrong scale factor's staged
    * source files across JVMs. */
  private[graft] def dirKey(d: String): String =
    d.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Scratch directory for a stateful query fixture (ingest stores, CDC
    * feeds, incremental indexes), salted by BOTH pid and the session's
    * UUID: two JVMs must not clobber each other's live trees, and two
    * SESSIONS in one JVM share a pid while the fixture caches are
    * memoized per (session, sfDir) — a pid-only path let a second
    * session's builder Fs.rm the live directory the first session's
    * cached entry still pointed at. The token is a counter-backed
    * per-session value (not identityHashCode, which can silently
    * collide), so the per-session guarantee is actual. `freshRoot`
    * clears the whole tree, `fresh` clears named
    * sub-dirs — centralized here so a stateful fixture cannot forget
    * its wipe. Abandoned trees from DEAD pids under the same prefix
    * are swept on first use (once per prefix per process): without the
    * sweep, every run leaked its full parquet trees in /tmp forever. */
  private[graft] def scratchDir(s: SparkSession, prefix: String,
      d: String, fresh: Seq[String] = Nil,
      freshRoot: Boolean = false): String = {
    sweepDeadPids(prefix)
    val dir = s"/tmp/$prefix/p${ProcessHandle.current().pid()}_s" +
      s"${sessionToken(s)}_${dirKey(d)}"
    if (freshRoot) graft.core.Fs.rm(new java.io.File(dir))
    fresh.foreach(sub => graft.core.Fs.rm(new java.io.File(s"$dir/$sub")))
    dir
  }

  // Per-session token that is UNIQUE by construction (an identityHashCode
  // salt could silently collide two live sessions onto one scratch tree —
  // the exact clobber the salt exists to prevent, just rarer). Weak keys:
  // dead sessions don't pin.
  private val sessionTokens = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Long]())
  private val sessionCounter = new java.util.concurrent.atomic.AtomicLong()
  private def sessionToken(s: SparkSession): Long =
    sessionTokens.synchronized {
      Option(sessionTokens.get(s)).map(_.longValue()).getOrElse {
        val t = sessionCounter.incrementAndGet()
        sessionTokens.put(s, t)
        t
      }
    }

  private val sweptPrefixes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def sweepDeadPids(prefix: String): Unit =
    if (sweptPrefixes.add(prefix)) {
      val root = new java.io.File(s"/tmp/$prefix")
      Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
        val m = "^p(\\d+)_".r.findFirstMatchIn(f.getName)
        val dead = m.exists(mm =>
          scala.util.Try(mm.group(1).toLong).toOption.exists(pid =>
            ProcessHandle.of(pid).isEmpty))
        if (dead) graft.core.Fs.rm(f)
      }
    }

  /** Race-free memoization for the fixture caches:
    * TrieMap.getOrElseUpdate is NOT atomic in its by-name argument, so
    * two concurrent first calls both ran a builder against the same
    * scratch directory — one thread's wipe deleting the other's
    * in-flight build. Fast-path read, then a serialized build (fixture
    * builds are heavy and rare; one lock per cache is correct). */
  private[queries] def memoize[K, V](
      cache: scala.collection.concurrent.TrieMap[K, V], key: K)(
      build: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None => cache.synchronized(cache.getOrElseUpdate(key, build))
    }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(q => q.name -> q.fn).toMap

  lazy val oracles: Map[String, String] =
    entries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
