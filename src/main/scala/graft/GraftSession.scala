package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entry point (Verify, Bench, tests,
  * user code) gets the same scale-oriented defaults.
  *
  * Defaults are chosen for the driver's local[32] harness but mirror what a
  * 1000-executor cluster config would set per-executor: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partitions sized to cores rather than the 200 default, and UTC so results
  * are comparable with the DuckDB oracle.
  */
object GraftSession {
  def builder(cores: Int = 32): SparkSession.Builder = {
    // SPARK_GRAFT_MASTER overrides the single-JVM default — the
    // multi-executor smoke (`local-cluster[2,4,4096]`) runs the SAME
    // driver protocol with executors in their OWN JVMs, structurally
    // flushing task closures that only work because local-mode executors
    // share the driver's heap (non-serializable captures, driver-local
    // file assumptions). Executor JVMs inherit this JVM's classpath.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]")
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // executors this size (tens of GiB) broadcast far bigger sides than
      // the 10 MB default profitably — dimension tables and cached derived
      // tables (e.g. Graph.latestValues) should hash-map, not shuffle
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // reliable checkpoints (Dedup.corpusDedup's span stage uses one when
      // a checkpoint dir is configured) are NOT cleaned by default — a
      // long-running service would leak one survivor-corpus-sized
      // checkpoint per call. This makes the ContextCleaner delete the
      // files when the checkpointed RDD is GC'd; cluster deployments
      // must set it too (documented at the corpusDedup call site).
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
      // rejects; read as long and normalize in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // keep side-effect artifacts (managed-table warehouse, Derby
      // metastore log) out of the working tree — harness hygiene, not a
      // semantic setting
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
    if (master.startsWith("local-cluster"))
      // worker-spawned executor JVMs don't inherit sbt's forked classpath;
      // hand them this JVM's so graft classes resolve in tasks
      b.config("spark.executor.extraClassPath",
        sys.props("java.class.path"))
    else b
  }

  def local(cores: Int = 32): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
