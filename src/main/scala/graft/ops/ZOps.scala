package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField}

/** Dataset-level ZefOps (SURVEY §2.3–§2.5) as extension methods:
  * `import graft.ops.ZOps._` and chain `df.zTake(5)`, `df.distinctBy(...)`,
  * `df.chunk(...)`, `df.sliding(...)` — the Scala restatement of the zef
  * pipeline `xs | take[5] | distinct | ...`.
  *
  * Order-dependent ops (chunk/sliding/takeWhile/enumerate/order-preserving
  * distinct) REQUIRE explicit ordering columns — Datasets are unordered
  * sets; the reference operates on Python lists where order is implicit
  * (SURVEY §7.4 flags exactly this). Every such op takes `order: Seq[Column]`.
  *
  * Scale: none of these materialize a global single partition except where
  * a total order is information-theoretically required — and there the
  * implementation is two-phase (per-partition index + offset reconciliation
  * via zipWithIndex), not a one-partition window.
  */
object ZOps {

  implicit final class DataFrameZOps(private val df: DataFrame) extends AnyVal {

    /** zef `filter[VT]` (impl.py:6105) — VT calculus predicate. */
    def zFilter(c: String, vt: VT): DataFrame = df.filter(vt.isA(col(c)))

    /** zef `Assert[pred][msg]` (impl.py:5674): every row must satisfy the
      * predicate or the job fails with the message — checked in-flow as a
      * filter condition (a dropped projection would be pruned away by the
      * optimizer and never evaluate; a filter always runs), no extra pass
      * over the data. */
    def zAssert(pred: Column, msg: String): DataFrame =
      df.filter(
        when(pred, lit(true)).otherwise(
          raise_error(concat(lit(s"Assert failed: $msg — row: "),
            to_json(struct(df.columns.map(col): _*)))).cast("boolean")))

    /** zef `take[n]` / `skip[n]` over an explicit total order
      * (impl.py:3711,3508). Negative take = from the end (reverse order). */
    def zTake(n: Int, order: Seq[Column]): DataFrame =
      if (n >= 0) df.orderBy(order: _*).limit(n)
      else df.orderBy(order.map(c => c.desc): _*).limit(-n)

    def zSkip(n: Int, order: Seq[Column]): DataFrame =
      df.orderBy(order: _*).offset(n)

    /** zef `distinct_by[f]` order-preserving dedupe (impl.py:4420): keep
      * the first row per key under `order`. */
    def distinctBy(key: Seq[Column], order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(key: _*).orderBy(order: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

    /** zef `frequencies` (impl.py:4116). */
    def frequencies(cols: Column*): DataFrame =
      df.groupBy(cols: _*).agg(count(lit(1)).as("freq"))

    /** zef `enumerate` (impl.py:1723): global 0-based index under a total
      * order — scalable AND DataFrame-native (no RDD round-trip, stays in
      * WholeStageCodegen, keeps Catalyst lineage for downstream pushdown):
      *
      *   1. range-partition + sort-within-partitions on the order key
      *      (ONE balanced shuffle);
      *   2. per-row local position from `monotonically_increasing_id`'s
      *      low 33 bits (a map-side counter in iteration order, i.e. the
      *      sorted order — zero extra shuffle);
      *   3. per-partition row counts aggregated to a tiny (#partitions)-row
      *      table, cumulated into start offsets, broadcast-joined back.
      *
      * The sorted+indexed result is frozen with an EAGER localCheckpoint
      * before fan-out: range partitioning samples boundaries, and two plan
      * branches (or two actions, e.g. takeWhile's cut probe then the main
      * read) would otherwise sample independently — counts computed against
      * one partitioning, local positions against another, silently wrong
      * indexes. The checkpoint materializes the partitioning exactly once
      * (cost ≈ one shuffle write, stored as InternalRows with no encoder
      * round-trip — unlike an RDD zipWithIndex round-trip, downstream stays
      * in WholeStageCodegen) and the ContextCleaner frees it when the
      * result Dataset is released. */
    def enumerate(order: Seq[Column], idxCol: String = "idx"): DataFrame = {
      val sorted = df.repartitionByRange(
        math.max(df.sparkSession.sparkContext.defaultParallelism, 1), order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__local",
          monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
        .localCheckpoint()
      val offsets = sorted.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__off", coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("__pid"), col("__off"))
      sorted.join(broadcast(offsets), "__pid")
        .withColumn(idxCol, col("__local") + col("__off"))
        .drop("__pid", "__local", "__off")
    }

    /** zef `chunk[n]` (impl.py:1306): fixed-size blocks under a total order. */
    def chunk(n: Int, order: Seq[Column], chunkCol: String = "chunk_id"): DataFrame =
      enumerate(order, "__i")
        .withColumn(chunkCol, (col("__i") / n).cast("long")).drop("__i")

    /** zef `stride[n]` (impl.py:1267): every n-th element. */
    def stride(n: Int, order: Seq[Column]): DataFrame =
      enumerate(order, "__i").filter(col("__i") % n === 0).drop("__i")

    /** zef `sliding[w]` (impl.py:1427) per group: window of w rows ending
      * at each row, emitted as an aggregate the caller computes over
      * `rowsBetween`; generic collect_list variant. */
    def sliding(w: Int, partition: Seq[Column], order: Seq[Column],
        valueCol: Column, as: String = "window"): DataFrame = {
      val win = Window.partitionBy(partition: _*).orderBy(order: _*)
        .rowsBetween(-(w - 1), Window.currentRow)
      df.withColumn(as, collect_list(valueCol).over(win))
    }

    /** zef `scan[+]` (impl.py:3568): running fold (here: running aggregate
      * expression over the prefix window). */
    def scan(agg: Column, partition: Seq[Column], order: Seq[Column],
        as: String = "scan"): DataFrame = {
      val win = Window.partitionBy(partition: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(as, agg.over(win))
    }

    /** zef `take_while[pred]` (impl.py:3768): longest prefix satisfying
      * pred under a total order — global min violating index, then filter.
      * Two distributed passes, no driver iteration. */
    def takeWhile(pred: Column, order: Seq[Column]): DataFrame = {
      val idx = enumerate(order, "__i")
      val firstBad = idx.filter(!pred).agg(min(col("__i"))).collect()(0)
      val cut = if (firstBad.isNullAt(0)) Long.MaxValue else firstBad.getLong(0)
      idx.filter(col("__i") < cut).drop("__i")
    }

    /** zef `skip_while[pred]` (impl.py:3678). */
    def skipWhile(pred: Column, order: Seq[Column]): DataFrame = {
      val idx = enumerate(order, "__i")
      val firstBad = idx.filter(!pred).agg(min(col("__i"))).collect()(0)
      val cut = if (firstBad.isNullAt(0)) Long.MaxValue else firstBad.getLong(0)
      idx.filter(col("__i") >= cut).drop("__i")
    }

    /** zef `group[f]` — consecutive runs over a GLOBAL total order
      * (impl.py:5890), two-phase and scale-safe (no single-partition
      * window over the full set):
      *
      *   1. range-partition + sort on the order key (one balanced shuffle);
      *   2. per physical partition: change flags + local run ids via a
      *      window PARTITIONED by `spark_partition_id` (second balanced
      *      shuffle — each task owns whole partitions, never the world);
      *   3. stitch across partition boundaries with a tiny per-partition
      *      stats table (first key, last key, #runs): partition p's first
      *      run merges with p-1's last run iff the boundary keys are equal;
      *      global run offsets are a cumulative sum over the stats rows,
      *      broadcast-joined back.
      *
      * Global run ids are 1-based and dense. As in [[enumerate]], the range
      * partitioning is frozen with an eager localCheckpoint so the stats
      * branch and the main branch see the SAME sampled boundaries.
      */
    def groupConsecutive(keyCol: Column, order: Seq[Column],
        runCol: String = "run_id"): DataFrame = {
      val sorted = df.repartitionByRange(
        math.max(df.sparkSession.sparkContext.defaultParallelism, 1), order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__key", keyCol)
        .localCheckpoint()
      val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      val flagged = sorted
        .withColumn("__chg",
          when(lag(col("__key"), 1).over(w).isNull ||
            lag(col("__key"), 1).over(w) =!= col("__key"), 1L).otherwise(0L))
        .withColumn("__localRun", sum(col("__chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val orderKey = struct(order: _*)
      val stats = flagged.groupBy(col("__pid")).agg(
        sum(col("__chg")).as("__nruns"),
        min_by(col("__key"), orderKey).as("__firstKey"),
        max_by(col("__key"), orderKey).as("__lastKey"))
      // tiny table (#partitions rows): offset_p = Σ_{q<p} nruns_q − Σ_{q≤p} merge_q
      val tw = Window.orderBy(col("__pid"))
      val offsets = stats
        .withColumn("__merge",
          when(lag(col("__lastKey"), 1).over(tw) === col("__firstKey"), 1L)
            .otherwise(0L))
        .withColumn("__off",
          coalesce(sum(col("__nruns")).over(
            tw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) -
            sum(col("__merge")).over(
              tw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("__pid"), col("__off"))
      flagged.join(broadcast(offsets), "__pid")
        .withColumn(runCol, col("__localRun") + col("__off"))
        .drop("__pid", "__key", "__chg", "__localRun", "__off")
    }

    def groupConsecutiveKeyed(partition: Seq[Column], keyCol: Column,
        order: Seq[Column], runCol: String = "run_id"): DataFrame = {
      val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      df.withColumn("__chg",
        when(lag(keyCol, 1).over(w).isNull ||
          lag(keyCol, 1).over(w) =!= keyCol, 1).otherwise(0))
        .withColumn(runCol, sum(col("__chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .drop("__chg")
    }

    /** zef `interleave` (impl.py:1183): round-robin merge of this and
      * other under per-side orders. */
    def interleave(other: DataFrame, order: Seq[Column]): DataFrame = {
      val a = df.enumerate(order, "__i").withColumn("__src", lit(0))
      val b = other.enumerate(order, "__i").withColumn("__src", lit(1))
      a.unionByName(b).orderBy(col("__i"), col("__src"))
        .drop("__i", "__src")
    }

    /** zef `reverse` (impl.py:1824) = flip the order columns downstream;
      * provided for pipeline readability. */
    def reversed(order: Seq[Column]): DataFrame = df.orderBy(order.map(_.desc): _*)

    /** zef `max_by/min_by[f]` top-1 per group (impl.py:3084). */
    def maxBy(partition: Seq[Column], order: Seq[Column]): DataFrame =
      distinctBy(partition, order.map(_.desc))
    def minBy(partition: Seq[Column], order: Seq[Column]): DataFrame =
      distinctBy(partition, order)

    /** Skew-salted join (the manual tool for when AQE's skew-join split is
      * not enough — e.g. one key holding >50% of rows): the skewed LEFT
      * side gets a random salt in [0, salt); the RIGHT side is replicated
      * `salt` times; the join key becomes (key, salt). Result equals the
      * plain inner join on `key`, with the hot key's rows spread across
      * `salt` tasks. Deterministic row content, nondeterministic
      * partition placement — exactly the point. */
    def saltedJoin(right: DataFrame, key: String, salt: Int): DataFrame = {
      val saltedLeft = df.withColumn("__salt",
        (rand(seed = 42) * salt).cast("int"))
      val explodedRight = right.withColumn("__salt",
        explode(sequence(lit(0), lit(salt - 1))))
      saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
    }
  }
}
