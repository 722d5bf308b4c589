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

  /** Below this plan-statistics size estimate, total-order ops (enumerate /
    * groupConsecutive / consecutiveRuns) run as a single-partition window:
    * the distributed two-phase machinery costs more than the computation
    * for inputs that fit one task. Same adaptivity principle as Spark's
    * autoBroadcastJoinThreshold, same default. Override per-session with
    * `spark.conf.set("graft.smallSortThreshold", bytes)` (0 forces the
    * distributed path — used by specs to exercise it at toy sizes). */
  val DefaultSmallSortThreshold: Long = 64L << 20

  private def isSmallSort(d: DataFrame): Boolean = {
    val thr = d.sparkSession.conf.getOption("graft.smallSortThreshold")
      .map(_.toLong).getOrElse(DefaultSmallSortThreshold)
    d.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thr)
  }

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

    /** Negative skip mirrors negative take: drop `-n` from the END. */
    def zSkip(n: Int, order: Seq[Column]): DataFrame =
      if (n >= 0) df.orderBy(order: _*).offset(n)
      else df.orderBy(order.map(_.desc): _*).offset(-n)

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
      * The sorted+indexed result is frozen with a LAZY localCheckpoint
      * before fan-out: range partitioning samples boundaries, and two plan
      * branches (or two actions, e.g. takeWhile's cut probe then the main
      * read) would otherwise sample independently — counts computed against
      * one partitioning, local positions against another, silently wrong
      * indexes. Lazy (persist-backed) beats eager here: the freeze
      * materializes DURING the first consuming action instead of as a
      * separate up-front job, so a single-action caller (stride, chunk)
      * pays zero extra passes — the offsets branch and the main join read
      * the same cached partitions via the block manager (concurrent
      * computation of one partition is serialized there, so both branches
      * always see identical boundaries). Rows are stored as InternalRows
      * with no encoder round-trip — unlike an RDD zipWithIndex round-trip,
      * downstream stays in WholeStageCodegen — and the ContextCleaner frees
      * the blocks when the result Dataset is released. */
    def enumerate(order: Seq[Column], idxCol: String = "idx"): DataFrame = {
      // adaptive: tiny inputs (plan-stats estimate) skip the two-phase
      // machinery — see groupConsecutive's scale note
      if (isSmallSort(df))
        return df.withColumn(idxCol,
          row_number().over(Window.orderBy(order: _*)).cast("long") - 1)
      val sorted = df.repartitionByRange(
        math.max(df.sparkSession.sparkContext.defaultParallelism, 1), order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__local",
          monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
        .localCheckpoint(eager = false)
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

    /** zef `chunk[n]` (impl.py:1306): fixed-size blocks under a total order.
      * n rejects at PLAN time: n = 0 reached the executors as an ANSI
      * DIVIDE_BY_ZERO mid-job (same convention as minhash/sampleK). */
    def chunk(n: Int, order: Seq[Column], chunkCol: String = "chunk_id"): DataFrame = {
      require(n > 0, s"chunk: block size must be positive, got $n")
      enumerate(order, "__i")
        .withColumn(chunkCol, (col("__i") / n).cast("long")).drop("__i")
    }

    /** zef `stride[n]` (impl.py:1267): every n-th element. */
    def stride(n: Int, order: Seq[Column]): DataFrame = {
      require(n > 0, s"stride: step must be positive, got $n")
      enumerate(order, "__i").filter(col("__i") % n === 0).drop("__i")
    }

    /** zef `sliding[w]` (impl.py:1427) per group: window of w rows ending
      * at each row, emitted as an aggregate the caller computes over
      * `rowsBetween`; generic collect_list variant. */
    def sliding(w: Int, partition: Seq[Column], order: Seq[Column],
        valueCol: Column, as: String = "window"): DataFrame = {
      require(w > 0, s"sliding: window width must be positive, got $w")
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
      * Two distributed passes, no driver iteration. A NULL-evaluating
      * predicate row is a VIOLATION (the row does not satisfy pred), not
      * a pass: the violation scan coalesces unknown to false-satisfied,
      * or a null row silently extended the prefix past itself —
      * consistent with takeUntil/skipUntil, where an unknown is not a
      * hit. */
    def takeWhile(pred: Column, order: Seq[Column]): DataFrame = {
      val idx = enumerate(order, "__i")
      boundaryFilter(idx, idx.filter(!coalesce(pred, lit(false))), _ < _)
    }

    /** The boundary index (min `__i` over `marks`; MaxValue when none)
      * applied IN-PLAN: a one-row aggregate broadcast into a nested-loop
      * filter — the sanctioned scalar cross-join idiom — instead of an
      * eager collect(). Constructing the DataFrame is then side-effect
      * free (plan tooling shapes it without running jobs); the probe job
      * runs when the RESULT runs, inside any timing window. enumerate's
      * lazy checkpoint keeps the probe branch and the main read on one
      * partitioning (its doc). */
    private def boundaryFilter(idx: DataFrame, marks: DataFrame,
        keep: (Column, Column) => Column): DataFrame = {
      val cut = marks.agg(
        coalesce(min(col("__i")), lit(Long.MaxValue)).as("__cut"))
      idx.join(broadcast(cut), keep(col("__i"), col("__cut")))
        .drop("__i", "__cut")
    }

    /** zef `skip_while[pred]` (impl.py:3678). NULL pred = violation, as
      * in [[takeWhile]]. */
    def skipWhile(pred: Column, order: Seq[Column]): DataFrame = {
      val idx = enumerate(order, "__i")
      boundaryFilter(idx, idx.filter(!coalesce(pred, lit(false))), _ >= _)
    }

    /** zef `take_until[pred]` (impl.py:3807): take_while with the predicate
      * negated AND the bounding element included. */
    def takeUntil(pred: Column, order: Seq[Column]): DataFrame = {
      val idx = enumerate(order, "__i")
      boundaryFilter(idx, idx.filter(pred), _ <= _)
    }

    /** zef `skip_until[pred]`: drop elements before the first satisfying
      * one; the bounding element is kept. */
    def skipUntil(pred: Column, order: Seq[Column]): DataFrame = {
      val idx = enumerate(order, "__i")
      boundaryFilter(idx, idx.filter(pred), _ >= _)
    }

    /** zef `take_while_pair[pred]` (impl.py:3885): termination depends on
      * two SUCCESSIVE elements — keep rows until the first adjacent pair
      * fails, emitting both elements of the last passing pair. The
      * predicate sees the previous row's columns prefixed `prev_`
      * (e.g. `col("prev_v") =!= col("v")`). Adjacency via a self-join on
      * the enumerate index — distributed, no single-partition window. */
    def takeWhilePair(pred: Column, order: Seq[Column]): DataFrame = {
      val idx = enumerate(order, "__i")
      val prev = idx.toDF(idx.columns
        .map(c => if (c == "__i") "__pi" else s"prev_$c"): _*)
      val pairs = idx.join(prev, col("__i") === col("__pi") + 1)
      // NULL pred = violating pair, as in takeWhile
      boundaryFilter(idx, pairs.filter(!coalesce(pred, lit(false))), _ < _)
    }

    /** zef `split_at[n]` (impl.py:10227): ([first n], [rest]) under the
      * total order. One enumerate feeds both branches (the index table is
      * checkpoint-frozen, see [[enumerate]]). */
    def splitAt(n: Long, order: Seq[Column]): (DataFrame, DataFrame) = {
      val idx = enumerate(order, "__i")
      (idx.filter(col("__i") < n).drop("__i"),
        idx.filter(col("__i") >= n).drop("__i"))
    }

    /** zef `single_or[default]` (impl.py:3966): the single row if exactly
      * one, `default` if empty, error on 2+ — a bounded driver scalar like
      * the reference (limit(2), never a full collect). */
    def singleOr(default: => org.apache.spark.sql.Row): org.apache.spark.sql.Row = {
      val rows = df.limit(2).collect()
      rows.length match {
        case 0 => default
        case 1 => rows(0)
        case _ => throw new IllegalArgumentException(
          "single_or: more than one row present")
      }
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
      * partitioning is frozen with a LAZY localCheckpoint so the stats
      * branch and the main branch see the SAME sampled boundaries — lazy,
      * so the freeze costs no separate job (see enumerate's scale note).
      *
      * ADAPTIVE, like Spark's own broadcast-vs-shuffle join choice: below
      * [[ZOps.smallSortThreshold]] (plan-statistics estimate, default
      * 64 MB) the whole input fits one task comfortably and the two-phase
      * machinery (range sample + shuffle + freeze + stitch) costs more
      * than the computation itself — a single-partition window wins and
      * nothing is at risk. Above it, the two-phase scale path runs. Both
      * paths produce identical output.
      */
    def groupConsecutive(keyCol: Column, order: Seq[Column],
        runCol: String = "run_id"): DataFrame = {
      if (isSmallSort(df)) {
        val w = Window.orderBy(order: _*)
        return df
          .withColumn("__chg",
            when(lag(lit(1), 1).over(w).isNull ||
              !(lag(keyCol, 1).over(w) <=> keyCol), 1L).otherwise(0L))
          .withColumn(runCol, sum(col("__chg")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .drop("__chg")
      }
      // shared flags phase: range shuffle + per-partition window, frozen
      // lazily ABOVE the expensive work so the stats branch and the main
      // join both read one cached computation with identical range bounds.
      // (A per-partition imperative mapPartitions pass was measured too:
      // its encoder round-trip costs MORE than the window's __pid
      // re-exchange at realistic row widths, and it exits
      // WholeStageCodegen — the window version stays fully codegen'd.
      // Change flags are null-safe: consecutive null keys are ONE run.)
      val flagged = df.groupConsecutiveFlags(keyCol, order)
      val orderKey = struct(order: _*)
      val stats = flagged.groupBy(col("__pid")).agg(
        sum(col("__chg")).as("__nruns"),
        min_by(col("__key"), orderKey).as("__firstKey"),
        max_by(col("__key"), orderKey).as("__lastKey"))
      // tiny table (#partitions rows): offset_p = Σ_{q<p} nruns_q − Σ_{q≤p} merge_q
      // merge is NULL-SAFE on the boundary keys (a null-keyed run spanning a
      // boundary must still merge) but never fires on the first partition
      // (lag-of-nothing is not a matching null key).
      val tw = Window.orderBy(col("__pid"))
      val offsets = stats
        .withColumn("__merge",
          when(lag(lit(1), 1).over(tw).isNotNull &&
            (lag(col("__lastKey"), 1).over(tw) <=> col("__firstKey")), 1L)
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
        when(lag(lit(1), 1).over(w).isNull ||
          !(lag(keyCol, 1).over(w) <=> keyCol), 1).otherwise(0))
        .withColumn(runCol, sum(col("__chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .drop("__chg")
    }

    /** Run-LEVEL `group[f]` — one row `(runCol, keyOut, lenOut)` per maximal
      * consecutive run, never materializing a per-row run id. For run-length
      * analytics (sessionization, streak stats) this is the scale shape:
      * [[groupConsecutive]] + `groupBy(run_id)` shuffles one group per run
      * (≈ row count for alternating keys); here runs are reduced
      * PER PARTITION first (the partial agg collapses each partition to its
      * run list map-side), only boundary runs — at most 2 per partition —
      * need cross-partition reconciliation, and they take a driver-free
      * tiny-aggregate path. Output run ids are 1-based, dense, in run order.
      */
    def consecutiveRuns(keyCol: Column, order: Seq[Column],
        runCol: String = "run_id", keyOut: String = "key",
        lenOut: String = "run_len"): DataFrame = {
      // adaptive: below the small-sort threshold, per-row run ids + one
      // tiny agg beat the boundary-merge machinery
      if (isSmallSort(df))
        return df.groupConsecutive(keyCol, order, runCol)
          .groupBy(col(runCol))
          .agg(min(keyCol).as(keyOut), count(lit(1)).as(lenOut))
      val flagged = df.groupConsecutiveFlags(keyCol, order)
      // collapse each partition to its runs: __localRun is contiguous
      // within a partition, so the hash agg partially aggregates map-side
      // with at most (#runs in partition) live groups
      val runs = flagged.groupBy(col("__pid"), col("__localRun"))
        .agg(min(col("__key")).as("__key"), count(lit(1)).as("__len"))
        .localCheckpoint(eager = false)
      val stats = runs.groupBy(col("__pid")).agg(
        max(col("__localRun")).as("__nruns"),
        min_by(col("__key"), col("__localRun")).as("__firstKey"),
        max_by(col("__key"), col("__localRun")).as("__lastKey"))
      val tw = Window.orderBy(col("__pid"))
      val offsets = stats
        .withColumn("__mergeIn",
          when(lag(lit(1), 1).over(tw).isNotNull &&
            (lag(col("__lastKey"), 1).over(tw) <=> col("__firstKey")), 1L)
            .otherwise(0L))
        .withColumn("__mergeOut",
          coalesce(lead(col("__mergeIn"), 1).over(tw), lit(0L)))
        .withColumn("__off",
          coalesce(sum(col("__nruns")).over(
            tw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) -
            sum(col("__mergeIn")).over(
              tw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("__pid"), col("__off"), col("__mergeIn"), col("__mergeOut"),
          col("__nruns"))
      val withId = runs.join(broadcast(offsets), "__pid")
        .withColumn(runCol, col("__localRun") + col("__off"))
      // a run needs cross-partition merging only if it touches a merging
      // boundary; everything else passes through MAP-SIDE (broadcast join,
      // no shuffle). Chains (a whole partition being one run) are safe:
      // every segment of the chain lands on the same global run id, and the
      // tiny aggregate sums their lengths.
      val boundary =
        (col("__localRun") === 1 && col("__mergeIn") === 1L) ||
          (col("__localRun") === col("__nruns") && col("__mergeOut") === 1L)
      val through = withId.filter(!boundary)
        .select(col(runCol), col("__key").as(keyOut), col("__len").as(lenOut))
      val merged = withId.filter(boundary)
        .groupBy(col(runCol))
        .agg(min(col("__key")).as(keyOut), sum(col("__len")).as(lenOut))
      through.unionByName(merged)
    }

    /** Shared first phase of [[groupConsecutive]]/[[consecutiveRuns]]:
      * range-partition + sort + per-partition change flags and local run
      * ids, frozen (lazily) for multi-branch consumption. */
    private[ops] def groupConsecutiveFlags(keyCol: Column,
        order: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      df.repartitionByRange(
        math.max(df.sparkSession.sparkContext.defaultParallelism, 1), order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__key", keyCol)
        .withColumn("__chg",
          when(lag(lit(1), 1).over(w).isNull ||
            !(lag(col("__key"), 1).over(w) <=> col("__key")), 1L).otherwise(0L))
        .withColumn("__localRun", sum(col("__chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint(eager = false)
    }

    /** zef `interleave` (impl.py:1183): round-robin merge of this and
      * other under per-side orders, TRUNCATED to the shortest side
      * (reference: output length = sides × N_shortest). */
    def interleave(other: DataFrame, order: Seq[Column]): DataFrame = {
      val a = df.enumerate(order, "__i").withColumn("__src", lit(0))
      val b = other.enumerate(order, "__i").withColumn("__src", lit(1))
      // truncation length from the ENUMERATED (checkpoint-frozen) frames in
      // one aggregate job — two bare count() jobs over the raw inputs paid
      // two extra full scans for a number the enumerates already imply
      val stats = a.agg(max(col("__i")).as("m"), count(lit(1)).as("c"))
        .unionByName(b.agg(max(col("__i")).as("m"), count(lit(1)).as("c")))
        .collect()
      val n = if (stats.exists(_.getLong(1) == 0L)) 0L
        else stats.map(_.getLong(0)).min + 1
      a.unionByName(b).filter(col("__i") < n)
        .orderBy(col("__i"), col("__src"))
        .drop("__i", "__src")
    }

    /** zef `interleave_longest` (impl.py:1226): as [[interleave]] but runs
      * to the LONGEST side — leftover elements keep their round-robin
      * slots. */
    def interleaveLongest(other: DataFrame, order: Seq[Column]): DataFrame = {
      val a = df.enumerate(order, "__i").withColumn("__src", lit(0))
      val b = other.enumerate(order, "__i").withColumn("__src", lit(1))
      a.unionByName(b).orderBy(col("__i"), col("__src"))
        .drop("__i", "__src")
    }

    /** zef `reverse` (impl.py:1824) = flip the order columns downstream;
      * provided for pipeline readability. */
    def reversed(order: Seq[Column]): DataFrame = df.orderBy(order.map(_.desc): _*)

    /** zef `max_by/min_by[f]` top-1 per group (impl.py:3084) — lowered to
      * a hash aggregate (`max`/`min` over a packed struct), NOT a
      * row_number window: the window funnels the whole table through
      * #distinct-keys sort tasks (a 3-value key sorts everything in 3
      * tasks at any scale), while the aggregate keeps map-side partial
      * combine and stays balanced at any key cardinality. Ties under
      * `order` break deterministically by the remaining row columns
      * (extremum of the full packed row). A frame carrying a
      * non-orderable column (map) cannot pack the row itself into a
      * min/max struct; such frames aggregate the winner's CANONICAL
      * IDENTITY instead (orderable columns as-is, maps as recursively
      * sorted entry arrays — [[Orderables.canonicalKey]]) and re-join it
      * to fetch the full rows: still one hash aggregate + one equi-join,
      * map-side combined and key-balanced — no global sort funnel — and
      * deterministic unless two rows differ ONLY inside a
      * non-canonicalizable LEAF type (CalendarInterval-class; nested
      * maps/structs/arrays all canonicalize since r13). Mixed-direction
      * sort expressions: use distinctBy. */
    def maxBy(partition: Seq[Column], order: Seq[Column]): DataFrame =
      topOnePerGroup(partition, order, asc = false)
    def minBy(partition: Seq[Column], order: Seq[Column]): DataFrame =
      topOnePerGroup(partition, order, asc = true)

    private def topOnePerGroup(partition: Seq[Column], order: Seq[Column],
        asc: Boolean): DataFrame = {
      import org.apache.spark.sql.catalyst.expressions.RowOrdering
      val orderable = df.schema.fields.forall(f => RowOrdering.isOrderable(f.dataType))
      if (orderable) {
        val packed = struct(
          order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } ++
            df.columns.map(col): _*)
        val top = if (asc) min(packed) else max(packed)
        df.groupBy(partition: _*).agg(top.as("__top"))
          .select(df.columns.map(c => col("__top").getField(c).as(c)): _*)
      } else {
        // the winner's identity: partition exprs (constant within a
        // group, so they never flip a within-group comparison but make
        // the identity join key group-unique), then the order keys, then
        // every column's canonical orderable key in schema order
        val idStruct = struct(
          partition.zipWithIndex.map { case (c, i) => c.as(s"__p$i") } ++
            order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } ++
            df.schema.fields.zipWithIndex.flatMap { case (f, i) =>
              Orderables.canonicalKey(f.dataType, col(f.name))
                .map(_.as(s"__k$i"))
            }: _*)
        val top = if (asc) min(col("__id")) else max(col("__id"))
        val withId = df.withColumn("__id", idStruct)
        val winners = withId.groupBy(partition: _*).agg(top.as("__top"))
          .select(col("__top"))
        // semi-join back on the identity, then collapse rows that are
        // indistinguishable up to it (differ only in deeper non-orderable
        // nesting) to one per group
        withId.join(winners, col("__id") === col("__top"), "left_semi")
          .dropDuplicates(Seq("__id"))
          .drop("__id")
      }
    }

    /** Skew-salted join — DSL face of [[graft.ops.SkewJoin.saltedJoin]]
      * (deterministic row-hash salt, replicated right side; identical
      * output to the plain join with the hot key spread across `salt`
      * tasks). */
    def saltedJoin(right: DataFrame, key: String, salt: Int): DataFrame =
      SkewJoin.saltedJoin(df, right, Seq(key), salt)
  }
}
