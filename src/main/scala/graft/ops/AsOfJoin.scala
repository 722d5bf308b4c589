package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single nearest right row at-or-before
  * (backward) / at-or-after (forward) its time, per equi-key: pandas
  * `merge_asof`, DuckDB/QuestDB `ASOF JOIN`. Spark has no native operator;
  * the naive lowering (per-left-row max-over-right subquery, or a range
  * join + argmax) is quadratic in key history.
  *
  * Lowering here is the scalable union trick: tag both inputs, union them,
  * and carry the last right payload over a (key, time, side) window — ONE
  * shuffle on the key, one in-partition sort, linear scan. At 100 TB this
  * is the same cost shape as any keyed aggregation; there is no per-row
  * probe and no quadratic candidate set.
  *
  * Left-join semantics: unmatched (or out-of-tolerance) left rows keep
  * nulls in the right-value columns. Matching is INCLUSIVE at equal
  * timestamps (DuckDB `l.ts >= r.ts` convention).
  *
  * Tie contract: when several right rows share the winning (key, time),
  * the winner is the MAXIMUM over the payload's CANONICAL TIE KEYS —
  * lexicographic over the right value columns in column order, where an
  * orderable column is its own key and a map contributes its recursively
  * sorted entry array ([[Orderables.canonicalKey]]) — in BOTH lowerings
  * ([[backwardSmallRight]]'s sorted history + `element_at(-1)` and the
  * union+window path's `__tie` in the window ordering), so results are
  * partitioning-independent and the two paths agree row-for-row,
  * map-carrying payloads included. Residual: right rows identical in
  * every canonicalizable column (i.e. differing only inside a
  * non-canonicalizable LEAF type — CalendarInterval-class; nested
  * maps/structs/arrays all canonicalize since r13) keep an
  * unspecified winner.
  */
object AsOfJoin {

  /** Most recent right row with `right.rightTime <= left.leftTime`.
    * `toleranceSec` (on the TimeAxis.seconds scale — epoch seconds for
    * timestamp / timestamp_ntz axes, raw units for numeric axes) drops
    * matches further back than the bound, like merge_asof's `tolerance`. */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      toleranceSec: Option[Double] = None): DataFrame =
    joinImpl(left, right, on, leftTime, rightTime, toleranceSec, fwd = false)

  /** Earliest right row with `right.rightTime >= left.leftTime`. */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      toleranceSec: Option[Double] = None): DataFrame =
    joinImpl(left, right, on, leftTime, rightTime, toleranceSec, fwd = true)

  /** Backward as-of join for a SMALL right side (reference data / slowly
    * changing dimensions): pack each key's right history into one sorted
    * array, BROADCAST it, and resolve per left row with codegen'd array
    * functions. The big fact side never shuffles — at 100 TB this is the
    * difference between a map-only pass and an all-to-all of the facts
    * (the union+window [[backward]] stays the right plan when both sides
    * are large). Histories ride in executor memory: right must fit a
    * broadcast (same contract as any broadcast join). */
  def backwardSmallRight(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      toleranceSec: Option[Double] = None): DataFrame = {
    val rightVals = right.columns.filterNot(c => on.contains(c) || c == rightTime)
    val clash = rightVals.intersect(left.columns)
    require(clash.isEmpty,
      s"right value columns clash with left: ${clash.mkString(", ")} — alias them first")
    require(rightVals.nonEmpty, "right side carries no value columns")
    requireNoReserved(left, right)
    val payload = struct(col(rightTime).as("__rt") +: rightVals.map(col): _*)
    val payloadOrderable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.select(payload).schema.head.dataType)
    val hist =
      if (payloadOrderable)
        // the common case: the payload struct IS its own canonical order
        right.groupBy(on.map(col): _*)
          .agg(sort_array(collect_list(payload)).as("__hist"))
      else {
        // map-carrying payloads can't ride sort_array — sort the history
        // by the CANONICAL tie-key struct instead (same keys the window
        // lowering orders by, so the two paths agree row-for-row), with
        // the payload riding alongside
        val tie = tieStruct(right, rightTime, rightVals)
        right.groupBy(on.map(col): _*)
          .agg(array_sort(
            collect_list(struct(tie.as("__tk"), payload.as("__pl"))),
            (a, b) => when(a.getField("__tk") < b.getField("__tk"), -1)
              .when(a.getField("__tk") > b.getField("__tk"), 1)
              .otherwise(0))
            .as("__histkv"))
          .withColumn("__hist", col("__histkv.__pl"))
          .drop("__histkv")
      }
    val joined = left.join(broadcast(hist), on, "left")
    val eligible = filter(col("__hist"),
      h => h.getField("__rt") <= col(leftTime))
    val m = when(size(eligible) > 0, element_at(eligible, -1))
    val lSec = TimeAxis.seconds(left.schema(leftTime).dataType, col(leftTime))
    def rSec(c: org.apache.spark.sql.Column) =
      TimeAxis.seconds(right.schema(rightTime).dataType, c)
    val ok = toleranceSec.foldLeft(m.isNotNull)((acc, tol) => acc &&
      lSec - rSec(m.getField("__rt")) <= lit(tol))
    joined.select(
      left.columns.map(col) ++
        rightVals.map(v => when(ok, m.getField(v)).as(v)): _*)
  }

  /** Canonical tie-key struct over a right payload: the time column plus
    * each value column's canonical orderable key (itself when orderable,
    * recursively sorted map entries — [[Orderables.canonicalKey]]);
    * a non-canonicalizable leaf contributes nothing and keeps the
    * documented unspecified-residual. Shared by both lowerings so their
    * tie winners agree. */
  private def tieStruct(right: DataFrame, rightTime: String,
      rightVals: Seq[String]): org.apache.spark.sql.Column =
    struct(col(rightTime).as("__rt") +:
      rightVals.zipWithIndex.flatMap { case (v, i) =>
        Orderables.canonicalKey(right.schema(v).dataType, col(v))
          .map(_.as(s"__k$i"))
      }: _*)

  /** Inputs carrying the lowering's internal names would be silently
    * overwritten (`withColumn` replaces) or make the packed struct's
    * field lookup ambiguous — reject loudly, like the value-clash check. */
  private def requireNoReserved(left: DataFrame, right: DataFrame): Unit = {
    val reserved = Set("__t", "__r", "__side", "__m", "__hist", "__rt", "__tie")
    val bad = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(bad.isEmpty,
      s"as-of join: column names ${bad.mkString(", ")} are reserved by the " +
        "lowering — alias them first")
  }

  private def joinImpl(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, toleranceSec: Option[Double],
      fwd: Boolean): DataFrame = {
    val rightVals = right.columns.filterNot(c => on.contains(c) || c == rightTime)
    val clash = rightVals.intersect(left.columns)
    require(clash.isEmpty,
      s"right value columns clash with left: ${clash.mkString(", ")} — alias them first")
    require(rightVals.nonEmpty, "right side carries no value columns")
    requireNoReserved(left, right)

    // right rows pack their payload into one struct; left rows carry null.
    // side 0 = right sorts BEFORE side 1 = left at equal time in both
    // directions, which is what makes the match inclusive. NULL-time
    // right rows are dropped up front: under SQL semantics (null <= t is
    // null) they can match nothing, but asc ordering sorts nulls FIRST,
    // so an unfiltered null-time right row was picked up by last() for
    // every left row older than all real rights — a fabricated match the
    // smallRight lowering (whose history filter drops null __rt) never
    // produced.
    val payload = struct(col(rightTime).as("__rt") +: rightVals.map(col): _*)
    // the common case — an orderable payload struct IS its own canonical
    // tie key (field-for-field what tieStruct would build), so shipping a
    // separate __tie column through the key shuffle doubled right-row
    // width for nothing; only map-carrying payloads need the canonical
    // key column (same branch smallRight takes)
    val payloadOrderable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.select(payload).schema.head.dataType)
    val rPre = right.filter(col(rightTime).isNotNull).select(
      on.map(col) ++ Seq(
        col(rightTime).as("__t"),
        payload.as("__r"),
        lit(0).as("__side")) ++
        (if (payloadOrderable) Nil
         else Seq(tieStruct(right, rightTime, rightVals).as("__tie"))): _*)
    val rType = rPre.schema("__r").dataType
    val lPre0 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__r", lit(null).cast(rType))
      .withColumn("__side", lit(1))
    val lPre =
      if (payloadOrderable) lPre0
      else lPre0.withColumn("__tie",
        lit(null).cast(rPre.schema("__tie").dataType))

    val ord = if (fwd) col("__t").desc else col("__t").asc
    // the tie order breaks duplicate-(key, time) right rows by max
    // CANONICAL key — the row sorting LAST wins under last() — mirroring
    // backwardSmallRight's element_at(-1) over its sorted history, so the
    // winner is partitioning-independent, map-carrying payloads included
    // (canonical keys are orderable by construction; the payload struct
    // itself may not be). Left rows carry a null tie column and always
    // sort by (__t, __side) alone.
    val tieOrd = if (payloadOrderable) col("__r").asc else col("__tie").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(ord, col("__side").asc, tieOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lPre.unionByName(rPre, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val lSec = TimeAxis.seconds(left.schema(leftTime).dataType, col("__t"))
    val rSec = TimeAxis.seconds(right.schema(rightTime).dataType, col("__m.__rt"))
    val dist = if (fwd) rSec - lSec else lSec - rSec
    // `__t.isNotNull`: a NULL-time LEFT row matches nothing (null <= t is
    // null in SQL) — under desc ordering nulls sort LAST, so the forward
    // lowering's window otherwise handed such rows the earliest right row
    val ok = toleranceSec.foldLeft(
      col("__m").isNotNull && col("__t").isNotNull)(
      (acc, tol) => acc && dist <= lit(tol))
    matched.select(
      left.columns.map(col) ++
        rightVals.map(v => when(ok, col(s"__m.`$v`")).as(v)): _*)
  }
}
