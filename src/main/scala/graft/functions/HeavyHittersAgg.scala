package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Heavy hitters — `heavy_hitters(x, capacity)`: the Misra–Gries frequent-
  * items summary as a custom Catalyst aggregate (the mergeable-summaries
  * formulation of Agarwal et al., same extension tier as [[MinHashAgg]] /
  * [[BottomKAgg]]).
  *
  * Guarantees with `capacity` counters over N rows: every item with true
  * count > N/(capacity+1) is present, and each reported estimate satisfies
  * `true - N/(capacity+1) <= est <= true` — regardless of partitioning or
  * merge order. Exact (est = true count, all items) whenever the group's
  * distinct-item count fits `capacity`, which is what lets an oracle query
  * hash-check the machinery end-to-end.
  *
  * Scale shape: the buffer is O(capacity) — partial aggregation squeezes
  * each map task's rows into `capacity` counters and the shuffle carries
  * only that, versus an exact groupBy-count whose shuffle is O(distinct
  * items). This is THE aggregate for "top domains / top tokens / top
  * near-dup clusters over 100 TB" where the long tail is the cost.
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[Any, Long]] {

  type Buf = scala.collection.mutable.HashMap[Any, Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("est_count", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      // probe with the RAW value first (UTF8String hashes/compares by
      // content): the dominant heavy-hitter path is an already-present
      // key, and cloning there allocated + copied bytes per corpus row
      // only to discard them; clone only when actually inserting (the raw
      // ref may alias a reused row buffer, so stored keys must own bytes)
      if (buf.contains(v)) buf(v) += 1L
      else if (buf.size < capacity) {
        val key = v match {
          case s: UTF8String => s.clone()
          case other => other
        }
        buf(key) = 1L
      } else decrementAll(buf, 1L)
    }
    buf
  }

  /** The MG overflow step: charge `by` against every counter, dropping the
    * ones that reach zero (each decrement "pairs off" occurrences of
    * capacity+1 distinct items — the source of the N/(capacity+1) bound). */
  private def decrementAll(buf: Buf, by: Long): Unit = {
    val dead = buf.iterator.filter(_._2 <= by).map(_._1).toList
    buf.mapValuesInPlace((_, c) => c - by)
    dead.foreach(buf.remove)
  }

  /** Mergeable-summaries merge: add counts pairwise; if over capacity,
    * subtract the (capacity+1)-th largest count from everything. */
  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    if (buf.size > capacity) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      decrementAll(buf, cut)
    }
    buf
  }

  /** Deterministic output order: estimate desc, item string asc. */
  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.toArray
      .sortBy { case (k, c) => (-c, k.toString) }
      .map { case (k, c) => InternalRow(k, c) })

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      child.dataType match {
        case LongType => out.writeLong(k.asInstanceOf[Long])
        case IntegerType => out.writeInt(k.asInstanceOf[Int])
        case StringType =>
          val b = k.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case other => throw new UnsupportedOperationException(
          s"heavy_hitters: unsupported item type $other")
      }
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf: Buf = scala.collection.mutable.HashMap.empty
    var i = 0
    while (i < n) {
      val k: Any = child.dataType match {
        case LongType => in.readLong()
        case IntegerType => in.readInt()
        case StringType =>
          val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
        case other => throw new UnsupportedOperationException(
          s"heavy_hitters: unsupported item type $other")
      }
      buf(k) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {
  /** Column form: heavyHitters(itemCol, capacity) in groupBy().agg(...) —
    * returns array<struct<item, est_count>> sorted by estimate desc.
    * Supported item types: long, int, string. */
  def heavyHitters(item: Column, capacity: Int): Column = {
    require(capacity > 0, "capacity must be positive")
    val e = ColumnBridge.expression(item)
    ColumnBridge.column(HeavyHittersAgg(e, capacity).toAggregateExpression())
  }

  /** Typed entry over a resolved frame: rejects unsupported item types at
    * PLAN time with a usable message — unchecked, serialize() threw
    * UnsupportedOperationException mid-job after the whole map stage ran
    * (and only when partial aggregation happened to kick in). */
  def heavyHittersChecked(df: org.apache.spark.sql.DataFrame, itemCol: String,
      capacity: Int): Column = {
    val dt = df.schema(itemCol).dataType
    require(dt == LongType || dt == IntegerType || dt == StringType,
      s"heavy_hitters: unsupported item type $dt for '$itemCol' — " +
        "supported: long, int, string (cast first)")
    heavyHitters(org.apache.spark.sql.functions.col(itemCol), capacity)
  }
}
