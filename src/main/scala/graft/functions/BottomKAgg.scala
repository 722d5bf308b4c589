package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Expression, Literal, Md5}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic bounded per-group sampling — `sample_k(x, k, seed)` keeps
  * the k group members with the SMALLEST `md5(seed || x)`: a bottom-k
  * sketch, i.e. a uniform sample that is a pure function of the values
  * (never `rand()`), so re-runs, backfills, and different partitionings
  * all select the same rows — and a different seed draws an independent
  * sample.
  *
  * A custom Catalyst `TypedImperativeAggregate` (same extension tier as
  * [[MinHashAgg]]): the buffer holds at most 2k (hash, value) pairs, so
  * partial aggregation does the heavy lifting map-side and the shuffle
  * carries O(k) state per group — versus the window-function formulation
  * (`row_number() OVER (ORDER BY md5(...)) <= k`) which shuffles EVERY row
  * of every group. md5 (not xxhash) is deliberate: it makes the selection
  * engine-portable, which is what lets DuckDB oracle the exact sample.
  */
case class BottomKAgg(
    child: Expression,
    k: Int,
    seed: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(String, Any)]] {

  type Buf = scala.collection.mutable.ArrayBuffer[(String, Any)]

  private lazy val hashExpr: Expression =
    Md5(Cast(Concat(Seq(Literal(UTF8String.fromString(seed), StringType),
      Cast(child, StringType))), BinaryType))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.ArrayBuffer.empty

  /** Total order on entries: hash first; value tiebreak only matters under
    * an md5 collision (lexicographic on toString — matches the oracle's
    * value tiebreak for all realistic inputs). */
  private def lt(a: (String, Any), b: (String, Any)): Boolean = {
    val c = a._1.compareTo(b._1)
    if (c != 0) c < 0 else a._2.toString < b._2.toString
  }

  /** Keep the buffer bounded: amortized compaction to the k smallest once
    * it doubles. */
  private def compact(buf: Buf): Buf = {
    if (buf.size > 2 * k) {
      val kept = buf.sortWith(lt).take(k)
      buf.clear(); buf ++= kept
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val h = hashExpr.eval(input).asInstanceOf[UTF8String].toString
      val copied = v match {
        case s: UTF8String => s.clone()
        case other => other
      }
      buf += ((h, copied))
      compact(buf)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.sortWith(lt).take(k).map(_._2).toArray)

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val entries = buf.sortWith(lt).take(k)
    out.writeInt(entries.size)
    entries.foreach { case (h, v) =>
      out.writeUTF(h)
      child.dataType match {
        case LongType => out.writeLong(v.asInstanceOf[Long])
        case IntegerType => out.writeInt(v.asInstanceOf[Int])
        case StringType =>
          val b = v.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case other => throw new UnsupportedOperationException(
          s"sample_k: unsupported value type $other")
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf: Buf = scala.collection.mutable.ArrayBuffer.empty
    var i = 0
    while (i < n) {
      val h = in.readUTF()
      val v: Any = child.dataType match {
        case LongType => in.readLong()
        case IntegerType => in.readInt()
        case StringType =>
          val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
        case other => throw new UnsupportedOperationException(
          s"sample_k: unsupported value type $other")
      }
      buf += ((h, v))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "sample_k"
}

object BottomKAgg {
  /** Column form: sampleK(valueCol, k, seed) in groupBy().agg(...) —
    * returns a sorted-by-hash array of the k sampled values. Supported
    * value types: long, int, string. */
  def sampleK(value: Column, k: Int, seed: String = ""): Column = {
    require(k > 0, "k must be positive")
    val e = ColumnBridge.expression(value)
    ColumnBridge.column(BottomKAgg(e, k, seed).toAggregateExpression())
  }
}
