package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Single-pass MinHash signature aggregate — a custom Catalyst
  * `TypedImperativeAggregate` (the (b) extension tier of the build rules:
  * a native aggregate expression, not a UDAF).
  *
  * Semantics: for k virtual hash functions h_i(x) = h1(x) + i·h2(x)
  * (standard double hashing; Kirsch-Mitzenmacher), the signature is
  * sig[i] = min over group of h_i(x). One buffer of k longs, updated with
  * TWO xxhash64 evaluations per row — versus k independent `min(xxhash64)`
  * aggregate columns (k hash evaluations per row and k aggregate buffers).
  * Partial aggregation (merge = element-wise min) comes from the aggregate
  * contract, so the shuffle carries one k-long array per group.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val h1 = XxHash64(Seq(child), 42L)
  private lazy val h2 = XxHash64(Seq(child), 7919L)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    if (child.eval(input) != null) {
      val a = h1.eval(input).asInstanceOf[Long]
      val b = h2.eval(input).asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = a + i * b
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  /** Column form: minhash(shingleCol, k) usable in groupBy().agg(...). */
  def minhash(shingle: Column, numHashes: Int): Column = {
    // 0 would emit empty signatures (every doc identical -> the LSH
    // candidate join degenerates to a cross product); negative crashes
    // in serialize() mid-job. Reject at plan time.
    require(numHashes > 0, s"minhash: numHashes must be positive, got $numHashes")
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(shingle), numHashes)
        .toAggregateExpression())
  }
}
