package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash sketch aggregate (SURVEY.md §4 "optional perf
  * extra"): for each group, the element-wise minimum of `numHashes`
  * seeded xxhash64 values over the input strings — i.e. the MinHash
  * signature of the group's shingle set.
  *
  * Why custom: the composable formulation (explode an `numHashes`-long
  * hash array per shingle, groupBy(doc, pos).min) shuffles
  * |shingles| × numHashes rows. This aggregate keeps the signature in a
  * fixed `Array[Long]` buffer, partial-aggregated map-side, so the
  * shuffle carries ONE row of `numHashes` longs per document — the only
  * shape that survives a 100 TB corpus.
  */
case class MinHashAggExpr(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val (base, offset, len) = (s.getBaseObject, s.getBaseOffset, s.numBytes)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUnsafeBytes(base, offset, len, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAggExpr = copy(child = c.head)

  override def prettyName: String = "minhash_sketch"
}

object MinHashAgg {
  /** Column API: MinHash signature (array of `numHashes` longs) of the
    * grouped string column.
    */
  def minhash_sketch(c: Column, numHashes: Int): Column =
    bridge.column(MinHashAggExpr(bridge.expression(c), numHashes)
      .toAggregateExpression())
}
