package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate: keeps the k best (score, id)
  * pairs under the ordering (score asc|desc, id asc — id breaks ties),
  * returned as a rank-ordered `array<struct<score:double, id:bigint>>`.
  *
  * Why custom: the composable per-query top-k (`row_number` over
  * `Window.partitionBy(qid)`) ships EVERY candidate score to one task
  * per query — per-query shuffle bytes grow with corpus size N. This
  * aggregate's buffer is a fixed k-slot insertion array that partial-
  * aggregates map-side, so the exchange carries at most k pairs per
  * (query × map partition) — bounded by k, not N, which is the only
  * shape that survives a 100 TB candidate side. Ties resolve exactly
  * like the window formulation's `orderBy(score, id)`, so results are
  * row-identical to the plan it replaces.
  *
  * The k-slot insertion buffer is O(k) per update — for ANN-scale k
  * (≤ a few hundred) that beats heap bookkeeping; the hot path is a
  * branch + `System.arraycopy`.
  *
  * NULL semantics: rows whose score or id is null are SKIPPED (standard
  * aggregate-ignores-nulls behavior). This differs from the
  * nulls-first ascending `row_number` windows this aggregate replaced,
  * which ranked a null-distance row (e.g. from a length-mismatched
  * vector) into the top-k. Callers that must surface malformed inputs
  * loudly should assert score non-nullness upstream.
  */
case class TopKAggExpr(
    score: Expression,
    id: Expression,
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"top_k needs k > 0, got $k")

  // analysis-time typing: SQL `top_k(int_col, id, 3, false)` must fail
  // analysis with a clear type-mismatch error, not die at runtime with
  // a ClassCastException in update(). Strict (no implicit widening):
  // callers cast scores to double / ids to bigint explicitly, keeping
  // the buffer layout visible at the call site.
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k score must be DOUBLE, got ${score.dataType.sql} — cast explicitly")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k id must be BIGINT, got ${id.dataType.sql} — cast explicitly")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, ascending)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, ascending)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAggExpr =
    copy(score = c(0), id = c(1))

  override def prettyName: String = "top_k"
}

/** Fixed-capacity rank-ordered (score, id) buffer: slot 0 is the best
  * pair, comparisons are (score asc|desc, id asc). Insertion keeps the
  * array sorted — O(k) worst case via one arraycopy shift.
  */
final class TopKBuffer(val k: Int, val ascending: Boolean) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /* strict "a ranks before b" under (score asc|desc, id asc) */
  private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) { if (ascending) c < 0 else c > 0 }
    else i1 < i2
  }

  def insert(s: Double, i: Long): Unit = {
    if (n == k && !before(s, i, scores(n - 1), ids(n - 1))) return
    // binary search for the insertion slot among the current n entries
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(s, i, scores(mid), ids(mid))) hi = mid else lo = mid + 1
    }
    val last = math.min(n, k - 1)
    if (last > lo) {
      System.arraycopy(scores, lo, scores, lo + 1, last - lo)
      System.arraycopy(ids, lo, ids, lo + 1, last - lo)
    }
    scores(lo) = s
    ids(lo) = i
    if (n < k) n += 1
  }
}

object TopKAgg {
  /** Column API: rank-ordered `array<struct<score, id>>` of the group's
    * k best pairs — `ascending = true` for distances (smallest first),
    * `false` for similarities (largest first); ids break score ties
    * ascending, matching `row_number` over `orderBy(score, id)`.
    */
  def top_k(score: Column, id: Column, k: Int, ascending: Boolean): Column =
    bridge.column(TopKAggExpr(bridge.expression(score),
      bridge.expression(id), k, ascending).toAggregateExpression())
}
