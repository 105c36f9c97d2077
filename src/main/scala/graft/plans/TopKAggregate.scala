package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate — the one-pass physical form of
  * "ORDER BY score DESC LIMIT k per group" (SURVEY.md §4: multi-query kNN
  * without a window sort).
  *
  * The window-rank formulation shuffles every scored row to its query's
  * partition and ranks there; this aggregate keeps a k-sized heap per
  * group in the PARTIAL phase (map side), so only k rows per (partition ×
  * query) cross the shuffle — at 100 TB, the shuffle volume drops from
  * |collection|·|queries| rows to |partitions|·|queries|·k. Heaps merge
  * associatively in the FINAL phase.
  *
  * Semantics: top `k` (score, id) pairs by (score DESC, id ASC) — the
  * exact ordering the declared kNN queries use, so results are
  * hash-identical to the window form. Output: ARRAY<STRUCT<score, id>>
  * in rank order (explode to rows + posexplode for ranks).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id)
  // analysis-time contract: update() casts with asInstanceOf, so a
  // non-DOUBLE score or non-BIGINT id must fail analysis, not the task
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType != DoubleType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName score must be DOUBLE, got ${score.dataType.catalogString}")
    else if (id.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName id must be BIGINT, got ${id.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_topk"

  /** Rank order matching Spark's window sort `desc(score), asc(id)`:
    * best-first, with NaN ordered ABOVE +Inf (java.lang.Double.compare —
    * the same total order Spark's descending sort uses, so a NaN score
    * ranks #1 in both physical forms). The max-heap dequeues the GREATEST
    * element under this ordering = the current worst. */
  private val rankOrder: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // higher score first
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](rankOrder)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // +0.0 normalization: Spark's sort treats -0.0 == 0.0, Double.compare
      // does not; -0.0 + 0.0 == +0.0 (NaN passes through unchanged)
      buf.enqueue((s.asInstanceOf[Double] + 0.0, i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { e => a.enqueue(e); if (a.size > k) a.dequeue() }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(rankOrder)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** Column API: `topK(score, id, k)` aggregate. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByScore(GraftSqlBridge.expression(score),
        GraftSqlBridge.expression(id), k).toAggregateExpression())
}
