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

/** KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002 /
  * Beyer et al. 2007's unbiased estimator: keep the `k` smallest DISTINCT
  * hash values of a column; if fewer than k distinct hashes exist the
  * count is exact, otherwise D ≈ (k−1)/U_(k) where U_(k) is the k-th
  * smallest hash normalized to (0,1).
  *
  * Why not Spark's `approx_count_distinct`: its HLL++ register layout is
  * implementation-defined, so no independent engine can replay it — this
  * sketch is pure order statistics of md5 hashes, which any engine
  * reproduces bit-for-bit (the DuckDB oracle replays it with a window
  * rank). Exactness of the replay is the point; the ±1/√k accuracy story
  * is the same as any KMV.
  *
  * Scale shape: the buffer is a ≤k-entry distinct set per group that
  * dedups on insert, so the PARTIAL phase absorbs any number of repeated
  * values map-side and only ≤k longs per (partition × group) cross the
  * shuffle — same contract as [[TopKByScore]], plus dedup. Sketches merge
  * associatively (set-union, cap k), which is what makes per-day /
  * per-shard sketches combinable without rescanning (spec-asserted).
  *
  * Output: the ascending array of the ≤k minimum distinct hashes. The
  * estimate is left to plain column arithmetic over the array, so the
  * sketch itself stays storable/mergeable.
  */
case class KmvSketch(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(hash)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (hash.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName hash must be BIGINT, got ${hash.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val h = hash.eval(input)
    if (h != null) {
      buf.add(h.asInstanceOf[Long])
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long],
                     b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach { h => a.add(h); if (a.size > k) a.remove(a.last) }
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    // box explicitly: TreeSet[Long].toArray is a primitive [J, which is
    // not an Array[Any] at runtime
    new GenericArrayData(buf.toArray.map(x => x: Any))

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.add(in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
}

object KmvSketch {
  /** Column API: `kmv(hash, k)` aggregate → ascending ARRAY<BIGINT>. */
  def kmv(hash: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvSketch(GraftSqlBridge.expression(hash), k).toAggregateExpression())

  /** Distinct-count estimate from a KMV array: exact size when the
    * sketch is unsaturated, else (k−1)·2^60/h_(k) (hashes are 60-bit md5
    * prefixes). Plain column arithmetic — identical in any engine. */
  def estimate(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * (1L << 60).toDouble) /
        element_at(sketch, k).cast("double"))
  }
}
