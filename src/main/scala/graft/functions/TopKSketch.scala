package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters state: at most `cap` counters plus the total
  * ingested count. Counters are LOWER bounds on true frequencies; the MG
  * invariant bounds the undercount by Δ ≤ (n − Σ counters) / (cap + 1),
  * and any item with true count > n/(cap+1) is guaranteed present. When
  * observed cardinality ≤ cap the sketch is EXACT (no decrement ever
  * fires, Δ = 0) — the regime the DuckDB oracle checks; the adversarial
  * regime is spec-checked against an in-memory truth.
  */
final class MGState(val cap: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var n: Long = 0L

  def add(term: String): Unit = addWeighted(term, 1L)

  /** Weighted MG update (Berinde et al., PODS'09 generalization): insert
    * the full weight, then restore the counter bound by subtracting the
    * (cap+1)-th largest value from all — identical to the merge step with
    * a singleton summary, so the undercount invariant carries over with n
    * = total WEIGHT.
    */
  def addWeighted(term: String, w: Long): Unit = {
    if (w <= 0) return
    n += w
    counts.update(term, counts.getOrElse(term, 0L) + w)
    if (counts.size > cap) {
      val vals = counts.values.toArray.sorted(Ordering[Long].reverse)
      val sub = vals(cap)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - sub)
      counts.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(counts.remove)
    }
  }

  /** Mergeable-summaries merge (Agarwal et al., PODS'12): pointwise sum,
    * then subtract the (cap+1)-th largest value and drop non-positives —
    * preserves the MG error invariant additively.
    */
  def mergeIn(other: MGState): MGState = {
    n += other.n
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > cap) {
      val vals = counts.values.toArray.sorted(Ordering[Long].reverse)
      val sub = vals(cap) // (cap+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - sub)
      counts.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(counts.remove)
    }
    this
  }

  /** Upper bound on how much any counter undercounts its true frequency. */
  def errBound: Long = (n - counts.valuesIterator.sum) / (cap + 1)
}

object MGState {
  def toBytes(buffer: MGState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.n)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte], cap: Int): MGState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new MGState(cap)
    st.n = in.readLong()
    val k = in.readInt()
    var i = 0
    while (i < k) { st.counts.update(in.readUTF(), in.readLong()); i += 1 }
    st
  }
}

/** `graft_topk_sketch(term, cap)` — the ClickHouse `topK()` role as a native
  * mergeable Catalyst aggregate (rung (b) of the custom-operator ladder):
  * per-partition Misra–Gries summaries, merged associatively at the
  * exchange, one bounded array out. At 100 TB this is the only sane shape
  * for "top event types right now": the shuffle carries ≤ cap counters per
  * partition instead of the full key cardinality, and the error is bounded
  * and reported (`err` column) rather than silent.
  *
  * eval emits array<struct<term, est, err>> sorted (est desc, term asc) —
  * deterministic under ties; est is the MG lower-bound counter.
  */
case class TopKSketch(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGState] with UnaryLike[Expression] {

  override def prettyName: String = "graft_topk_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("est", LongType),
    StructField("err", LongType))))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_topk_sketch requires a STRING term, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): MGState = new MGState(cap)

  override def update(buffer: MGState, input: InternalRow): MGState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGState, other: MGState): MGState =
    buffer.mergeIn(other)

  override def eval(buffer: MGState): Any = {
    val err = buffer.errBound
    val rows = buffer.counts.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(t), c, err))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MGState): Array[Byte] = MGState.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): MGState = MGState.fromBytes(bytes, cap)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKSketch =
    copy(child = newChild)
}

/** `graft_topk_weighted(term, weight, cap)` — the ClickHouse
  * `topKWeighted()` role: the same MG summary with weighted increments
  * (weight-heavy hitters — "top keys by revenue", not by row count).
  * Exact while observed cardinality ≤ cap; counters are lower bounds on
  * true total weight with the same (W − Σc)/(cap+1) undercount invariant,
  * W = total weight.
  */
case class TopKWeightedSketch(left: Expression, right: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGState]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "graft_topk_weighted"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("est", LongType),
    StructField("err", LongType))))

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ByteType | ShortType | IntegerType | LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_topk_weighted requires (STRING term, integral weight), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def createAggregationBuffer(): MGState = new MGState(cap)

  override def update(buffer: MGState, input: InternalRow): MGState = {
    val t = left.eval(input)
    val w = right.eval(input)
    if (t != null && w != null)
      buffer.addWeighted(t.asInstanceOf[UTF8String].toString,
        w.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: MGState, other: MGState): MGState =
    buffer.mergeIn(other)

  override def eval(buffer: MGState): Any = {
    val err = buffer.errBound
    val rows = buffer.counts.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(t), c, err))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MGState): Array[Byte] = MGState.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): MGState = MGState.fromBytes(bytes, cap)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKWeightedSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKWeightedSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKWeightedSketch =
    copy(left = newLeft, right = newRight)
}

object TopKSketch {
  /** Column builder: aggregate to array<struct<term, est, err>>. */
  def topkSketch(term: Column, cap: Int): Column =
    GraftSqlBridge.column(
      TopKSketch(GraftSqlBridge.expression(term), cap).toAggregateExpression())

  /** Weighted variant: `weight` must be a LONG column. */
  def topkWeighted(term: Column, weight: Column, cap: Int): Column =
    GraftSqlBridge.column(
      TopKWeightedSketch(GraftSqlBridge.expression(term),
        GraftSqlBridge.expression(weight), cap).toAggregateExpression())
}
