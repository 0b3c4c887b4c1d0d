package graft.plans

import graft.ext.TextHash
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch aggregate `graft_cms(item, d, w)` → flat
  * `array<bigint>` of length d·w (row-major d hash rows × w buckets).
  *
  * The scale story: exact frequency counting (`groupBy(item).count()`)
  * hash-shuffles the ENTIRE distinct-item universe — for corpus n-grams at
  * 100 TB that universe is trillions of keys and the shuffle IS the job.
  * This sketch is a fixed d·w long buffer per mapper, partial-aggregation
  * friendly (merge = elementwise add, exactly like any partial sum), so
  * the shuffle carries mappers × (d·w) longs — independent of the item
  * universe — and any candidate's count is then estimated as
  * `min_i sketch[i·w + h_i(x)]`, an overestimate by at most the collision
  * mass (ε ≈ e/w per row, δ ≈ e^-d). Candidates come from a lexicon, a
  * sample, or a bounded per-partition heap — the sketch answers
  * frequencies, not membership.
  *
  * Determinism: h_i(x) = ((a_i·hmod(x) + b_i) mod P) mod w over the SAME
  * md5-derived universal-hash family as MinHash ([[TextHash.hashParams]]),
  * so a DuckDB oracle rebuilds the identical table and the gate compares
  * estimates exactly. Null items are ignored (SQL aggregate convention). */
case class CmsAggregate(
    item: Expression,
    dExpr: Expression,
    wExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(item, dExpr, wExpr)

  lazy val d: Int = dExpr.eval(null).asInstanceOf[Number].intValue()
  lazy val w: Int = wExpr.eval(null).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cms item must be string, got ${item.dataType.catalogString}")
    else if (!dExpr.foldable || !wExpr.foldable ||
      !Seq(dExpr, wExpr).forall(e =>
        Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType)))
      TypeCheckResult.TypeCheckFailure("graft_cms d and w must be integral literals")
    else {
      val dv = Option(dExpr.eval(null)).map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
      val wv = Option(wExpr.eval(null)).map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
      if (dv < 1 || dv > TextHash.NumHashes)
        TypeCheckResult.TypeCheckFailure(
          s"graft_cms d must be in [1, ${TextHash.NumHashes}]")
      else if (wv < 1 || wv > (1L << 22))
        TypeCheckResult.TypeCheckFailure("graft_cms w must be in [1, 2^22]")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val h = CmsAggregate.baseHash(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < d) {
        val (a, b) = TextHash.hashParams(i)
        val bucket = (((a * h + b) % TextHash.P) % w).toInt
        buffer(i * w + bucket) += 1
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAggregate =
    copy(item = newChildren(0), dExpr = newChildren(1), wExpr = newChildren(2))

  override def prettyName: String = "graft_cms"
}

object CmsAggregate {
  /** The same 60-bit-md5-mod-P base hash as [[TextHash.hmod]], through
    * [[MinHashNative.hash60]]'s byte-level path (thread-local digest, no
    * hex strings — the per-item cost IS the sketch's hot loop). */
  def baseHash(s: UTF8String): Long =
    MinHashNative.hash60(s.toString) % TextHash.P
}
