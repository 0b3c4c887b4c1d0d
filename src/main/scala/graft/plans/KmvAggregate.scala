package graft.plans

import graft.ext.TextHash
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV / bottom-k theta sketch aggregate `graft_kmv(item, k)` → the k
  * smallest DISTINCT item hashes, as a sorted ascending `array<bigint>`
  * (shorter than k when the slice has fewer distinct items — then the
  * sketch IS the exact distinct hash set).
  *
  * The scale story: cross-slice distinct questions ("how many documents do
  * two crawls share", "how much of source A's vocabulary appears in B")
  * need either a full distinct-key shuffle per slice — the item universe,
  * trillions of keys at 100 TB — or a mergeable bounded synopsis. The KMV
  * sketch (Bar-Yossef et al. 2002; the bottom-k theta form per Dasu et
  * al. / the DataSketches theta family) is that synopsis: k longs per
  * mapper, merge = merged-distinct keep-k-smallest (associative and
  * commutative like any partial agg, so the shuffle carries mappers × k
  * longs), and because every engine keeps the SAME k smallest values of
  * the SAME hash function, sketches of different slices compose AFTER
  * aggregation: θ = the largest retained hash bounds a uniform sample of
  * the union, and intersect/union estimates are pure expression arithmetic
  * over two one-row sketches ([[graft.ext.Sketches.kmvIntersect]]).
  *
  * Determinism (the oracle contract): the hash is the same md5-derived
  * `hmod` as MinHash/CMS — uniform on [0, P) — so a DuckDB oracle rebuilds
  * the identical sketch with `ORDER BY hash LIMIT k` over distinct hashes
  * and every downstream estimate matches bit-for-bit. No RNG anywhere.
  * Null items are ignored (SQL aggregate convention). */
case class KmvAggregate(
    item: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(item, kExpr)

  lazy val k: Int = kExpr.eval(null).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_kmv item must be string, got ${item.dataType.catalogString}")
    else if (!kExpr.foldable ||
      !Seq(ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_kmv k must be an integral literal")
    else {
      val kv = Option(kExpr.eval(null)).map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
      if (kv < 1 || kv > (1L << 18))
        TypeCheckResult.TypeCheckFailure("graft_kmv k must be in [1, 2^18]")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def insert(buffer: java.util.TreeSet[Long], h: Long): Unit =
    if (buffer.size < k) { buffer.add(h); () }
    else if (h < buffer.last()) { if (buffer.add(h)) buffer.pollLast(); () }

  override def update(
      buffer: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = item.eval(input)
    if (v != null) insert(buffer, CmsAggregate.baseHash(v.asInstanceOf[UTF8String]))
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[Long],
      other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.size * 8)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < bytes.length / 8) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAggregate =
    copy(item = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "graft_kmv"
}
