package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_cdc_chunks(bin, minSize, avgBits, maxSize)` → array<struct<
  * offset int, len int, fp bigint>>: content-defined chunking of a binary
  * payload (LBFS/rsync-class, Muthitacharoen et al. 2001; the gear-hash
  * formulation per FastCDC, Xia et al. 2016).
  *
  * Why this exists: multimodal blobs (images, audio, video frames) at
  * 100 TB want storage dedup and near-identical payload detection WITHOUT
  * decoding. Fixed-size chunking breaks on byte insertion — every
  * boundary after the edit shifts, all fingerprints change. CDC draws
  * boundaries where a rolling hash of the content itself hits a mask, so
  * an insertion only re-chunks the neighborhood of the edit and every
  * other chunk fingerprint survives (spec-pinned shift-resistance).
  *
  * Boundary rule: h ← (h << 1) + gear(byte); cut when len ≥ minSize and
  * (h & (2^avgBits − 1)) == 0, or unconditionally at maxSize — expected
  * chunk length ≈ minSize + 2^avgBits. The 256-entry gear table derives
  * from the shared md5 hash family (`hash60("cdc:" + byte)`), and chunk
  * fingerprints are FNV-1a 64 over the chunk bytes — everything
  * deterministic and engine-independent, nothing random.
  *
  * Why a native expression (ladder rung (b)): a stateful byte scan is not
  * expressible with built-in functions short of exploding per-byte rows
  * (a 100 TB blob column would explode to 10^14 rows). One static call
  * inside whole-stage codegen scans each blob once. The DuckDB oracle
  * replays the scan at gate scale as a recursive CTE over unnested bytes
  * (HUGEINT mod-2^64 emulating the wrapping int64 arithmetic); CdcSpec
  * adds coverage invariants, shift resistance, fuzz vs a naive
  * reference. */
case class CdcChunksExpression(
    child: Expression,
    minSize: Int,
    avgBits: Int,
    maxSize: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_chunks requires a binary argument, got ${child.dataType.catalogString}")
    else if (minSize < 1 || avgBits < 1 || avgBits > 28 || maxSize < minSize)
      TypeCheckResult.TypeCheckFailure(
        "graft_cdc_chunks needs 1 <= minSize <= maxSize and avgBits in [1, 28]")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = Cdc.ChunkArray
  override def prettyName: String = "graft_cdc_chunks"
  override protected def nullSafeEval(input: Any): Any =
    Cdc.chunks(input.asInstanceOf[Array[Byte]], minSize, avgBits, maxSize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.Cdc.chunks($c, $minSize, $avgBits, $maxSize)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpression =
    copy(child = newChild)
}

object Cdc {

  val ChunkArray: ArrayType = ArrayType(StructType(Seq(
    StructField("offset", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  /** Deterministic gear table from the shared md5 family. */
  private val Gear: Array[Long] =
    Array.tabulate(256)(b => MinHashNative.hash60("cdc:" + b))

  private val FnvOffset = -3750763034362895579L // 0xcbf29ce484222325
  private val FnvPrime = 1099511628211L

  /** One-pass gear-hash chunker; static so codegen calls it directly. */
  def chunks(bytes: Array[Byte], minSize: Int, avgBits: Int, maxSize: Int): GenericArrayData = {
    val mask = (1L << avgBits) - 1L
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      bytes.length / (minSize + (1 << avgBits)) + 1)
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize) {
        out += row(bytes, start, len)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) out += row(bytes, start, bytes.length - start)
    new GenericArrayData(out.toArray)
  }

  private def row(bytes: Array[Byte], offset: Int, len: Int) = {
    var fp = FnvOffset
    var j = offset
    while (j < offset + len) {
      fp = (fp ^ (bytes(j) & 0xffL)) * FnvPrime
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(offset, len, fp)
  }
}
