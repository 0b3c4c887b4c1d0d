package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked DETERMINISTIC STUB (`decodeStub`) — the
  * Spark-side contract is real and tested: schema (binary payload + struct
  * metadata), partition-wise batch iteration (`mapPartitions`, one decoder
  * init per partition — the Scala analogue of a pandas-batched UDF), and the
  * feature-row output shape. Swapping `decodeStub` for a real codec changes
  * no plumbing.
  *
  * Scale notes: binary payloads make wide rows — keep
  * `spark.sql.files.maxPartitionBytes` moderate, never collect; feature
  * extraction is embarrassingly parallel (no shuffle).
  */
object Multimodal {

  final case class MediaRecord(
      doc_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      byte_len: Long,
      width: Int, // stub: derived dimensions
      height: Int,
      channels: Int,
      first_byte: Int,
      n_frames: Int)

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Attach a fake binary payload derived from a text column (UTF-8 bytes) —
    * the testdata has no real media; this exercises the binary-column path
    * end-to-end. kind cycles image/audio/video by doc_id. */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("doc_id"),
      element_at(
        typedLit(Seq("image", "audio", "video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real implementation would parse the codec header and
    * decode frames (??? in this container — no image/audio libs). The stub
    * derives deterministic pseudo-features from the bytes so the pipeline is
    * testable end-to-end. One "decoder init" per partition, batch iteration
    * inside — the real-codec call pattern. */
  def decodeStub(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    // per-partition decoder initialization would happen here (expensive
    // library setup amortized over the partition, not per row)
    records.map { r =>
      val len = r.payload.length
      MediaFeatures(
        doc_id = r.doc_id,
        kind = r.kind,
        byte_len = len.toLong,
        width = len % 640,
        height = len % 480,
        channels = 3,
        first_byte = if (len > 0) r.payload(0) & 0xff else -1,
        n_frames = if (r.kind == "video") len % 30 else 1)
    }
  }

  /** Full pipeline: attach binary → partition-wise decode → features. */
  def extractFeatures(df: DataFrame, idCol: String, textCol: String): Dataset[MediaFeatures] =
    attachBinary(df, idCol, textCol).mapPartitions(decodeStub)

  /** Frame sampling for video payloads: every `stride`-th byte offset as a
    * stub "frame" (the real op samples decoded frames); demonstrates
    * exploding one media row into per-frame rows without a shuffle. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    media.toDF()
      .where(col("kind") === "video")
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, int(octet_length(payload)/$stride)), i -> i * $stride)"))
          .as(Seq("frame_idx", "byte_offset")))
  }

  /** 60-bit perceptual average-hash of a binary column via the
    * `graft_avg_hash` codegen kernel (one O(L) scan per blob, no shuffle)
    * — the near-dup signature for media payloads. Feed the result to
    * [[graft.ext.Dedup.hammingNeighbors]] for exact corpus-scale
    * Hamming-radius pair search: identical payloads collide at distance
    * 0, locally-edited ones land within a small radius. */
  def avgHash(bin: Column): Column =
    call_function("graft_avg_hash", bin)

  /** Content-defined chunks of a binary column (no codec needed): adds a
    * `chunks` array<struct<offset,len,fp>> via the `graft_cdc_chunks`
    * native expression — shift-resistant boundaries, so storage-level
    * dedup survives byte insertions that would shift every fixed-size
    * chunk. One codegen scan per blob, no shuffle. */
  def cdcChunks(
      df: DataFrame,
      binCol: String,
      minSize: Int = 256,
      avgBits: Int = 10,
      maxSize: Int = 8192
  ): DataFrame =
    // pinned to one evaluation per row: the explode consumer triggers
    // InferFiltersFromGenerate, whose inferred size(chunks)>0 filter
    // would otherwise alias-inline a SECOND full chunking pass (and on
    // wide synthetic inputs overflow the 64 KB codegen method limit,
    // silently dropping the stage to interpreted execution)
    df.withColumn("chunks", graft.plans.EvalOnceExpression.evalOnce(
      call_function("graft_cdc_chunks",
        col(binCol), lit(minSize), lit(avgBits), lit(maxSize))))

  /** Chunk-level dedup accounting over a blob corpus — the storage-savings
    * question ("how many bytes are redundant across payloads") answered
    * with two partial-agg passes: explode chunks once, count/sum raw, and
    * aggregate per distinct fingerprint (identical fp ⇒ identical chunk
    * bytes up to 64-bit FNV collision — accounting-grade, documented).
    * Returns one row: (n_blobs, n_chunks, total_bytes, uniq_chunks,
    * uniq_bytes). */
  def cdcDedupStats(
      df: DataFrame,
      binCol: String,
      minSize: Int = 256,
      avgBits: Int = 10,
      maxSize: Int = 8192
  ): DataFrame = {
    val ch = cdcChunks(df, binCol, minSize, avgBits, maxSize)
      .select(explode(col("chunks")).as("c"))
      .select(col("c.len").as("len"), col("c.fp").as("fp"))
    val perFp = ch.groupBy("fp").agg(count(lit(1)).as("n"), min("len").as("len"))
    df.agg(count(lit(1)).as("n_blobs"))
      .crossJoin(perFp.agg(
        sum("n").as("n_chunks"),
        sum(col("n") * col("len")).as("total_bytes"),
        count(lit(1)).as("uniq_chunks"),
        sum("len").as("uniq_bytes")))
  }
}
