package graft.export

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import java.security.MessageDigest
import java.util.concurrent.Executors
import scala.util.control.NonFatal

/** Cross-object-store copy — the reference's GCS→S3 export leg
  * (aircan/dependencies/cloud/storage.py:271-350: parallel byte-range
  * reads + S3 multipart upload, bounded memory, abort on failure;
  * single-stream fallback for small objects), re-expressed over the
  * Hadoop FileSystem API so one implementation serves any scheme pair the
  * deployment mounts (s3a://, gs://, abfs://, hdfs://, file://).
  *
  * Shape preserved from the reference:
  *   - N parallel range reads of `chunkSize` parts (`maxConcurrency`
  *     in-flight, so memory is bounded by maxConcurrency × chunkSize),
  *   - per-part bounded retry (reopen + seek — range reads are idempotent),
  *   - small objects take a single-stream path (multipart overhead),
  *   - staging-object protocol (the FS-neutral analogue of S3
  *     complete/abort_multipart_upload): a stage failure deletes only the
  *     partial staging object; the pre-existing destination is replaced
  *     only after the staged copy is complete, and a failed commit rename
  *     leaves the staged copy in place rather than losing both objects,
  *   - optional source delete after a successful copy.
  *
  * The destination WRITE is one ordered stream (generic FileSystems have
  * no random-offset writes); on stores with a native multipart committer
  * the bottleneck side — the parallel range READ — is the same as the
  * reference's.
  */
object ObjectCopy {

  final case class CopyResult(bytes: Long, md5Hex: String, parts: Int)

  def copy(
      conf: Configuration,
      src: String,
      dst: String,
      chunkSize: Int = 8 * 1024 * 1024,
      maxConcurrency: Int = 4,
      deleteSource: Boolean = false,
      maxAttempts: Int = 3
  ): CopyResult = {
    require(chunkSize > 0 && maxConcurrency > 0)
    val srcPath = new Path(src)
    val dstPath = new Path(dst)
    val srcFs = srcPath.getFileSystem(conf)
    val dstFs = dstPath.getFileSystem(conf)
    val total = srcFs.getFileStatus(srcPath).getLen
    val tmp = new Path(dstPath.getParent, s".${dstPath.getName}.__copying")
    val md = MessageDigest.getInstance("MD5")

    def readRange(start: Long, len: Int): Array[Byte] = {
      var attempt = 1
      while (true) {
        try {
          val in = srcFs.open(srcPath)
          try {
            val buf = new Array[Byte](len)
            in.seek(start)
            in.readFully(buf, 0, len) // range reads are idempotent → retryable
            return buf
          } finally in.close()
        } catch {
          case NonFatal(e) =>
            if (attempt >= maxAttempts) throw e
            Thread.sleep(200L * attempt)
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }

    val out = dstFs.create(tmp, true)
    val nParts = math.max(1L, (total + chunkSize - 1) / chunkSize)
    // Phase 1 — stage: any failure here aborts and deletes the partial
    // staging object; an existing destination is never touched.
    try {
      if (total <= chunkSize) {
        // single-stream path (reference: storage.py:292-305)
        val buf = readRange(0L, total.toInt)
        md.update(buf)
        out.write(buf)
      } else {
        val pool = Executors.newFixedThreadPool(maxConcurrency)
        try {
          var drained = 0L
          // sliding window of ≤ maxConcurrency in-flight parts, drained in
          // order into the single destination stream
          val inFlight = scala.collection.mutable.Queue
            .empty[java.util.concurrent.Future[Array[Byte]]]
          var submitted = 0L
          while (submitted < nParts || inFlight.nonEmpty) {
            while (submitted < nParts && inFlight.size < maxConcurrency) {
              val start = submitted * chunkSize
              val len = math.min(chunkSize.toLong, total - start).toInt
              inFlight.enqueue(pool.submit(() => readRange(start, len)))
              submitted += 1
            }
            val buf = inFlight.dequeue().get()
            md.update(buf)
            out.write(buf)
            drained += buf.length
          }
          if (drained != total)
            throw new java.io.IOException(
              s"drained $drained bytes from $srcPath, expected $total")
        } finally pool.shutdownNow()
      }
      out.close()
    } catch {
      case NonFatal(e) =>
        try out.close() catch { case NonFatal(_) => () }
        dstFs.delete(tmp, false) // abort: never leave a partial object
        throw e
    }
    // Phase 2 — commit: the staged object is complete; the old destination
    // is only removed now (the FS-neutral analogue of S3
    // complete_multipart_upload, which also swaps only at completion). On
    // stores without atomic rename there is a small window where dst is
    // absent; if the rename itself fails the staged object is LEFT IN PLACE
    // so the data survives for manual recovery — never deleted after the
    // old destination is gone.
    if (dstFs.exists(dstPath)) dstFs.delete(dstPath, false)
    if (!dstFs.rename(tmp, dstPath))
      throw new java.io.IOException(
        s"rename $tmp -> $dstPath failed; staged copy preserved at $tmp")
    if (deleteSource) srcFs.delete(srcPath, false)
    CopyResult(total, md.digest().map("%02x".format(_)).mkString, nParts.toInt)
  }
}
