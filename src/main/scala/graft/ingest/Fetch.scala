package graft.ingest

import java.io.{BufferedInputStream, FileOutputStream, IOException}
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path, Paths}
import java.security.{DigestInputStream, MessageDigest}

/** Driver-side HTTP(S) source staging — the reference's primary input mode:
  * every scan starts from a CKAN resource URL that is streamed down before
  * (or while) parsing. Spark's file sources don't read `https://` paths, so
  * remote inputs are fetched once to a scratch file and the existing
  * format-dispatched [[Reader]] takes over.
  *
  * Reference behavior mirrored:
  *   - stream-to-scratch with an MD5 of the bytes
  *     (aircan/dependencies/cloud/storage.py:99-222,
  *     aircan/dependencies_legacy/utils.py:320-355),
  *   - connect/read timeouts 10 s / 1200 s
  *     (aircan/dags/pipeline_ckan_to_bigquery.py:80-81),
  *   - bounded retry with backoff on transient statuses 402/408/502/503/504
  *     (aircan/dependencies_legacy/utils.py:320-355).
  *
  * Scale notes: one URL is inherently one stream — identical to the
  * reference's streamer. On a real cluster, point `scratchDir` at a shared
  * filesystem/object store so all executors can read the staged file; fleets
  * of resources parallelize at the pipeline level (one fetch per resource),
  * not inside a single download.
  */
object Fetch {

  final case class FetchOptions(
      connectTimeoutMs: Int = 10000, // reference: 10 s connect
      readTimeoutMs: Int = 1200000, // reference: 1200 s read
      maxAttempts: Int = 4,
      retryStatuses: Set[Int] = Set(402, 408, 502, 503, 504),
      backoffMs: Long = 500L, // linear backoff: attempt * backoffMs
      headers: Map[String, String] = Map.empty,
      scratchDir: Option[String] = None
  )

  /** Staged download: local path + byte count + md5 of the streamed bytes
    * (the reference records the same triple for change detection). */
  final case class Fetched(path: String, bytes: Long, md5Hex: String)

  def isRemote(path: String): Boolean = {
    val p = path.toLowerCase
    p.startsWith("http://") || p.startsWith("https://")
  }

  // One download feeds the whole pipeline run (schema inference, validation
  // read, and the load read all hit the same URL) — cache per-URL within the
  // process, like the reference's single streamed copy.
  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Transparent staging: remote URLs are fetched to scratch (once per URL
    * per process); local/Hadoop paths pass through untouched.
    *
    * A cache hit re-validates that the staged file still exists (tmp
    * cleaners on long-lived drivers can reap scratch files) and re-fetches
    * if it is gone. The cache keys on URL only: the FIRST fetch's options
    * (headers/scratchDir/timeouts) win for that URL's lifetime in this
    * process — call [[clearStaged]] to re-fetch under different options. */
  def stage(path: String, opts: FetchOptions = FetchOptions()): String =
    if (!isRemote(path)) path
    else staged.compute(path, (url, cached) =>
      if (cached != null && Files.exists(Paths.get(cached))) cached
      else toScratch(url, opts).path)

  /** Drop the per-process staging cache (tests; long-lived drivers that
    * re-ingest a mutated resource). */
  def clearStaged(): Unit = staged.clear()

  /** Fetch `url` to a scratch file, preserving the URL's file extension so
    * [[SourceFormat.detect]] works on either the URL or the staged path. */
  def toScratch(url: String, opts: FetchOptions = FetchOptions()): Fetched = {
    val dir = opts.scratchDir.map(Paths.get(_)).getOrElse {
      Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    }
    Files.createDirectories(dir)
    val target = Files.createTempFile(dir, "graft-fetch-", suffixOf(url))
    var attempt = 1
    var result: Option[Fetched] = None
    while (result.isEmpty) {
      try result = Some(download(url, target, opts))
      catch {
        case e: HttpStatusError => throw e // 4xx/5xx outside the retry list: permanent
        case _: IOException if attempt < opts.maxAttempts =>
          // transient statuses (402/408/502/503/504) and connect/read failures
          Thread.sleep(opts.backoffMs * attempt)
          attempt += 1
      }
    }
    result.get
  }

  /** Retryable HTTP status (reference retry list). */
  final class TransientHttpError(val status: Int, url: String)
      extends IOException(s"transient HTTP $status from $url")

  /** Non-retryable HTTP status. */
  final class HttpStatusError(val status: Int, url: String)
      extends IOException(s"HTTP $status fetching $url")

  private def download(url: String, target: Path, opts: FetchOptions): Fetched = {
    val conn = new URI(url).toURL.openConnection()
    conn.setConnectTimeout(opts.connectTimeoutMs)
    conn.setReadTimeout(opts.readTimeoutMs)
    opts.headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn match {
      case http: HttpURLConnection =>
        http.setInstanceFollowRedirects(true)
        val status = http.getResponseCode
        if (opts.retryStatuses.contains(status)) {
          http.disconnect()
          throw new TransientHttpError(status, url)
        }
        if (status < 200 || status >= 300) {
          http.disconnect()
          throw new HttpStatusError(status, url)
        }
      case _ => () // file:/jar: URLs stream without status codes (tests)
    }
    val md = MessageDigest.getInstance("MD5")
    val in = new DigestInputStream(new BufferedInputStream(conn.getInputStream), md)
    val out = new FileOutputStream(target.toFile)
    var total = 0L
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        total += n
        n = in.read(buf)
      }
    } finally {
      try in.close() finally out.close()
    }
    Fetched(target.toString, total, md.digest().map("%02x".format(_)).mkString)
  }

  /** File suffix of a URL path (query/fragment stripped) — keeps `.csv.gz`
    * style double extensions so codec detection survives staging. */
  private[ingest] def suffixOf(url: String): String = {
    val path = url.takeWhile(c => c != '?' && c != '#')
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dot = name.indexOf('.')
    if (dot < 0) "" else name.substring(dot)
  }
}
