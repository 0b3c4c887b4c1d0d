package graft.pipeline

/** Outbound failure-message redaction (C6 hygiene). The reference scrubs
  * internal URIs and project names from error strings before they leave
  * the system (dependencies_legacy/google_cloud/bigquery_handler.py:
  * 104-116 — a replace-all pass over a replacer map applied to the
  * warehouse error before it reaches the status endpoint). This engine's
  * analogue: Spark error messages embed local filesystem paths, JDBC URLs
  * and hostnames exactly the way the reference's warehouse errors embedded
  * storage-bucket URIs, and the pipeline's status callback and alert sink
  * both POST their messages off-box.
  *
  * A [[Redactor]] is an ORDERED literal replacer list applied to every
  * outbound status message and alert payload — but not to the raised
  * [[PipelineException]] itself: in-process consumers keep the full
  * message for debugging; the redaction boundary is what leaves the
  * system. Ordered so a more specific secret can precede a broader one
  * ("/data/tenant-a/raw" before "/data"). Literal replacement, not regex:
  * secrets are paths/hosts/tokens a config author lists verbatim, and a
  * literal pass cannot be broken by regex metacharacters inside them.
  */
final case class Redactor(replacements: Seq[(String, String)]) {

  def isEmpty: Boolean = replacements.isEmpty

  /** Scrub one string: apply every (secret → replacement) pair in order. */
  def apply(s: String): String =
    replacements.foldLeft(s) { case (acc, (secret, repl)) =>
      if (secret.isEmpty) acc else acc.replace(secret, repl)
    }

  /** Decorate a status callback so every outbound message is scrubbed. */
  def statusCallback(inner: StatusCallback): StatusCallback =
    if (isEmpty) inner
    else
      new StatusCallback {
        def update(state: String, message: String): Unit =
          inner.update(state, apply(message))
      }

  /** Decorate an alert sink so every outbound payload is scrubbed. */
  def alertSink(inner: AlertSink): AlertSink =
    if (isEmpty) inner
    else
      new AlertSink {
        def alert(table: String, payload: String): Unit =
          inner.alert(apply(table), apply(payload))
      }
}

object Redactor {
  /** No-op default: redaction is opt-in configuration, like alerting. */
  val Empty: Redactor = Redactor(Nil)
}
