package graft.api

/** Minimal, binary-safe `multipart/form-data` parsing — just enough for
  * the reference daemon's upload client (one file part, streamed:
  * `crates/daemon/src/parquet_handler.rs:119-127` builds a single
  * `file` part; the oracle side drains every part and last-write-wins
  * on the same target name, `crates/oracle/src/routes/files/upload.rs:
  * 30-61`). RFC 7578 framing: parts delimited by `--boundary` lines,
  * each part = headers, CRLFCRLF, payload, CRLF before the next
  * delimiter; final delimiter suffixed `--`.
  *
  * Byte-level scanning throughout — parquet payloads are binary and a
  * string round-trip would corrupt them.
  */
object Multipart {

  /** Extracts the LAST part's payload (the reference writes each part to
    * the same file, so last wins) from `body`, or None when the body is
    * not well-formed multipart for `contentType`'s boundary. */
  def filePart(contentType: String, body: Array[Byte]): Option[Array[Byte]] =
    boundary(contentType).flatMap { b =>
      val delim = ("--" + b).getBytes("ISO-8859-1")
      val crlf2 = "\r\n\r\n".getBytes("ISO-8859-1")
      var parts = List.empty[Array[Byte]]
      var at = indexOf(body, delim, 0)
      while (at >= 0) {
        val afterDelim = at + delim.length
        // closing delimiter: "--boundary--"
        val closing = afterDelim + 1 < body.length &&
          body(afterDelim) == '-' && body(afterDelim + 1) == '-'
        if (closing) at = -1
        else {
          val nextDelim = indexOf(body, delim, afterDelim)
          if (nextDelim < 0) at = -1
          else {
            val headerEnd = indexOf(body, crlf2, afterDelim)
            if (headerEnd >= 0 && headerEnd < nextDelim) {
              val start = headerEnd + crlf2.length
              val end = nextDelim - 2 // the CRLF that precedes the delimiter
              if (end >= start) parts ::= java.util.Arrays.copyOfRange(body, start, end)
            }
            at = nextDelim
          }
        }
      }
      parts.headOption // list is built reversed — head IS the last part
    }

  /** The `boundary=` parameter of a multipart content type (quoted or
    * bare form). */
  private[api] def boundary(contentType: String): Option[String] =
    contentType.split(';').map(_.trim)
      .collectFirst {
        case p if p.toLowerCase.startsWith("boundary=") =>
          p.substring("boundary=".length).stripPrefix("\"").stripSuffix("\"")
      }
      .filter(_.nonEmpty)

  /** First index of `pat` in `hay` at/after `from`, −1 if absent. */
  private def indexOf(hay: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val limit = hay.length - pat.length
    while (i <= limit) {
      var j = 0
      while (j < pat.length && hay(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }
}
