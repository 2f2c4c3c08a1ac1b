package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** RFC 7578 framing cases for the minimal multipart parser backing
  * `POST /file/{name}` — binary payloads, quoted boundaries, and the
  * reference oracle's last-part-wins drain semantics
  * (crates/oracle/src/routes/files/upload.rs:30-61). */
class MultipartSpec extends AnyFunSuite {

  private def body(boundary: String, payloads: Array[Byte]*): Array[Byte] =
    payloads.zipWithIndex.map { case (p, i) =>
      (s"--$boundary\r\n" +
        s"""Content-Disposition: form-data; name="file"; filename="f$i"\r\n""" +
        "\r\n").getBytes("ISO-8859-1") ++ p ++ "\r\n".getBytes("ISO-8859-1")
    }.reduce(_ ++ _) ++ s"--$boundary--\r\n".getBytes("ISO-8859-1")

  test("boundary parameter: bare, quoted, missing, empty") {
    assert(Multipart.boundary("multipart/form-data; boundary=abc").contains("abc"))
    assert(Multipart.boundary("multipart/form-data; boundary=\"a b\"").contains("a b"))
    assert(Multipart.boundary("Multipart/Form-Data; charset=utf-8; Boundary=xyz")
      .contains("xyz"))
    assert(Multipart.boundary("multipart/form-data").isEmpty)
    assert(Multipart.boundary("multipart/form-data; boundary=").isEmpty)
  }

  test("single binary part survives bytes that are invalid UTF-8") {
    val payload = Array.tabulate(512)(i => ((i * 7 + 0x80) % 256).toByte)
    val ct = "multipart/form-data; boundary=B1"
    val got = Multipart.filePart(ct, body("B1", payload))
    assert(got.exists(_.sameElements(payload)))
  }

  test("payload containing CRLF and dashes is not mis-split") {
    val payload = "line1\r\n--notTheBoundary\r\nline2--".getBytes("ISO-8859-1")
    val got = Multipart.filePart("multipart/form-data; boundary=Bnd", body("Bnd", payload))
    assert(got.exists(_.sameElements(payload)))
  }

  test("multiple parts: last part wins, matching the reference drain loop") {
    val first = "old contents".getBytes("ISO-8859-1")
    val last = "new contents".getBytes("ISO-8859-1")
    val got = Multipart.filePart("multipart/form-data; boundary=BB", body("BB", first, last))
    assert(got.exists(_.sameElements(last)))
  }

  test("empty part payload is extracted as zero bytes, not dropped") {
    val got = Multipart.filePart("multipart/form-data; boundary=BB",
      body("BB", Array.emptyByteArray))
    assert(got.exists(_.isEmpty))
  }

  test("malformed bodies return None") {
    val ct = "multipart/form-data; boundary=BB"
    assert(Multipart.filePart(ct, "no delimiter here".getBytes("ISO-8859-1")).isEmpty)
    assert(Multipart.filePart(ct, Array.emptyByteArray).isEmpty)
    // opening delimiter but no terminator and no second delimiter
    assert(Multipart.filePart(ct, "--BB\r\nheaders\r\n\r\ndata".getBytes("ISO-8859-1")).isEmpty)
    // no boundary parameter at all
    assert(Multipart.filePart("multipart/form-data", body("BB", Array[Byte](1))).isEmpty)
  }
}
