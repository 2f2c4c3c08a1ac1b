package graft.api

import org.scalatest.funsuite.AnyFunSuite

import graft.oracle.Schnorr

/** NIP-98 extractor behavior (nostr_extractor.rs:29-102): a header built
  * by [[NostrAuth.authHeader]] round-trips; every tamper direction is
  * rejected with the right class (401-style malformed vs 403-style
  * forbidden). */
class NostrAuthSpec extends AnyFunSuite {

  private val key = Schnorr.taggedHash("graft/nostr-test", Array(1.toByte))
  private val url = "http://127.0.0.1:8080/oracle/events"
  private val now = 1723500000L

  test("valid header verifies and yields the signer's npub") {
    val h = NostrAuth.authHeader(key, "POST", url, now)
    val out = NostrAuth.verify(Some(h), "POST", url, now + 5)
    assert(out.isRight)
    assert(out.toOption.get.npub == NostrAuth.npubOf(key))
  }

  test("missing header, wrong scheme, bad base64") {
    assert(NostrAuth.verify(None, "POST", url, now).isLeft)
    assert(NostrAuth.verify(Some("Bearer abc"), "POST", url, now).isLeft)
    assert(NostrAuth.verify(Some("Nostr !!!"), "POST", url, now).isLeft)
  }

  test("stale created_at is rejected") {
    val h = NostrAuth.authHeader(key, "POST", url, now)
    assert(NostrAuth.verify(Some(h), "POST", url, now + NostrAuth.MaxSkewSeconds + 1).isLeft)
    assert(NostrAuth.verify(Some(h), "POST", url, now - NostrAuth.MaxSkewSeconds - 1).isLeft)
  }

  test("url and method binding") {
    val h = NostrAuth.authHeader(key, "POST", url, now)
    assert(NostrAuth.verify(Some(h), "POST", url + "/other", now).isLeft)
    assert(NostrAuth.verify(Some(h), "GET", url, now).isLeft)
  }

  test("tampered signature / id fail as forbidden") {
    val h = NostrAuth.authHeader(key, "POST", url, now)
    val json = new String(java.util.Base64.getDecoder.decode(h.drop(6)), "UTF-8")
    // flip a hex digit inside the sig value
    val sigStart = json.indexOf("\"sig\":\"") + 7
    val flipped = json.updated(sigStart,
      if (json(sigStart) == '0') '1' else '0')
    val tampered = "Nostr " + java.util.Base64.getEncoder.encodeToString(flipped.getBytes("UTF-8"))
    val out = NostrAuth.verify(Some(tampered), "POST", url, now)
    assert(out.isLeft && out.swap.toOption.get.startsWith("forbidden"))

    // altered content invalidates the id hash
    val recontent = json.replace("\"content\":\"\"", "\"content\":\"x\"")
    val tampered2 = "Nostr " + java.util.Base64.getEncoder.encodeToString(recontent.getBytes("UTF-8"))
    val out2 = NostrAuth.verify(Some(tampered2), "POST", url, now)
    assert(out2.isLeft && out2.swap.toOption.get.startsWith("forbidden"))
  }

  test("a different key's npub differs (no cross-acceptance)") {
    val other = Schnorr.taggedHash("graft/nostr-test", Array(2.toByte))
    val h = NostrAuth.authHeader(other, "POST", url, now)
    val out = NostrAuth.verify(Some(h), "POST", url, now)
    assert(out.isRight && out.toOption.get.npub != NostrAuth.npubOf(key))
  }
}
