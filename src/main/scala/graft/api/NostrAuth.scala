package graft.api

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.oracle.{Keys, Schnorr}

/** NIP-98 HTTP authentication (the reference's `NostrAuth` extractor,
  * crates/oracle/src/nostr_extractor.rs:29-102), implemented from the
  * public NIP-98/NIP-01 specifications:
  *
  *   `Authorization: Nostr <base64(signed nostr event JSON)>` where the
  *   event has `kind` 27235, a `u` tag equal to the absolute request URL,
  *   a `method` tag equal to the HTTP method, a recent `created_at`, an
  *   `id` that is the SHA-256 of the NIP-01 canonical serialization
  *   `[0, pubkey, created_at, kind, tags, content]`, and a BIP-340
  *   signature of `id` under `pubkey`.
  *
  * Verification is pure JVM over [[graft.oracle.Schnorr]]; the extractor
  * returns the requester's `npub…` form (what the reference compares
  * against `coordinator_pubkey`, oracle.rs:237-243).
  */
object NostrAuth {

  /** Allowed |now − created_at| skew. NIP-98 leaves the window to the
    * server; 60 s matches the nostr crate's default used by the
    * reference. */
  val MaxSkewSeconds: Long = 60L

  final case class Verified(pubkeyHex: String, npub: String)

  private def sha256(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(bytes)

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xFF}%02x").mkString

  private def stripScheme(u: String): String =
    u.replaceFirst("^[Hh][Tt][Tt][Pp][Ss]?://", "")

  private def unhex(s: String): Option[Array[Byte]] =
    if (s.length % 2 != 0 || !s.forall(c => Character.digit(c, 16) >= 0)) None
    else Some(s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)

  /** NIP-01 canonical form: the JSON array with no whitespace and
    * standard JSON string escaping. json4s' compact rendering is exactly
    * that. */
  private def canonical(pubkeyHex: String, createdAt: Long, kind: Long,
      tags: List[List[String]], content: String): Array[Byte] = {
    val arr = JArray(List(
      JInt(0), JString(pubkeyHex), JInt(createdAt), JInt(kind),
      JArray(tags.map(t => JArray(t.map(JString(_))))), JString(content)))
    JsonMethods.compact(JsonMethods.render(arr)).getBytes(StandardCharsets.UTF_8)
  }

  /** Verify an `Authorization` header against the request. Returns
    * Left(401-style reason) for a missing/malformed header or stale
    * timestamp, Left("forbidden: …") for a signature that fails — the
    * caller maps the two to 401/403 like the reference
    * (oracle_routes.rs:88-89). */
  def verify(header: Option[String], method: String, url: String,
      nowEpochSec: Long): Either[String, Verified] = {
    for {
      h <- header.toRight("missing Authorization header")
      b64 <- {
        val t = h.trim
        if (t.regionMatches(true, 0, "Nostr ", 0, 6)) Right(t.drop(6).trim)
        else Left("Authorization scheme must be Nostr")
      }
      raw <- try Right(Base64.getDecoder.decode(b64))
             catch { case _: IllegalArgumentException => Left("invalid base64 in Authorization") }
      json <- try Right(JsonMethods.parse(new String(raw, StandardCharsets.UTF_8)))
              catch { case _: Exception => Left("invalid JSON in Authorization event") }
      ev <- json match {
        case o: JObject => Right(o)
        case _ => Left("Authorization event must be a JSON object")
      }
      id <- (ev \ "id") match { case JString(s) => Right(s); case _ => Left("missing id") }
      pubkey <- (ev \ "pubkey") match { case JString(s) => Right(s); case _ => Left("missing pubkey") }
      createdAt <- (ev \ "created_at") match {
        case JInt(n) => Right(n.toLong)
        case JLong(n) => Right(n)
        case _ => Left("missing created_at")
      }
      kind <- (ev \ "kind") match {
        case JInt(n) => Right(n.toLong)
        case JLong(n) => Right(n)
        case _ => Left("missing kind")
      }
      content = (ev \ "content") match { case JString(s) => s; case _ => "" }
      sig <- (ev \ "sig") match { case JString(s) => Right(s); case _ => Left("missing sig") }
      tags <- (ev \ "tags") match {
        case JArray(ts) =>
          val parsed = ts.map {
            case JArray(items) if items.forall(_.isInstanceOf[JString]) =>
              Some(items.collect { case JString(s) => s })
            case _ => None
          }
          if (parsed.forall(_.isDefined)) Right(parsed.flatten)
          else Left("tags must be arrays of strings")
        case _ => Left("missing tags")
      }
      _ <- if (kind == 27235L) Right(()) else Left(s"kind must be 27235, got $kind")
      _ <- if (math.abs(nowEpochSec - createdAt) <= MaxSkewSeconds) Right(())
           else Left("created_at outside the allowed window")
      uTag = tags.collectFirst { case "u" :: u :: _ => u }
      // scheme-insensitive: the server sits behind arbitrary TLS
      // termination, so a client signing the real https:// URL must
      // still verify — what identifies the request is host+path+query
      _ <- if (uTag.exists(t => stripScheme(t) == stripScheme(url))) Right(())
           else Left(s"u tag ${uTag.getOrElse("<none>")} does not match request URL $url")
      methodTag = tags.collectFirst { case "method" :: m :: _ => m }
      _ <- if (methodTag.exists(_.equalsIgnoreCase(method))) Right(())
           else Left("method tag does not match request method")
      pkBytes <- unhex(pubkey).filter(_.length == 32).toRight("pubkey must be 64 hex chars")
      idBytes <- unhex(id).filter(_.length == 32).toRight("id must be 64 hex chars")
      sigBytes <- unhex(sig).filter(_.length == 64).toRight("sig must be 128 hex chars")
      _ <- {
        val computed = sha256(canonical(pubkey, createdAt, kind, tags, content))
        if (java.util.Arrays.equals(computed, idBytes)) Right(())
        else Left("forbidden: event id does not match canonical hash")
      }
      _ <- if (Schnorr.verify(pkBytes, idBytes, sigBytes)) Right(())
           else Left("forbidden: invalid signature")
    } yield Verified(pubkey, Keys.npub(pkBytes))
  }

  /** Build a NIP-98 Authorization header value for (url, method) — the
    * client half (what the reference's coordinator does before calling
    * `POST /oracle/events`). Used by ApiSpec and any JVM client. */
  def authHeader(seckey: Array[Byte], method: String, url: String,
      nowEpochSec: Long): String = {
    val pubkeyHex = hex(Schnorr.pubkey(seckey))
    val tags = List(List("u", url), List("method", method))
    val idBytes = sha256(canonical(pubkeyHex, nowEpochSec, 27235L, tags, ""))
    val sig = Schnorr.sign(seckey, idBytes)
    val ev = JObject(
      "id" -> JString(hex(idBytes)),
      "pubkey" -> JString(pubkeyHex),
      "created_at" -> JInt(nowEpochSec),
      "kind" -> JInt(27235),
      "tags" -> JArray(tags.map(t => JArray(t.map(JString(_))))),
      "content" -> JString(""),
      "sig" -> JString(hex(sig)))
    "Nostr " + Base64.getEncoder.encodeToString(
      JsonMethods.compact(JsonMethods.render(ev)).getBytes(StandardCharsets.UTF_8))
  }

  /** The npub of a client secret key — what a coordinator registers as
    * `coordinator_pubkey`. */
  def npubOf(seckey: Array[Byte]): String = Keys.npub(Schnorr.pubkey(seckey))
}
