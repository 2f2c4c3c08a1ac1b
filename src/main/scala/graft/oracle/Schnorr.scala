package graft.oracle

import java.math.BigInteger
import java.security.MessageDigest

/** BIP-340 Schnorr signatures over secp256k1 — pure JVM, implemented from
  * the public spec (BIP-340: curve/field constants, tagged hashes, x-only
  * public keys, even-y nonce normalization) and pinned by the published
  * BIP-340 test vectors in SchnorrSpec.
  *
  * This completes the attestation half of the reference's ETL (SURVEY
  * §3.2 step 6): the reference signs the winner bytes with a fixed
  * per-event nonce via dlctix's `attestation_secret(private_key, nonce,
  * winner_bytes)` (crates/oracle/src/oracle.rs:648,
  * tests/api/etl_workflow.rs:329-333) — that scalar is exactly the `s`
  * half of a BIP-340 signature whose nonce is the event nonce instead of
  * the derived one ([[signWithNonce]] / [[attestationSecret]] here), with
  * the same BIP0340/challenge tagged hash and the same even-y
  * normalization of both keys. Verification is the standard equation
  * `s·G = R + e·P`, so an attestation recomputes byte-identically from
  * (key, nonce, winners) and third parties can check it against the
  * announced nonce point.
  *
  * Arithmetic is affine BigInteger — a few hundred modular inversions per
  * signature. This runs once per event on the driver (like the
  * reference's signer); it is not a per-row kernel and never appears in a
  * Spark plan.
  */
object Schnorr {

  // secp256k1 domain parameters (SEC 2 / BIP-340).
  private val P = new BigInteger(
    "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F", 16)
  private val N = new BigInteger(
    "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141", 16)
  private val G = Some(Pt(
    new BigInteger("79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798", 16),
    new BigInteger("483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8", 16)))
  private val Three = BigInteger.valueOf(3)
  private val Seven = BigInteger.valueOf(7)

  /** Affine point; the point at infinity is `None` at the Option level. */
  private final case class Pt(x: BigInteger, y: BigInteger)

  private def add(a: Option[Pt], b: Option[Pt]): Option[Pt] = (a, b) match {
    case (None, r) => r
    case (l, None) => l
    case (Some(Pt(x1, y1)), Some(Pt(x2, y2))) =>
      if (x1 == x2 && y1.add(y2).mod(P).signum == 0) None // p + (-p)
      else {
        val lam =
          if (x1 == x2) // doubling (y != 0 on this curve: x^3+7=0 has no even-order point)
            x1.multiply(x1).multiply(Three)
              .multiply(y1.shiftLeft(1).modInverse(P)).mod(P)
          else
            y2.subtract(y1).multiply(x2.subtract(x1).modInverse(P)).mod(P)
        val x3 = lam.multiply(lam).subtract(x1).subtract(x2).mod(P)
        Some(Pt(x3, lam.multiply(x1.subtract(x3)).subtract(y1).mod(P)))
      }
  }

  private def mul(p: Option[Pt], k: BigInteger): Option[Pt] = {
    var r: Option[Pt] = None
    var q = p
    var i = 0
    val kk = k.mod(N)
    while (i < kk.bitLength()) {
      if (kk.testBit(i)) r = add(r, q)
      q = add(q, q)
      i += 1
    }
    r
  }

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    parts.foreach(md.update)
    md.digest()
  }

  /** `SHA256(SHA256(tag) || SHA256(tag) || data)` (BIP-340 tagged hash). */
  def taggedHash(tag: String, data: Array[Byte]): Array[Byte] = {
    val th = sha256(tag.getBytes("US-ASCII"))
    sha256(th, th, data)
  }

  private def int(bs: Array[Byte]): BigInteger = new BigInteger(1, bs)

  private def bytes32(v: BigInteger): Array[Byte] = {
    val raw = v.toByteArray.dropWhile(_ == 0)
    require(raw.length <= 32, "value exceeds 32 bytes")
    new Array[Byte](32 - raw.length) ++ raw
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Array.tabulate(32)(i => (a(i) ^ b(i)).toByte)

  private def hasEvenY(p: Pt): Boolean = !p.y.testBit(0)

  /** The even-y point with this x, if x is on the curve (BIP-340 lift_x). */
  private def liftX(x: BigInteger): Option[Pt] = {
    if (x.signum < 0 || x.compareTo(P) >= 0) None
    else {
      val c = x.modPow(Three, P).add(Seven).mod(P)
      val y = c.modPow(P.add(BigInteger.ONE).shiftRight(2), P) // sqrt: p ≡ 3 mod 4
      if (y.multiply(y).mod(P) != c) None
      else Some(Pt(x, if (y.testBit(0)) P.subtract(y) else y))
    }
  }

  /** X-only public key for a 32-byte secret key. */
  def pubkey(seckey: Array[Byte]): Array[Byte] = {
    val d = int(seckey)
    require(d.signum > 0 && d.compareTo(N) < 0, "secret key out of range")
    bytes32(mul(G, d).get.x)
  }

  /** SEC-1 compressed public key (33 bytes: 0x02/0x03 parity prefix +
    * big-endian x) — the form the reference's `GET /oracle/pubkey`
    * base64-encodes (oracle.rs:150-153). */
  def compressedPubkey(seckey: Array[Byte]): Array[Byte] = {
    val d = int(seckey)
    require(d.signum > 0 && d.compareTo(N) < 0, "secret key out of range")
    val p = mul(G, d).get
    (if (hasEvenY(p)) 0x02.toByte else 0x03.toByte) +: bytes32(p.x)
  }

  /** BIP-340 default signing: deterministic nonce from (key, aux, msg). */
  def sign(seckey: Array[Byte], msg: Array[Byte],
      auxRand: Array[Byte] = new Array[Byte](32)): Array[Byte] = {
    val d0 = int(seckey)
    require(d0.signum > 0 && d0.compareTo(N) < 0, "secret key out of range")
    require(auxRand.length == 32, "aux randomness must be 32 bytes")
    val pp = mul(G, d0).get
    val d = if (hasEvenY(pp)) d0 else N.subtract(d0)
    val t = xor(bytes32(d), taggedHash("BIP0340/aux", auxRand))
    val rand = taggedHash("BIP0340/nonce", t ++ bytes32(pp.x) ++ msg)
    val k0 = int(rand).mod(N)
    require(k0.signum != 0, "zero derived nonce")
    finish(d, pp, k0, msg)
  }

  /** Sign with a FIXED secret nonce — the DLC oracle attestation form.
    * The event announcement commits to the nonce point, so the signer
    * must use that exact nonce, not a derived one (oracle.rs:622-650). */
  def signWithNonce(seckey: Array[Byte], nonce: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val d0 = int(seckey)
    require(d0.signum > 0 && d0.compareTo(N) < 0, "secret key out of range")
    val k0 = int(nonce).mod(N)
    require(k0.signum != 0, "zero nonce")
    val pp = mul(G, d0).get
    val d = if (hasEvenY(pp)) d0 else N.subtract(d0)
    finish(d, pp, k0, msg)
  }

  private def finish(d: BigInteger, pp: Pt, k0: BigInteger, msg: Array[Byte]): Array[Byte] = {
    val r = mul(G, k0).get
    val k = if (hasEvenY(r)) k0 else N.subtract(k0)
    val e = int(taggedHash("BIP0340/challenge",
      bytes32(r.x) ++ bytes32(pp.x) ++ msg)).mod(N)
    val sig = bytes32(r.x) ++ bytes32(k.add(e.multiply(d)).mod(N))
    // BIP-340 mandates the self-check: catches any arithmetic fault before
    // an invalid signature escapes.
    require(verify(bytes32(pp.x), msg, sig), "BIP-340 self-verification failed")
    sig
  }

  /** The reference's `attestation_secret`: the s scalar of the
    * fixed-nonce signature over the winner bytes (etl_workflow.rs:329). */
  def attestationSecret(seckey: Array[Byte], nonce: Array[Byte], msg: Array[Byte]): Array[Byte] =
    signWithNonce(seckey, nonce, msg).drop(32)

  /** BIP-340 verification: `s·G − e·P = R`, R even-y with x = r. */
  def verify(pubkeyX: Array[Byte], msg: Array[Byte], sig: Array[Byte]): Boolean = {
    if (pubkeyX.length != 32 || sig.length != 64) return false
    liftX(int(pubkeyX)) match {
      case None => false
      case Some(pp) =>
        val r = int(sig.take(32))
        val s = int(sig.drop(32))
        if (r.compareTo(P) >= 0 || s.compareTo(N) >= 0) false
        else {
          val e = int(taggedHash("BIP0340/challenge",
            sig.take(32) ++ pubkeyX ++ msg)).mod(N)
          add(mul(G, s), mul(Some(pp), N.subtract(e))) match {
            case Some(rp) => hasEvenY(rp) && rp.x == r
            case None => false
          }
        }
    }
  }
}
