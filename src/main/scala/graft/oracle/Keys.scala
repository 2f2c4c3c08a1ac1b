package graft.oracle

import java.util.Base64

/** F14 — coordinator key formatting (crates/oracle/src/oracle.rs:145-160):
  * the reference surfaces its pubkey as base64 of the serialized point and
  * as a bech32 `npub…` string. Driver-side utilities; the crypto itself
  * (key generation, Schnorr signing) stays out of engine scope per SURVEY.
  *
  * The bech32 encoder is implemented from the public BIP-173
  * specification (charset, 5-bit regrouping, BCH checksum generator
  * constants) — no external dependency.
  */
object Keys {

  def base64Key(key: Array[Byte]): String = Base64.getEncoder.encodeToString(key)

  def hexKey(key: Array[Byte]): String = key.map(b => f"${b & 0xFF}%02x").mkString

  // ---- bech32 (BIP-173) ----

  private val Charset = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
  private val Gen = Array(0x3b6a57b2, 0x26508e6d, 0x1ea119fa, 0x3d4233dd, 0x2a1462b3)

  private def polymod(values: Seq[Int]): Int = {
    var chk = 1
    for (v <- values) {
      val top = chk >>> 25
      chk = ((chk & 0x1ffffff) << 5) ^ v
      for (i <- 0 until 5)
        if (((top >>> i) & 1) == 1) chk ^= Gen(i)
    }
    chk
  }

  private def hrpExpand(hrp: String): Seq[Int] =
    hrp.map(_.toInt >>> 5) ++ Seq(0) ++ hrp.map(_.toInt & 31)

  private def checksum(hrp: String, data: Seq[Int]): Seq[Int] = {
    val poly = polymod(hrpExpand(hrp) ++ data ++ Seq(0, 0, 0, 0, 0, 0)) ^ 1
    (0 until 6).map(i => (poly >>> (5 * (5 - i))) & 31)
  }

  /** Regroup 8-bit bytes into 5-bit groups, padding the tail. */
  private def toFiveBit(bytes: Array[Byte]): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var acc = 0
    var bits = 0
    for (b <- bytes) {
      acc = (acc << 8) | (b & 0xFF)
      bits += 8
      while (bits >= 5) { bits -= 5; out += (acc >>> bits) & 31 }
    }
    if (bits > 0) out += (acc << (5 - bits)) & 31
    out.result()
  }

  /** bech32 encode arbitrary payload bytes under a human-readable part. */
  def bech32(hrp: String, payload: Array[Byte]): String = {
    require(hrp.nonEmpty && hrp.forall(c => c >= 33 && c <= 126), "invalid hrp")
    val data = toFiveBit(payload)
    hrp + "1" + (data ++ checksum(hrp, data)).map(Charset(_)).mkString
  }

  /** The `npub…` form of a 32-byte x-only public key (oracle.rs:156-160). */
  def npub(xOnlyKey: Array[Byte]): String = {
    require(xOnlyKey.length == 32, s"npub needs a 32-byte x-only key, got ${xOnlyKey.length}")
    bech32("npub", xOnlyKey)
  }
}
