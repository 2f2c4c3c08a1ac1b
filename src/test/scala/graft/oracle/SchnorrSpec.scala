package graft.oracle

import org.scalatest.funsuite.AnyFunSuite

/** BIP-340 implementation pinned by the spec's published test vectors
  * (the first five vectors of the BIP-340 reference csv: four sign+verify
  * vectors and the verify-only vector with a 3-leading-zero-byte R.x),
  * plus negative and round-trip properties. */
class SchnorrSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def toHex(bs: Array[Byte]): String = bs.map("%02X".format(_)).mkString

  // --- BIP-340 test vectors 0-3: sign + verify ---------------------------

  private case class V(seckey: String, pubkey: String, aux: String, msg: String, sig: String)

  private val signVectors = Seq(
    V("0000000000000000000000000000000000000000000000000000000000000003",
      "F9308A019258C31049344F85F89D5229B531C845836F99B08601F113BCE036F9",
      "0000000000000000000000000000000000000000000000000000000000000000",
      "0000000000000000000000000000000000000000000000000000000000000000",
      "E907831F80848D1069A5371B402410364BDF1C5F8307B0084C55F1CE2DCA8215" +
        "25F66A4A85EA8B71E482A74F382D2CE5EBEEE8FDB2172F477DF4900D310536C0"),
    V("B7E151628AED2A6ABF7158809CF4F3C762E7160F38B4DA56A784D9045190CFEF",
      "DFF1D77F2A671C5F36183726DB2341BE58FEAE1DA2DECED843240F7B502BA659",
      "0000000000000000000000000000000000000000000000000000000000000001",
      "243F6A8885A308D313198A2E03707344A4093822299F31D0082EFA98EC4E6C89",
      "6896BD60EEAE296DB48A229FF71DFE071BDE413E6D43F917DC8DCF8C78DE3341" +
        "8906D11AC976ABCCB20B091292BFF4EA897EFCB639EA871CFA95F6DE339E4B0A"),
    V("C90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA63B14E5C9",
      "DD308AFEC5777E13121FA72B9CC1B7CC0139715309B086C960E18FD969774EB8",
      "C87AA53824B4D7AE2EB035A2B5BBBCCC080E76CDC6D1692C4B0B62D798E6D906",
      "7E2D58D8B3BCDF1ABADEC7829054F90DDA9805AAB56C77333024B9D0A508B75C",
      "5831AAEED7B44BB74E5EAB94BA9D4294C49BCF2A60728D8B4C200F50DD313C1B" +
        "AB745879A5AD954A72C45A91C3A51D3C7ADEA98D82F8481E0E1E03674A6F3FB7"),
    // negated-key case (P has odd y)
    V("0B432B2677937381AEF05BB02A66ECD012773062CF3FA2549E44F58ED2401710",
      "25D1DFF95105F5253C4022F628A996AD3A0D95FBF21D468A1B33F8C160D8F517",
      "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF",
      "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF",
      "7EB0509757E246F19449885651611CB965ECC1A187DD51B64FDA1EDC9637D5EC" +
        "97582B9CB13DB3933705B32BA982AF5AF25FD78881EBB32771FC5922EFC66EA3"))

  test("pubkey derivation matches the published vectors") {
    for (v <- signVectors)
      assert(toHex(Schnorr.pubkey(hex(v.seckey))) == v.pubkey)
  }

  test("signing reproduces the published signatures byte-identically") {
    for (v <- signVectors)
      assert(toHex(Schnorr.sign(hex(v.seckey), hex(v.msg), hex(v.aux))) == v.sig)
  }

  test("published signatures verify") {
    for (v <- signVectors)
      assert(Schnorr.verify(hex(v.pubkey), hex(v.msg), hex(v.sig)))
  }

  // --- vector 4: verify-only ---------------------------------------------

  test("verify-only vector 4 (R.x with leading zero bytes) passes") {
    assert(Schnorr.verify(
      hex("D69C3509BB99E412E68B0FE8544E72837DFA30746D8BE2AA65975F29D22DC7B9"),
      hex("4DF3C3F68FCC83B27E9D42C90431A72499F17875C81A599B566C9889B9696703"),
      hex("00000000000000000000003B78CE563F89A0ED9414F5AA28AD0D96D6795F9C63" +
        "76AFB1548AF603B3EB45C9F8207DEE1060CB71C04E80F593060B07D28308D7F4")))
  }

  // --- negative properties ----------------------------------------------

  test("any single-byte corruption of a signature fails verification") {
    val v = signVectors(1)
    val sig = hex(v.sig)
    for (i <- Seq(0, 15, 31, 32, 47, 63)) {
      val bad = sig.clone(); bad(i) = (bad(i) ^ 0x01).toByte
      assert(!Schnorr.verify(hex(v.pubkey), hex(v.msg), bad), s"byte $i")
    }
  }

  test("a signature does not verify under a different message or key") {
    val v = signVectors(2)
    val otherMsg = hex(v.msg).clone(); otherMsg(0) = (otherMsg(0) ^ 0xFF).toByte
    assert(!Schnorr.verify(hex(v.pubkey), otherMsg, hex(v.sig)))
    assert(!Schnorr.verify(hex(signVectors(1).pubkey), hex(v.msg), hex(v.sig)))
  }

  test("an x-coordinate not on the curve is rejected") {
    // x = 5: 5^3 + 7 = 132 is a quadratic non-residue mod p, so no point
    // has this x; verification must fail at lift_x, not throw.
    val notOnCurve = hex("0000000000000000000000000000000000000000000000000000000000000005")
    assert(!Schnorr.verify(notOnCurve,
      hex(signVectors(0).msg), hex(signVectors(0).sig)))
  }

  // --- fixed-nonce attestation (the reference's attestation_secret) ------

  test("fixed-nonce signature verifies and the attestation recomputes byte-identically") {
    val seckey = hex("C90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA63B14E5C9")
    val nonce = hex("0000000000000000000000000000000000000000000000000000000000000007")
    val winners = Scoring.winningBytes(Seq(2L, 0L, 1L))
    val sig = Schnorr.signWithNonce(seckey, nonce, winners)
    assert(Schnorr.verify(Schnorr.pubkey(seckey), winners, sig))
    // deterministic: same (key, nonce, winners) -> same attestation bytes
    val again = Schnorr.attestationSecret(seckey, nonce, winners)
    assert(java.util.Arrays.equals(sig.drop(32), again))
    // R.x commits to the nonce: x-only coordinate of nonce*G
    assert(toHex(sig.take(32)) == toHex(Schnorr.pubkey(nonce)))
    // and a different winner ordering attests differently
    val other = Schnorr.attestationSecret(seckey, nonce, Scoring.winningBytes(Seq(0L, 2L, 1L)))
    assert(!java.util.Arrays.equals(again, other))
  }

  test("round-trip: varied keys and message lengths sign and verify") {
    for (i <- 1 to 8) {
      val seckey = Schnorr.taggedHash("graft/test-key", Array(i.toByte))
      val msg = Array.fill(i * 7)(i.toByte) // BIP-340 allows any msg length
      val aux = Schnorr.taggedHash("graft/test-aux", Array(i.toByte))
      val sig = Schnorr.sign(seckey, msg, aux)
      assert(Schnorr.verify(Schnorr.pubkey(seckey), msg, sig))
    }
  }
}
