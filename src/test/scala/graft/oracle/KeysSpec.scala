package graft.oracle

import org.scalatest.funsuite.AnyFunSuite

class KeysSpec extends AnyFunSuite {

  test("base64/hex key formatting") {
    val key = Array[Byte](0, 1, 127, -128, -1)
    assert(Keys.base64Key(key) == java.util.Base64.getEncoder.encodeToString(key))
    assert(Keys.hexKey(key) == "00017f80ff")
  }

  test("bech32 matches the BIP-173 empty-payload vector") {
    // "A12UEL5L" (lowercased) is a valid bech32 string from the BIP-173
    // test vectors: hrp "a", no data part, checksum "2uel5l".
    assert(Keys.bech32("a", Array.emptyByteArray) == "a12uel5l")
  }

  test("npub matches the public NIP-19 vector") {
    val pub = "3bf0c63fcb93463407af97a5e5ee64fa883d107ef9e558472c4eb9aaaefa459d"
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(Keys.npub(pub) ==
      "npub180cvv07tjdrrgpa0j7j7tmnyl2yr6yr7l8j4s3evf6u64th6gkwsyjh6w6")
  }

  test("npub rejects wrong key lengths") {
    intercept[IllegalArgumentException](Keys.npub(Array.fill[Byte](31)(0)))
  }
}
