package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** AES-CMAC and AES-SIV pinned to the RFCs' PUBLISHED test vectors
  * (RFC 4493 §4, RFC 5297 A.1) — kernel drift is a red spec, not a
  * silent ciphertext change — plus Tink keyset wire-format checks
  * against hand-assembled proto bytes (independent of the writer).
  */
class AesSivSpec extends AnyFunSuite {
  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def toHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private val cmacKey = hex("2b7e151628aed2a6abf7158809cf4f3c")

  test("RFC 4493 AES-CMAC test vectors") {
    assert(toHex(AesSiv.cmac(cmacKey, Array.emptyByteArray)) ==
      "bb1d6929e95937287fa37d129b756746")
    assert(toHex(AesSiv.cmac(cmacKey, hex("6bc1bee22e409f96e93d7e117393172a"))) ==
      "070a16b46b4d4144f79bdd9dd04a287c")
    assert(toHex(AesSiv.cmac(cmacKey, hex(
      "6bc1bee22e409f96e93d7e117393172aae2d8a571e03ac9c9eb76fac45af8e5130c81c46a35ce411"))) ==
      "dfa66747de9ae63030ca32611497c827")
    assert(toHex(AesSiv.cmac(cmacKey, hex(
      "6bc1bee22e409f96e93d7e117393172aae2d8a571e03ac9c9eb76fac45af8e51" +
        "30c81c46a35ce411e5fbc1191a0a52eff69f2445df4f9b17ad2b417be66c3710"))) ==
      "51f0bebf7e3b9d92fc49741779363cfe")
  }

  test("RFC 5297 A.1 deterministic SIV vector") {
    val key = hex("fffefdfcfbfaf9f8f7f6f5f4f3f2f1f0f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    val ad = hex("101112131415161718191a1b1c1d1e1f2021222324252627")
    val plain = hex("112233445566778899aabbccddee")
    val out = AesSiv.encrypt(key, plain, ad)
    assert(toHex(out.take(16)) == "85632d07c6e8f37f950acd320a2ecc93")
    assert(toHex(out.drop(16)) == "40c02b9690c4dc04daef7f6afe5c")
    assert(AesSiv.decrypt(key, out, ad).sameElements(plain))
    // tamper → loud
    val bad = out.clone(); bad(20) = (bad(20) ^ 1).toByte
    intercept[javax.crypto.AEADBadTagException] { AesSiv.decrypt(key, bad, ad) }
    intercept[javax.crypto.AEADBadTagException] {
      AesSiv.decrypt(key, out, hex("00")) }
  }

  test("AES-SIV roundtrips with the 64-byte Tink AesSivKey size") {
    val key = Array.tabulate(64)(i => (i * 7 + 3).toByte)
    for (n <- Seq(0, 1, 15, 16, 17, 100)) {
      val plain = Array.tabulate(n)(i => (i * 13).toByte)
      val ad = Array.tabulate(n % 7)(i => (i + 1).toByte)
      val ct = AesSiv.encrypt(key, plain, ad)
      assert(ct.length == plain.length + 16)
      assert(AesSiv.decrypt(key, ct, ad).sameElements(plain))
      // deterministic: equal inputs give equal ciphertexts
      assert(AesSiv.encrypt(key, plain, ad).sameElements(ct))
    }
  }

  test("Tink keyset wire format: hand-assembled proto bytes parse") {
    // Keyset { primary_key_id = 0x2a; key = [ Key {
    //   key_data { type_url = AesGcmKey, value = AesGcmKey{key_value=K16},
    //              key_material_type = SYMMETRIC },
    //   status = ENABLED, key_id = 0x2a, output_prefix_type = TINK } ] }
    // assembled byte-by-byte from the protobuf wire spec, NOT via the
    // writer under test
    val k16 = Array.tabulate(16)(_.toByte)
    val url = TinkFormat.AES_GCM_URL.getBytes("UTF-8")
    def vbytes(field: Int, b: Array[Byte]): Array[Byte] =
      Array(((field << 3) | 2).toByte, b.length.toByte) ++ b
    def vint(field: Int, v: Int): Array[Byte] =
      Array((field << 3).toByte, v.toByte)
    val gcmProto = vbytes(3, k16) // AesGcmKey.key_value = field 3
    val keyData = vbytes(1, url) ++ vbytes(2, gcmProto) ++ vint(3, 1)
    val key = vbytes(1, keyData) ++ vint(2, 1) ++ vint(3, 0x2a) ++ vint(4, 1)
    val keyset = vint(1, 0x2a) ++ vbytes(2, key)
    val parsed = TinkFormat.parse(keyset)
    assert(parsed.primaryKeyId == 0x2a)
    assert(parsed.keys.length == 1)
    assert(parsed.keys.head.typeUrl == TinkFormat.AES_GCM_URL)
    assert(parsed.keys.head.keyValue.sameElements(k16))
    assert(parsed.keys.head.outputPrefix == TinkFormat.PREFIX_TINK)
    // writer → parser is the identity on the model (field-by-field —
    // Key carries Array[Byte], so case-class equality can't be used)
    val re = TinkFormat.parse(TinkFormat.serialize(parsed))
    assert(re.primaryKeyId == parsed.primaryKeyId &&
      re.keys.head.keyValue.sameElements(k16) &&
      re.keys.head.typeUrl == parsed.keys.head.typeUrl)
  }

  test("Tink JSON keyset roundtrip, unsigned key ids") {
    val ks = TinkFormat.Keyset(-2, Seq( // key_id is uint32: renders unsigned
      TinkFormat.Key(-2, TinkFormat.AES_SIV_URL, Array.tabulate(64)(_.toByte))))
    val json = TinkFormat.toJson(ks)
    assert(json.contains(s""""primaryKeyId":${-2L & 0xffffffffL}"""))
    assert(json.contains("AesSivKey"))
    val back = TinkFormat.fromJson(json)
    assert(back.primaryKeyId == -2)
    assert(back.keys.head.keyValue.sameElements(ks.keys.head.keyValue))
    assert(back.keys.head.outputPrefix == TinkFormat.PREFIX_TINK)
  }

  test("KMS stand-in envelope laws") {
    val ks = AeadKernels.newKeyset("AEAD_AES_GCM_256")
    val wrapped = KmsStandin.wrap("projects/p/locations/l/keyRings/r/cryptoKeys/k", ks)
    assert(KmsStandin.unwrap("projects/p/locations/l/keyRings/r/cryptoKeys/k",
      wrapped).sameElements(ks))
    intercept[IllegalArgumentException] {
      KmsStandin.unwrap("projects/OTHER/key", wrapped) }
    // fresh nonce per wrap: two wraps differ
    assert(!KmsStandin.wrap("res", ks).sameElements(KmsStandin.wrap("res", ks)))
  }
}
