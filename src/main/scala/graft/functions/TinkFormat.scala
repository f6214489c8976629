package graft.functions

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Tink binary/JSON keyset interop (r12 — converts the r11 documented
  * keyset-format deviation: keysets are now REAL serialized Tink
  * `Keyset` protos, byte-interoperable with Tink and BigQuery).
  *
  * The wire layout is the PUBLIC protobuf encoding of tink.proto:
  *   Keyset        { uint32 primary_key_id = 1; repeated Key key = 2; }
  *   Keyset.Key    { KeyData key_data = 1; KeyStatusType status = 2;
  *                   uint32 key_id = 3; OutputPrefixType prefix = 4; }
  *   KeyData       { string type_url = 1; bytes value = 2;
  *                   KeyMaterialType key_material_type = 3; }
  *   AesGcmKey     { uint32 version = 1; bytes key_value = 3; }
  *   AesSivKey     { uint32 version = 1; bytes key_value = 2; }
  * Only varint and length-delimited wire types appear in these
  * messages; unknown fields are skipped on read (so keysets produced
  * by real Tink parse), zero-valued fields are omitted on write
  * (proto3 canonical form).
  */
object TinkFormat {
  val AES_GCM_URL = "type.googleapis.com/google.crypto.tink.AesGcmKey"
  val AES_SIV_URL = "type.googleapis.com/google.crypto.tink.AesSivKey"
  // internal markers for keys migrated from the pre-r12 GAEAD1 layout:
  // a legacy DET key's ciphertexts use the old HMAC-subkey construction
  // (not RFC 5297), so the key must stay distinguishable after upgrade
  val LEGACY_GCM_URL = "graft.local/LegacyGcmKey"
  val LEGACY_DET_URL = "graft.local/LegacyDetKey"
  // AES-CBC-PKCS raw keys (KEYS.ADD_KEY_FROM_RAW_BYTES 'AES_CBC_PKCS'):
  // Tink publishes no CBC key type — the URL is engine-local, the key
  // material rides raw in the proto like the legacy markers. CBC keys
  // are decrypt-only (BigQuery: an added raw key never becomes primary)
  val AES_CBC_URL = "graft.local/AesCbcPkcsKey"

  // enum values from tink.proto
  val STATUS_ENABLED = 1
  val PREFIX_TINK = 1
  val PREFIX_RAW = 3
  val MATERIAL_SYMMETRIC = 1

  case class Key(keyId: Int, typeUrl: String, keyValue: Array[Byte],
      status: Int = STATUS_ENABLED, outputPrefix: Int = PREFIX_TINK) {
    def tinkPrefix: Array[Byte] =
      if (outputPrefix == PREFIX_TINK)
        Array[Byte](1, (keyId >>> 24).toByte, (keyId >>> 16).toByte,
          (keyId >>> 8).toByte, keyId.toByte)
      else Array.emptyByteArray
  }

  case class Keyset(primaryKeyId: Int, keys: Seq[Key]) {
    def primary(fn: String): Key = keys.find(_.keyId == primaryKeyId)
      .getOrElse(throw new IllegalArgumentException(
        s"$fn: keyset has no key matching primary_key_id $primaryKeyId"))
    /** Primary first, then the remaining keys newest-first. */
    def orderedForDecrypt(fn: String): Seq[Key] =
      primary(fn) +: keys.filterNot(_.keyId == primaryKeyId).reverse
  }

  // ---- minimal protobuf wire codec ----

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def writeTag(out: java.io.ByteArrayOutputStream, field: Int,
      wire: Int): Unit = writeVarint(out, (field.toLong << 3) | wire)
  private def writeUint32(out: java.io.ByteArrayOutputStream, field: Int,
      v: Int): Unit =
    if (v != 0) { writeTag(out, field, 0); writeVarint(out, v.toLong & 0xffffffffL) }
  private def writeBytes(out: java.io.ByteArrayOutputStream, field: Int,
      b: Array[Byte]): Unit =
    if (b.nonEmpty) { writeTag(out, field, 2); writeVarint(out, b.length); out.write(b) }

  private class Reader(b: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < b.length
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        if (pos >= b.length || shift > 63) throw new IllegalArgumentException(
          "malformed protobuf varint")
        val x = b(pos); pos += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def lenDelim(): Array[Byte] = {
      val n = varint()
      if (n < 0 || pos + n > b.length) throw new IllegalArgumentException(
        "malformed protobuf length")
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n.toInt)
      pos += n.toInt
      r
    }
    /** (fieldNumber, wireType); skips over the value for unused wires. */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lenDelim()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported protobuf wire type $w")
    }
  }

  private def aesKeyMaterial(typeUrl: String, value: Array[Byte]): Array[Byte] = {
    // AesGcmKey.key_value is field 3, AesSivKey.key_value is field 2
    val keyField = if (typeUrl == AES_GCM_URL) 3 else 2
    val r = new Reader(value)
    var key: Array[Byte] = null
    while (r.hasMore) {
      val t = r.varint()
      val (field, wire) = ((t >>> 3).toInt, (t & 7).toInt)
      if (field == keyField && wire == 2) key = r.lenDelim() else r.skip(wire)
    }
    if (key == null) throw new IllegalArgumentException(
      s"keyset: key proto for $typeUrl carries no key_value")
    key
  }

  private def wrapKeyMaterial(typeUrl: String, raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val keyField = if (typeUrl == AES_GCM_URL) 3 else 2
    // version = 0 omitted (proto3 default)
    writeBytes(out, keyField, raw)
    out.toByteArray
  }

  def serialize(ks: Keyset): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeUint32(out, 1, ks.primaryKeyId)
    ks.keys.foreach { k =>
      val kd = new java.io.ByteArrayOutputStream()
      writeBytes(kd, 1, k.typeUrl.getBytes("UTF-8"))
      val material =
        if (k.typeUrl == AES_GCM_URL || k.typeUrl == AES_SIV_URL)
          wrapKeyMaterial(k.typeUrl, k.keyValue)
        else k.keyValue // legacy markers carry the raw master directly
      writeBytes(kd, 2, material)
      writeUint32(kd, 3, MATERIAL_SYMMETRIC)
      val key = new java.io.ByteArrayOutputStream()
      writeBytes(key, 1, kd.toByteArray)
      writeUint32(key, 2, k.status)
      writeUint32(key, 3, k.keyId)
      writeUint32(key, 4, k.outputPrefix)
      writeBytes(out, 2, key.toByteArray)
    }
    out.toByteArray
  }

  def parse(bytes: Array[Byte]): Keyset = {
    val r = new Reader(bytes)
    var primary = 0
    val keys = scala.collection.mutable.ArrayBuffer.empty[Key]
    while (r.hasMore) {
      val t = r.varint()
      val (field, wire) = ((t >>> 3).toInt, (t & 7).toInt)
      (field, wire) match {
        case (1, 0) => primary = r.varint().toInt
        case (2, 2) => keys += parseKey(r.lenDelim())
        case _ => r.skip(wire)
      }
    }
    if (keys.isEmpty) throw new IllegalArgumentException("keyset: no keys")
    Keyset(primary, keys.toSeq)
  }

  private def parseKey(b: Array[Byte]): Key = {
    val r = new Reader(b)
    var typeUrl = ""; var value = Array.emptyByteArray
    var status = 0; var keyId = 0; var prefix = 0
    while (r.hasMore) {
      val t = r.varint()
      val (field, wire) = ((t >>> 3).toInt, (t & 7).toInt)
      (field, wire) match {
        case (1, 2) =>
          val kd = new Reader(r.lenDelim())
          while (kd.hasMore) {
            val t2 = kd.varint()
            val (f2, w2) = ((t2 >>> 3).toInt, (t2 & 7).toInt)
            (f2, w2) match {
              case (1, 2) => typeUrl = new String(kd.lenDelim(), "UTF-8")
              case (2, 2) => value = kd.lenDelim()
              case _ => kd.skip(w2)
            }
          }
        case (2, 0) => status = r.varint().toInt
        case (3, 0) => keyId = r.varint().toInt
        case (4, 0) => prefix = r.varint().toInt
        case _ => r.skip(wire)
      }
    }
    val material =
      if (typeUrl == AES_GCM_URL || typeUrl == AES_SIV_URL)
        aesKeyMaterial(typeUrl, value)
      else value
    Key(keyId, typeUrl, material, status, prefix)
  }

  // ---- Tink JSON keyset format (KEYS.KEYSET_TO_JSON / FROM_JSON) ----

  private def prefixName(p: Int): String = p match {
    case 1 => "TINK"; case 2 => "LEGACY"; case 3 => "RAW"; case 4 => "CRUNCHY"
    case _ => "UNKNOWN_PREFIX"
  }
  private def prefixValue(s: String): Int = s match {
    case "TINK" => 1; case "LEGACY" => 2; case "RAW" => 3; case "CRUNCHY" => 4
    case other => throw new IllegalArgumentException(
      s"keyset JSON: unknown outputPrefixType '$other'")
  }
  private def statusName(s: Int): String = s match {
    case 1 => "ENABLED"; case 2 => "DISABLED"; case 3 => "DESTROYED"
    case _ => "UNKNOWN_STATUS"
  }
  private def statusValue(s: String): Int = s match {
    case "ENABLED" => 1; case "DISABLED" => 2; case "DESTROYED" => 3
    case other => throw new IllegalArgumentException(
      s"keyset JSON: unknown status '$other'")
  }

  def toJson(ks: Keyset): String = {
    val b64 = java.util.Base64.getEncoder
    // key_id is uint32 — render unsigned like Tink does
    def uid(i: Int): Long = i.toLong & 0xffffffffL
    val keys = ks.keys.map { k =>
      val material =
        if (k.typeUrl == AES_GCM_URL || k.typeUrl == AES_SIV_URL)
          wrapKeyMaterial(k.typeUrl, k.keyValue)
        else k.keyValue
      s"""{"keyData":{"typeUrl":"${k.typeUrl}",""" +
        s""""value":"${b64.encodeToString(material)}",""" +
        s""""keyMaterialType":"SYMMETRIC"},""" +
        s""""status":"${statusName(k.status)}","keyId":${uid(k.keyId)},""" +
        s""""outputPrefixType":"${prefixName(k.outputPrefix)}"}"""
    }
    s"""{"primaryKeyId":${uid(ks.primaryKeyId)},"key":[${keys.mkString(",")}]}"""
  }

  def fromJson(json: String): Keyset = {
    import org.json4s._
    val root = org.json4s.jackson.JsonMethods.parse(json)
    def num(v: JValue, what: String): Long = v match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JDouble(d) => d.toLong
      case _ => throw new IllegalArgumentException(s"keyset JSON: missing $what")
    }
    val primary = num(root \ "primaryKeyId", "primaryKeyId").toInt
    val keys = (root \ "key") match {
      case JArray(ks) => ks.map { k =>
        val kd = k \ "keyData"
        val typeUrl = (kd \ "typeUrl") match {
          case JString(s) => s
          case _ => throw new IllegalArgumentException("keyset JSON: missing typeUrl")
        }
        val value = (kd \ "value") match {
          case JString(s) => java.util.Base64.getDecoder.decode(s)
          case _ => throw new IllegalArgumentException("keyset JSON: missing value")
        }
        val material =
          if (typeUrl == AES_GCM_URL || typeUrl == AES_SIV_URL)
            aesKeyMaterial(typeUrl, value)
          else value
        val status = (k \ "status") match {
          case JString(s) => statusValue(s); case _ => STATUS_ENABLED
        }
        val prefix = (k \ "outputPrefixType") match {
          case JString(s) => prefixValue(s); case _ => PREFIX_TINK
        }
        Key(num(k \ "keyId", "keyId").toInt, typeUrl, material, status, prefix)
      }
      case _ => throw new IllegalArgumentException("keyset JSON: missing key array")
    }
    if (keys.isEmpty) throw new IllegalArgumentException("keyset JSON: no keys")
    Keyset(primary, keys)
  }
}

/** RFC 5297 AES-SIV with AES-CMAC (RFC 4493) — the construction behind
  * Tink's AesSivKey (BigQuery's DETERMINISTIC_AEAD_AES_SIV_CMAC_256
  * carries a 64-byte key: leftmost half keys S2V/CMAC, rightmost half
  * keys AES-CTR). Both building blocks are pinned to the RFCs' own
  * published test vectors in AesSivSpec. Implemented from the public
  * specs over JDK AES primitives (the JDK ships no SIV mode).
  */
object AesSiv {
  private def aesEcbEncrypt(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
    c.doFinal(block)
  }

  /** GF(2^128) doubling: left shift by one, conditional xor with 0x87. */
  private def dbl(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    var carry = 0
    var i = 15
    while (i >= 0) {
      val v = (d(i) & 0xff) << 1 | carry
      out(i) = v.toByte
      carry = (v >>> 8) & 1
      i -= 1
    }
    if (carry == 1) out(15) = (out(15) ^ 0x87).toByte
    out
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** AES-CMAC, RFC 4493. */
  def cmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val l = aesEcbEncrypt(key, new Array[Byte](16))
    val k1 = dbl(l)
    val k2 = dbl(k1)
    val n = math.max(1, (msg.length + 15) / 16)
    val lastComplete = msg.nonEmpty && msg.length % 16 == 0
    val lastBlock =
      if (lastComplete) xor(msg.slice((n - 1) * 16, n * 16), k1)
      else {
        val padded = new Array[Byte](16)
        val rem = msg.length - (n - 1) * 16
        System.arraycopy(msg, (n - 1) * 16, padded, 0, rem)
        padded(rem) = 0x80.toByte
        xor(padded, k2)
      }
    var x = new Array[Byte](16)
    var i = 0
    while (i < n - 1) {
      x = aesEcbEncrypt(key, xor(x, msg.slice(i * 16, (i + 1) * 16)))
      i += 1
    }
    aesEcbEncrypt(key, xor(x, lastBlock))
  }

  /** S2V, RFC 5297 §2.4, over (associated data components, plaintext). */
  def s2v(key: Array[Byte], ads: Seq[Array[Byte]], plain: Array[Byte]): Array[Byte] = {
    var d = cmac(key, new Array[Byte](16))
    ads.foreach(ad => d = xor(dbl(d), cmac(key, ad)))
    if (plain.length >= 16) {
      // xorend: xor D into the LAST 16 bytes of the plaintext
      val t = plain.clone()
      val off = plain.length - 16
      var i = 0
      while (i < 16) { t(off + i) = (t(off + i) ^ d(i)).toByte; i += 1 }
      cmac(key, t)
    } else {
      val padded = new Array[Byte](16)
      System.arraycopy(plain, 0, padded, 0, plain.length)
      padded(plain.length) = 0x80.toByte
      cmac(key, xor(dbl(d), padded))
    }
  }

  private def ctr(key: Array[Byte], v: Array[Byte], data: Array[Byte]): Array[Byte] = {
    // Q = V with the 31st and 63rd bit cleared (rightmost bit = 0th)
    val q = v.clone()
    q(8) = (q(8) & 0x7f).toByte
    q(12) = (q(12) & 0x7f).toByte
    val c = Cipher.getInstance("AES/CTR/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(q))
    c.doFinal(data)
  }

  /** key = K1(mac) ∥ K2(ctr); output = V(16) ∥ C. */
  def encrypt(key: Array[Byte], plain: Array[Byte], ad: Array[Byte]): Array[Byte] = {
    require(key.length == 32 || key.length == 64,
      s"AES-SIV key must be 32 or 64 bytes, got ${key.length}")
    val half = key.length / 2
    val v = s2v(key.take(half), Seq(ad), plain)
    v ++ ctr(key.drop(half), v, plain)
  }

  def decrypt(key: Array[Byte], cipher: Array[Byte], ad: Array[Byte]): Array[Byte] = {
    if (cipher.length < 16) throw new javax.crypto.AEADBadTagException(
      "AES-SIV: ciphertext shorter than the synthetic IV")
    val half = key.length / 2
    val v = cipher.take(16)
    val plain = ctr(key.drop(half), v, cipher.drop(16))
    val expect = s2v(key.take(half), Seq(ad), plain)
    // constant-time compare
    var diff = 0
    var i = 0
    while (i < 16) { diff |= (v(i) ^ expect(i)); i += 1 }
    if (diff != 0) throw new javax.crypto.AEADBadTagException(
      "AES-SIV: authentication failed")
    plain
  }
}

/** Local stand-in for the Cloud KMS envelope layer behind
  * KEYS.KEYSET_CHAIN / NEW_WRAPPED_KEYSET / REWRAP_KEYSET: there is no
  * KMS here, so the key-encryption key is DERIVED from the resource
  * name (HKDF-SHA256 with a fixed engine salt) — the wrapped bytes are
  * NOT interoperable with Cloud KMS (documented), but the SQL surface,
  * the envelope laws (wrap∘unwrap = id, rewrap moves between
  * resources, wrong resource fails loud), and the INNER keyset's Tink
  * byte format are.
  */
object KmsStandin {
  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  /** HKDF-SHA256(salt = fixed, ikm = resource, info = "kek"), 32 bytes. */
  def kek(resource: String): Array[Byte] = {
    val prk = hmac("graft-kms-standin-v1".getBytes("UTF-8"),
      resource.getBytes("UTF-8"))
    hmac(prk, "kek".getBytes("UTF-8") :+ 1.toByte)
  }

  def wrap(resource: String, keyset: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](12)
    val rng = new java.security.SecureRandom()
    rng.nextBytes(iv)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(kek(resource), "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    c.updateAAD(resource.getBytes("UTF-8"))
    iv ++ c.doFinal(keyset)
  }

  def unwrap(resource: String, wrapped: Array[Byte]): Array[Byte] = {
    if (wrapped.length < 12 + 16) throw new IllegalArgumentException(
      "KEYS: wrapped keyset too short")
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(kek(resource), "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, wrapped.take(12)))
    c.updateAAD(resource.getBytes("UTF-8"))
    try c.doFinal(wrapped.drop(12))
    catch { case _: javax.crypto.AEADBadTagException =>
      throw new IllegalArgumentException(
        "KEYS: wrapped keyset does not unwrap under this kms_resource_name")
    }
  }
}
