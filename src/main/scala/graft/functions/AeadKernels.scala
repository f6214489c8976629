package graft.functions

import java.security.SecureRandom
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery AEAD / KEYS / DETERMINISTIC_* encryption surface (closes
  * part of the round-9 GEOGRAPHY/AEAD/ML namespace skip):
  * KEYS.NEW_KEYSET, AEAD.ENCRYPT, AEAD.DECRYPT_STRING/BYTES,
  * DETERMINISTIC_ENCRYPT, DETERMINISTIC_DECRYPT_STRING/BYTES.
  *
  * Semantics match BigQuery's contract — keyset-typed dispatch (an
  * AEAD keyset refuses DETERMINISTIC_ENCRYPT and vice versa),
  * authenticated additional_data (wrong AAD fails loud; SAFE. → NULL),
  * AEAD.ENCRYPT nondeterministic per call, DETERMINISTIC_ENCRYPT
  * stable for equal (keyset, plaintext, aad).
  *
  * BYTE INTEROP (r12 — converts the r11 keyset-format deviation):
  * keysets are serialized Tink `Keyset` protos (TinkFormat.scala),
  * AEAD ciphertexts are Tink's AES-GCM layout (TINK output prefix
  * `0x01 ∥ key_id` then `iv(12) ∥ ct ∥ tag(16)`), and DETERMINISTIC
  * uses RFC 5297 AES-SIV with a 64-byte AesSivKey (AesSiv.scala) —
  * keysets and ciphertexts round-trip with Tink/BigQuery for the
  * AES-GCM and AES-SIV families. KEYS.ROTATE_KEYSET /
  * ADD_KEY_FROM_RAW_BYTES (16- or 32-byte AES keys, added RAW) /
  * KEYSET_LENGTH / KEYSET_TO_JSON / KEYSET_FROM_JSON work over the
  * same model. Envelope surface (KEYS.NEW_WRAPPED_KEYSET /
  * REWRAP_KEYSET / KEYSET_CHAIN) rides a LOCAL KMS stand-in
  * (KmsStandin: KEK derived from the resource name) — the envelope
  * bytes are not Cloud-KMS interoperable, the inner keyset is.
  * Pre-r12 `GAEAD1` keysets still parse (legacy read path; rotation
  * re-serializes them as Tink protos with legacy-marker type URLs
  * because their DETERMINISTIC construction predates RFC 5297 here).
  */
object AeadKernels {
  import TinkFormat.{Key, Keyset}

  private val MAGIC = "GAEAD1".getBytes("UTF-8")
  private val rng = new SecureRandom()

  private def freshBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    rng.synchronized(rng.nextBytes(b))
    b
  }

  private def freshKeyId(taken: Set[Int]): Int = {
    var id = 0
    while (id == 0 || taken.contains(id)) id = rng.synchronized(rng.nextInt())
    id
  }

  /** Parse either format into the Tink model: legacy GAEAD1 keys map to
    * RAW-prefix keys (their ciphertexts carried no prefix), with the
    * det type kept distinguishable via a legacy type URL.
    */
  private def parseAnyKeyset(ks: Array[Byte], fn: String): Keyset = {
    if (ks.length > MAGIC.length + 1 &&
        java.util.Arrays.equals(ks.take(MAGIC.length), MAGIC)) {
      val body = ks.length - MAGIC.length - 1
      if (body % 32 != 0 || body == 0) throw new IllegalArgumentException(
        s"$fn: not a keyset produced by KEYS.NEW_KEYSET")
      val url = if (ks(MAGIC.length) == 0.toByte) TinkFormat.LEGACY_GCM_URL
        else TinkFormat.LEGACY_DET_URL
      val n = body / 32
      val keys = (0 until n).map { i =>
        Key(i + 1, url, ks.slice(MAGIC.length + 1 + i * 32,
          MAGIC.length + 1 + (i + 1) * 32), outputPrefix = TinkFormat.PREFIX_RAW)
      }
      Keyset(n, keys) // legacy primary = last
    } else {
      try TinkFormat.parse(ks)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"$fn: not a keyset produced by KEYS.NEW_KEYSET (${e.getMessage})")
      }
    }
  }

  // CBC raw keys live inside AEAD keysets (BigQuery adds them via
  // KEYS.ADD_KEY_FROM_RAW_BYTES to decrypt externally-produced
  // AES-CBC-PKCS ciphertexts) — the family check must admit them
  private val gcmUrls = Set(TinkFormat.AES_GCM_URL, TinkFormat.LEGACY_GCM_URL,
    TinkFormat.AES_CBC_URL)
  private val detUrls = Set(TinkFormat.AES_SIV_URL, TinkFormat.LEGACY_DET_URL)

  private def requireFamily(ks: Keyset, urls: Set[String], fn: String): Keyset = {
    if (!ks.keys.forall(k => urls.contains(k.typeUrl)))
      throw new IllegalArgumentException(
        s"$fn: keyset type mismatch (AEAD functions need AEAD_AES_GCM_256, " +
          "DETERMINISTIC_* need DETERMINISTIC_AEAD_AES_SIV_CMAC_256)")
    ks
  }

  def newKeyset(keyType: String): Array[Byte] = {
    val key = keyType match {
      case "AEAD_AES_GCM_256" =>
        Key(freshKeyId(Set.empty), TinkFormat.AES_GCM_URL, freshBytes(32))
      case "DETERMINISTIC_AEAD_AES_SIV_CMAC_256" =>
        Key(freshKeyId(Set.empty), TinkFormat.AES_SIV_URL, freshBytes(64))
      case other => throw new IllegalArgumentException(
        s"KEYS.NEW_KEYSET: unsupported key type '$other' (supported: " +
          "AEAD_AES_GCM_256, DETERMINISTIC_AEAD_AES_SIV_CMAC_256)")
    }
    TinkFormat.serialize(Keyset(key.keyId, Seq(key)))
  }

  /** KEYS.ROTATE_KEYSET: add a fresh key, which becomes primary; older
    * keys remain for decryption. Legacy keysets upgrade to the Tink
    * serialization here (their keys keep legacy type URLs).
    */
  def rotateKeyset(ks0: Array[Byte], keyType: String): Array[Byte] = {
    val wantUrls = keyType match {
      case "AEAD_AES_GCM_256" => gcmUrls
      case "DETERMINISTIC_AEAD_AES_SIV_CMAC_256" => detUrls
      case other => throw new IllegalArgumentException(
        s"KEYS.ROTATE_KEYSET: unsupported key type '$other' (supported: " +
          "AEAD_AES_GCM_256, DETERMINISTIC_AEAD_AES_SIV_CMAC_256)")
    }
    val ks = requireFamily(parseAnyKeyset(ks0, "KEYS.ROTATE_KEYSET"),
      wantUrls, "KEYS.ROTATE_KEYSET")
    val fresh =
      if (wantUrls == gcmUrls)
        Key(freshKeyId(ks.keys.map(_.keyId).toSet), TinkFormat.AES_GCM_URL,
          freshBytes(32))
      else
        Key(freshKeyId(ks.keys.map(_.keyId).toSet), TinkFormat.AES_SIV_URL,
          freshBytes(64))
    TinkFormat.serialize(Keyset(fresh.keyId, ks.keys :+ fresh))
  }

  /** KEYS.ADD_KEY_FROM_RAW_BYTES: add a caller-supplied raw AES key as
    * a NON-primary key (BigQuery: the added key decrypts but does not
    * become the encryption key). Raw-key ciphertexts carry no Tink
    * prefix, so the key is added with the RAW output-prefix type;
    * 16-byte AES-128 and 32-byte AES-256 keys both work (r12 — the
    * 16-byte form was a documented skip). BigQuery restricts this
    * function to AEAD key types ('AES_GCM').
    */
  def addKeyFromRawBytes(ks0: Array[Byte], keyType: String,
      raw: Array[Byte]): Array[Byte] = {
    val url = keyType match {
      case "AES_GCM" => TinkFormat.AES_GCM_URL
      // r12: AES_CBC_PKCS raw keys (the last encryption-surface skip) —
      // decrypt-only interop with externally-produced IV ∥ CBC(PKCS#7)
      // ciphertexts; the added key never becomes primary, so ENCRYPT
      // can never pick it
      case "AES_CBC_PKCS" => TinkFormat.AES_CBC_URL
      case _ => throw new IllegalArgumentException(
        "KEYS.ADD_KEY_FROM_RAW_BYTES: key type must be 'AES_GCM' or 'AES_CBC_PKCS'")
    }
    val ks = requireFamily(parseAnyKeyset(ks0, "KEYS.ADD_KEY_FROM_RAW_BYTES"),
      gcmUrls, "KEYS.ADD_KEY_FROM_RAW_BYTES")
    // Tink's AesGcm accepts only 128/256-bit keys; CBC interop also
    // takes the 192-bit size external systems commonly use
    val okLens = if (keyType == "AES_GCM") Set(16, 32) else Set(16, 24, 32)
    if (!okLens.contains(raw.length)) throw new IllegalArgumentException(
      s"KEYS.ADD_KEY_FROM_RAW_BYTES: raw $keyType key must be " +
        s"${okLens.toSeq.sorted.mkString(" or ")} bytes")
    val added = Key(freshKeyId(ks.keys.map(_.keyId).toSet),
      url, raw.clone(), outputPrefix = TinkFormat.PREFIX_RAW)
    TinkFormat.serialize(Keyset(ks.primaryKeyId, ks.keys :+ added))
  }

  /** KEYS.KEYSET_LENGTH: number of keys in the keyset. */
  def keysetLength(ks: Array[Byte]): Long =
    parseAnyKeyset(ks, "KEYS.KEYSET_LENGTH").keys.length.toLong

  /** KEYS.KEYSET_TO_JSON: Tink's public JSON keyset layout. */
  def keysetToJson(ks: Array[Byte]): String =
    TinkFormat.toJson(parseAnyKeyset(ks, "KEYS.KEYSET_TO_JSON"))

  /** KEYS.KEYSET_FROM_JSON: parse Tink JSON back to the binary proto. */
  def keysetFromJson(json: String): Array[Byte] =
    TinkFormat.serialize(try TinkFormat.fromJson(json)
    catch {
      case e: IllegalArgumentException => throw e
      case e: Exception => throw new IllegalArgumentException(
        s"KEYS.KEYSET_FROM_JSON: malformed keyset JSON (${e.getMessage})")
    })

  /** KEYS.NEW_WRAPPED_KEYSET: fresh keyset enveloped under the local
    * KMS stand-in's resource-derived KEK.
    */
  def newWrappedKeyset(resource: String, keyType: String): Array[Byte] =
    KmsStandin.wrap(resource, newKeyset(keyType))

  /** KEYS.REWRAP_KEYSET: move a wrapped keyset between KMS resources. */
  def rewrapKeyset(from: String, to: String, wrapped: Array[Byte]): Array[Byte] =
    KmsStandin.wrap(to, KmsStandin.unwrap(from, wrapped))

  /** The keyset referenced by a KEYS.KEYSET_CHAIN struct: unwrap the
    * first-level keyset under the chain's resource-derived KEK.
    */
  def unwrapChain(resource: String, wrapped: Array[Byte]): Array[Byte] =
    KmsStandin.unwrap(resource, wrapped)

  private def gcm(mode: Int, key: Array[Byte], nonce: Array[Byte],
      aad: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new GCMParameterSpec(128, nonce))
    if (aad.nonEmpty) c.updateAAD(aad)
    c.doFinal(data)
  }

  def encrypt(ks0: Array[Byte], plain: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    val ks = requireFamily(parseAnyKeyset(ks0, "AEAD.ENCRYPT"), gcmUrls,
      "AEAD.ENCRYPT")
    val k = ks.primary("AEAD.ENCRYPT")
    // unreachable through this engine's own KEYS surface (added raw
    // keys never become primary), but a hand-built KEYSET_FROM_JSON
    // keyset could pin one — unauthenticated encryption must stay loud
    if (k.typeUrl == TinkFormat.AES_CBC_URL) throw new IllegalArgumentException(
      "AEAD.ENCRYPT: AES_CBC_PKCS keys are decrypt-only (CBC is unauthenticated)")
    val nonce = freshBytes(12)
    k.tinkPrefix ++ nonce ++ gcm(Cipher.ENCRYPT_MODE, k.keyValue, nonce, aad, plain)
  }

  /** Decrypt candidates in Tink's order: a TINK-prefix match pins the
    * key; then every key is tried against the RAW layout (covers
    * RAW-prefix keys, raw-added keys, and pre-r12 ciphertexts). Only
    * auth failures advance — a wrong AAD under every candidate is the
    * loud final error.
    */
  def decrypt(ks0: Array[Byte], cipher: Array[Byte], aad: Array[Byte],
      fn: String): Array[Byte] = {
    val ks = requireFamily(parseAnyKeyset(ks0, fn), gcmUrls, fn)
    if (cipher.length < 12 + 16) throw new IllegalArgumentException(
      s"$fn: ciphertext too short")
    val keys = ks.orderedForDecrypt(fn)
    val attempts = scala.collection.mutable.ArrayBuffer.empty[() => Array[Byte]]
    if (cipher.length > 5 + 12 + 16 && cipher(0) == 1.toByte) {
      val id = ((cipher(1) & 0xff) << 24) | ((cipher(2) & 0xff) << 16) |
        ((cipher(3) & 0xff) << 8) | (cipher(4) & 0xff)
      keys.filter(k => k.keyId == id && k.outputPrefix == TinkFormat.PREFIX_TINK)
        .foreach { k =>
          val body = cipher.drop(5)
          attempts += (() => gcm(Cipher.DECRYPT_MODE, k.keyValue,
            body.take(12), aad, body.drop(12)))
        }
    }
    keys.foreach { k =>
      if (k.typeUrl == TinkFormat.AES_CBC_URL) {
        // externally-produced AES-CBC-PKCS layout: 16-byte IV ∥ CBC
        // ciphertext (whole blocks). AAD is IGNORED — CBC carries no
        // authentication (BigQuery documents the same for these keys)
        if (cipher.length >= 32 && (cipher.length - 16) % 16 == 0)
          attempts += { () =>
            val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
            c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(k.keyValue, "AES"),
              new javax.crypto.spec.IvParameterSpec(cipher.take(16)))
            c.doFinal(cipher.drop(16))
          }
      } else
        attempts += (() => gcm(Cipher.DECRYPT_MODE, k.keyValue,
          cipher.take(12), aad, cipher.drop(12)))
    }
    attempts.iterator.zipWithIndex.map { case (a, i) =>
      try Some(a())
      // AEADBadTagException extends BadPaddingException, so one catch
      // advances past both a failed GCM tag and failed CBC padding
      catch { case _: javax.crypto.BadPaddingException if i < attempts.size - 1 => None }
    }.collectFirst { case Some(p) => p }.getOrElse(
      throw new javax.crypto.AEADBadTagException(
        s"$fn: no key in the keyset authenticates this ciphertext/AAD"))
  }

  /** Pre-r12 deterministic construction, kept so legacy keysets still
    * decrypt (and encrypt consistently): synthetic nonce =
    * HMAC-SHA256(macSubkey, len(aad) ∥ aad ∥ plaintext) truncated to 12,
    * AES-GCM keyed by a separately-derived subkey (r10 ADVICE: no
    * cross-primitive key reuse).
    */
  private def detSubkey(master: Array[Byte], label: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(master, "HmacSHA256"))
    mac.doFinal(label.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def sivNonce(macKey: Array[Byte], aad: Array[Byte],
      plain: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(macKey, "HmacSHA256"))
    mac.update(java.nio.ByteBuffer.allocate(4).putInt(aad.length).array())
    mac.update(aad)
    mac.update(plain)
    mac.doFinal().take(12)
  }

  private def legacyDetEncrypt(master: Array[Byte], plain: Array[Byte],
      aad: Array[Byte]): Array[Byte] = {
    val nonce = sivNonce(detSubkey(master, "graft-siv-mac"), aad, plain)
    nonce ++ gcm(Cipher.ENCRYPT_MODE, detSubkey(master, "graft-siv-aes"),
      nonce, aad, plain)
  }

  def detEncrypt(ks0: Array[Byte], plain: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    val ks = requireFamily(parseAnyKeyset(ks0, "DETERMINISTIC_ENCRYPT"),
      detUrls, "DETERMINISTIC_ENCRYPT")
    val k = ks.primary("DETERMINISTIC_ENCRYPT")
    if (k.typeUrl == TinkFormat.LEGACY_DET_URL)
      legacyDetEncrypt(k.keyValue, plain, aad)
    else k.tinkPrefix ++ AesSiv.encrypt(k.keyValue, plain, aad)
  }

  def detDecrypt(ks0: Array[Byte], cipher: Array[Byte], aad: Array[Byte],
      fn: String): Array[Byte] = {
    val ks = requireFamily(parseAnyKeyset(ks0, fn), detUrls, fn)
    if (cipher.length < 16) throw new IllegalArgumentException(
      s"$fn: ciphertext too short")
    val keys = ks.orderedForDecrypt(fn)
    val attempts = scala.collection.mutable.ArrayBuffer.empty[() => Array[Byte]]
    if (cipher.length > 5 + 16 && cipher(0) == 1.toByte) {
      val id = ((cipher(1) & 0xff) << 24) | ((cipher(2) & 0xff) << 16) |
        ((cipher(3) & 0xff) << 8) | (cipher(4) & 0xff)
      keys.filter(k => k.keyId == id && k.outputPrefix == TinkFormat.PREFIX_TINK &&
          k.typeUrl == TinkFormat.AES_SIV_URL)
        .foreach(k => attempts += (() => AesSiv.decrypt(k.keyValue, cipher.drop(5), aad)))
    }
    keys.foreach { k =>
      if (k.typeUrl == TinkFormat.LEGACY_DET_URL)
        attempts += (() => gcm(Cipher.DECRYPT_MODE,
          detSubkey(k.keyValue, "graft-siv-aes"), cipher.take(12), aad,
          cipher.drop(12)))
      else
        attempts += (() => AesSiv.decrypt(k.keyValue, cipher, aad))
    }
    attempts.iterator.zipWithIndex.map { case (a, i) =>
      try Some(a())
      catch { case _: javax.crypto.AEADBadTagException if i < attempts.size - 1 => None }
    }.collectFirst { case Some(p) => p }.getOrElse(
      throw new javax.crypto.AEADBadTagException(
        s"$fn: no key in the keyset authenticates this ciphertext/AAD"))
  }

  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_keys_new_keyset"))) return
    def reg(name: String, make: Seq[Expression] => Expression): Unit =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, make, "scala_udf")
    reg("graft_keys_new_keyset", e => NewKeysetExpr(e.head))
    reg("graft_aead_encrypt", e => AeadEncryptExpr(e(0), e(1), e(2)))
    reg("graft_aead_decrypt_string", e => AeadCryptExpr("decrypt_string", e(0), e(1), e(2)))
    reg("graft_aead_decrypt_bytes", e => AeadCryptExpr("decrypt_bytes", e(0), e(1), e(2)))
    reg("graft_det_encrypt", e => AeadCryptExpr("det_encrypt", e(0), e(1), e(2)))
    reg("graft_det_decrypt_string", e => AeadCryptExpr("det_decrypt_string", e(0), e(1), e(2)))
    reg("graft_det_decrypt_bytes", e => AeadCryptExpr("det_decrypt_bytes", e(0), e(1), e(2)))
    reg("graft_keys_rotate", e => RotateKeysetExpr(e(0), e(1)))
    reg("graft_keys_add_raw", e => AddRawKeyExpr(e(0), e(1), e(2)))
    reg("graft_keys_length", e => KeysetLengthExpr(e.head))
    reg("graft_keys_to_json", e => KeysetJsonExpr("to_json", e.head))
    reg("graft_keys_from_json", e => KeysetJsonExpr("from_json", e.head))
    reg("graft_keys_new_wrapped", e => NewWrappedKeysetExpr(e(0), e(1)))
    reg("graft_keys_rewrap", e => RewrapKeysetExpr(e(0), e(1), e(2)))
  }
}

/** KEYS.ROTATE_KEYSET — nondeterministic like NEW_KEYSET (fresh key
  * material per evaluation).
  */
case class RotateKeysetExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Nondeterministic with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def initializeInternal(partitionIndex: Int): Unit = {}
  override protected def evalInternal(input: InternalRow): Any = {
    val (ks, t) = (left.eval(input), right.eval(input))
    if (ks == null || t == null) null
    else AeadKernels.rotateKeyset(AeadCryptExpr.bytes(ks),
      t.asInstanceOf[UTF8String].toString)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RotateKeysetExpr =
    copy(left = newLeft, right = newRight)
}

/** KEYS.ADD_KEY_FROM_RAW_BYTES — deterministic (the caller supplies the
  * key material).
  */
case class AddRawKeyExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(ks: Any, t: Any, raw: Any): Any =
    AeadKernels.addKeyFromRawBytes(AeadCryptExpr.bytes(ks),
      t.asInstanceOf[UTF8String].toString, AeadCryptExpr.bytes(raw))
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): AddRawKeyExpr = copy(first = f, second = s, third = t)
}

/** KEYS.KEYSET_LENGTH. */
case class KeysetLengthExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(ks: Any): Any =
    AeadKernels.keysetLength(AeadCryptExpr.bytes(ks))
  override protected def withNewChildInternal(newChild: Expression): KeysetLengthExpr =
    copy(child = newChild)
}

/** KEYS.NEW_KEYSET — honestly nondeterministic (fresh key material per
  * evaluation), so the optimizer never folds or duplicates it.
  */
case class NewKeysetExpr(child: Expression)
    extends UnaryExpression with Nondeterministic with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def initializeInternal(partitionIndex: Int): Unit = {}
  override protected def evalInternal(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null
    else AeadKernels.newKeyset(t.asInstanceOf[UTF8String].toString)
  }
  override protected def withNewChildInternal(newChild: Expression): NewKeysetExpr =
    copy(child = newChild)
}

/** AEAD.ENCRYPT — nondeterministic (fresh GCM nonce per evaluation), so
  * common-subexpression elimination never dedups two encrypt calls into
  * one ciphertext.
  */
case class AeadEncryptExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with Nondeterministic
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def initializeInternal(partitionIndex: Int): Unit = {}
  override protected def evalInternal(input: InternalRow): Any = {
    val (k, d, a) = (first.eval(input), second.eval(input), third.eval(input))
    if (k == null || d == null || a == null) null
    else AeadKernels.encrypt(AeadCryptExpr.keysetBytes(k),
      AeadCryptExpr.bytes(d), AeadCryptExpr.bytes(a))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): AeadEncryptExpr = copy(first = f, second = s, third = t)
}

object AeadCryptExpr {
  private[functions] def bytes(v: Any): Array[Byte] = v match {
    case b: Array[Byte] => b
    case s: UTF8String => s.getBytes
    case other => throw new IllegalArgumentException(
      s"AEAD: expected STRING or BYTES, got ${other.getClass.getSimpleName}")
  }

  /** The KEYSET argument slot additionally accepts a KEYS.KEYSET_CHAIN
    * struct (kms_resource_name STRING, first_level_keyset BYTES) —
    * unwrapped through the local KMS stand-in before use (r12).
    */
  private[functions] def keysetBytes(v: Any): Array[Byte] = v match {
    case r: InternalRow if r.numFields == 2 =>
      AeadKernels.unwrapChain(r.getUTF8String(0).toString, r.getBinary(1))
    case other => bytes(other)
  }
}

/** AEAD/DETERMINISTIC decrypt + deterministic-encrypt kernels. Plaintext
  * accepts STRING or BYTES (the two overloads); additional_data likewise.
  */
case class AeadCryptExpr(fn: String, first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (fn.endsWith("_string")) StringType else BinaryType
  override def nullable: Boolean = true
  import AeadCryptExpr.{bytes, keysetBytes}
  override protected def nullSafeEval(k: Any, d: Any, a: Any): Any = {
    val ks = keysetBytes(k); val data = bytes(d); val aad = bytes(a)
    fn match {
      case "det_encrypt" => AeadKernels.detEncrypt(ks, data, aad)
      case "decrypt_string" => UTF8String.fromBytes(
        AeadKernels.decrypt(ks, data, aad, "AEAD.DECRYPT_STRING"))
      case "decrypt_bytes" =>
        AeadKernels.decrypt(ks, data, aad, "AEAD.DECRYPT_BYTES")
      case "det_decrypt_string" => UTF8String.fromBytes(
        AeadKernels.detDecrypt(ks, data, aad, "DETERMINISTIC_DECRYPT_STRING"))
      case "det_decrypt_bytes" =>
        AeadKernels.detDecrypt(ks, data, aad, "DETERMINISTIC_DECRYPT_BYTES")
      case other => throw new IllegalStateException(s"unknown AEAD kernel $other")
    }
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): AeadCryptExpr = copy(first = f, second = s, third = t)
}

/** KEYS.KEYSET_TO_JSON / KEYS.KEYSET_FROM_JSON (r12) — deterministic
  * conversions between the Tink binary and JSON keyset layouts.
  */
case class KeysetJsonExpr(fn: String, child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (fn == "to_json") StringType else BinaryType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = fn match {
    case "to_json" => UTF8String.fromString(
      AeadKernels.keysetToJson(AeadCryptExpr.bytes(v)))
    case _ => AeadKernels.keysetFromJson(v.asInstanceOf[UTF8String].toString)
  }
  override protected def withNewChildInternal(newChild: Expression): KeysetJsonExpr =
    copy(child = newChild)
}

/** KEYS.NEW_WRAPPED_KEYSET — nondeterministic (fresh key material and
  * fresh envelope nonce per evaluation).
  */
case class NewWrappedKeysetExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with Nondeterministic with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def initializeInternal(partitionIndex: Int): Unit = {}
  override protected def evalInternal(input: InternalRow): Any = {
    val (res, t) = (left.eval(input), right.eval(input))
    if (res == null || t == null) null
    else AeadKernels.newWrappedKeyset(res.asInstanceOf[UTF8String].toString,
      t.asInstanceOf[UTF8String].toString)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NewWrappedKeysetExpr =
    copy(left = newLeft, right = newRight)
}

/** KEYS.REWRAP_KEYSET — nondeterministic (fresh envelope nonce), so two
  * rewrap calls never CSE into one shared ciphertext.
  */
case class RewrapKeysetExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with Nondeterministic
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override protected def initializeInternal(partitionIndex: Int): Unit = {}
  override protected def evalInternal(input: InternalRow): Any = {
    val (f, s, w) = (first.eval(input), second.eval(input), third.eval(input))
    if (f == null || s == null || w == null) null
    else AeadKernels.rewrapKeyset(f.asInstanceOf[UTF8String].toString,
      s.asInstanceOf[UTF8String].toString, AeadCryptExpr.bytes(w))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): RewrapKeysetExpr = copy(first = f, second = s, third = t)
}
