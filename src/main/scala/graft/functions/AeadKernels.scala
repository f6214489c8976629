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
  * stable for equal (keyset, plaintext, aad). KEYS.ROTATE_KEYSET /
  * ADD_KEY_FROM_RAW_BYTES / KEYSET_LENGTH (r11) work over multi-key
  * keysets. DOCUMENTED DEVIATION: BigQuery keysets are serialized Tink
  * protos; this engine's keysets use a versioned local format
  * (`GAEAD1` + type byte + one-or-more 32-byte keys, primary LAST)
  * and the ciphertexts are JDK AES-GCM — keysets and ciphertexts are
  * NOT interchangeable with Tink/BigQuery, only the SQL surface and
  * its laws are. Ciphertexts carry no Tink key-id prefix, so decrypt
  * tries the primary then older keys. Deterministic encryption uses an
  * SIV-style construction (nonce = HMAC-SHA256(macSubkey, aad ∥
  * plaintext) truncated, AES keyed by a separately-derived subkey)
  * rather than RFC 5297 AES-SIV, which the JDK lacks.
  */
object AeadKernels {
  private val MAGIC = "GAEAD1".getBytes("UTF-8")
  private val TYPE_GCM: Byte = 0
  private val TYPE_DET: Byte = 1
  private val TYPE_ANY: Byte = -1 // validateKeyset: skip the type check
  private val rng = new SecureRandom()

  def newKeyset(keyType: String): Array[Byte] = {
    val t = keyType match {
      case "AEAD_AES_GCM_256" => TYPE_GCM
      case "DETERMINISTIC_AEAD_AES_SIV_CMAC_256" => TYPE_DET
      case other => throw new IllegalArgumentException(
        s"KEYS.NEW_KEYSET: unsupported key type '$other' (supported: " +
          "AEAD_AES_GCM_256, DETERMINISTIC_AEAD_AES_SIV_CMAC_256)")
    }
    val key = new Array[Byte](32)
    rng.synchronized(rng.nextBytes(key))
    MAGIC ++ Array(t) ++ key
  }

  // Multi-key keysets (r11 — closes the KEYS.ROTATE/ADD/LENGTH skip):
  // MAGIC + type + key1 ∥ … ∥ keyN, 32 bytes each, PRIMARY = LAST.
  // NEW_KEYSET's single-key layout is the N = 1 case unchanged; encrypt
  // uses the primary only; decrypt tries primary first then the older
  // keys right-to-left (our ciphertexts carry no key id — unlike Tink's
  // output prefix — part of the documented keyset-format deviation).
  private def validateKeyset(ks: Array[Byte], wantType: Byte, fn: String): Unit = {
    val body = ks.length - MAGIC.length - 1
    if (ks.length < MAGIC.length + 1 + 32 || body % 32 != 0 ||
        !java.util.Arrays.equals(ks.take(MAGIC.length), MAGIC))
      throw new IllegalArgumentException(
        s"$fn: not a keyset produced by KEYS.NEW_KEYSET")
    val t = ks(MAGIC.length)
    if (wantType >= 0 && t != wantType) throw new IllegalArgumentException(
      s"$fn: keyset type mismatch (AEAD functions need AEAD_AES_GCM_256, " +
        "DETERMINISTIC_* need DETERMINISTIC_AEAD_AES_SIV_CMAC_256)")
  }

  private def parseKeyset(ks: Array[Byte], wantType: Byte, fn: String): Array[Byte] = {
    validateKeyset(ks, wantType, fn)
    ks.takeRight(32)
  }

  /** All keys, primary (newest) first. */
  private def allKeys(ks: Array[Byte], wantType: Byte, fn: String): Seq[Array[Byte]] = {
    validateKeyset(ks, wantType, fn)
    val n = (ks.length - MAGIC.length - 1) / 32
    (n - 1 to 0 by -1).map(i =>
      ks.slice(MAGIC.length + 1 + i * 32, MAGIC.length + 1 + (i + 1) * 32))
  }

  private def keyTypeByte(keyType: String, fn: String): Byte = keyType match {
    case "AEAD_AES_GCM_256" => TYPE_GCM
    case "DETERMINISTIC_AEAD_AES_SIV_CMAC_256" => TYPE_DET
    case other => throw new IllegalArgumentException(
      s"$fn: unsupported key type '$other' (supported: AEAD_AES_GCM_256, " +
        "DETERMINISTIC_AEAD_AES_SIV_CMAC_256)")
  }

  /** KEYS.ROTATE_KEYSET: append a fresh key, which becomes primary;
    * older keys remain for decryption.
    */
  def rotateKeyset(ks: Array[Byte], keyType: String): Array[Byte] = {
    val want = keyTypeByte(keyType, "KEYS.ROTATE_KEYSET")
    validateKeyset(ks, want, "KEYS.ROTATE_KEYSET")
    val key = new Array[Byte](32)
    rng.synchronized(rng.nextBytes(key))
    ks ++ key
  }

  /** KEYS.ADD_KEY_FROM_RAW_BYTES: add a caller-supplied raw key as a
    * NON-primary key (BigQuery: the added key decrypts but does not
    * become the encryption key). Our format slots 32-byte keys; the
    * 16-byte AES-128 raw form BigQuery also accepts stays loud.
    * BigQuery restricts this to AEAD key types ('AES_GCM').
    */
  def addKeyFromRawBytes(ks: Array[Byte], keyType: String,
      raw: Array[Byte]): Array[Byte] = {
    if (keyType != "AES_GCM") throw new IllegalArgumentException(
      "KEYS.ADD_KEY_FROM_RAW_BYTES: only 'AES_GCM' raw keys are supported " +
        "(AES_CBC_PKCS is not implemented in this engine)")
    validateKeyset(ks, TYPE_GCM, "KEYS.ADD_KEY_FROM_RAW_BYTES")
    if (raw.length != 32) throw new IllegalArgumentException(
      "KEYS.ADD_KEY_FROM_RAW_BYTES: raw key must be 32 bytes " +
        "(16-byte AES-128 keys are not supported in this engine)")
    // non-primary = insert BEFORE the existing keys (primary is last)
    ks.take(MAGIC.length + 1) ++ raw ++ ks.drop(MAGIC.length + 1)
  }

  /** KEYS.KEYSET_LENGTH: number of keys in the keyset. */
  def keysetLength(ks: Array[Byte]): Long = {
    validateKeyset(ks, TYPE_ANY, "KEYS.KEYSET_LENGTH")
    ((ks.length - MAGIC.length - 1) / 32).toLong
  }

  private def gcm(mode: Int, key: Array[Byte], nonce: Array[Byte],
      aad: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new GCMParameterSpec(128, nonce))
    if (aad.nonEmpty) c.updateAAD(aad)
    c.doFinal(data)
  }

  def encrypt(ks: Array[Byte], plain: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    val key = parseKeyset(ks, TYPE_GCM, "AEAD.ENCRYPT")
    val nonce = new Array[Byte](12)
    rng.synchronized(rng.nextBytes(nonce))
    nonce ++ gcm(Cipher.ENCRYPT_MODE, key, nonce, aad, plain)
  }

  def decrypt(ks: Array[Byte], cipher: Array[Byte], aad: Array[Byte],
      fn: String): Array[Byte] = {
    val keys = allKeys(ks, TYPE_GCM, fn)
    if (cipher.length < 12 + 16) throw new IllegalArgumentException(
      s"$fn: ciphertext too short")
    // primary first, then rotated-out keys; only auth failures advance
    // (a wrong-AAD failure under EVERY key is the loud final error)
    keys.iterator.zipWithIndex.map { case (key, i) =>
      try Some(gcm(Cipher.DECRYPT_MODE, key, cipher.take(12), aad, cipher.drop(12)))
      catch { case _: javax.crypto.AEADBadTagException if i < keys.size - 1 => None }
    }.collectFirst { case Some(p) => p }.getOrElse(
      throw new javax.crypto.AEADBadTagException(
        s"$fn: no key in the keyset authenticates this ciphertext/AAD"))
  }

  /** SIV key separation (r10 ADVICE): real AES-SIV (and Tink's
    * AES_SIV_CMAC) carries a 64-byte key split into independent MAC and
    * encryption halves; reusing one 32-byte key for both the synthetic-
    * nonce HMAC and AES-GCM is cross-primitive key reuse. Our keysets
    * carry 32 bytes of master material, so expand it into two labeled
    * subkeys (HKDF-style one-block expand: HMAC(master, label)) — the
    * MAC subkey never touches AES, the AES subkey never keys the HMAC.
    * Part of the documented keyset-format deviation from Tink.
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

  def detEncrypt(ks: Array[Byte], plain: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    val master = parseKeyset(ks, TYPE_DET, "DETERMINISTIC_ENCRYPT")
    val nonce = sivNonce(detSubkey(master, "graft-siv-mac"), aad, plain)
    nonce ++ gcm(Cipher.ENCRYPT_MODE, detSubkey(master, "graft-siv-aes"),
      nonce, aad, plain)
  }

  def detDecrypt(ks: Array[Byte], cipher: Array[Byte], aad: Array[Byte],
      fn: String): Array[Byte] = {
    val masters = allKeys(ks, TYPE_DET, fn)
    if (cipher.length < 12 + 16) throw new IllegalArgumentException(
      s"$fn: ciphertext too short")
    masters.iterator.zipWithIndex.map { case (master, i) =>
      try Some(gcm(Cipher.DECRYPT_MODE, detSubkey(master, "graft-siv-aes"),
        cipher.take(12), aad, cipher.drop(12)))
      catch { case _: javax.crypto.AEADBadTagException if i < masters.size - 1 => None }
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
    else AeadKernels.encrypt(AeadCryptExpr.bytes(k),
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
}

/** AEAD/DETERMINISTIC decrypt + deterministic-encrypt kernels. Plaintext
  * accepts STRING or BYTES (the two overloads); additional_data likewise.
  */
case class AeadCryptExpr(fn: String, first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType =
    if (fn.endsWith("_string")) StringType else BinaryType
  override def nullable: Boolean = true
  import AeadCryptExpr.bytes
  override protected def nullSafeEval(k: Any, d: Any, a: Any): Any = {
    val ks = bytes(k); val data = bytes(d); val aad = bytes(a)
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
