package graft.functions

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Minimal MD5 (RFC 1321) specialized for the engine's 60-bit prefix
  * hash — the single largest per-task CPU sink across the d-family
  * (every minhash shingle, simhash/rolling-hash token and LSH band key
  * funnels through `graft_md5_60`). Differences from the
  * `java.security.MessageDigest` path it replaces, all overhead, none
  * semantic:
  *
  *   - input bytes are read directly from the UTF8String's base memory
  *     (heap or off-heap) — no `getBytes` copy for offset views, which
  *     is every string read out of an UnsafeRow or unsafe array;
  *   - only the first two state words A and B (= the first 8 digest
  *     bytes, all the prefix hash uses) leave the core — no 16-byte
  *     digest array allocation, no engine reset/update machinery;
  *   - the 64-step compression is fully unrolled with the RFC 1321
  *     constants inline.
  *
  * Bit-identical to MessageDigest("MD5"): same algorithm, enforced by a
  * property test over random byte strings covering every tail-padding
  * class and multi-block lengths (Md5KernelSpec). The DuckDB oracle
  * replays the same md5, so results cannot drift.
  */
object Md5Kernel {
  private final val LE: Boolean =
    java.nio.ByteOrder.nativeOrder() == java.nio.ByteOrder.LITTLE_ENDIAN
  // tail scratch: the final 1-2 padded blocks (<= 128 bytes), per thread
  private val tailBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](128))

  /** Big-endian long of the first 8 md5 digest bytes, `>>> 4` —
    * numerically identical to parsing the first 15 hex digest chars
    * (see [[SketchKernels.md5Long60]]).
    */
  def prefix60(s: UTF8String): Long = {
    val st = new Array[Int](4)
    st(0) = 0x67452301; st(1) = 0xefcdab89; st(2) = 0x98badcfe; st(3) = 0x10325476
    md5Blocks(st, s.getBaseObject, s.getBaseOffset, s.numBytes)
    val hi = Integer.reverseBytes(st(0)).toLong
    val lo = Integer.reverseBytes(st(1)).toLong & 0xffffffffL
    ((hi << 32) | lo) >>> 4
  }

  /** Digest `len` bytes at (base, off) into the running state `st`. */
  private def md5Blocks(st: Array[Int], base: AnyRef, off: Long, len: Int): Unit = {
    var p = off
    var rem = len
    while (rem >= 64) {
      compress(st, base, p)
      p += 64
      rem -= 64
    }
    // tail: data ++ 0x80 ++ zeros ++ 8-byte little-endian bit length
    val buf = tailBuf.get()
    if (rem > 0) Platform.copyMemory(base, p, buf, Platform.BYTE_ARRAY_OFFSET, rem)
    buf(rem) = 0x80.toByte
    val end = if (rem <= 55) 64 else 128
    java.util.Arrays.fill(buf, rem + 1, end - 8, 0.toByte)
    val bits = len.toLong * 8
    var i = 0
    while (i < 8) { buf(end - 8 + i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
    compress(st, buf, Platform.BYTE_ARRAY_OFFSET.toLong)
    if (end == 128) compress(st, buf, Platform.BYTE_ARRAY_OFFSET.toLong + 64)
  }

  /** Little-endian int at (base, off); the branch is a constant the JIT
    * folds away.
    */
  @inline private def ld(base: AnyRef, off: Long): Int =
    if (LE) Platform.getInt(base, off)
    else (Platform.getByte(base, off) & 0xff) |
      ((Platform.getByte(base, off + 1) & 0xff) << 8) |
      ((Platform.getByte(base, off + 2) & 0xff) << 16) |
      ((Platform.getByte(base, off + 3) & 0xff) << 24)

  /** One RFC 1321 compression of the 64 bytes at (base, off) into `st`. */
  private def compress(st: Array[Int], base: AnyRef, off: Long): Unit = {
    val ia = st(0); val ib = st(1); val ic = st(2); val id = st(3)
    var a = ia; var b = ib; var c = ic; var d = id
    val m0 = ld(base, off + 0)
    val m1 = ld(base, off + 4)
    val m2 = ld(base, off + 8)
    val m3 = ld(base, off + 12)
    val m4 = ld(base, off + 16)
    val m5 = ld(base, off + 20)
    val m6 = ld(base, off + 24)
    val m7 = ld(base, off + 28)
    val m8 = ld(base, off + 32)
    val m9 = ld(base, off + 36)
    val m10 = ld(base, off + 40)
    val m11 = ld(base, off + 44)
    val m12 = ld(base, off + 48)
    val m13 = ld(base, off + 52)
    val m14 = ld(base, off + 56)
    val m15 = ld(base, off + 60)
    a = b + Integer.rotateLeft(a + ((b & c) | (~b & d)) + m0 + -680876936, 7)
    d = a + Integer.rotateLeft(d + ((a & b) | (~a & c)) + m1 + -389564586, 12)
    c = d + Integer.rotateLeft(c + ((d & a) | (~d & b)) + m2 + 606105819, 17)
    b = c + Integer.rotateLeft(b + ((c & d) | (~c & a)) + m3 + -1044525330, 22)
    a = b + Integer.rotateLeft(a + ((b & c) | (~b & d)) + m4 + -176418897, 7)
    d = a + Integer.rotateLeft(d + ((a & b) | (~a & c)) + m5 + 1200080426, 12)
    c = d + Integer.rotateLeft(c + ((d & a) | (~d & b)) + m6 + -1473231341, 17)
    b = c + Integer.rotateLeft(b + ((c & d) | (~c & a)) + m7 + -45705983, 22)
    a = b + Integer.rotateLeft(a + ((b & c) | (~b & d)) + m8 + 1770035416, 7)
    d = a + Integer.rotateLeft(d + ((a & b) | (~a & c)) + m9 + -1958414417, 12)
    c = d + Integer.rotateLeft(c + ((d & a) | (~d & b)) + m10 + -42063, 17)
    b = c + Integer.rotateLeft(b + ((c & d) | (~c & a)) + m11 + -1990404162, 22)
    a = b + Integer.rotateLeft(a + ((b & c) | (~b & d)) + m12 + 1804603682, 7)
    d = a + Integer.rotateLeft(d + ((a & b) | (~a & c)) + m13 + -40341101, 12)
    c = d + Integer.rotateLeft(c + ((d & a) | (~d & b)) + m14 + -1502002290, 17)
    b = c + Integer.rotateLeft(b + ((c & d) | (~c & a)) + m15 + 1236535329, 22)
    a = b + Integer.rotateLeft(a + ((d & b) | (~d & c)) + m1 + -165796510, 5)
    d = a + Integer.rotateLeft(d + ((c & a) | (~c & b)) + m6 + -1069501632, 9)
    c = d + Integer.rotateLeft(c + ((b & d) | (~b & a)) + m11 + 643717713, 14)
    b = c + Integer.rotateLeft(b + ((a & c) | (~a & d)) + m0 + -373897302, 20)
    a = b + Integer.rotateLeft(a + ((d & b) | (~d & c)) + m5 + -701558691, 5)
    d = a + Integer.rotateLeft(d + ((c & a) | (~c & b)) + m10 + 38016083, 9)
    c = d + Integer.rotateLeft(c + ((b & d) | (~b & a)) + m15 + -660478335, 14)
    b = c + Integer.rotateLeft(b + ((a & c) | (~a & d)) + m4 + -405537848, 20)
    a = b + Integer.rotateLeft(a + ((d & b) | (~d & c)) + m9 + 568446438, 5)
    d = a + Integer.rotateLeft(d + ((c & a) | (~c & b)) + m14 + -1019803690, 9)
    c = d + Integer.rotateLeft(c + ((b & d) | (~b & a)) + m3 + -187363961, 14)
    b = c + Integer.rotateLeft(b + ((a & c) | (~a & d)) + m8 + 1163531501, 20)
    a = b + Integer.rotateLeft(a + ((d & b) | (~d & c)) + m13 + -1444681467, 5)
    d = a + Integer.rotateLeft(d + ((c & a) | (~c & b)) + m2 + -51403784, 9)
    c = d + Integer.rotateLeft(c + ((b & d) | (~b & a)) + m7 + 1735328473, 14)
    b = c + Integer.rotateLeft(b + ((a & c) | (~a & d)) + m12 + -1926607734, 20)
    a = b + Integer.rotateLeft(a + (b ^ c ^ d) + m5 + -378558, 4)
    d = a + Integer.rotateLeft(d + (a ^ b ^ c) + m8 + -2022574463, 11)
    c = d + Integer.rotateLeft(c + (d ^ a ^ b) + m11 + 1839030562, 16)
    b = c + Integer.rotateLeft(b + (c ^ d ^ a) + m14 + -35309556, 23)
    a = b + Integer.rotateLeft(a + (b ^ c ^ d) + m1 + -1530992060, 4)
    d = a + Integer.rotateLeft(d + (a ^ b ^ c) + m4 + 1272893353, 11)
    c = d + Integer.rotateLeft(c + (d ^ a ^ b) + m7 + -155497632, 16)
    b = c + Integer.rotateLeft(b + (c ^ d ^ a) + m10 + -1094730640, 23)
    a = b + Integer.rotateLeft(a + (b ^ c ^ d) + m13 + 681279174, 4)
    d = a + Integer.rotateLeft(d + (a ^ b ^ c) + m0 + -358537222, 11)
    c = d + Integer.rotateLeft(c + (d ^ a ^ b) + m3 + -722521979, 16)
    b = c + Integer.rotateLeft(b + (c ^ d ^ a) + m6 + 76029189, 23)
    a = b + Integer.rotateLeft(a + (b ^ c ^ d) + m9 + -640364487, 4)
    d = a + Integer.rotateLeft(d + (a ^ b ^ c) + m12 + -421815835, 11)
    c = d + Integer.rotateLeft(c + (d ^ a ^ b) + m15 + 530742520, 16)
    b = c + Integer.rotateLeft(b + (c ^ d ^ a) + m2 + -995338651, 23)
    a = b + Integer.rotateLeft(a + (c ^ (b | ~d)) + m0 + -198630844, 6)
    d = a + Integer.rotateLeft(d + (b ^ (a | ~c)) + m7 + 1126891415, 10)
    c = d + Integer.rotateLeft(c + (a ^ (d | ~b)) + m14 + -1416354905, 15)
    b = c + Integer.rotateLeft(b + (d ^ (c | ~a)) + m5 + -57434055, 21)
    a = b + Integer.rotateLeft(a + (c ^ (b | ~d)) + m12 + 1700485571, 6)
    d = a + Integer.rotateLeft(d + (b ^ (a | ~c)) + m3 + -1894986606, 10)
    c = d + Integer.rotateLeft(c + (a ^ (d | ~b)) + m10 + -1051523, 15)
    b = c + Integer.rotateLeft(b + (d ^ (c | ~a)) + m1 + -2054922799, 21)
    a = b + Integer.rotateLeft(a + (c ^ (b | ~d)) + m8 + 1873313359, 6)
    d = a + Integer.rotateLeft(d + (b ^ (a | ~c)) + m15 + -30611744, 10)
    c = d + Integer.rotateLeft(c + (a ^ (d | ~b)) + m6 + -1560198380, 15)
    b = c + Integer.rotateLeft(b + (d ^ (c | ~a)) + m13 + 1309151649, 21)
    a = b + Integer.rotateLeft(a + (c ^ (b | ~d)) + m4 + -145523070, 6)
    d = a + Integer.rotateLeft(d + (b ^ (a | ~c)) + m11 + -1120210379, 10)
    c = d + Integer.rotateLeft(c + (a ^ (d | ~b)) + m2 + 718787259, 15)
    b = c + Integer.rotateLeft(b + (d ^ (c | ~a)) + m9 + -343485551, 21)
    st(0) = ia + a; st(1) = ib + b; st(2) = ic + c; st(3) = id + d
  }
}
