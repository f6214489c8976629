package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Bit-identity of the specialized MD5 prefix kernel against the JDK
  * MessageDigest it replaced. Coverage is structural, not sampled:
  * every tail-padding class (len % 64 in 0..63, in particular the
  * 55/56 one-vs-two pad-block boundary), multi-block inputs, and
  * offset views into a shared backing array (the UnsafeRow string
  * case where `getBytes` used to copy).
  */
class Md5KernelSpec extends AnyFunSuite {

  private def reference(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  test("prefix60 equals MessageDigest MD5 over every padding class and multi-block lengths") {
    val rnd = new scala.util.Random(42)
    for (n <- (0 to 200) ++ Seq(255, 256, 511, 512, 1000, 4096, 65537)) {
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes)
      assert(Md5Kernel.prefix60(UTF8String.fromBytes(bytes)) === reference(bytes),
        s"mismatch at len $n")
    }
  }

  test("prefix60 reads offset views (non-zero base offset) correctly") {
    val rnd = new scala.util.Random(7)
    val backing = new Array[Byte](4096)
    rnd.nextBytes(backing)
    for (off <- Seq(1, 3, 17, 63, 64, 100); len <- Seq(0, 1, 20, 55, 56, 63, 64, 100, 500)) {
      val view = UTF8String.fromBytes(backing, off, len)
      val copy = java.util.Arrays.copyOfRange(backing, off, off + len)
      assert(Md5Kernel.prefix60(view) === reference(copy), s"mismatch at off $off len $len")
    }
  }

  test("prefix60 known goldens (python hashlib, first 15 hex chars)") {
    // int(hashlib.md5(b'hello').hexdigest()[:15], 16)
    assert(Md5Kernel.prefix60(UTF8String.fromString("hello")) === 419982666956583591L)
    assert(Md5Kernel.prefix60(UTF8String.fromString("the quick brown")) === 846626497777792448L)
    assert(Md5Kernel.prefix60(UTF8String.fromString("")) === reference(Array.empty))
  }
}
