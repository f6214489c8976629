package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level pins for FarmHash Fingerprint64 and BigQuery INSTR.
  *
  * Fingerprint64 vectors: the empty input is k2 straight from the
  * spec's zero-length branch; 'abc' is pyfarmhash's documented
  * hash64/fingerprint64 value (short inputs share farmhashna's
  * HashLen0to16). Longer inputs pin each length-class branch against
  * regression (self-derived at first implementation, then frozen —
  * any kernel edit that shifts a branch breaks here, not in a gate).
  */
class FarmHashSpec extends AnyFunSuite {
  private def fp(s: String): Long =
    FarmHashKernels.fingerprint64(s.getBytes("UTF-8"))

  test("fingerprint64 empty input is k2 (spec zero-length branch)") {
    assert(fp("") == 0x9ae16a3b2f90404fL)
  }

  test("fingerprint64('abc') matches the published vector") {
    assert(fp("abc") == 2640714258260161385L)
  }

  test("fingerprint64 exercises every length-class branch distinctly") {
    // 1..3 / 4..7 / 8..16 / 17..32 / 33..64 / 65+ (loop) — all produce
    // stable, pairwise-distinct values; a branch-boundary off-by-one
    // (e.g. len 16 vs 17) would collide or throw
    val inputs = Seq("a", "abcd", "abcdefgh", "abcdefgh12345678",
      "abcdefgh123456789", "a" * 32, "a" * 33, "a" * 64, "a" * 65,
      "a" * 128, "a" * 129, "ab" * 100)
    val hashes = inputs.map(fp)
    assert(hashes.distinct.size == hashes.size)
    // determinism across calls
    assert(inputs.map(fp) == hashes)
  }

  test("fingerprint64 depends on every byte (long-input loop)") {
    val base = ("x" * 200).getBytes("UTF-8")
    val h0 = FarmHashKernels.fingerprint64(base)
    (0 until 200 by 17).foreach { i =>
      val mod = base.clone(); mod(i) = 'y'.toByte
      assert(FarmHashKernels.fingerprint64(mod) != h0, s"byte $i ignored")
    }
  }

  private def instr(v: String, s: String, p: Int = 1, o: Int = 1): Long =
    FarmHashKernels.instr(
      org.apache.spark.unsafe.types.UTF8String.fromString(v),
      org.apache.spark.unsafe.types.UTF8String.fromString(s), p, o)

  test("INSTR forward search (BigQuery doc examples)") {
    assert(instr("banana", "an") == 2L)
    assert(instr("banana", "an", 3) == 4L)
    assert(instr("banana", "an", 1, 1) == 2L)
    assert(instr("banana", "an", 1, 2) == 4L)
    assert(instr("banana", "an", 1, 3) == 0L)
    assert(instr("banana", "ann") == 0L)
  }

  test("INSTR backward search (negative position)") {
    assert(instr("banana", "an", -1) == 4L)
    assert(instr("banana", "an", -1, 2) == 2L)
    assert(instr("banana", "an", -1, 3) == 0L)
    // match must START at or before the resolved position
    assert(instr("banana", "an", -3) == 4L) // start index 3 (0-based), match at 3
    assert(instr("banana", "an", -4) == 2L) // start index 2: match at 3 excluded
  }

  test("INSTR counts overlapping occurrences") {
    assert(instr("aaaa", "aa", 1, 2) == 2L)
    assert(instr("aaaa", "aa", 1, 3) == 3L)
  }

  test("INSTR edge semantics: empty needle 0; position 0 and occurrence < 1 loud") {
    assert(instr("abc", "") == 0L)
    intercept[IllegalArgumentException](instr("abc", "b", 0))
    intercept[IllegalArgumentException](instr("abc", "b", 1, 0))
  }

  test("INSTR property: forward and backward enumerate the same match set") {
    // occurrence k backward from the end == occurrence (n − k + 1)
    // forward, for every k — checked over a random small-alphabet corpus
    // (overlaps included; the property holds because both directions
    // walk the identical ordered set of match start positions)
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val v = Seq.fill(rnd.nextInt(24) + 1)(('a' + rnd.nextInt(2)).toChar).mkString
      val s = Seq.fill(rnd.nextInt(3) + 1)(('a' + rnd.nextInt(2)).toChar).mkString
      val fwd = Iterator.from(1)
        .map(k => instr(v, s, 1, k)).takeWhile(_ != 0L).toVector
      val bwd = Iterator.from(1)
        .map(k => instr(v, s, -1, k)).takeWhile(_ != 0L).toVector
      assert(bwd == fwd.reverse, s"v=$v s=$s fwd=$fwd bwd=$bwd")
      // every reported position really is a match start
      fwd.foreach(p => assert(v.startsWith(s, p.toInt - 1), s"v=$v s=$s p=$p"))
      // one past the last occurrence finds nothing
      assert(instr(v, s, 1, fwd.size + 1) == 0L)
    }
  }

  test("INSTR property: positive position p equals searching the suffix") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val v = Seq.fill(rnd.nextInt(20) + 2)(('a' + rnd.nextInt(2)).toChar).mkString
      val s = Seq.fill(rnd.nextInt(2) + 1)(('a' + rnd.nextInt(2)).toChar).mkString
      val p = rnd.nextInt(v.length) + 1
      val viaSuffix = instr(v.substring(p - 1), s) match {
        case 0L => 0L
        case q => q + p - 1
      }
      assert(instr(v, s, p) == viaSuffix, s"v=$v s=$s p=$p")
    }
  }

  test("fingerprint64 property: no accidental prefix/length aliasing") {
    // inputs that share a long prefix but differ in length or tail must
    // not collide — catches a mis-read of the (len-1)&63 tail handling
    val base = "q" * 300
    val variants = (0 to 64).map(i => base.substring(0, 200 + i)) ++
      (0 until 32).map(i => base.substring(0, 200) + ("q" * i) + "z")
    val hs = variants.map(fp)
    assert(hs.distinct.size == hs.size)
  }
}
