package graft.queries

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** The real-decode half of the multimodal path: `javax.imageio` must
  * round-trip the synthetic PNGs exactly (the m01/m04 oracles replay the
  * pixel formula, so any codec drift breaks the gates), and a checked-in
  * PNG — written by a separate encoder run, not this JVM — must decode to
  * the formula's pixels.
  */
class MultimodalSpec extends AnyFunSuite {

  private def expectedPixel(seed: Long, x: Int, y: Int, bumped: Boolean): Int = {
    val bump = if (bumped && x == 0 && y < 2) 16L else 0L
    (((seed * 31L + x * 7L + y * 13L + bump) % 256L + 256L) % 256L).toInt
  }

  test("checked-in PNG decodes to the formula's exact pixels") {
    val in = getClass.getResourceAsStream("/graft/gray_20x16_seed5.png")
    assert(in != null, "test resource graft/gray_20x16_seed5.png missing")
    val img = ImageIO.read(in)
    assert(img.getWidth == 20 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 20)
      assert(img.getRaster.getSample(x, y, 0) == expectedPixel(5L, x, y, bumped = false),
        s"pixel ($x,$y)")
  }

  test("syntheticImage round-trips exactly through ImageIO for varied seeds") {
    for (seed <- Seq(0L, 7L, 255L, 256L, 123456789L); bumped <- Seq(false, true)) {
      val w = 16 + (seed % 16).toInt
      val png = Multimodal.syntheticImage(seed, w, 16, bumped)
      // a real PNG: signature bytes
      assert(png.take(8).map(b => f"${b & 0xff}%02x").mkString == "89504e470d0a1a0a")
      val img = ImageIO.read(new ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == 16)
      for (y <- 0 until 16; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == expectedPixel(seed, x, y, bumped),
          s"seed=$seed bumped=$bumped pixel ($x,$y)")
    }
  }

  test("syntheticImage BMP round-trips exactly too") {
    val bmp = Multimodal.syntheticImage(9L, 20, 16, format = "bmp")
    // 'BM' signature
    assert(bmp.take(2).map(b => f"${b & 0xff}%02x").mkString == "424d")
    val img = ImageIO.read(new ByteArrayInputStream(bmp))
    assert(img.getWidth == 20 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 20)
      assert(img.getRaster.getSample(x, y, 0) == expectedPixel(9L, x, y, bumped = false),
        s"pixel ($x,$y)")
  }

  test("syntheticWav decodes back to the formula's exact PCM samples") {
    import javax.sound.sampled.AudioSystem
    for (seed <- Seq(0L, 5L, 123456789L)) {
      val n = 256 + (seed % 64).toInt
      val wav = Multimodal.syntheticWav(seed, n)
      // canonical header: 'RIFF' + little-endian chunk size (36 + 2n)
      val size = 36 + 2 * n
      val expHead = "52494646" +
        f"${size & 0xff}%02x${(size >> 8) & 0xff}%02x${(size >> 16) & 0xff}%02x${(size >> 24) & 0xff}%02x"
      assert(wav.take(8).map(b => f"${b & 0xff}%02x").mkString == expHead)
      val pcm = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav)).readAllBytes()
      assert(pcm.length == 2 * n)
      for (i <- 0 until n) {
        val v = (pcm(2 * i) & 0xff) | (pcm(2 * i + 1).toInt << 8)
        val exp = (((seed * 37L + i * 31L + 7L) % 65536L) - 32768L).toInt
        assert(v == exp, s"seed=$seed sample $i")
      }
    }
  }

  test("syntheticGif frames decode back to the per-frame formula exactly") {
    for (seed <- Seq(0L, 5L, 987654321L)) {
      val (w, h, nf) = (12 + (seed % 8).toInt, 8, 3 + (seed % 5).toInt)
      val gif = Multimodal.syntheticGif(seed, w, h, nf)
      // 'GIF89a' signature
      assert(gif.take(6).map(b => f"${b & 0xff}%02x").mkString == "474946383961")
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(gif)))
      assert(reader.getNumImages(true) == nf)
      for (f <- 0 until nf) {
        val img = reader.read(f)
        assert(img.getWidth == w && img.getHeight == h)
        for (y <- 0 until h; x <- 0 until w) {
          val exp = (((seed * 29L + f * 7L + x * 3L + y * 5L) % 256L + 256L) % 256L).toInt
          assert(img.getRaster.getSample(x, y, 0) == exp,
            s"seed=$seed frame=$f pixel ($x,$y)")
        }
      }
      reader.dispose()
    }
  }

  test("bumped variant differs in exactly the 2 planted pixels") {
    val a = ImageIO.read(new ByteArrayInputStream(Multimodal.syntheticImage(42L, 20, 16)))
    val b = ImageIO.read(new ByteArrayInputStream(
      Multimodal.syntheticImage(42L, 20, 16, bumped = true)))
    val diffs = for {
      y <- 0 until 16; x <- 0 until 20
      if a.getRaster.getSample(x, y, 0) != b.getRaster.getSample(x, y, 0)
    } yield (x, y)
    assert(diffs == Seq((0, 0), (0, 1)))
  }

  test("nearest-neighbor thumbnail samples the formula's exact pixels") {
    // replicate resizeThumbnails' kernel on a decoded 20x16 image:
    // sx = tx*20/8, sy = ty*16/8 — must equal the formula at those points
    val img = ImageIO.read(new ByteArrayInputStream(Multimodal.syntheticImage(9L, 20, 16)))
    for (ty <- 0 until 8; tx <- 0 until 8) {
      val sx = tx * 20 / 8
      val sy = ty * 16 / 8
      assert(img.getRaster.getSample(sx, sy, 0) == expectedPixel(9L, sx, sy, bumped = false),
        s"thumb ($tx,$ty) -> src ($sx,$sy)")
    }
  }
}
