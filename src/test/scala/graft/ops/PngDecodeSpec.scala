package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Differential gate for the gray-8 PNG pixel decoder: the q352 oracle
  * covers the stored-mode zlib path and filters 0–2 (its generator writes
  * those arithmetically); THIS spec covers what SQL generation can't —
  * real deflate-COMPRESSED streams and encoder-chosen filters including
  * Average/Paeth — by round-tripping through the JDK's own PNG writer
  * (ImageIO, no new dependency) and requiring pixel-for-pixel equality
  * with the BufferedImage raster.
  */
class PngDecodeSpec extends AnyFunSuite {

  private def writePng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0, px(y * w + x))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos), "JDK PNG writer unavailable")
    baos.toByteArray
  }

  test("pngGray8Pixels round-trips JDK-written deflate PNGs pixel-for-pixel") {
    val rnd = new scala.util.Random(42)
    // shapes chosen to exercise the encoder's adaptive filter selection:
    // noise (None/Sub), horizontal gradient (Sub), vertical gradient (Up),
    // diagonal gradient (Paeth/Average territory), constant (any)
    val cases: Seq[(String, Int, Int, (Int, Int) => Int)] = Seq(
      ("noise", 8, 8, (_, _) => rnd.nextInt(256)),
      ("hgrad", 32, 16, (x, _) => (x * 8) % 256),
      ("vgrad", 16, 32, (_, y) => (y * 8) % 256),
      ("diag", 33, 17, (x, y) => (x * 5 + y * 7) % 256), // non-multiple-of-anything dims
      ("const", 5, 11, (_, _) => 128),
      ("big-noise", 64, 64, (_, _) => rnd.nextInt(256))
    )
    cases.foreach { case (name, w, h, f) =>
      val px = Array.tabulate(w * h)(i => f(i % w, i / w))
      val bytes = writePng(px, w, h)
      // the JDK writer really compresses: a stored stream would be >= raw size
      assert(bytes.length < w * h + 100 || name == "noise" || name == "big-noise",
        s"$name: suspiciously uncompressed (${bytes.length} bytes for ${w * h} px)")
      Multimodal.pngGray8Pixels(bytes, 1L << 22) match {
        case Some((gw, gh, got)) =>
          assert(gw == w && gh == h, s"$name: dims ($gw,$gh) != ($w,$h)")
          assert(got.sameElements(px), s"$name: pixel mismatch")
        case None => fail(s"$name: decoder returned None on a valid JDK PNG")
      }
    }
  }

  test("pngGray8Pixels refuses corrupt and out-of-scope payloads") {
    val px = Array.tabulate(64)(i => (i * 3) % 256)
    val good = writePng(px, 8, 8)
    assert(Multimodal.pngGray8Pixels(good, 1L << 22).isDefined)
    // Adler-32 integrity: flipping a byte inside the IDAT data must refuse,
    // not return wrong pixels (find IDAT, corrupt a mid-stream byte)
    val idatAt = good.sliding(4).indexWhere(w =>
      w(0) == 'I' && w(1) == 'D' && w(2) == 'A' && w(3) == 'T')
    assert(idatAt > 0)
    val corrupt = good.clone()
    corrupt(idatAt + 8) = (corrupt(idatAt + 8) ^ 0x55).toByte
    assert(Multimodal.pngGray8Pixels(corrupt, 1L << 22).isEmpty,
      "corrupted IDAT must refuse (inflate or Adler failure), not mis-decode")
    // truncated stream
    assert(Multimodal.pngGray8Pixels(good.take(good.length - 20), 1L << 22).isEmpty)
    // RGB PNGs are out of scope (color type 2) — refuse, don't mis-read
    val rgb = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", baos)
    assert(Multimodal.pngGray8Pixels(baos.toByteArray, 1L << 22).isEmpty)
    // pixel-count guard
    assert(Multimodal.pngGray8Pixels(good, 16L).isEmpty)
    // not a PNG at all / null
    assert(Multimodal.pngGray8Pixels("BM000000".getBytes, 1L << 22).isEmpty)
    assert(Multimodal.pngGray8Pixels(null, 1L << 22).isEmpty)
  }
}
