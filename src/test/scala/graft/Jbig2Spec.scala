package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** /JBIG2Decode: the MMR generic-region subset over the shared T.6
  * kernel — roundtrip, polarity, arithmetic refusal, totality, and the
  * end-to-end PDF image path. */
class Jbig2Spec extends AnyFunSuite {

  test("embedded JBIG2 MMR region roundtrips with 0-is-black polarity") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 10) {
      val w = 8 + rnd.nextInt(72)
      val h = 1 + rnd.nextInt(12)
      val bitmap = Array.tabulate(h, w)((_, _) => rnd.nextBoolean())
      val enc = Jbig2.encodeEmbedded(bitmap, w)
      val dec = Jbig2.decodeEmbedded(enc)
        .fold(e => fail(s"trial $trial: $e"), identity)
      val rowBytes = (w + 7) / 8
      assert(dec.length == rowBytes * h, s"trial $trial")
      for (y <- 0 until h; x <- 0 until w) {
        val bit = (dec(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        // JBIG2 1=black is inverted to the /DeviceGray 0-is-black polarity
        assert((bit == 0) == bitmap(y)(x), s"trial $trial pixel ($x,$y)")
      }
    }
  }

  test("arithmetic-coded generic region (MMR=0) is refused, not mis-decoded") {
    val bitmap = Array.tabulate(4, 16)((y, x) => (x + y) % 2 == 0)
    val enc = Jbig2.encodeEmbedded(bitmap, 16)
    // flip the MMR bit in the generic-region flags byte, which sits
    // immediately before the T.6 payload at the end of the stream
    val mmrLen = Ccitt.encodeG4(bitmap, 16).length
    val genFlagsOff = enc.length - mmrLen - 1
    assert((enc(genFlagsOff) & 1) == 1, "fixture layout changed")
    val m = enc.clone()
    m(genFlagsOff) = 0x00.toByte
    Jbig2.decodeEmbedded(m) match {
      case Left(PdfError.UnsupportedFeature(msg)) => assert(msg.contains("arithmetic"))
      case other => fail(s"expected UnsupportedFeature, got $other")
    }
  }

  test("malformed JBIG2 streams return Left, never throw or hang") {
    val valid = Jbig2.encodeEmbedded(
      Array.tabulate(6, 40)((y, x) => ((x + y) % 3) == 0), 40)
    val rnd = new scala.util.Random(47)
    for (n <- 0 until 600) {
      val bytes =
        if (n % 3 == 0) valid.take(rnd.nextInt(valid.length))
        else if (n % 3 == 1) Array.fill[Byte](1 + rnd.nextInt(96))(rnd.nextInt(256).toByte)
        else {
          val m = valid.clone()
          m(rnd.nextInt(m.length)) = (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
          m
        }
      Jbig2.decodeEmbedded(bytes) match {
        case Right(_) | Left(_) => () // totality is the assertion
      }
    }
  }

  test("JBIG2 image extracts end-to-end with correct dimensions and pixels") {
    val d = graft.spark.FixtureGen.jbig2Image(5)
    val doc = DocStructure.openDocument(d.bytes, None).toOption.get
    assert(Extract.taggedText(doc) == Right(d.expected))
    val images = Images.extractPageImages(doc, 1).toOption.get
    assert(images.length == 1)
    val im = images.head
    assert(im.format == "png", im.format)
    val png = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(im.bytes))
    assert(png.getWidth == 48 && png.getHeight == 10)
    // spot-check against the constructed bitmap: (x+2y+5)%6<3 = black
    for ((x, y) <- Seq((0, 0), (1, 0), (4, 3), (47, 9))) {
      val black = ((x + 2 * y + 5) % 6) < 3
      val v = png.getRaster.getSample(x, y, 0)
      assert((v == 0) == black, s"pixel ($x,$y): sample $v expected black=$black")
    }
  }
}
