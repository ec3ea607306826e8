package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** CCITT Group 4 (T.6) decode: table sanity, hand-derived vectors,
  * encode/decode round-trips, and the end-to-end image-export path. */
class CcittSpec extends AnyFunSuite {

  test("T.4 run-length tables are prefix-free and complete") {
    def check(enc: Map[Int, String], name: String): Unit = {
      val codes = enc.values.toList
      assert(codes.distinct.length == codes.length, s"$name has duplicate codes")
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$name: '$a' is a prefix of '$b'")
      // terminating 0-63, makeup 64..1728 step 64, extended 1792..2560 step 64
      assert((0 to 63).forall(enc.contains), s"$name missing terminating runs")
      assert((64 to 2560 by 64).forall(enc.contains), s"$name missing makeup runs")
    }
    check(Ccitt.whiteEncode, "white")
    check(Ccitt.blackEncode, "black")
  }

  test("hand-derived G4 vectors: all-white rows (V0) and a horizontal run") {
    // 8x3 all-white: V0 per row against the imaginary white reference line
    // -> bits "111" + EOFB; each packed row = 0xff (white=1 by default)
    val white = Ccitt.decodeG4(
      Ccitt.encodeG4(Array.fill(3, 8)(false), 8), 8, 3, blackIs1 = false, byteAlign = false)
      .toOption.get
    assert(white.toList == List.fill(3)(0xff.toByte))
    // the encoder really emitted one V0 bit per row: 3 bits + 24-bit EOFB
    // = 27 bits -> 4 bytes, first byte 1110_0000... = 0xE0
    val encWhite = Ccitt.encodeG4(Array.fill(3, 8)(false), 8)
    assert(encWhite.length == 4 && (encWhite(0) & 0xff) == 0xe0,
      encWhite.map(b => f"${b & 0xff}%02x").mkString(","))
    // 8x1, 4 white then 4 black: horizontal mode 001 + white(4)=1011 +
    // black(4)=011 -> "0011011011" -> packed pixels 1111_0000 = 0xf0
    val row = Array(Array(false, false, false, false, true, true, true, true))
    val enc = Ccitt.encodeG4(row, 8)
    val bits = enc.flatMap(b => (7 to 0 by -1).map(k => (b >> k) & 1)).mkString
    assert(bits.startsWith("0011011011"), bits)
    val dec = Ccitt.decodeG4(enc, 8, 1, blackIs1 = false, byteAlign = false).toOption.get
    assert(dec.toList == List(0xf0.toByte))
    // BlackIs1 flips the packing convention
    val dec1 = Ccitt.decodeG4(enc, 8, 1, blackIs1 = true, byteAlign = false).toOption.get
    assert(dec1.toList == List(0x0f.toByte))
  }

  test("G4 round-trip over patterned and long-run bitmaps") {
    def pack(bm: Array[Array[Boolean]], w: Int): List[Byte] = {
      val rowBytes = (w + 7) / 8
      bm.toList.flatMap { row =>
        val bs = Array.fill[Byte](rowBytes)(0xff.toByte)
        for (x <- 0 until w if row(x))
          bs(x >> 3) = (bs(x >> 3) & ~(1 << (7 - (x & 7)))).toByte
        bs.toList
      }
    }
    val cases = Seq(
      (64, 40, (x: Int, y: Int) => (x * 7 + y * 13) % 5 < 2), // dense texture
      (200, 12, (x: Int, y: Int) => x / 90 % 2 == 0 && y % 3 != 0), // long runs (makeup codes)
      (31, 9, (x: Int, y: Int) => (x ^ y) % 4 == 0), // non-byte-aligned width
      (2600, 3, (x: Int, y: Int) => x < 2570 && y == 1)) // >2560 run (extended makeup)
    for ((w, h, f) <- cases) {
      val bm = Array.tabulate(h, w)((y, x) => f(x, y))
      val dec = Ccitt.decodeG4(Ccitt.encodeG4(bm, w), w, h, blackIs1 = false, byteAlign = false)
      assert(dec.isRight, s"${w}x$h: $dec")
      assert(dec.toOption.get.toList == pack(bm, w), s"${w}x$h round-trip mismatch")
    }
  }

  test("malformed G4 streams return Left, never throw or hang") {
    val junk = Array.tabulate[Byte](64)(i => (i * 41 + 7).toByte)
    for (cols <- Seq(8, 64, 1728)) {
      val r = Ccitt.decodeG4(junk, cols, 0, blackIs1 = false, byteAlign = false)
      assert(r.isLeft || r.isRight) // total: any Either is fine, no exception
    }
    assert(Ccitt.decodeG4(Array[Byte](0x55, 0x55), 0, 0, blackIs1 = false, byteAlign = false).isLeft)
    // mini-soak: deterministic pseudo-random streams + mutated valid streams
    val rnd = new scala.util.Random(42)
    val valid = Ccitt.encodeG4(Array.tabulate(12, 64)((y, x) => (x * 3 + y) % 7 < 3), 64)
    var decoded = 0
    for (n <- 0 until 500) {
      val bytes =
        if (n % 2 == 0) Array.fill[Byte](1 + rnd.nextInt(96))(rnd.nextInt(256).toByte)
        else {
          val m = valid.clone()
          m(rnd.nextInt(m.length)) = (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
          m
        }
      Ccitt.decodeG4(bytes, 64, 12, blackIs1 = false, byteAlign = false) match {
        case Right(_) => decoded += 1
        case Left(_) => ()
      }
    }
    assert(decoded >= 0) // totality is the assertion; no throw, no hang
  }

  test("CCITT G3 1-D roundtrip: encode -> decode recovers the bitmap") {
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 20) {
      val w = 1 + rnd.nextInt(90)
      val h = 1 + rnd.nextInt(12)
      val bitmap = Array.tabulate(h, w)((_, _) => rnd.nextBoolean())
      val enc = Ccitt.encodeG3(bitmap, w)
      val dec = Ccitt.decodeG3(enc, w, h, k = 0, blackIs1 = true, byteAlign = false)
        .fold(e => fail(s"trial $trial: $e"), identity)
      val rowBytes = (w + 7) / 8
      assert(dec.length == rowBytes * h, s"trial $trial w=$w h=$h")
      for (y <- 0 until h; x <- 0 until w) {
        val bit = (dec(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        assert((bit == 1) == bitmap(y)(x), s"trial $trial pixel ($x,$y)")
      }
    }
  }

  test("CCITT G3 totality: truncation and bit flips never throw (1-D and mixed)") {
    val bitmap = Array.tabulate(10, 64)((y, x) => ((x + y) % 3) == 0)
    val rnd = new scala.util.Random(99)
    // k = 0 exercises the pure 1-D path; k 1..4 exercise the mixed 2-D
    // branch (decodeRow2D through G3), including its error paths
    for (kf <- 0 to 4) {
      val valid =
        if (kf == 0) Ccitt.encodeG3(bitmap, 64)
        else Ccitt.encodeG3Mixed(bitmap, 64, kf)
      for (n <- 0 until 600) {
        val bytes =
          if (n % 3 == 0) valid.take(rnd.nextInt(valid.length))
          else if (n % 3 == 1) Array.fill[Byte](1 + rnd.nextInt(96))(rnd.nextInt(256).toByte)
          else {
            val m = valid.clone()
            m(rnd.nextInt(m.length)) = (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
            m
          }
        Ccitt.decodeG3(bytes, 64, 10, k = kf, blackIs1 = false, byteAlign = false) match {
          case Right(_) | Left(_) => () // totality is the assertion
        }
      }
    }
  }

  test("CCITT G3 2-D truncation keeps the decoded prefix (clean EOF, not an error)") {
    val bitmap = Array.tabulate(6, 32)((y, x) => ((x + 2 * y) % 5) < 2)
    val full = Ccitt.encodeG3Mixed(bitmap, 32, 3)
    val whole = Ccitt.decodeG3(full, 32, 0, k = 3, blackIs1 = true,
      byteAlign = false).toOption.get
    // walk truncation points: every result must be Right (EOF is clean),
    // never Left, and the decoded rows must be the BYTE PREFIX of the full
    // decode (truncation may only drop trailing rows, never corrupt one)
    for (cut <- 1 until full.length) {
      val dec = Ccitt.decodeG3(full.take(cut), 32, 0, k = 3,
        blackIs1 = true, byteAlign = false)
      dec match {
        case Right(rows) =>
          assert(rows.length <= whole.length, s"cut=$cut")
          assert(java.util.Arrays.equals(rows, whole.take(rows.length)),
            s"cut=$cut: truncated decode is not a prefix of the full decode")
        case Left(e) => fail(s"cut=$cut: truncation must be clean EOF, got $e")
      }
    }
  }

  test("CCITT G3 /K > 0 mixed roundtrip: 1-D anchor rows + 2-D delta rows") {
    val rnd = new scala.util.Random(123)
    for (trial <- 0 until 12) {
      val w = 8 + rnd.nextInt(80)
      val h = 2 + rnd.nextInt(10)
      val kFactor = 1 + rnd.nextInt(4)
      // correlated rows (the shape 2-D coding exists for) with random noise
      val first = Array.tabulate(w)(_ => rnd.nextBoolean())
      val bitmap = Array.iterate(first, h)(prev =>
        prev.map(b => if (rnd.nextInt(8) == 0) !b else b))
      val enc = Ccitt.encodeG3Mixed(bitmap, w, kFactor)
      val dec = Ccitt.decodeG3(enc, w, h, k = kFactor, blackIs1 = true, byteAlign = false)
        .fold(e => fail(s"trial $trial: $e"), identity)
      val rowBytes = (w + 7) / 8
      assert(dec.length == rowBytes * h, s"trial $trial w=$w h=$h k=$kFactor")
      for (y <- 0 until h; x <- 0 until w) {
        val bit = (dec(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        assert((bit == 1) == bitmap(y)(x), s"trial $trial k=$kFactor pixel ($x,$y)")
      }
    }
  }

  test("CCITT G3 image extracts end-to-end with correct dimensions") {
    // /K 0 (pure 1-D) and /K 2 (mixed 1-D/2-D) through the full PDF path
    for (k <- Seq(0, 2)) {
      val d = graft.spark.FixtureGen.ccittImageG3(7, k)
      val doc = DocStructure.openDocument(d.bytes, None).toOption.get
      assert(Extract.taggedText(doc) == Right(d.expected))
      val images = Images.extractPageImages(doc, 1).toOption.get
      assert(images.length == 1, s"k=$k")
      val im = images.head
      assert(im.format == "png", s"k=$k ${im.format}")
      val png = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(im.bytes))
      assert(png.getWidth == 40 && png.getHeight == 12, s"k=$k")
      // spot-check pixels against the constructed bitmap: (3x+y+7)%7<3 = black
      for ((x, y) <- Seq((0, 0), (1, 0), (5, 3), (39, 11))) {
        val black = ((x * 3 + y + 7) % 7) < 3
        val v = png.getRaster.getSample(x, y, 0)
        assert((v == 0) == black, s"k=$k pixel ($x,$y): sample $v expected black=$black")
      }
    }
  }

  test("CCITT G4 image extracts end-to-end with correct dimensions") {
    val d = graft.spark.FixtureGen.ccittImage(4)
    val doc = DocStructure.openDocument(d.bytes, None).toOption.get
    // text on the page still extracts
    assert(Extract.taggedText(doc) == Right(d.expected))
    val images = Images.extractPageImages(doc, 1).toOption.get
    assert(images.length == 1)
    val im = images.head
    assert(im.format == "png", im.format)
    assert(im.bbox == Rect(72, 560, 168, 592))
    val png = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(im.bytes))
    assert(png.getWidth == 48 && png.getHeight == 16)
    // spot-check pixels against the constructed bitmap: (x+y+4)%5<2 = black
    for ((x, y) <- Seq((0, 0), (1, 0), (2, 0), (3, 5), (47, 15))) {
      val black = ((x + y + 4) % 5) < 2
      val v = png.getRaster.getSample(x, y, 0)
      assert((v == 0) == black, s"pixel ($x,$y): sample $v expected black=$black")
    }
  }
}
