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

  test("MQ arithmetic generic region roundtrips for all 4 templates") {
    val rnd = new scala.util.Random(53)
    for (template <- 0 to 3; trial <- 0 until 4) {
      val w = 8 + rnd.nextInt(72)
      val h = 1 + rnd.nextInt(14)
      // mix of structured and noisy content: noise stresses LPS paths,
      // structure stresses long MPS runs and renormalization
      val bitmap = Array.tabulate(h, w)((y, x) =>
        if (trial % 2 == 0) rnd.nextBoolean() else ((x / 3 + y) % 4) < 2)
      val enc = Jbig2.encodeEmbeddedArith(bitmap, w, template)
      val dec = Jbig2.decodeEmbedded(enc)
        .fold(e => fail(s"template $template trial $trial: $e"), identity)
      val rowBytes = (w + 7) / 8
      assert(dec.length == rowBytes * h, s"template $template trial $trial")
      for (y <- 0 until h; x <- 0 until w) {
        val bit = (dec(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        assert((bit == 0) == bitmap(y)(x),
          s"template $template trial $trial pixel ($x,$y)")
      }
    }
  }

  test("TPGDON typical-prediction rows roundtrip (repeated and changing rows)") {
    val rnd = new scala.util.Random(59)
    for (template <- 0 to 3) {
      val w = 40
      // blocks of repeated rows exercise the LTP toggle in both directions
      val distinct = Array.tabulate(5, w)((_, _) => rnd.nextBoolean())
      val bitmap = Array.tabulate(20)(y => distinct(y / 4).clone())
      val enc = Jbig2.encodeEmbeddedArith(bitmap, w, template, tpgdon = true)
      val plain = Jbig2.encodeEmbeddedArith(bitmap, w, template)
      assert(enc.length < plain.length,
        s"template $template: TPGDON should compress repeated rows")
      val dec = Jbig2.decodeEmbedded(enc)
        .fold(e => fail(s"template $template: $e"), identity)
      val rowBytes = (w + 7) / 8
      for (y <- 0 until 20; x <- 0 until w) {
        val bit = (dec(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        assert((bit == 0) == bitmap(y)(x), s"template $template pixel ($x,$y)")
      }
    }
  }

  test("MQ state table matches ITU-T T.88 Table E.1 spot values") {
    // pins the transcribed table against independently-published rows
    // (first/last/switch rows of the standard's Table E.1)
    assert(Mq.QeTable(0) == 0x5601 && Mq.Nmps(0) == 1 && Mq.Nlps(0) == 1 && Mq.Switch(0) == 1)
    assert(Mq.QeTable(6) == 0x5601 && Mq.Nmps(6) == 7 && Mq.Nlps(6) == 6 && Mq.Switch(6) == 1)
    assert(Mq.QeTable(14) == 0x5601 && Mq.Nmps(14) == 15 && Mq.Nlps(14) == 14 && Mq.Switch(14) == 1)
    assert(Mq.QeTable(45) == 0x0001 && Mq.Nmps(45) == 45 && Mq.Nlps(45) == 43 && Mq.Switch(45) == 0)
    assert(Mq.QeTable(46) == 0x5601 && Mq.Nmps(46) == 46 && Mq.Nlps(46) == 46 && Mq.Switch(46) == 0)
    assert(Mq.QeTable.length == 47 && Mq.Nmps.length == 47 && Mq.Nlps.length == 47)
  }

  test("multi-region and offset streams are refused, not partially decoded") {
    val bitmap = Array.tabulate(4, 16)((y, x) => (x + y) % 2 == 0)
    val one = Jbig2.encodeEmbedded(bitmap, 16)
    // two generic regions: duplicate the region segment (drop page info
    // from the copy — segments are self-delimiting)
    val pageLen = 11 + 19 // header + page-info body
    val region = one.drop(pageLen)
    Jbig2.decodeEmbedded(one ++ region) match {
      case Left(PdfError.UnsupportedFeature(msg)) => assert(msg.contains("region segments"))
      case other => fail(s"expected refusal of 2 regions, got $other")
    }
    // offset region: patch x=2 into the region segment info
    val m = one.clone()
    val regInfo = pageLen + 11 // region body starts after its own header
    assert(m(regInfo + 11) == 0, "fixture layout changed")
    m(regInfo + 11) = 2 // x offset low byte
    Jbig2.decodeEmbedded(m) match {
      case Left(PdfError.UnsupportedFeature(msg)) => assert(msg.contains("offset"))
      case other => fail(s"expected refusal of offset region, got $other")
    }
  }

  test("symbol dictionary + text region roundtrips (the symbol-coded text path)") {
    // three 5x8 glyphs with distinct patterns; instances tile two text
    // lines with varying spacing — the dominant real-world JBIG2 shape
    def glyph(k: Int): Array[Array[Boolean]] =
      Array.tabulate(8, 5)((y, x) => ((x * (k + 2) + y * (7 - k)) % 5) < 2)
    val symbols = Seq(glyph(0), glyph(1), glyph(2))
    val w = 64
    val h = 24
    val instances =
      (0 until 8).map(c => (c % 3, 2 + c * 7, 3)) ++
        (0 until 8).map(c => ((c + 1) % 3, 4 + c * 7, 13))
    for (template <- 0 to 3) {
      val enc = Jbig2.encodeEmbeddedSymbolText(symbols, instances, w, h, template)
      val dec = Jbig2.decodeEmbedded(enc)
        .fold(e => fail(s"template $template: $e"), identity)
      // construct the expected page independently (OR-composited glyphs)
      val page = Array.ofDim[Boolean](h, w)
      for ((id, s, t) <- instances; y <- 0 until 8; x <- 0 until 5
           if symbols(id)(y)(x) && t + y < h && s + x < w)
        page(t + y)(s + x) = true
      val rowBytes = (w + 7) / 8
      assert(dec.length == rowBytes * h, s"template $template")
      for (y <- 0 until h; x <- 0 until w) {
        val bit = (dec(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        assert((bit == 0) == page(y)(x), s"template $template pixel ($x,$y)")
      }
    }
  }

  test("MQ integer coder roundtrips boundary values through a shared stream") {
    // exercises every bucket boundary of T.88 Annex A plus OOB markers,
    // all through ONE encoder/decoder pair (the adaptive contexts carry
    // state across values, so ordering is part of the contract)
    val values: Seq[Option[Long]] = Seq(
      Some(0L), Some(1L), Some(3L), Some(4L), Some(19L), Some(20L), Some(83L),
      Some(84L), Some(339L), Some(340L), Some(4435L), Some(4436L), Some(100000L),
      Some(-1L), Some(-4L), Some(-20L), Some(-84L), Some(-340L), Some(-4436L),
      None, Some(7L), None, Some(-99999L), Some(2L)) ++
      (0 until 200).map(k => Some(((k * 7919) % 9000 - 4500).toLong))
    val enc = new Mq.Encoder
    val ectx = new Jbig2.IntCtx
    values.foreach(v => Jbig2.encodeInt(enc, ectx, v))
    enc.flush()
    val bytes = enc.bytes()
    val dec = new Mq.Decoder(bytes, 0, bytes.length)
    val dctx = new Jbig2.IntCtx
    for ((v, i) <- values.zipWithIndex)
      assert(Jbig2.decodeInt(dec, dctx) == v, s"value $i = $v")
  }

  test("pattern/halftone segments are refused, not silently skipped") {
    val bitmap = Array.tabulate(4, 16)((y, x) => (x + y) % 2 == 0)
    val one = Jbig2.encodeEmbedded(bitmap, 16)
    // splice a pattern-dictionary segment (type 16, empty body) ahead of
    // the valid page-info + generic-region stream: its pixels would be
    // dropped by a generic-only decode, so the walk must refuse
    val patDict = Array[Byte](0, 0, 0, 2, 16, 0, 1, 0, 0, 0, 0)
    Jbig2.decodeEmbedded(patDict ++ one) match {
      case Left(PdfError.UnsupportedFeature(msg)) => assert(msg.contains("16"), msg)
      case other => fail(s"expected refusal of pattern dict, got $other")
    }
  }

  test("tall-skinny arithmetic region decodes with flat allocation (no row-object bomb)") {
    // w=1 x h=4096 passes the area guard; the decode must complete and
    // roundtrip (the flat h*w bitmap keeps a crafted w=1 x h=64M region
    // at 64 MB instead of gigabytes of per-row object headers)
    val h = 4096
    val bitmap = Array.tabulate(h, 1)((y, _) => y % 3 == 0)
    val enc = Jbig2.encodeEmbeddedArith(bitmap, 1, template = 0)
    val dec = Jbig2.decodeEmbedded(enc).fold(e => fail(e.toString), identity)
    assert(dec.length == h)
    for (y <- 0 until h)
      assert((((dec(y) >> 7) & 1) == 0) == bitmap(y)(0), s"row $y")
  }

  test("malformed JBIG2 streams return Left, never throw or hang") {
    val bm = Array.tabulate(6, 40)((y, x) => ((x + y) % 3) == 0)
    val glyphs = Seq(Array.tabulate(6, 4)((y, x) => (x + y) % 2 == 0),
      Array.tabulate(6, 4)((y, x) => x == y % 4))
    val bases = Seq(Jbig2.encodeEmbedded(bm, 40),
      Jbig2.encodeEmbeddedArith(bm, 40, 0),
      Jbig2.encodeEmbeddedArith(bm, 40, 3, tpgdon = true),
      Jbig2.encodeEmbeddedSymbolText(glyphs,
        (0 until 6).map(c => (c % 2, 1 + c * 6, 2)), 40, 10))
    val rnd = new scala.util.Random(47)
    for (n <- 0 until 1200) {
      val valid = bases(n % bases.length)
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

  test("Annex B standard tables: prefix-valid, contiguous tiling, complete where specified") {
    import graft.core.Jbig2Huffman._
    for ((tb, idx) <- standardTables.zipWithIndex) {
      val name = s"B.${idx + 1}"
      assert(tb.valid, s"$name: canonical code assignment overflows a length")
      // Kraft inequality must hold for any prefix code; B.1-B.6, B.14 and
      // B.15 are COMPLETE codes (sum exactly 1) in the standard
      val kraft = tb.lines.filter(_.prefLen > 0)
        .map(l => BigDecimal(1) / BigDecimal(2).pow(l.prefLen)).sum
      assert(kraft <= 1, s"$name: Kraft sum $kraft > 1 (not a prefix code)")
      if (Set(0, 1, 2, 3, 4, 5, 13, 14)(idx))
        assert(kraft == 1, s"$name: expected a complete code, Kraft=$kraft")
      // the normal lines tile a contiguous integer range with no gaps,
      // and the lower/upper lines sit exactly adjacent to it — a strong
      // transcription check on (rangelen, rangelow)
      val normal = tb.lines.filter(_.kind == Normal).sortBy(_.rangeLow)
      for (Seq(a, b) <- normal.sliding(2) if normal.length > 1)
        assert(a.rangeLow + (1L << a.rangeLen) == b.rangeLow,
          s"$name: gap after ${a.rangeLow}")
      tb.lines.find(_.kind == Lower).foreach(l =>
        assert(l.rangeLow + 1 == normal.head.rangeLow, s"$name: lower line misplaced"))
      tb.lines.find(_.kind == Upper).foreach(u =>
        assert(u.rangeLow ==
          normal.last.rangeLow + (1L << normal.last.rangeLen),
          s"$name: upper line misplaced"))
    }
  }

  test("Annex B tables roundtrip boundary values (encode -> decode)") {
    import graft.core.Jbig2Huffman._
    for ((tb, idx) <- standardTables.zipWithIndex) {
      val normal = tb.lines.filter(_.kind == Normal)
      val lows = normal.map(_.rangeLow)
      val highs = normal.map(l => l.rangeLow + (1L << l.rangeLen) - 1)
      val beyond = tb.lines.collect {
        case l if l.kind == Lower => Seq(l.rangeLow, l.rangeLow - 1000)
        case l if l.kind == Upper => Seq(l.rangeLow, l.rangeLow + 100000)
      }.flatten
      val oob = if (tb.lines.exists(_.kind == Oob)) Seq(None) else Nil
      val values = (lows ++ highs ++ beyond).map(Some(_)) ++ oob
      val bw = new BitWriter
      values.foreach(tb.encode(bw, _))
      val data = bw.result()
      val r = new BitReader(data, 0, data.length)
      for ((v, k) <- values.zipWithIndex)
        assert(tb.decode(r) == Right(v), s"B.${idx + 1} value $k = $v")
    }
  }

  test("Huffman symbol dictionary + text region roundtrips (uncompressed and MMR collective)") {
    def glyph(k: Int): Array[Array[Boolean]] =
      Array.tabulate(8, 5)((y, x) => ((x * (k + 2) + y * (7 - k)) % 5) < 2)
    val symbols = Seq(glyph(0), glyph(1), glyph(2))
    val w = 64
    val h = 24
    val instances =
      (0 until 8).map(c => (c % 3, 2 + c * 7, 3)) ++
        (0 until 8).map(c => ((c + 1) % 3, 4 + c * 7, 13))
    for (mmr <- Seq(false, true)) {
      val enc = Jbig2.encodeEmbeddedSymbolTextHuffman(symbols, instances, w, h, mmr)
      val dec = Jbig2.decodeEmbedded(enc)
        .fold(e => fail(s"mmr=$mmr: $e"), identity)
      val page = Array.ofDim[Boolean](h, w)
      for ((id, s, t) <- instances; y <- 0 until 8; x <- 0 until 5
           if symbols(id)(y)(x) && t + y < h && s + x < w)
        page(t + y)(s + x) = true
      val rowBytes = (w + 7) / 8
      assert(dec.length == rowBytes * h, s"mmr=$mmr")
      for (y <- 0 until h; x <- 0 until w) {
        val bit = (dec(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        assert((bit == 0) == page(y)(x), s"mmr=$mmr pixel ($x,$y)")
      }
      // the arithmetic encoding of the same page decodes to the same pixels
      val arith = Jbig2.decodeEmbedded(
        Jbig2.encodeEmbeddedSymbolText(symbols, instances, w, h)).toOption.get
      assert(java.util.Arrays.equals(dec, arith), s"mmr=$mmr vs arithmetic")
    }
  }

  test("Huffman custom selector without a referred table is refused, not mis-decoded") {
    def glyph: Array[Array[Boolean]] = Array.tabulate(8, 5)((y, x) => (x + y) % 2 == 0)
    val enc = Jbig2.encodeEmbeddedSymbolTextHuffman(Seq(glyph), Seq((0, 1, 1)), 16, 12)
    // dict flags low byte at offset 42 (same layout as the arith test):
    // set SDHUFFDH selector to 3 (custom table) — the dict refers NO
    // type-53 segment, so the selector has nothing to consume
    assert(enc(41) == 0 && enc(42) == 1, "dict flag offset moved")
    val mutated = enc.clone()
    mutated(42) = (1 | (3 << 2)).toByte
    Jbig2.decodeEmbedded(mutated) match {
      case Left(PdfError.ParseError(msg)) => assert(msg.contains("custom table"), msg)
      case other => fail(s"expected missing-custom-table refusal, got $other")
    }
    // reserved selector value 2 is refused too
    val reserved = enc.clone()
    reserved(42) = (1 | (2 << 2)).toByte
    assert(Jbig2.decodeEmbedded(reserved).isLeft)
  }

  test("Huffman CUSTOM tables (T.88 B.2.2): DW + DT table segments decode identically") {
    def glyph(k: Int): Array[Array[Boolean]] =
      Array.tabulate(8, 5)((y, x) => ((x * (k + 2) + y * (7 - k)) % 5) < 2)
    val symbols = Seq(glyph(0), glyph(1), glyph(2))
    val w = 64
    val h = 24
    val instances =
      (0 until 8).map(c => (c % 3, 2 + c * 7, 3)) ++
        (0 until 8).map(c => ((c + 1) % 3, 4 + c * 7, 13))
    val std = Jbig2.decodeEmbedded(
      Jbig2.encodeEmbeddedSymbolTextHuffman(symbols, instances, w, h))
      .fold(e => fail(s"standard: $e"), identity)
    val cus = Jbig2.decodeEmbedded(
      Jbig2.encodeEmbeddedSymbolTextHuffman(symbols, instances, w, h,
        customTables = true))
      .fold(e => fail(s"custom: $e"), identity)
    assert(java.util.Arrays.equals(std, cus),
      "custom-table stream decodes differently from the standard-table stream")
    // the custom stream really is custom-coded: its dict flags select
    // table 3 for DW and its region flags select custom DT
    val enc = Jbig2.encodeEmbeddedSymbolTextHuffman(symbols, instances, w, h,
      customTables = true)
    assert(Jbig2.decodeEmbedded(enc).isRight)
    // truncating the DW table segment must refuse the whole stream
    // (segment walk sees a bad table), not decode partially
    val cut = enc.take(60)
    assert(Jbig2.decodeEmbedded(cut).isLeft)
  }

  test("parseCustomTable: authored bytes round-trip and malformed bytes are refused") {
    import graft.core.Jbig2Huffman._
    val bs = customTableBytes(low = -32, high = 33, rl = 3, prefLen = 4, oob = true)
    val t = parseCustomTable(bs, 0, bs.length).fold(e => fail(e.render), identity)
    // encode/decode identity across the whole range, both range escapes, OOB
    for (v <- Seq(-32L, -1L, 0L, 5L, 32L, -100L, 500L)) {
      val w = new BitWriter
      t.encode(w, Some(v))
      val r = new BitReader(w.result(), 0, w.result().length)
      assert(t.decode(r) == Right(Some(v)), s"v=$v")
    }
    locally {
      val w = new BitWriter
      t.encode(w, None)
      val r = new BitReader(w.result(), 0, w.result().length)
      assert(t.decode(r) == Right(None))
    }
    // totality: truncations never throw; low >= high is refused (same
    // flags byte our author emits, range [9, 5))
    for (n <- 0 until bs.length) parseCustomTable(bs.take(n), 0, n)
    assert(parseCustomTable(Array[Byte](0x56, 0, 0, 0, 9, 0, 0, 0, 5, 0, 0), 0, 11).isLeft)
  }

  test("MQ coder matches the ITU-T T.88 Annex H.2 external test sequence") {
    // the ONE externally-authored fixture for the MQ coder: the standard's
    // own 32-byte test input and 30-byte expected code stream (identical in
    // T.800 Annex J / the JPEG-2000 software test data). A mirrored
    // encoder/decoder convention error cannot pass this — the bytes come
    // from the spec, not from this repo's encoder.
    def hex(s: String): Array[Byte] =
      s.split("\\s+").filter(_.nonEmpty).map(x => Integer.parseInt(x, 16).toByte)
    val input = hex(
      "00 02 00 51 00 00 00 C0 03 52 87 2A AA AA AA AA 82 C0 20 00 FC D7 9E F6 BF 7F ED 90 4F 46 A3 BF")
    val expected = hex(
      "84 C7 3B FC E1 A1 43 04 02 20 00 00 41 0D BB 86 F4 31 7F FF 88 FF 37 47 1A DB 6A DF FF AC")
    // decode direction (what production uses): the official code stream
    // must reproduce every input bit through one context from state 0
    val decCx = new Array[Byte](1)
    val dec = new Mq.Decoder(expected, 0, expected.length)
    for (i <- 0 until input.length * 8) {
      val want = (input(i / 8) >> (7 - (i % 8))) & 1
      assert(dec.decodeBit(decCx, 0) == want, s"bit $i")
    }
    // encode direction (fixture authoring): output must be a prefix of the
    // official stream — this encoder's flush discards the trailing
    // marker-adjacent bytes the decoder never needs (it feeds 1s past end)
    val encCx = new Array[Byte](1)
    val enc = new Mq.Encoder
    for (b <- input; i <- 7 to 0 by -1) enc.encodeBit(encCx, 0, (b >> i) & 1)
    enc.flush()
    val out = enc.bytes()
    assert(out.length == 28 && java.util.Arrays.equals(out, expected.take(28)),
      out.map(b => f"${b & 0xff}%02X").mkString(" "))
  }

  test("symbol dictionaries with retained coding contexts are refused") {
    // T.88 7.4.3.1.1 bits 8/9 import arithmetic contexts from a referred
    // dict; decoding while ignoring them would silently mis-decode
    def glyph: Array[Array[Boolean]] = Array.tabulate(8, 5)((y, x) => (x + y) % 2 == 0)
    val enc = Jbig2.encodeEmbeddedSymbolText(Seq(glyph), Seq((0, 1, 1)), 16, 12)
    // dict segment: 30-byte page-info segment (11-byte header + 19-byte
    // body) + 11-byte header; its first two body bytes are the u16 flags
    // (template 0 => 0x0000)
    assert(enc(41) == 0 && enc(42) == 0, "dict flag offset moved")
    for (bit <- Seq(0x100, 0x200)) {
      val mutated = enc.clone()
      mutated(41) = ((bit >> 8) & 0xff).toByte
      Jbig2.decodeEmbedded(mutated) match {
        case Left(PdfError.UnsupportedFeature(msg)) =>
          assert(msg.contains("retained"), msg)
        case other => fail(s"flag bit $bit: expected refusal, got $other")
      }
    }
  }

  test("text-region overdraw beyond 2x the region area is refused (blit bomb)") {
    // 200 instances of an 8x8 solid glyph all at (0,0) on a 16x16 region:
    // each draw clips to 64 pixels, cumulative 12,800 >> 2*16*16 = 512.
    // Without the draw budget this class scales to ~10^13 iterations
    // (4096x4096 symbol x 2^20 instances)
    val solid = Array.fill(8, 8)(true)
    val bomb = Jbig2.encodeEmbeddedSymbolText(
      Seq(solid), Seq.fill(200)((0, 0, 0)), 16, 16)
    Jbig2.decodeEmbedded(bomb) match {
      case Left(PdfError.ParseError(msg)) => assert(msg.contains("draws"), msg)
      case other => fail(s"expected overdraw refusal, got $other")
    }
    // a benign region with modest overlap still decodes
    val ok = Jbig2.encodeEmbeddedSymbolText(
      Seq(solid), Seq((0, 0, 0), (0, 4, 2), (0, 8, 4)), 24, 16)
    assert(Jbig2.decodeEmbedded(ok).isRight)
  }

  test("blitInstance: >=32-bit offsets cost nothing and never wrap into the bitmap (r6 advice)") {
    // the arithmetic decodeInt's 32-bit branch yields up to ±(2^32+4435)
    // and Huffman Lower/Upper lines read 32-bit offsets — a truncating
    // .toInt on such an offT/curS wrapped (e.g. to Int.MinValue) and
    // indexed bits/bm.bits negatively; the guard must return BEFORE any
    // Int conversion
    val bits = new Array[Boolean](16 * 16)
    val glyph = Jbig2.Bm(8, 8, Array.fill(64)(true))
    val huge = Seq(1L << 32, -(1L << 32), Int.MaxValue.toLong + 7,
      Int.MinValue.toLong - 7, 1L << 31, -(1L << 31) - 1, (1L << 32) + 4435)
    for (offT <- huge; curS <- 0L +: huge) {
      val r = Jbig2.blitInstance(bits, 16, 16, glyph, curS, offT, 5L, 512L)
      assert(r == Right(5L), s"offT=$offT curS=$curS -> $r")
    }
    for (curS <- huge) {
      val r = Jbig2.blitInstance(bits, 16, 16, glyph, curS, 0L, 5L, 512L)
      assert(r == Right(5L), s"curS=$curS -> $r")
    }
    assert(bits.forall(!_), "off-page instance drew pixels")
    // boundary: exactly off-page on each side costs nothing
    for ((s, t) <- Seq((0L, -8L), (0L, 16L), (-8L, 0L), (16L, 0L)))
      assert(Jbig2.blitInstance(bits, 16, 16, glyph, s, t, 1L, 512L) == Right(1L))
    assert(bits.forall(!_))
    // one row/column visible draws exactly that clip and charges it
    assert(Jbig2.blitInstance(bits, 16, 16, glyph, 0L, -7L, 0L, 512L) == Right(8L))
    assert(bits.count(identity) == 8)
    java.util.Arrays.fill(bits, false)
    // fully in-range draws the whole glyph
    assert(Jbig2.blitInstance(bits, 16, 16, glyph, 4L, 4L, 0L, 512L) == Right(64L))
    assert(bits.count(identity) == 64)
  }

  test("Huffman text region refuses TRANSPOSED and non-OR comb ops like the arithmetic path (r6 advice)") {
    // the SBHUFF dispatch precedes the arithmetic path's refusals; the
    // Huffman decoder must apply the same ones rather than decode with
    // wrong placement/compositing and report success
    val data = new Array[Byte](64)
    val syms = Vector(Jbig2.Bm(2, 2, Array.fill(4)(false)))
    Jbig2.decodeTextRegionHuffman(data, 0, 64, 8, 8, syms, (1 << 6) | 1,
      Vector.empty) match {
      case Left(PdfError.UnsupportedFeature(msg)) =>
        assert(msg.toLowerCase.contains("transposed"), msg)
      case other => fail(s"expected transposed refusal, got $other")
    }
    for (op <- 1 to 3)
      Jbig2.decodeTextRegionHuffman(data, 0, 64, 8, 8, syms, (op << 7) | 1,
        Vector.empty) match {
        case Left(PdfError.UnsupportedFeature(msg)) =>
          assert(msg.contains("comb op"), msg)
        case other => fail(s"expected comb-op refusal, got $other")
      }
  }
}
