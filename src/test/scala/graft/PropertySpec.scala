package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core._

/** Property-based checks over the pure kernels (raw ScalaCheck generators
  * driven deterministically; the scalatest-plus bridge is not on the
  * classpath). */
class PropertySpec extends AnyFunSuite {

  private val Runs = 200

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit = {
    var seed = Seed(20260816L)
    var i = 0
    while (i < Runs) {
      g.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => body(a, b) }

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(body: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc)) { case (a, b, c) => body(a, b, c) }

  private val smallD = Gen.choose(-1000.0, 1000.0)
  private val matGen = for {
    a <- smallD; b <- smallD; c <- smallD; d <- smallD; e <- smallD; f <- smallD
  } yield Mat(a, b, c, d, e, f)

  test("matrix multiplication is associative (within fp tolerance)") {
    forAll(matGen, matGen, matGen) { (a, b, c) =>
      val l = a.multiply(b).multiply(c)
      val r = a.multiply(b.multiply(c))
      val scale = List(l.a, l.b, l.c, l.d, l.e, l.f).map(math.abs).max max 1.0
      assert(math.abs(l.a - r.a) / scale < 1e-9)
      assert(math.abs(l.f - r.f) / scale < 1e-9)
    }
  }

  test("identity is a two-sided unit") {
    forAll(matGen) { m =>
      assert(m.multiply(Mat.identity) == m && Mat.identity.multiply(m) == m)
    }
  }

  test("RC4 is an involution") {
    val byteArr = Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    forAll(byteArr, byteArr) { (key, data) =>
      assert(Crypt.rc4(key, Crypt.rc4(key, data)).toList == data.toList)
    }
  }

  test("AES object decryption inverts encryption for any payload") {
    val byteArr = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    val sec = Security(4, 4, Array.tabulate[Byte](16)(i => (i * 13 + 1).toByte), 16, aes = true)
    forAll(byteArr, Gen.choose(1, 9999)) { (data, objNum) =>
      val key = Crypt.objectKey(sec, objNum, 0)
      val cipher = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      val ct = new Array[Byte](16) ++ cipher.doFinal(data)
      assert(Crypt.decryptString(sec, objNum, 0, ct).toList == data.toList)
    }
  }

  test("UTF-16BE code splitting round-trips codepoints") {
    val cpGen = Gen.oneOf(
      Gen.choose(0x20, 0xD7FF), Gen.choose(0xE000, 0xFFFD), Gen.choose(0x10000, 0x10FFFF))
    forAll(Gen.listOf(cpGen)) { cps =>
      val bytes = cps.flatMap { cp =>
        new String(Character.toChars(cp)).getBytes("UTF-16BE").map(_ & 0xff).toList
      }
      assert(Interp.unicodeBytesToCodes(bytes) == cps)
    }
  }

  test("flate deflate/inflate round-trips") {
    val byteArr = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    forAll(byteArr) { data =>
      assert(Filters.inflate(Filters.deflate(data)).toList == data.toList)
    }
  }

  test("reading order sort is a permutation and deterministic") {
    val lineGen = for {
      bl <- Gen.choose(0.0, 800.0)
      x <- Gen.choose(0.0, 600.0)
      t <- Gen.alphaStr
    } yield Line(bl, x, x + 10, 10, x, 0, t, Nil, lastSuper = false)
    forAll(Gen.listOf(lineGen)) { ls =>
      val sorted = Layout.sortLinesByReadingOrder(ls)
      assert(sorted.length == ls.length)
      assert(sorted.sortBy(l => (l.baseline, l.inlineStart, l.text)) ==
        ls.sortBy(l => (l.baseline, l.inlineStart, l.text)))
      assert(Layout.sortLinesByReadingOrder(ls) == sorted)
    }
  }

  test("diff of identical paragraph lists is empty; deletions count bounded") {
    forAll(Gen.listOf(Gen.alphaStr)) { ps =>
      assert(Diff.diffParagraphs(ps, ps).isEmpty)
    }
    forAll(Gen.listOf(Gen.alphaStr), Gen.listOf(Gen.alphaStr)) { (a, b) =>
      val changes = Diff.diffParagraphs(a, b)
      assert(changes.length <= a.length + b.length)
    }
  }

  test("html entity decoding never throws and preserves plain text") {
    forAll(Gen.asciiPrintableStr) { s =>
      val noAmp = s.filter(_ != '&')
      assert(Html.decodeEntities(noAmp) == noAmp)
      Html.decodeEntities(s) // total
    }
  }

  test("Kmv.bulkAdd is equivalent to repeated add for any batch") {
    import graft.spark.Kmv
    val itemsGen = Gen.listOf(Gen.chooseNum(0, 5000).map(n => s"item-$n"))
    forAll(itemsGen, itemsGen) { (existing, batch) =>
      var viaAdd = Array.emptyLongArray
      for (it <- existing) viaAdd = Kmv.addItem(viaAdd, it)
      val state = viaAdd
      for (it <- batch) viaAdd = Kmv.addItem(viaAdd, it)
      val viaBulk = Kmv.bulkAdd(state, batch.map(Kmv.hash).toArray)
      assert(viaBulk.toList == viaAdd.toList,
        s"bulkAdd diverged (existing=${existing.length}, batch=${batch.length})")
    }
  }

  test("CCITT G4 encode/decode round-trips arbitrary bitmaps") {
    val bmGen = for {
      w <- Gen.chooseNum(1, 90)
      h <- Gen.chooseNum(1, 20)
      cells <- Gen.listOfN(w * h, Gen.oneOf(true, false))
    } yield (w, h, cells.grouped(w).map(_.toArray).toArray)
    forAll(bmGen) { case (w, h, bm) =>
      val dec = Ccitt.decodeG4(Ccitt.encodeG4(bm, w), w, h,
        blackIs1 = true, byteAlign = false)
      assert(dec.isRight, s"${w}x$h failed: $dec")
      val rowBytes = (w + 7) / 8
      val expected = bm.toList.flatMap { row =>
        val bs = new Array[Byte](rowBytes)
        for (x <- 0 until w if row(x))
          bs(x >> 3) = (bs(x >> 3) | (1 << (7 - (x & 7)))).toByte
        bs.toList
      }
      assert(dec.toOption.get.toList == expected, s"${w}x$h pixel mismatch")
    }
  }

  test("AVI demux is total over arbitrary bytes and mutated real containers") {
    val junk = Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    forAll(junk)(bs => graft.spark.Surfaces.demuxAvi(bs)) // must not throw
    val good = graft.spark.FixtureGen.mediaAvi(5L).bytes
    val mut = Gen.zip(Gen.chooseNum(0, good.length - 1), Gen.chooseNum(-128, 127))
    forAll(mut) { case (pos, v) =>
      val m = good.clone(); m(pos) = v.toByte
      graft.spark.Surfaces.demuxAvi(m) // single-byte corruption: no throw
    }
  }
}
