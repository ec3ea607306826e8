package graft.core

import scala.collection.immutable.TreeMap

/** CFF (Compact Font Format) charset/encoding extraction for /FontFile3
  * Type1C fonts (reference src/PDF/CFF.hs): INDEX walk -> Top DICT ->
  * custom encoding array + charset SIDs -> code -> text map. Mirrors the
  * reference's quirks (format-0 encodings read nCodes-1 entries, SIDs <= 95
  * map to the code itself, real DICT operands parse to 0). */
object Cff {

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private final class Rdr(val buf: Array[Byte], var pos: Int) {
    def card(n: Int): Option[Long] = {
      if (pos + n > buf.length) return None
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | u8(buf, pos + i); i += 1 }
      pos += n
      Some(v)
    }
    def take(n: Int): Option[Array[Byte]] = {
      if (n < 0 || pos + n > buf.length) None
      else {
        val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
        pos += n
        Some(out)
      }
    }
  }

  /** INDEX: count(2), offSize(1), offsets (count+1) * offSize, data. */
  private def index(r: Rdr): Option[List[Array[Byte]]] = {
    for {
      count <- r.card(2)
      offSize <- r.card(1)
      offsets <- {
        val n = count.toInt + 1
        val out = List.newBuilder[Long]
        var ok = true
        var i = 0
        while (ok && i < n) {
          r.card(offSize.toInt) match {
            case Some(v) => out += v
            case None => ok = false
          }
          i += 1
        }
        if (ok) Some(out.result()) else None
      }
      datas <- {
        val sizes = offsets.zip(0L :: offsets).map { case (a, b) => (a - b).toInt }.tail
        val out = List.newBuilder[Array[Byte]]
        var ok = true
        for (sz <- sizes if ok) r.take(sz) match {
          case Some(d) => out += d
          case None => ok = false
        }
        if (ok) Some(out.result()) else None
      }
    } yield datas
  }

  private def header(r: Rdr): Boolean = r.card(4).isDefined

  private sealed trait DictOp
  private final case class DictInt(v: Int) extends DictOp
  private case object DictReal extends DictOp

  @inline private def isKeyByte(b: Int): Boolean =
    (b >= 0 && b <= 5) || (b >= 13 && b <= 18)
  @inline private def isEscKey(b: Int): Boolean =
    (b >= 0 && b <= 8) || (b >= 20 && b <= 23) || (b >= 30 && b <= 38)

  /** Parse the whole DICT data into (key bytes -> operands), first-entry
    * order preserved. */
  private def parseDict(d: Array[Byte]): List[(List[Int], List[DictOp])] = {
    val out = List.newBuilder[(List[Int], List[DictOp])]
    var pos = 0
    var ops = List.newBuilder[DictOp]
    def atKey: Boolean = pos < d.length && {
      val b = u8(d, pos)
      isKeyByte(b) || (b == 12 && pos + 1 < d.length && isEscKey(u8(d, pos + 1)))
    }
    while (pos < d.length) {
      if (atKey) {
        val b = u8(d, pos)
        val key =
          if (b == 12) { val k = List(12, u8(d, pos + 1)); pos += 2; k }
          else {
            // reference: many1 of single key bytes merge into one key
            val ks = List.newBuilder[Int]
            while (pos < d.length && isKeyByte(u8(d, pos))) { ks += u8(d, pos); pos += 1 }
            ks.result()
          }
        out += ((key, ops.result()))
        ops = List.newBuilder[DictOp]
      } else {
        val b0 = u8(d, pos)
        pos += 1
        if (b0 >= 32 && b0 <= 246) ops += DictInt(b0 - 139)
        else if (b0 >= 247 && b0 <= 250 && pos < d.length) {
          ops += DictInt((b0 - 247) * 256 + u8(d, pos) + 108); pos += 1
        } else if (b0 >= 251 && b0 <= 254 && pos < d.length) {
          ops += DictInt(-(b0 - 251) * 256 - u8(d, pos) - 108); pos += 1
        } else if (b0 == 28 && pos + 1 < d.length) {
          ops += DictInt((u8(d, pos) << 8) | u8(d, pos + 1)); pos += 2
        } else if (b0 == 29 && pos + 3 < d.length) {
          ops += DictInt((u8(d, pos) << 24) | (u8(d, pos + 1) << 16) |
            (u8(d, pos + 2) << 8) | u8(d, pos + 3))
          pos += 4
        } else if (b0 == 30) {
          // real: nibbles until a byte with low nibble 0xF, then one more
          while (pos < d.length && (u8(d, pos) & 0x0f) != 0x0f) pos += 1
          pos += 2 // terminator byte + the reference's extra getCard 1
          ops += DictReal
        } else return out.result() // unknown byte: stop (parse failure)
      }
    }
    out.result()
  }

  private def dictLookup(entries: List[(List[Int], List[DictOp])], key: List[Int]): Option[List[DictOp]] =
    entries.collectFirst { case (k, v) if k == key => v }

  /** Custom encoding array at an absolute offset: format 0 reads nCodes-1
    * codes (reference quirk); format 1 expands (first, nLeft) ranges. */
  private def encodingArray(c: Array[Byte], off: Int): List[Int] = {
    val r = new Rdr(c, off)
    (for {
      format <- r.card(1)
      p <- r.card(1)
    } yield format match {
      case 0 =>
        val out = List.newBuilder[Int]
        var i = 0
        var ok = true
        while (ok && i < p.toInt - 1) {
          r.card(1) match {
            case Some(v) => out += v.toInt
            case None => ok = false
          }
          i += 1
        }
        if (ok) out.result() else Nil
      case 1 =>
        val out = List.newBuilder[Int]
        var i = 0
        var ok = true
        while (ok && i < p.toInt) {
          (r.card(1), r.card(1)) match {
            case (Some(first), Some(nLeft)) =>
              var cdl = first.toInt
              while (cdl <= first.toInt + nLeft.toInt) { out += cdl; cdl += 1 }
            case _ => ok = false
          }
          i += 1
        }
        if (ok) out.result() else Nil
      case _ => Nil
    }).getOrElse(Nil)
  }

  /** Charset at an absolute offset: format 0 only — one SID per glyph
    * excluding .notdef. */
  private def charsetData(c: Array[Byte], off: Int, nGlyphs: Int): List[Int] = {
    val r = new Rdr(c, off)
    r.card(1) match {
      case Some(0) =>
        val out = List.newBuilder[Int]
        var i = 0
        var ok = true
        while (ok && i < nGlyphs - 1) {
          r.card(2) match {
            case Some(v) => out += v.toInt
            case None => ok = false
          }
          i += 1
        }
        if (ok) out.result() else Nil
      case _ => Nil
    }
  }

  def encoding(c: Array[Byte]): Encoding = {
    try {
      val r = new Rdr(c, 0)
      if (!header(r)) return Encoding.NullMap
      val topDicts = for {
        _ <- index(r) // Name INDEX
        tops <- index(r) // Top DICT INDEX
      } yield tops
      topDicts match {
        case None => Encoding.NullMap
        case Some(Nil) => Encoding.NullMap
        case Some(tops) =>
          val strings: List[String] = {
            val r2 = new Rdr(c, 0)
            if (header(r2) && index(r2).isDefined && index(r2).isDefined)
              index(r2).map(_.map(b =>
                new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))).getOrElse(Nil)
            else Nil
          }
          val pairs = tops.flatMap { d =>
            val entries = parseDict(d)
            val encs: List[Int] = dictLookup(entries, List(16)) match {
              case Some(List(DictInt(0))) | Some(List(DictInt(1))) => Nil
              case Some(List(DictInt(n))) => encodingArray(c, n)
              case _ => Nil
            }
            val charset: List[Int] = dictLookup(entries, List(15)) match {
              case Some(List(DictInt(off))) =>
                val nGlyphs = dictLookup(entries, List(17)) match {
                  case Some(List(DictInt(csOff))) =>
                    val r3 = new Rdr(c, csOff)
                    index(r3).map(_.length).getOrElse(0)
                  case _ => 0
                }
                charsetData(c, off, nGlyphs)
              case _ => Nil
            }
            charset.zip(encs)
          }
          var m = TreeMap.empty[Int, String]
          for ((sid, code) <- pairs) {
            val text =
              if (sid > 390) stringToText(strings.lift(sid - 390 - 1).getOrElse(""))
              else if (sid > 95) sidToText(sid)
              else CharMaps.safeChr(code)
            if (!m.contains(code)) m = m.updated(code, text)
          }
          Encoding.DiffEncoding(m)
      }
    } catch {
      case _: Exception => Encoding.NullMap
    }
  }

  private def stringToText(s: String): String = s match {
    case "a113" => "‡"
    case "a114" => "・"
    case "trianglesolid" => "▲"
    case x => "[CFF:String " + x + "]"
  }

  /** Appendix C standard strings, SIDs 1..228 (reference CFF.hs:233-462;
    * gaps become spaces). */
  private val predefined: Map[Int, Char] = Map(
    1 -> ' ', 2 -> '!', 3 -> '"', 4 -> '#', 5 -> '$', 6 -> '%', 7 -> '&', 8 -> '’',
    9 -> '(', 10 -> ')', 11 -> '*', 12 -> '+', 13 -> ',', 14 -> '-', 15 -> '.', 16 -> '/',
    17 -> '0', 18 -> '1', 19 -> '2', 20 -> '3', 21 -> '4', 22 -> '5', 23 -> '6', 24 -> '7',
    25 -> '8', 26 -> '9', 27 -> ':', 28 -> ';', 29 -> '<', 30 -> '=', 31 -> '>', 32 -> '?',
    33 -> '@', 34 -> 'A', 35 -> 'B', 36 -> 'C', 37 -> 'D', 38 -> 'E', 39 -> 'F', 40 -> 'G',
    41 -> 'H', 42 -> 'I', 43 -> 'J', 44 -> 'K', 45 -> 'L', 46 -> 'M', 47 -> 'N', 48 -> 'O',
    49 -> 'P', 50 -> 'Q', 51 -> 'R', 52 -> 'S', 53 -> 'T', 54 -> 'U', 55 -> 'V', 56 -> 'W',
    57 -> 'X', 58 -> 'Y', 59 -> 'Z', 60 -> '{', 61 -> '/', 62 -> '}', 63 -> '^', 64 -> '_',
    65 -> '‘', 66 -> 'a', 67 -> 'b', 68 -> 'c', 69 -> 'd', 70 -> 'e', 71 -> 'f', 72 -> 'g',
    73 -> 'h', 74 -> 'i', 75 -> 'j', 76 -> 'k', 77 -> 'l', 78 -> 'm', 79 -> 'n', 80 -> 'o',
    81 -> 'p', 82 -> 'q', 83 -> 'r', 84 -> 's', 85 -> 't', 86 -> 'u', 87 -> 'v', 88 -> 'w',
    89 -> 'x', 90 -> 'y', 91 -> 'z', 92 -> '[', 93 -> 'ˉ', 94 -> ']', 95 -> '~',
    96 -> '¡', 97 -> '¢', 98 -> '£', 99 -> '/', 100 -> '¥', 101 -> 'ƒ', 102 -> '§',
    103 -> '$', 104 -> '\'', 105 -> '“', 106 -> '«', 107 -> '‹', 108 -> '›', 109 -> 'ﬁ',
    110 -> 'ﬂ', 111 -> '–', 112 -> '†', 113 -> '‡', 114 -> '·', 115 -> '❡', 116 -> '・',
    117 -> '‚', 118 -> '„', 119 -> '”', 120 -> '»', 121 -> '…', 122 -> '‰', 123 -> '¿',
    124 -> '`', 125 -> '´', 126 -> '^', 127 -> '~', 128 -> '¯', 129 -> '˘', 130 -> '˙',
    131 -> '¨', 132 -> '°', 133 -> '¸', 134 -> '˝', 135 -> '˛', 136 -> 'ˇ', 137 -> '—',
    138 -> 'Æ', 139 -> 'ª', 140 -> 'Ł', 141 -> 'Ø', 142 -> 'Œ', 143 -> 'º', 144 -> 'æ',
    145 -> 'ı', 146 -> 'ł', 147 -> 'ø', 148 -> 'œ', 149 -> 'ẞ', 150 -> '¹', 151 -> '￢',
    152 -> 'µ', 153 -> '™', 154 -> 'Ð', 155 -> '½', 156 -> '±', 157 -> 'Þ', 158 -> '¼',
    159 -> '÷', 160 -> '¦', 161 -> '°', 162 -> 'þ', 163 -> '¾', 164 -> '²', 165 -> '®',
    166 -> '－', 167 -> 'ð', 168 -> '×', 169 -> '³', 170 -> 'Ⓒ', 171 -> 'Á', 172 -> 'Â',
    173 -> 'Ä', 174 -> 'À', 175 -> 'Å', 176 -> 'Ã', 177 -> 'Ç', 178 -> 'É', 179 -> 'Ê',
    180 -> 'Ë', 181 -> 'È', 182 -> 'Í', 183 -> 'Î', 184 -> 'Ï', 185 -> 'Ì', 186 -> 'Ñ',
    187 -> 'Ó', 188 -> 'Ô', 189 -> 'Ö', 190 -> 'Ò', 191 -> 'Õ', 192 -> 'Š', 193 -> 'Ú',
    194 -> 'Û', 195 -> 'Ü', 196 -> 'Ù', 197 -> 'Ý', 198 -> 'Ÿ', 199 -> 'Ž', 200 -> 'á',
    201 -> 'â', 202 -> 'ä', 203 -> 'à', 204 -> 'å', 205 -> 'ã', 206 -> 'ç', 207 -> 'é',
    208 -> 'ê', 209 -> 'ë', 210 -> 'è', 211 -> 'í', 212 -> 'î', 213 -> 'ï', 214 -> 'ì',
    215 -> 'ñ', 216 -> 'ó', 217 -> 'ô', 218 -> 'ö', 219 -> 'ò', 220 -> 'õ', 221 -> 'š',
    222 -> 'ú', 223 -> 'û', 224 -> 'ü', 225 -> 'ù', 226 -> 'ý', 227 -> 'ÿ', 228 -> 'ž')

  private def sidToText(sid: Int): String =
    predefined.get(sid).map(_.toString).getOrElse(if (sid >= 0 && sid <= 228) " " else "?")
}
