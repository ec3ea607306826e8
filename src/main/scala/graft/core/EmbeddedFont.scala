package graft.core

import scala.collection.immutable.TreeMap

/** Embedded font-program parsing: OpenType `cmap` table (formats 4, 12
  * and 14) and Type1 /Encoding scrape. Reached only when a font has
  * neither /ToUnicode nor a usable /Encoding (reference OpenType.hs;
  * format 14 is beyond parity — the reference skips it,
  * OpenType.hs:73-120 — but CJK corpora carry Ideographic Variation
  * Sequences, and a variant glyph is reachable ONLY through the UVS
  * subtable, so skipping it drops those glyphs' text entirely). Type1
  * per Type1.hs. CFF (FontFile3) charset/encoding is not parsed yet. */
object EmbeddedFont {

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int =
    if (i + 1 >= b.length) -1 else (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: Array[Byte], i: Int): Long =
    if (i + 3 >= b.length) -1L
    else (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** sfnt -> cmap subtables -> glyphID -> unicode text (the reverse map
    * used as a ToUnicode fallback for Identity-encoded CIDFontType2;
    * reference OpenType.hs:39-134). First-wins on duplicate glyph ids. */
  def openTypeCmap(font: Array[Byte]): Map[Int, String] = {
    try {
      if (font.length < 12) return Map.empty
      val isSfnt = (u32(font, 0) == 0x00010000L) ||
        (font.length >= 4 && font(0) == 'O' && font(1) == 'T' && font(2) == 'T' && font(3) == 'O')
      if (!isSfnt) return Map.empty
      val numTables = u16(font, 4)
      var cmapStart = -1L
      var cmapLen = -1L
      var t = 0
      while (t < numTables && cmapStart < 0) {
        val rec = 12 + t * 16
        if (rec + 16 <= font.length) {
          val tag = new String(font, rec, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
          if (tag == "cmap") {
            cmapStart = u32(font, rec + 8)
            cmapLen = u32(font, rec + 12)
          }
        }
        t += 1
      }
      if (cmapStart < 0 || cmapStart + 4 > font.length) return Map.empty
      val base = cmapStart.toInt
      val numRecords = u16(font, base + 2)
      var out = Map.empty[Int, String]
      def add(gid: Int, code: Int): Unit =
        if (!out.contains(gid)) out = out.updated(gid, CharMaps.safeChr(code))
      def addStr(gid: Int, s: String): Unit =
        if (!out.contains(gid)) out = out.updated(gid, s)
      // two passes: base formats (4/12) first so a gid reachable through
      // the standard cmap keeps its plain mapping, THEN format 14 — a
      // variation-selector gid exists only in the UVS subtable, while
      // default-UVS ranges reuse base-cmap gids (first-wins keeps those)
      for (pass <- 0 to 1; r <- 0 until numRecords) {
        val rec = base + 4 + r * 8
        val offset = u32(font, rec + 4)
        if (offset >= 0 && base + offset + 2 <= font.length) {
          val sub = base + offset.toInt
          (u16(font, sub), pass) match {
            case (4, 0) =>
              val segCount2 = u16(font, sub + 6)
              val segCount = segCount2 / 2
              val endCodes = sub + 14
              val startCodes = endCodes + segCount2 + 2
              val idDeltas = startCodes + segCount2
              val idRangeOffsets = idDeltas + segCount2
              var s = 0
              while (s < segCount) {
                val start = u16(font, startCodes + s * 2)
                val end = u16(font, endCodes + s * 2)
                val delta = u16(font, idDeltas + s * 2)
                val roPos = idRangeOffsets + s * 2
                val rangeOffset = u16(font, roPos)
                if (start >= 0 && end >= start) {
                  var c = start
                  while (c <= end) {
                    // reference: gid = c + delta when no range offset, else
                    // the raw uint16 at idRangeOffset[s] + 2*(c-start)
                    // (no delta, no masking — mirrored exactly)
                    val gid =
                      if (rangeOffset == 0) c + delta
                      else u16(font, roPos + rangeOffset + 2 * (c - start))
                    if (gid >= 0) add(gid, c)
                    c += 1
                  }
                }
                s += 1
              }
            case (12, 0) =>
              // bound the declared group count by the bytes actually
              // present (12 bytes per group): a crafted numGroups of ~4e9
              // would otherwise spin the loop for seconds per font even
              // though every out-of-bounds read is guarded
              val numGroups = math.min(u32(font, sub + 12),
                math.max(0L, (font.length - sub - 16).toLong / 12))
              var g = 0L
              while (g < numGroups) {
                val grp = sub + 16 + (g * 12).toInt
                val startChar = u32(font, grp).toInt
                val endChar = u32(font, grp + 4).toInt
                val startGid = u32(font, grp + 8).toInt
                if (startChar >= 0 && endChar >= startChar && endChar - startChar < 0x110000) {
                  var c = startChar
                  var gid = startGid
                  while (c <= endChar) {
                    add(gid, c)
                    c += 1
                    gid += 1
                  }
                }
                g += 1
              }
            case (14, 1) =>
              // Unicode Variation Sequences (platform 0 encoding 5): each
              // varSelector record carries a default-UVS table (base-cmap
              // gids — nothing to add) and a non-default table mapping
              // (unicodeValue, varSelector) -> gid; the reverse text for
              // such a gid is base char + selector (an IVS pair)
              val numVarSel = math.min(u32(font, sub + 6),
                math.max(0L, (font.length - sub - 10).toLong / 11))
              def u24(i: Int): Int =
                if (i + 2 >= font.length) -1
                else (u8(font, i) << 16) | (u8(font, i + 1) << 8) | u8(font, i + 2)
              var v = 0L
              while (v < numVarSel) {
                val vrec = sub + 10 + (v * 11).toInt
                val varSel = u24(vrec)
                val nonDefOff = u32(font, vrec + 7)
                if (varSel > 0 && nonDefOff > 0 && sub + nonDefOff + 4 <= font.length) {
                  val nd = sub + nonDefOff.toInt
                  val numMappings = math.min(u32(font, nd),
                    math.max(0L, (font.length - nd - 4).toLong / 5))
                  var m = 0L
                  while (m < numMappings) {
                    val mp = nd + 4 + (m * 5).toInt
                    val uv = u24(mp)
                    val gid = u16(font, mp + 3)
                    if (uv > 0 && uv <= 0x10ffff && varSel <= 0x10ffff && gid >= 0)
                      addStr(gid, new String(Character.toChars(uv)) +
                        new String(Character.toChars(varSel)))
                    m += 1
                  }
                }
                v += 1
              }
            case _ => ()
          }
        }
      }
      out
    } catch {
      case _: Exception => Map.empty
    }
  }

  /** Type1 `/Encoding ... dup N /name put` scrape (reference Type1.hs:35-62). */
  def type1Encoding(font: Array[Byte]): Encoding = {
    val s = new String(font, java.nio.charset.StandardCharsets.ISO_8859_1)
    val encAt = s.indexOf("/Encoding")
    if (encAt < 0) return Encoding.NullMap
    val after = s.substring(encAt + "/Encoding".length)
    val trimmed = after.dropWhile(c => c == ' ' || c == '\n' || c == '\r')
    if (trimmed.startsWith("StandardEncoding")) return Encoding.DiffEncoding(TreeMap.empty)
    // reference: skip through "for", then parse `dup <num> <name> put`
    // entries until a standalone readonly/def token
    val forAt = after.indexOf("for")
    val body0 = if (forAt >= 0) after.substring(forAt + 3) else after
    val stopRe = "(?<![A-Za-z./])(readonly|def)(?![A-Za-z])".r
    val body = stopRe.findFirstMatchIn(body0) match {
      case Some(mm) => body0.substring(0, mm.start)
      case None => body0
    }
    var m = TreeMap.empty[Int, String]
    val dup = "dup\\s+(\\d+)\\s*(/[^\\s]+)\\s+put".r
    for (mm <- dup.findAllMatchIn(body)) {
      val code = mm.group(1).toInt
      val name = mm.group(2)
      if (!m.contains(code)) m = m.updated(code, name)
    }
    if (m.isEmpty) Encoding.NullMap else Encoding.DiffEncoding(m)
  }
}
