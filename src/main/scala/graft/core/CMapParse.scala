package graft.core

/** /ToUnicode CMap parsing (reference src/PDF/Cmap.hs).
  *
  * Grammar mirrored from the reference: skip to `endcodespacerange`, then a
  * strict alternation of `N beginbfchar .. endbfchar` / `N beginbfrange ..
  * endbfrange` blocks until `endcmap`; any deviation yields an empty map.
  * bfrange destinations may be a hex base (incrementing) or an array of hex
  * strings; spans are capped at 65536 codes.
  */
object CMapParse {
  private[core] val MaxBfrangeSpan = 65536

  def parseCMap(bytes: Array[Byte]): Map[Int, String] = {
    if (bytes.isEmpty) return Map.empty
    val cur = new Cursor(bytes)
    val hdr = Lexer.indexOfFrom(bytes, 0, "endcodespacerange")
    if (hdr < 0) return Map.empty
    cur.pos = hdr + "endcodespacerange".length
    skipWs(cur)
    val out = Map.newBuilder[Int, String]
    var go = true
    while (go) {
      if (cur.consume("endcmap")) go = false
      else if (!block(cur, out)) return Map.empty
      if (cur.atEnd && go) return Map.empty
    }
    out.result()
  }

  private def skipWs(cur: Cursor): Unit = {
    while (!cur.atEnd && Character.isWhitespace(cur.peek)) cur.pos += 1
  }

  private def digits(cur: Cursor): Boolean = {
    var n = 0
    while (Lexer.isDigit(cur.peek)) { cur.pos += 1; n += 1 }
    n > 0
  }

  private def block(cur: Cursor, out: scala.collection.mutable.Builder[(Int, String), Map[Int, String]]): Boolean = {
    val save = cur.pos
    if (!digits(cur)) return false
    skipWs(cur)
    if (cur.consume("beginbfchar")) {
      skipWs(cur)
      var go = true
      while (go) {
        (hexletters(cur), if (cur.peek == '<') hexletters(cur) else None) match {
          case (Some(cid), Some(ucs)) =>
            (readHex(cid), readHex(ucs.take(4))) match {
              case (Some(c), Some(u)) => out += c -> new String(Character.toChars(clampChr(u)))
              case _ => ()
            }
          case _ => go = false
        }
      }
      skipWs(cur)
      if (!cur.consume("endbfchar")) { return false }
      skipWs(cur)
      true
    } else {
      cur.pos = save
      if (!digits(cur)) return false
      skipWs(cur)
      if (!cur.consume("beginbfrange")) return false
      skipWs(cur)
      var go = true
      while (go) {
        if (cur.peek != '<' && cur.peek != '[') go = false
        else {
          val lo = hexletters(cur)
          val hi = if (cur.peek == '<') hexletters(cur) else None
          (lo, hi) match {
            case (Some(l), Some(h)) =>
              val dst: Option[List[String]] =
                if (cur.peek == '<') hexletters(cur).map(List(_))
                else if (cur.peek == '[') hexletterArray(cur)
                else None
              dst match {
                case Some(elems) =>
                  (readHex(l), readHex(h)) match {
                    case (Some(a), Some(b)) if b >= a =>
                      val span = b - a + 1
                      val bCapped = if (span > MaxBfrangeSpan) a + MaxBfrangeSpan - 1 else b
                      if (elems.length == 1 && dstWasSingle(cur)) ()
                      val ucsList: Iterator[Int] =
                        if (elems.length == 1 && elems.head.nonEmpty && !elems.head.contains('\n')) {
                          readHex(elems.head) match {
                            case Some(n) => Iterator.from(n)
                            case None => Iterator.empty
                          }
                        } else elems.iterator.flatMap(readHex(_).iterator)
                      var code = a
                      val it = ucsList
                      while (code <= bCapped && it.hasNext) {
                        out += code -> new String(Character.toChars(clampChr(it.next())))
                        code += 1
                      }
                    case _ => ()
                  }
                case None => go = false
              }
            case _ => go = false
          }
        }
      }
      skipWs(cur)
      if (!cur.consume("endbfrange")) return false
      skipWs(cur)
      true
    }
  }

  // array vs single already distinguished by caller; kept for clarity
  private def dstWasSingle(cur: Cursor): Boolean = true

  private def clampChr(n: Int): Int =
    if (n >= 0 && n <= 0x10FFFF && !(n >= 0xD800 && n <= 0xDFFF)) n else 0xFFFD

  private def readHex(s: String): Option[Int] = {
    if (s.isEmpty || !s.forall(c => Lexer.isHexDigit(c))) return None
    var v = 0L
    for (c <- s) {
      v = v * 16 + Lexer.hexVal(c)
      if (v > Int.MaxValue) return Some(Int.MaxValue)
    }
    Some(v.toInt)
  }

  /** `< hex >`: groups of exactly 4 hex digits, or a single 2-digit group
    * (Cmap.hs:110-121). Trailing whitespace consumed. */
  private def hexletters(cur: Cursor): Option[String] = {
    if (cur.peek != '<') return None
    val save = cur.pos
    cur.pos += 1
    val sb = new StringBuilder
    // try: many 4-hex groups until '>'
    var ok = true
    val innerSave = cur.pos
    var done = false
    while (!done && ok) {
      if (cur.consume(">")) done = true
      else {
        var k = 0
        while (k < 4 && Lexer.isHexDigit(cur.peek)) { sb.append(cur.next().toChar); k += 1 }
        if (k != 4) ok = false
      }
    }
    if (ok && done) { skipWs(cur); return Some(sb.toString) }
    // fallback: exactly 2 hex digits then '>'
    cur.pos = innerSave
    val sb2 = new StringBuilder
    var k = 0
    while (k < 2 && Lexer.isHexDigit(cur.peek)) { sb2.append(cur.next().toChar); k += 1 }
    if (k == 2 && cur.consume(">")) { skipWs(cur); Some(sb2.toString) }
    else { cur.pos = save; None }
  }

  /** `[ <hex> <hex> ... ]` -> list of hex strings (Cmap.hs:126-132). */
  private def hexletterArray(cur: Cursor): Option[List[String]] = {
    if (cur.peek != '[') return None
    val save = cur.pos
    cur.pos += 1
    skipWs(cur)
    val out = List.newBuilder[String]
    var go = true
    while (go) {
      skipWs(cur)
      if (cur.consume("]")) { skipWs(cur); return Some(out.result()) }
      hexletters(cur) match {
        case Some(h) => out += h
        case None => go = false
      }
    }
    cur.pos = save
    None
  }
}
