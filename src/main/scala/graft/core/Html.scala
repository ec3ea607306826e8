package graft.core

import scala.collection.mutable.ArrayBuffer

/** DOM-heuristic main-content extraction for HTML payloads.
  *
  * No reference analogue (hpdft is PDF-only); this is the north-rule HTML
  * branch of the same extraction codepath. Design: a single-pass tag-soup
  * tokenizer feeding a block builder — boilerplate containers
  * (script/style/nav/header/footer/aside/form/template/iframe/svg plus
  * elements whose id/class look navigational) are skipped; block-level
  * boundaries become paragraph breaks; entities are decoded; output follows
  * the same "paragraphs joined by \n\n + trailing \n" convention as the PDF
  * path so downstream queries are format-agnostic.
  *
  * Deterministic and allocation-light: one forward scan, no DOM tree.
  */
object Html {

  private val skipContainers = Set(
    "head", "title", "script", "style", "noscript", "template", "svg", "iframe",
    "object", "nav", "header", "footer", "aside", "form", "button", "select", "option")

  private val blockTags = Set(
    "p", "div", "section", "article", "main", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "th", "thead",
    "tbody", "blockquote", "pre", "figure", "figcaption", "hr", "br", "address",
    "details", "summary", "fieldset")

  private val boilerplateHints = Array(
    "nav", "menu", "sidebar", "footer", "header", "banner", "breadcrumb",
    "cookie", "consent", "advert", " ads", "ad-", "social", "share", "related",
    "comment", "popup", "modal", "subscribe", "newsletter", "pagination")

  private val voidTags = Set("br", "hr", "img", "input", "meta", "link", "area",
    "base", "col", "embed", "source", "track", "wbr")

  def looksLikeHtml(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = math.min(bytes.length, 1024)
    while (i < n && Lexer.isPdfSpace(bytes(i) & 0xff)) i += 1
    if (i >= n) return false
    if ((bytes(i) & 0xff) != '<') return false
    val head = new String(bytes, i, math.min(64, bytes.length - i),
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
    head.startsWith("<!doctype") || head.startsWith("<html") || head.startsWith("<head") ||
      head.startsWith("<body") || head.startsWith("<?xml") || head.contains("<html")
  }

  def looksLikePdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
      bytes(3) == 'F' && bytes(4) == '-'

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = math.max(0, from)
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Extract main-content paragraphs from HTML bytes (UTF-8 assumed). */
  def extractHtml(bytes: Array[Byte]): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val paragraphs = extractParagraphs(s)
    if (paragraphs.isEmpty) "\n" else paragraphs.mkString("\n\n") + "\n"
  }

  def extractParagraphs(html: String): List[String] = {
    val out = new ArrayBuffer[String]
    val current = new StringBuilder
    // stack of skipped containers: (tagName) entries; content suppressed
    var skipStack: List[String] = Nil
    var i = 0
    val n = html.length

    def flushBlock(): Unit = {
      val t = normalizeWs(current.toString)
      if (t.nonEmpty) out += t
      current.setLength(0)
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        // comment?
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else {
          val (tag, attrs, isClose, selfClose, next) = readTag(html, i)
          i = next
          if (tag.isEmpty) ()
          else {
            val lt = tag
            if (!isClose) {
              val skip = skipContainers.contains(lt) ||
                (skipStack.isEmpty && isBoilerplateAttr(attrs) && lt != "body" && lt != "html")
              if (skip && !selfClose && !voidTags.contains(lt)) {
                if (skipStack.isEmpty) flushBlock()
                skipStack = lt :: skipStack
              } else if (skip && (selfClose || voidTags.contains(lt))) {
                () // skipped void element: nothing
              } else {
                if (blockTags.contains(lt) && skipStack.isEmpty) flushBlock()
                // raw-text containers still need their content skipped even
                // when self-closing flags lie; handled via skipStack above
              }
            } else {
              skipStack match {
                case top :: rest if top == lt => skipStack = rest
                case _ =>
                  if (skipStack.isEmpty && blockTags.contains(lt)) flushBlock()
                  else if (skipStack.nonEmpty && skipStack.contains(lt)) {
                    // unbalanced close of an outer skipped container
                    skipStack = skipStack.dropWhile(_ != lt) match {
                      case _ :: rest => rest
                      case Nil => Nil
                    }
                  }
              }
            }
            // script/style content must be skipped verbatim to matching close
            if (!isClose && (lt == "script" || lt == "style") && !selfClose) {
              // case-insensitive scan in place: `html.toLowerCase.indexOf`
              // copied the whole document per script tag AND could return a
              // shifted index (Unicode lowercasing can change string length,
              // e.g. U+0130 -> two chars)
              val closeIdx = indexOfIgnoreCase(html, "</" + lt, i)
              if (closeIdx >= 0) {
                // pop the skip entry we just pushed and jump past the raw text
                skipStack = skipStack match {
                  case top :: rest if top == lt => rest
                  case other => other
                }
                val gt = html.indexOf('>', closeIdx)
                i = if (gt < 0) n else gt + 1
              }
            }
          }
        }
      } else {
        if (skipStack.isEmpty) {
          // text run until next '<'
          val next = html.indexOf('<', i)
          val end = if (next < 0) n else next
          current.append(decodeEntities(html.substring(i, end)))
          i = end
        } else i += 1
      }
    }
    flushBlock()
    out.toList
  }

  private def readTag(html: String, start: Int): (String, String, Boolean, Boolean, Int) = {
    var i = start + 1
    val n = html.length
    var isClose = false
    if (i < n && html.charAt(i) == '/') { isClose = true; i += 1 }
    val tagStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-' || html.charAt(i) == ':')) i += 1
    val tag = html.substring(tagStart, i).toLowerCase
    if (tag.isEmpty) {
      // stray '<'
      return ("", "", false, false, math.min(start + 1, n))
    }
    val attrStart = i
    var inQuote = 0.toChar
    while (i < n) {
      val c = html.charAt(i)
      if (inQuote != 0) { if (c == inQuote) inQuote = 0.toChar }
      else if (c == '"' || c == '\'') inQuote = c
      else if (c == '>') {
        val attrs = html.substring(attrStart, i).toLowerCase
        val selfClose = attrs.endsWith("/")
        return (tag, attrs, isClose, selfClose, i + 1)
      }
      i += 1
    }
    (tag, html.substring(attrStart, math.min(i, n)).toLowerCase, isClose, false, n)
  }

  private def isBoilerplateAttr(attrs: String): Boolean = {
    if (attrs.isEmpty) return false
    val idClass = extractAttr(attrs, "id") + " " + extractAttr(attrs, "class") + " " +
      extractAttr(attrs, "role")
    if (idClass.trim.isEmpty) return false
    if (extractAttr(attrs, "role") == "navigation") return true
    boilerplateHints.exists(h => idClass.contains(h.trim))
  }

  private def extractAttr(attrs: String, name: String): String = {
    val idx = attrs.indexOf(name + "=")
    if (idx < 0) return ""
    // must be a word boundary
    if (idx > 0 && (attrs.charAt(idx - 1).isLetterOrDigit || attrs.charAt(idx - 1) == '-')) return ""
    var i = idx + name.length + 1
    if (i >= attrs.length) return ""
    val q = attrs.charAt(i)
    if (q == '"' || q == '\'') {
      val end = attrs.indexOf(q, i + 1)
      if (end < 0) attrs.substring(i + 1) else attrs.substring(i + 1, end)
    } else {
      val end = attrs.indexWhere(c => c == ' ' || c == '\t' || c == '\n', i)
      if (end < 0) attrs.substring(i) else attrs.substring(i, end)
    }
  }

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…", "laquo" -> "«",
    "raquo" -> "»", "ldquo" -> "“", "rdquo" -> "”", "lsquo" -> "‘",
    "rsquo" -> "’", "bull" -> "•", "middot" -> "·", "deg" -> "°",
    "times" -> "×", "divide" -> "÷", "euro" -> "€", "pound" -> "£",
    "yen" -> "¥", "cent" -> "¢", "sect" -> "§", "para" -> "¶",
    "plusmn" -> "±", "frac12" -> "½", "frac14" -> "¼", "sup2" -> "²",
    "sup3" -> "³", "micro" -> "µ", "shy" -> "")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try {
              sb.append(new String(Character.toChars(Integer.parseInt(body.drop(2), 16))))
              i = semi + 1
            } catch { case _: Exception => sb.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try {
              sb.append(new String(Character.toChars(Integer.parseInt(body.drop(1)))))
              i = semi + 1
            } catch { case _: Exception => sb.append(c); i += 1 }
          } else namedEntities.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def normalizeWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var lastWs = true
    for (c <- s) {
      val ws = Character.isWhitespace(c) || c == ' '
      if (ws) {
        if (!lastWs) sb.append(' ')
        lastWs = true
      } else { sb.append(c); lastWs = false }
    }
    while (sb.nonEmpty && sb.charAt(sb.length - 1) == ' ') sb.setLength(sb.length - 1)
    sb.toString
  }
}
