package graft.core

import java.nio.charset.Charset

/** Character tables.
  *
  * The reference embeds binary maps (reference src/PDF/Character.hs:19-30,
  * under data/map). Here the JIS X 0208 and CP932 tables are derived from the
  * JVM's own EUC-JP / windows-31j charsets (same published mappings), and
  * the glyph-name map is the same Adobe Glyph List subset.
  */
object CharMaps {

  /** Glyph name (with leading slash) -> unicode text. Mirrors the
    * reference's pdfchardict including its quirks (trailing-space keys,
    * ligature expansions, `/arrowdblleft` mapped to a right arrow). */
  lazy val pdfCharMap: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    // basic letters and digits map to themselves
    for (c <- 'A' to 'Z') b += (s"/$c" -> c.toString)
    for (c <- 'a' to 'z') b += (s"/$c" -> c.toString)
    val digits = List("zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine")
    for ((nm, i) <- digits.zipWithIndex) b += (s"/$nm" -> i.toString)
    val entries: List[(String, String)] = List(
      "/AE" -> "Æ", "/Aacute" -> "Á", "/Acircumflex" -> "Â",
      "/Adieresis" -> "Ä", "/Aring" -> "Å", "/Atilde" -> "Ã",
      "/Ccedilla" -> "Ç", "/Eacute" -> "É", "/Ecircumflex" -> "Ê",
      "/Edieresis" -> "Ë", "/Egrave" -> "È", "/Eth" -> "Ð",
      "/Euro" -> "€", "/Iacute" -> "Í", "/Icircumflex" -> "Î",
      "/Idieresis" -> "Ï", "/Igrave" -> "Ì", "/Lslash" -> "Ł",
      "/Ntilde" -> "Ñ", "/OE" -> "OE", "/Oacute" -> "Ó",
      "/Ocircumflex" -> "Ô", "/Odieresis" -> "Ö", "/Ograve" -> "Ò",
      "/Oslash" -> "Ø", "/Otilde" -> "Õ", "/Scaron" -> "Š",
      "/Thorn" -> "Þ", "/Uacute" -> "Ú", "/Ucircumflex" -> "Û",
      "/Udieresis" -> "Ü", "/Ugrave" -> "Ù", "/Yacute" -> "Ý",
      "/Ydieresis" -> "Ÿ", "/Zcaron" -> "Ž",
      "/aacute" -> "á", "/acircumflex" -> "â", "/acute" -> "´",
      "/adieresis" -> "ä", "/ae" -> "æ", "/agrave" -> "à",
      "/ampersand" -> "&", "/aring" -> "å", "/asciicircum" -> "^",
      "/asciitilde" -> "~", "/asterisk" -> "*", "/at" -> "@",
      "/atilde " -> "ã", // trailing space preserved from the reference table
      "/backslash" -> "\\", "/bar" -> "|", "/braceleft" -> "{",
      "/braceright" -> "}", "/bracketleft" -> "[", "/bracketright" -> "]",
      "/breve" -> "˘", "/brokenbar" -> "¦", "/bullet" -> "•",
      "/caron" -> "ˇ",
      "/ccedilla " -> "ç", // trailing space preserved
      "/cedilla" -> "¸", "/cent" -> "¢", "/circumflex" -> "ˆ",
      "/colon" -> ":", "/comma" -> ",", "/copyright" -> "©",
      "/circlecopyrt" -> "©", "/currency" -> "¤",
      "/dagger" -> "†", "/daggerdb" -> "‡", "/degree" -> "°",
      "/dieresis" -> "¨", "/divide" -> "÷", "/dollar" -> "$",
      "/dotaccent" -> "˙", "/dotlessi" -> "ı",
      "/eacute" -> "é", "/ecircumflex" -> "ê", "/edieresis" -> "ë",
      "/egrave" -> "è", "/ellipsis" -> "…", "/emdash" -> "—",
      "/endash" -> "–", "/equal" -> "=", "/eth" -> "ð",
      "/exclam" -> "!", "/exclamdown" -> "¡",
      "/ff" -> "ff", "/ffi" -> "ffi", "/ffl" -> "ffl", "/fi" -> "fi", "/fl" -> "fl",
      "/florin" -> "ƒ", "/fraction" -> "⁄", "/germandbls" -> "ß",
      "/grave" -> "`", "/greater" -> ">", "/guillemotleft" -> "«",
      "/guillemotright" -> "»", "/guilsinglleft" -> "‹",
      "/guilsinglright" -> "›", "/hungarumlaut" -> "˝",
      "/hyphen" -> "-", "/iacute" -> "í", "/icircumflex" -> "î",
      "/idieresis" -> "ï", "/igrave" -> "ì", "/less" -> "<",
      "/logicalnot" -> "¬", "/lslash" -> "ł", "/macron" -> "¯",
      "/minus" -> "−", "/mu" -> "μ", "/multiply" -> "×",
      "/ntilde" -> "ñ", "/numbersign" -> "#", "/oacute" -> "ó",
      "/ocircumflex" -> "ô", "/odieresis" -> "ö", "/oe" -> "oe",
      "/ogonek" -> "˛", "/ograve" -> "ò", "/onehalf" -> "½",
      "/onequarter" -> "¼", "/onesuperior" -> "¹",
      "/ordfeminine" -> "ª", "/ordmasculine" -> "º",
      "/oslash" -> "ø", "/otilde" -> "õ", "/paragraph" -> "¶",
      "/parenleft" -> "(", "/parenright" -> ")", "/percent" -> "%",
      "/period" -> ".", "/periodcentered" -> "·", "/perthousand" -> "‰",
      "/plus" -> "+",
      "/plusminus " -> "±", // trailing space preserved
      "/question" -> "?", "/questiondown" -> "¿", "/quotedbl" -> "\"",
      "/quotedblbase" -> "„", "/quotedblleft" -> "“",
      "/quotedblright" -> "”", "/quoteleft" -> "‘",
      "/quoteright" -> "’", "/quotesinglbase" -> "‚",
      "/quotesingle" -> "'", "/registered" -> "®", "/ring" -> "˚",
      "/scaron" -> "š", "/section" -> "§", "/semicolon" -> ";",
      "/slash" -> "/", "/space" -> " ", "/sterling" -> "£",
      "/thorn" -> "þ", "/threequarters" -> "¾",
      "/threesuperior" -> "³", "/tilde" -> "˜",
      "/trademark" -> "™", "/twosuperior" -> "²",
      "/uacute" -> "ú", "/ucircumflex" -> "û", "/udieresis" -> "ü",
      "/ugrave" -> "ù", "/underscore" -> "_", "/yacute" -> "ý",
      "/ydieresis" -> "ÿ", "/yen" -> "¥", "/zcaron" -> "ž",
      // Greek (Symbol font names)
      "/Alpha" -> "Α", "/Beta" -> "Β", "/Chi" -> "Χ",
      "/Delta" -> "Δ", "/Epsilon" -> "Ε", "/Eta" -> "Η",
      "/Gamma" -> "Γ", "/Iota" -> "Ι", "/Kappa" -> "Κ",
      "/Lambda" -> "Λ", "/Mu" -> "Μ", "/Nu" -> "Ν",
      "/Omega" -> "Ω", "/Omicron" -> "Ο", "/Phi" -> "Φ",
      "/Pi" -> "Π", "/Psi" -> "Ψ", "/Rho" -> "Ρ",
      "/Sigma" -> "Σ", "/Tau" -> "Τ", "/Theta" -> "Θ",
      "/Upsilon" -> "Υ", "/Xi" -> "Ξ", "/Zeta" -> "Ζ",
      "/aleph" -> "ℵ", "/alpha" -> "α", "/angle" -> "∠",
      "/angleleft" -> "〈", "/angleright" -> "〉",
      "/approxequal" -> "≈", "/arrowdblboth" -> "⇔",
      "/arrowdblleft" -> "⇒", // reference maps this to a RIGHT arrow; preserved
      "/asteriskmath" -> "*", "/beta" -> "β", "/chi" -> "χ",
      "/delta" -> "δ", "/epsilon" -> "ε", "/eta" -> "η",
      "/gamma" -> "γ", "/iota" -> "ι", "/kappa" -> "κ",
      "/lambda" -> "λ", "/nu" -> "ν", "/omega" -> "ω",
      "/omicron" -> "ο", "/phi" -> "φ", "/pi" -> "π",
      "/psi" -> "ψ", "/rho" -> "ρ", "/sigma" -> "σ",
      "/tau" -> "τ", "/theta" -> "θ", "/upsilon" -> "υ",
      "/xi" -> "ξ", "/zeta" -> "ζ",
      "/existential" -> "∃", "/universal" -> "∀",
      "/partialdiff" -> "∂", "/infinity" -> "∞",
      "/integral" -> "∫", "/sharp" -> "♯")
    b ++= entries
    b.result()
  }

  /** Legacy extended-ASCII table (cp1252-ish 128-159, latin-1 above, soft
    * hyphen 173 -> '-'). */
  lazy val extendedAscii: Map[Int, Char] = {
    val low: Map[Int, Char] = Map(
      128 -> '€', 129 -> ' ', 130 -> '‚', 131 -> 'ƒ',
      132 -> '„', 133 -> '…', 134 -> '†', 135 -> '‡',
      136 -> 'ˆ', 137 -> '‰', 138 -> 'Š', 139 -> '‹',
      140 -> 'Œ', 141 -> ' ', 142 -> 'Ž', 143 -> ' ',
      144 -> ' ', 145 -> '‘', 146 -> '’', 147 -> '“',
      148 -> '”', 149 -> '•', 150 -> '–', 151 -> '—',
      152 -> '˜', 153 -> '™', 154 -> 'š', 155 -> '›',
      156 -> 'œ', 157 -> ' ', 158 -> 'ž', 159 -> 'Ÿ')
    val high = (160 to 255).map(i => i -> (if (i == 173) '-' else i.toChar)).toMap
    low ++ high
  }

  /** JIS X 0208 2-byte code (ISO-2022 form, e.g. 0x467C) -> unicode string.
    * Derived from the JVM's EUC-JP decoder. */
  lazy val jisx0208Map: Map[Int, String] = {
    val cs = Charset.forName("EUC-JP")
    val b = Map.newBuilder[Int, String]
    var hi = 0x21
    while (hi <= 0x7e) {
      var lo = 0x21
      while (lo <= 0x7e) {
        val bytes = Array(((hi | 0x80) & 0xff).toByte, ((lo | 0x80) & 0xff).toByte)
        val s = new String(bytes, cs)
        if (s.length == 1 && s.charAt(0) != '�') b += ((hi << 8) | lo) -> s
        lo += 1
      }
      hi += 1
    }
    b.result()
  }

  /** Shift-JIS (CP932) 2-byte code -> unicode string, via windows-31j. */
  lazy val cp932Map: Map[Int, String] = {
    val cs = Charset.forName("windows-31j")
    val b = Map.newBuilder[Int, String]
    def leads = (0x81 to 0x9f) ++ (0xe0 to 0xfc)
    for (hi <- leads; lo <- 0x40 to 0xfc if lo != 0x7f) {
      val bytes = Array((hi & 0xff).toByte, (lo & 0xff).toByte)
      val s = new String(bytes, cs)
      if (s.length == 1 && s.charAt(0) != '�') b += ((hi << 8) | lo) -> s
    }
    b.result()
  }

  /** Adobe-Japan1 CID -> unicode (reference Character.hs:23-24,
    * data/map/Adobe-Japan1-6.map). All 17,960 assigned CIDs including the
    * proportional/halfwidth/vertical variant range 96-632 and supplement
    * CIDs 7478+ — the round-1 structural derivation (ASCII + contiguous
    * JIS X 0208) covered only 1-95 and 633-7477 and disagreed with the
    * reference on 9 JIS-Roman/fullwidth quirk CIDs (61 yen, 93 broken bar,
    * 95 small tilde, 633 EM space, 713/714/751 fullwidth cent/pound/not,
    * and a 2-CID overrun at 7478/7479). Loaded from a run-length resource:
    * `B<cid>:<chars>` = consecutive CIDs mapped to the payload's code
    * points in order; `E<cid>:<string>` = one multi-char value (e.g. CID 0
    * "[NOTDEF]", the reference's literal "????" kana-gist placeholders). */
  lazy val adobeJapan16Map: Map[Int, String] = {
    val in = getClass.getResourceAsStream("/graft/adobe-japan1-6.txt")
    require(in != null, "adobe-japan1-6.txt resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val b = Map.newBuilder[Int, String]
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        val colon = line.indexOf(':')
        val cid0 = line.substring(1, colon).toInt
        val payload = line.substring(colon + 1)
        if (line.charAt(0) == 'B') {
          var cid = cid0
          var i = 0
          while (i < payload.length) {
            val cp = payload.codePointAt(i)
            b += cid -> new String(Character.toChars(cp))
            cid += 1
            i += Character.charCount(cp)
          }
        } else b += cid0 -> payload
      }
    } finally src.close()
    b.result()
  }

  private val lowChars: Array[String] =
    (0 until 256).map(i => String.valueOf(i.toChar)).toArray

  def safeChr(n: Int): String =
    if (n >= 0 && n < 256) lowChars(n)
    else if (n >= 0 && n <= 0x10FFFF && !(n >= 0xD800 && n <= 0xDFFF)) new String(Character.toChars(n))
    else "�"
}
