package graft.core

import scala.collection.immutable.TreeMap
import PObj._
import DocStructure.{Dict, Document, emptyDict, findDict}

/** Font / encoding resolution (reference DocumentStructure.hs:772-1128). */
object Fonts {

  private val sjisEncodings = Set(
    "/90ms-RKSJ-H", "/90ms-RKSJ-V", "/90msp-RKSJ-H", "/90msp-RKSJ-V",
    "/RKSJ-H", "/RKSJ-V")

  private val unijisEncodings = Set(
    "/UniJIS-UCS2-H", "/UniJIS-UCS2-V", "/UniJIS-UCS2-HW-H", "/UniJIS-UCS2-HW-V",
    "/UniJIS-UTF16-H", "/UniJIS-UTF16-V", "/UniJIS2004-UTF16-H", "/UniJIS2004-UTF16-V")

  /** Page `/Resources/Font` dict (DocumentStructure.hs:780-788). */
  def fontObjs(dict: Dict, doc: Document): Dict =
    DocStructure.findResourcesDict(dict, doc) match {
      case Some(d) => d.get("/Font") match {
        case Some(PDict(fd)) => fd
        case Some(PRef(x)) => doc.findDictByRef(x).getOrElse(emptyDict)
        case _ => emptyDict
      }
      case None => emptyDict
    }

  /** The big /Encoding dispatch (DocumentStructure.hs:803-882).
    * Embedded CFF / Type1 font-program encodings are not parsed yet
    * (reference reaches them only when both /Encoding and /ToUnicode are
    * absent); those paths return NullMap. */
  def encodingFromDict(doc: Document, d: Dict): Encoding = {
    val subtype = d.get("/Subtype")
    val encField = d.get("/Encoding")
    subtype match {
      case Some(PName("/Type0")) => encField match {
        case Some(PName("/Identity-H")) =>
          descendantFontObjs(doc, d) match {
            case PRef(r) +: _ =>
              doc.findDictByRef(r).flatMap(_.get("/CIDSystemInfo")) match {
                case Some(PDict(ci)) => cidSystemInfo(ci)
                case Some(PRef(r2)) => doc.findDictByRef(r2) match {
                  case Some(ci) => cidSystemInfo(ci)
                  case None => Encoding.WithCharSet("")
                }
                case _ => Encoding.WithCharSet("")
              }
            case _ => Encoding.NullMap
          }
        case Some(PName(n)) if sjisEncodings.contains(n) => Encoding.SJISmap
        case Some(PName(n)) if unijisEncodings.contains(n) => Encoding.UnicodeMap
        case Some(PName("/H")) | Some(PName("/V")) => Encoding.JISmap
        case _ => Encoding.NullMap
      }
      case Some(PName("/Type1")) => encField match {
        case Some(PRef(r)) =>
          doc.findDictByRef(r).flatMap(_.get("/Differences")) match {
            case Some(PArray(arr)) => charDiff(arr)
            case _ => Encoding.NullMap
          }
        case Some(PDict(ed)) => ed.get("/Differences") match {
          case Some(PArray(arr)) => charDiff(arr)
          case _ => Encoding.NullMap
        }
        case Some(PName("/MacRomanEncoding")) | Some(PName("/MacExpertEncoding")) |
             Some(PName("/WinAnsiEncoding")) => Encoding.NullMap
        case Some(PName("/ZapfDingbats")) => Encoding.WithCharSet("ZapfDingbats")
        case Some(PName("/Symbol")) => Encoding.WithCharSet("Symbol")
        case _ =>
          val fd = fontDescriptorFromDict(doc, d)
          fd.get("/FontFile3") match {
            case Some(PRef(fontfile)) =>
              doc.rawStreamByRef(fontfile) match {
                case Right(bs) => Cff.encoding(bs)
                case Left(_) => Encoding.NullMap
              }
            case _ => fd.get("/FontFile") match {
              case Some(PRef(fontfile)) =>
                doc.rawStreamByRef(fontfile) match {
                  case Right(bs) => EmbeddedFont.type1Encoding(bs)
                  case Left(_) => Encoding.NullMap
                }
              case _ => Encoding.NullMap
            }
          }
      }
      case _ => Encoding.NullMap
    }
  }

  private def cidSystemInfo(ci: Dict): Encoding = {
    val registry = ci.get("/Registry") match { case Some(PText(r)) => r; case _ => "" }
    val ordering = ci.get("/Ordering") match { case Some(PText(o)) => o; case _ => "" }
    Encoding.CIDmap(registry + "-" + ordering)
  }

  /** /Differences array -> code -> glyph-name map; first-wins duplicates
    * (DocumentStructure.hs:885-895). */
  def charDiff(objs: Seq[PObj]): Encoding = {
    val pairs = List.newBuilder[(Int, String)]
    var i = 0
    val xs = objs.toList
    def walk(rest: List[PObj], idx: Int): Unit = rest match {
      case PNum(x) :: PName(n) :: tail =>
        val xi = Util.hsTruncate(x)
        if (idx < xi) { pairs += ((xi, n)); walk(tail, xi + 1) }
        else { pairs += ((idx, n)); walk(tail, idx + 1) }
      case PName(n) :: tail => pairs += ((idx, n)); walk(tail, idx + 1)
      case _ :: tail => walk(tail, idx)
      case Nil => ()
    }
    walk(xs, 0)
    // fromListWith (flip const): first occurrence wins
    var m = TreeMap.empty[Int, String]
    for ((k, v) <- pairs.result()) if (!m.contains(k)) m = m.updated(k, v)
    Encoding.DiffEncoding(m)
  }

  def descendantFontObjs(doc: Document, d: Dict): Vector[PObj] =
    d.get("/DescendantFonts") match {
      case Some(PArray(dfrs)) => dfrs
      case Some(PRef(r)) => doc.objsByRef(r) match {
        case Some(PArray(dfrs) :: _) => dfrs
        case Some(os) if isDescendantFontObjs(os) => Vector(PRef(r))
        case Some(os) => os.collectFirst { case PArray(a) => a }.getOrElse(Vector.empty)
        case None => Vector.empty
      }
      case _ => Vector.empty
    }

  private def isDescendantFontObjs(os: List[PObj]): Boolean =
    findDict(os).exists { cd =>
      cd.get("/Subtype") match {
        case Some(PName("/CIDFontType0")) | Some(PName("/CIDFontType2")) => true
        case _ => false
      }
    }

  def firstDescendantFontDict(doc: Document, d: Dict): Option[Dict] =
    descendantFontObjs(doc, d).headOption.flatMap {
      case PRef(r) => doc.findDictByRef(r)
      case PDict(dd) => Some(dd)
      case _ => None
    }

  def fontDescriptorFromDict(doc: Document, d: Dict): Dict =
    d.get("/FontDescriptor") match {
      case Some(PRef(r)) => doc.findDictByRef(r).getOrElse(emptyDict)
      case Some(PDict(fd)) => fd
      case _ => emptyDict
    }

  private def resolveObjArray(doc: Document, obj: PObj): Vector[PObj] = obj match {
    case PRef(r) => doc.objsByRef(r) match {
      case Some(List(PArray(arr))) => arr
      case Some(os) => os.collectFirst { case PArray(a) => a }.getOrElse(Vector.empty)
      case None => Vector.empty
    }
    case PArray(arr) => arr
    case _ => Vector.empty
  }

  /** /ToUnicode stream CMap, falling back to the embedded OpenType cmap
    * read from the descendant font's /FontFile2 sfnt
    * (DocumentStructure.hs:908-935). */
  def toUnicodeFromDict(doc: Document, d: Dict): Map[Int, String] =
    d.get("/ToUnicode") match {
      case Some(PRef(ref)) =>
        doc.rawStreamByRef(ref) match {
          case Right(s) if s.nonEmpty => CMapParse.parseCMap(s)
          case _ => noToUnicodeFromDict(doc, d)
        }
      case _ => noToUnicodeFromDict(doc, d)
    }

  private def noToUnicodeFromDict(doc: Document, d: Dict): Map[Int, String] =
    firstDescendantFontDict(doc, d) match {
      case None => Map.empty
      case Some(cidDict) =>
        fontDescriptorFromDict(doc, cidDict).get("/FontFile2") match {
          case Some(PRef(fontfile)) =>
            doc.rawStreamByRef(fontfile) match {
              case Right(bs) => EmbeddedFont.openTypeCmap(bs)
              case Left(_) => Map.empty
            }
          case _ => Map.empty
        }
    }

  /** fontInfoFromDict (DocumentStructure.hs:942-1002). */
  def fontInfoFromDict(doc: Document, d: Dict): FontInfo =
    d.get("/Subtype") match {
      case Some(PName("/Type0")) => type0FontInfo(doc, d)
      case _ => simpleFontInfo(doc, d)
    }

  private def simpleFontInfo(doc: Document, d: Dict): FontInfo = {
    val enc = encodingFromDict(doc, d)
    val tuc = toUnicodeFromDict(doc, d)
    val fd = fontDescriptorFromDict(doc, d)
    val defaultW = fd.get("/MissingWidth") match {
      case Some(PNum(w)) => w
      case _ => 0.0
    }
    val firstChar = d.get("/FirstChar") match {
      case Some(PNum(n)) => Util.hsTruncate(n)
      case _ => 0
    }
    val widths = d.get("/Widths") match {
      case Some(wobj) => resolveObjArray(doc, wobj).map {
        case PNum(w) => Some(w)
        case _ => None
      }
      case _ => Vector.empty[Option[Double]]
    }
    FontInfo(enc, tuc, firstChar, widths, Map.empty, Map.empty,
      FontInfo.DefaultVerticalW1, wmode = 0, bytesPerCode = 1,
      defaultWidth = defaultW, isType0 = false)
  }

  private def type0FontInfo(doc: Document, d: Dict): FontInfo = {
    val enc = encodingFromDict(doc, d)
    val tuc = toUnicodeFromDict(doc, d)
    val cidDict = firstDescendantFontDict(doc, d)
    val defaultW = cidDict.flatMap(_.get("/DW")) match {
      case Some(PNum(w)) => w
      case _ => 1000.0
    }
    val widthMap = cidDict.flatMap(_.get("/W")) match {
      case Some(wobj) => parseCidWidths(resolveObjArray(doc, wobj))
      case _ => Map.empty[Int, Double]
    }
    val w1Default = cidDict.flatMap(_.get("/DW2")) match {
      case Some(PArray(Vector(PNum(_), PNum(w1)))) => w1
      case _ => FontInfo.DefaultVerticalW1
    }
    val widthVMap = cidDict.flatMap(_.get("/W2")) match {
      case Some(wobj) => parseCidVerticalWidths(resolveObjArray(doc, wobj))
      case _ => Map.empty[Int, Double]
    }
    val wmode = d.get("/Encoding") match {
      case Some(PName("/V")) => 1
      case Some(PName(n)) if n.endsWith("-V") => 1
      case _ => 0
    }
    val bpc = enc match {
      case Encoding.SJISmap => 1
      case _ => 2
    }
    FontInfo(enc, tuc, 0, Vector.empty, widthMap, widthVMap, w1Default,
      wmode = wmode, bytesPerCode = bpc, defaultWidth = defaultW, isType0 = true)
  }

  /** CID /W forms: `c [w ...]` and `cFirst cLast w` (DocumentStructure.hs:1097-1119). */
  def parseCidWidths(objs: Vector[PObj]): Map[Int, Double] =
    foldCidMetrics(objs) {
      case PNum(w) => Some(w)
      case _ => None
    }

  def parseCidVerticalWidths(objs: Vector[PObj]): Map[Int, Double] =
    foldCidMetrics(objs) {
      case PArray(Vector(PNum(_), PNum(vy))) => Some(vy)
      case PNum(w) => Some(w)
      case _ => None
    }

  private def foldCidMetrics(objs: Vector[PObj])(metric: PObj => Option[Double]): Map[Int, Double] = {
    var m = Map.empty[Int, Double]
    def go(rest: List[PObj]): Unit = rest match {
      case PNum(c) :: PArray(ws) :: tail =>
        for ((w, i) <- ws.zipWithIndex; n <- metric(w)) m = m.updated(Util.hsTruncate(c) + i, n)
        go(tail)
      case PNum(cFirst) :: PNum(cLast) :: w :: tail =>
        metric(w) match {
          case Some(n) =>
            var cid = Util.hsTruncate(cFirst)
            // cap the range span like CMapParse's MaxBfrangeSpan: a crafted
            // "0 2147483647 500" would otherwise insert 2^31 entries (and
            // cLast = Int.MaxValue makes `cid += 1` wrap negative — an
            // infinite loop). No real CID font exceeds 65536 CIDs.
            val last = math.min(Util.hsTruncate(cLast).toLong,
              cid.toLong + CMapParse.MaxBfrangeSpan)
            while (cid <= last) { m = m.updated(cid, n); cid += 1 }
          case None => ()
        }
        go(tail)
      case _ :: tail => go(tail)
      case Nil => ()
    }
    go(objs.toList)
    m
  }
}
