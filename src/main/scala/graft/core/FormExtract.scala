package graft.core

import scala.collection.immutable.TreeMap
import PObj._
import DocStructure.{Dict, Document, findDict}

/** Form XObject export to standalone single-page PDFs (reference
  * src/PDF/FormExtract.hs): transitive ref closure from the form object,
  * renumber to 5.., wrap in a minimal catalog/pages/page that draws the
  * form with its /Matrix. Stream payloads are copied as stored (still
  * filter-encoded) so content streams survive round-trips. */
object FormExtract {

  /** Top-level Form XObject names on a 1-based page (sorted, no slash). */
  def pageFormNames(doc: Document, pageNum: Int): Either[PdfError, List[String]] =
    pageXObjectDict(doc, pageNum).map { xobj =>
      xobj.collect {
        case (name, PRef(r)) if isFormObject(doc, r) => stripSlash(name)
      }.toList.sorted
    }

  def extractFormPdf(doc: Document, pageNum: Int, name: String): Either[PdfError, Array[Byte]] =
    for {
      xobj <- pageXObjectDict(doc, pageNum)
      key = if (name.startsWith("/")) name else "/" + name
      formRef <- xobj.get(key) match {
        case Some(PRef(r)) if isFormObject(doc, r) => Right(r)
        case Some(PRef(_)) => Left(PdfError.UnsupportedFeature(s"$key is not a Form XObject"))
        case Some(_) => Left(PdfError.UnsupportedFeature(s"$key is not an indirect Form XObject"))
        case None => Left(PdfError.MissingKey(key, s"page $pageNum XObject dictionary"))
      }
      formDict <- doc.findDictByRef(formRef).toRight(PdfError.MissingObject(formRef))
      bbox <- formDict.get("/BBox") match {
        case Some(PArray(nums)) if nums.forall(_.isInstanceOf[PNum]) && nums.length == 4 =>
          Right(nums.collect { case PNum(n) => n })
        case Some(_) => Left(PdfError.UnsupportedFeature("Form /BBox must be an array of four numbers"))
        case None => Left(PdfError.MissingKey("/BBox", "Form XObject"))
      }
      matrix <- formDict.get("/Matrix") match {
        case None => Right(None)
        case Some(PArray(nums)) if nums.length == 6 && nums.forall(_.isInstanceOf[PNum]) =>
          Right(Some(nums.collect { case PNum(n) => n }))
        case Some(_) => Left(PdfError.UnsupportedFeature("Form /Matrix must be six numbers"))
      }
      copiedRefs <- transitiveClosure(doc, formRef)
    } yield {
      val renum: Map[Int, Int] = copiedRefs.zipWithIndex.map { case (r, i) => r -> (5 + i) }.toMap
      val formNewRef = renum(formRef)
      val pageContent = drawStream(key, matrix)
      val wrapper = List(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3 -> pageBody(bbox, key, formNewRef),
        4 -> contentStreamBody(pageContent))
      val copied = copiedRefs.map(r => renum(r) -> serializeCopied(doc, r, renum))
      val allObjs = (wrapper ++ copied).sortBy(_._1)
      val sb = new StringBuilder("%PDF-1.5\n%\u00c2\u00b5\u00c2\u00b6\n")
      val offsets = List.newBuilder[(Int, Int)]
      for ((n, body) <- allObjs) {
        offsets += n -> sb.length
        sb.append(n).append(" 0 obj\n").append(body).append("\nendobj\n")
      }
      val xrefPos = sb.length
      val size = allObjs.map(_._1).max + 1
      sb.append("xref\n0 ").append(size).append("\n")
      sb.append("0000000000 65535 f \n")
      for ((_, off) <- offsets.result().sortBy(_._1))
        sb.append(f"$off%010d 00000 n \n")
      sb.append("trailer\n<< /Size ").append(size)
        .append(" /Root 1 0 R >>\nstartxref\n").append(xrefPos).append("\n%%EOF\n")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }

  private def pageXObjectDict(doc: Document, pageNum: Int): Either[PdfError, Dict] =
    DocStructure.pageRefs(doc).flatMap { refs =>
      if (pageNum < 1 || pageNum > refs.length)
        Left(PdfError.UnsupportedFeature(s"page number $pageNum out of range"))
      else {
        val pref = refs(pageNum - 1)
        doc.objsByRef(pref) match {
          case Some(os) => findDict(os) match {
            case Some(pageDict) =>
              Interp.pageResourcesInherited(pageDict, doc) match {
                case None => Right(DocStructure.emptyDict)
                case Some(res) => res.get("/XObject") match {
                  case None => Right(DocStructure.emptyDict)
                  case Some(PDict(xd)) => Right(xd)
                  case Some(PRef(r)) => doc.findDictByRef(r).toRight(PdfError.MissingObject(r))
                  case Some(_) => Left(PdfError.UnsupportedFeature("invalid /XObject entry on page"))
                }
              }
            case None => Left(PdfError.MissingKey("/Type", s"page $pref"))
          }
          case None => Left(PdfError.MissingObject(pref))
        }
      }
    }

  private def isFormObject(doc: Document, ref: Int): Boolean =
    doc.findDictByRef(ref).exists(_.get("/Subtype").contains(PName("/Form")))

  private def stripSlash(n: String): String = if (n.startsWith("/")) n.drop(1) else n

  private def transitiveClosure(doc: Document, start: Int): Either[PdfError, List[Int]] = {
    var queue = List(start)
    var seen = Set.empty[Int]
    val acc = List.newBuilder[Int]
    while (queue.nonEmpty) {
      val r = queue.head
      queue = queue.tail
      if (!seen.contains(r)) {
        doc.objsByRef(r) match {
          case None => return Left(PdfError.MissingObject(r))
          case Some(os) =>
            val refs = os.flatMap(refsIn).distinct.filterNot(seen.contains)
            queue = queue ++ refs
            seen += r
            acc += r
        }
      }
    }
    Right(acc.result())
  }

  private def refsIn(o: PObj): List[Int] = o match {
    case PDict(d) => d.values.toList.flatMap(refsIn)
    case PArray(a) => a.toList.flatMap(refsIn)
    case PRef(r) => List(r)
    case _ => Nil
  }

  private def rewrite(renum: Map[Int, Int], o: PObj): PObj = o match {
    case PDict(d) => PDict(d.map { case (k, v) => k -> rewrite(renum, v) })
    case PArray(a) => PArray(a.map(rewrite(renum, _)))
    case PRef(r) => PRef(renum.getOrElse(r, r))
    case other => other
  }

  private def showPdfNumber(n: Double): String =
    if (n == n.toLong.toDouble) n.toLong.toString else n.toString

  private def pageBody(bbox: Vector[Double], formKey: String, formNewRef: Int): String =
    List(
      "<< /Type /Page /Parent 2 0 R",
      "/MediaBox [" + bbox.map(showPdfNumber).mkString(" ") + "]",
      "/Resources << /XObject <<",
      formKey,
      formNewRef + " 0 R >> >>",
      "/Contents 4 0 R >>").mkString(" ")

  private def drawStream(formKey: String, mmat: Option[Vector[Double]]): String = {
    def near(x: Double, y: Double) = math.abs(x - y) < 1e-9
    val cmOp = mmat match {
      case Some(Vector(a, b, c, d, e, f))
          if !(near(a, 1) && near(b, 0) && near(c, 0) && near(d, 1) && near(e, 0) && near(f, 0)) =>
        Vector(a, b, c, d, e, f).map(showPdfNumber).mkString(" ") + " cm"
      case _ => "1 0 0 1 0 0 cm"
    }
    s"q\n$cmOp\n$formKey Do\nQ\n"
  }

  private def contentStreamBody(stream: String): String =
    s"<< /Length ${stream.length} >>\nstream\n$stream\nendstream"

  private def serializeCopied(doc: Document, ref: Int, renum: Map[Int, Int]): String =
    doc.objsByRef(ref) match {
      case None => "null"
      case Some(os) => findDict(os) match {
        case Some(d) =>
          val rewritten = d.map { case (k, v) => k -> rewrite(renum, v) }
          os.collectFirst { case PStream(s) => s } match {
            case None => "<<" + serializeDict(rewritten) + " >>"
            case Some(stream) =>
              // stream bytes copied as stored (still filter-encoded)
              val noLen = rewritten - "/Length"
              val withLen = noLen.updated("/Length", PNum(stream.length.toDouble))
              "<<" + serializeDict(withLen) + " >>\nstream\n" +
                new String(stream, java.nio.charset.StandardCharsets.ISO_8859_1) + "\nendstream"
          }
        case None => os match {
          case List(single) => serializeObj(rewrite(renum, single))
          case _ => "null"
        }
      }
    }

  private def serializeDict(d: TreeMap[String, PObj]): String =
    d.map { case (k, v) => s" $k ${serializeObj(v)}" }.mkString

  def serializeObj(o: PObj): String = o match {
    case PDict(d) => "<<" + serializeDict(d) + " >>"
    case PArray(a) => "[" + a.map(serializeObj).mkString(" ") + "]"
    case PName(n) => n
    case PText(t) => serializeText(t)
    case PHex(h) => serializeHex(h)
    case PNum(n) => showPdfNumber(n)
    case PBool(true) => "true"
    case PBool(false) => "false"
    case PRef(r) => r + " 0 R"
    case PNull => "null"
    case PStream(_) => "null"
  }

  private def serializeText(t: String): String =
    if (t.forall(_ < 128)) {
      "(" + t.flatMap {
        case '\\' => "\\"
        case '(' => "\\("
        case ')' => "\\)"
        case c => c.toString
      } + ")"
    } else {
      val bytes = Array[Byte](0xfe.toByte, 0xff.toByte) ++
        t.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
      "<" + bytes.map(b => f"${b & 0xff}%02X").mkString + ">"
    }

  private def serializeHex(h: String): String =
    if (h.forall(c => Lexer.isHexDigit(c))) "<" + h + ">"
    else "<" + h.map(c => f"${c.toInt & 0xff}%02X").mkString + ">"
}
