package graft.core

import PObj._
import DocStructure.{Dict, Document, findDict, findDictOfType}

/** Tagged-PDF logical structure tree (reference src/PDF/Structure.hs). */
object Structure {

  final case class StructElem(seType: String, kids: List[StructKid])
  sealed trait StructKid
  final case class KidElem(e: StructElem) extends StructKid
  final case class KidMCID(page: Int, mcid: Int) extends StructKid

  final case class RubySpan(page: Int, bases: List[Int], rubies: List[Int])

  private val MaxStructDepth = 512

  def structTree(doc: Document): Either[PdfError, Option[StructElem]] =
    doc.rootRef.flatMap { rootRef =>
      doc.objsByRef(rootRef) match {
        case Some(os) => findDictOfType("/Catalog", os) match {
          case Some(catalog) => catalog.get("/StructTreeRoot") match {
            case Some(PRef(r)) => parseStructRef(r, None, doc, Set.empty, 0)
            case Some(PDict(d)) => parseStructDict(d, None, doc, Set.empty, 0)
            case _ => Right(None)
          }
          case None => Left(PdfError.MissingKey("/Type", "catalog"))
        }
        case None => Left(PdfError.MissingObject(rootRef))
      }
    }

  private def parseStructRef(ref: Int, pg: Option[Int], doc: Document,
      visited: Set[Int], depth: Int): Either[PdfError, Option[StructElem]] = {
    if (depth >= MaxStructDepth || visited.contains(ref)) Right(None)
    else doc.objsByRef(ref) match {
      case Some(os) => findDict(os) match {
        case Some(d) => parseStructDict(d, pg, doc, visited + ref, depth)
        case None => Right(None)
      }
      case None => Left(PdfError.MissingObject(ref))
    }
  }

  private def parseStructDict(d: Dict, pg: Option[Int], doc: Document,
      visited: Set[Int], depth: Int): Either[PdfError, Option[StructElem]] = {
    if (depth >= MaxStructDepth) return Right(None)
    val pg2 = pageRefFromDict(d, pg)
    val stype = structTypeName(d)
    parseKids(d.get("/K"), pg2, doc, visited, depth + 1).map { kids =>
      if (stype.isEmpty && kids.isEmpty) None
      else Some(StructElem(stype, kids))
    }
  }

  private def structTypeName(d: Dict): String =
    d.get("/S") match {
      case Some(PName(n)) => n
      case _ => d.get("/Type") match {
        case Some(PName(n)) => n
        case _ => ""
      }
    }

  private def pageRefFromDict(d: Dict, pg: Option[Int]): Option[Int] =
    d.get("/Pg") match {
      case Some(PRef(r)) => Some(r)
      case _ => pg
    }

  private def parseKids(k: Option[PObj], pg: Option[Int], doc: Document,
      visited: Set[Int], depth: Int): Either[PdfError, List[StructKid]] = k match {
    case None => Right(Nil)
    case Some(PNum(n)) => Right(pg.map(p => KidMCID(p, Util.hsTruncate(n))).toList)
    case Some(PArray(arr)) =>
      arr.foldLeft[Either[PdfError, List[StructKid]]](Right(Nil)) { (acc, o) =>
        acc.flatMap(ks => parseKid(o, pg, doc, visited, depth).map(ks ++ _))
      }
    case Some(o) => parseKid(o, pg, doc, visited, depth)
  }

  private def parseKid(o: PObj, pg: Option[Int], doc: Document,
      visited: Set[Int], depth: Int): Either[PdfError, List[StructKid]] = o match {
    case PNum(n) => Right(pg.map(p => KidMCID(p, Util.hsTruncate(n))).toList)
    case PRef(r) =>
      if (visited.contains(r)) Right(Nil) // /K ref cycle guard
      else doc.objsByRef(r) match {
        case Some(os) => findDict(os) match {
          case Some(d) => parseKidDict(d, pg, doc, visited + r, depth)
          case None => Right(Nil)
        }
        case None => Left(PdfError.MissingObject(r))
      }
    case PDict(d) => parseKidDict(d, pg, doc, visited, depth)
    case _ => Right(Nil)
  }

  private def parseKidDict(d: Dict, pg: Option[Int], doc: Document,
      visited: Set[Int], depth: Int): Either[PdfError, List[StructKid]] =
    d.get("/Type") match {
      case Some(PName("/MCR")) =>
        val pg2 = pageRefFromDict(d, pg)
        val mcid = d.get("/MCID").collect { case PNum(n) => Util.hsTruncate(n) }
        Right((pg2, mcid) match {
          case (Some(p), Some(m)) => List(KidMCID(p, m))
          case _ => Nil
        })
      case Some(PName("/OBJR")) => Right(Nil)
      case _ => parseStructDict(d, pg, doc, visited, depth).map {
        case Some(e) => List(KidElem(e))
        case None => Nil
      }
    }

  /** DFS over the tree: (ancestor path incl. self type, page, mcid). */
  def logicalOrder(root: StructElem): List[(List[String], Int, Int)] = {
    def walk(ancestors: List[String], e: StructElem): List[(List[String], Int, Int)] = {
      val path = ancestors :+ e.seType
      e.kids.flatMap {
        case KidMCID(page, mcid) => List((path, page, mcid))
        case KidElem(child) => walk(path, child)
      }
    }
    walk(Nil, root)
  }

  def collectRubySpans(root: StructElem): List[RubySpan] = {
    def walk(e: StructElem): List[RubySpan] = {
      val childSpans = e.kids.flatMap { case KidElem(c) => walk(c); case _ => Nil }
      val here = if (e.seType == "/Ruby") rubySpan(e.kids).toList else Nil
      here ++ childSpans
    }
    walk(root)
  }

  private def rubySpan(kids: List[StructKid]): Option[RubySpan] =
    (findKidElem("/RB", kids), findKidElem("/RT", kids)) match {
      case (Some(rb), Some(rt)) =>
        val bases = mcidsFromElem(rb)
        val rubies = mcidsFromElem(rt)
        bases match {
          case (page, _) :: _ if rubies.nonEmpty =>
            Some(RubySpan(page, bases.map(_._2), rubies.map(_._2)))
          case _ => None
        }
      case _ => None
    }

  private def findKidElem(want: String, kids: List[StructKid]): Option[StructElem] =
    // reference foldr keeps the LAST matching kid (Structure.hs:151-156)
    kids.collect { case KidElem(e) if e.seType == want => e }.lastOption

  private def mcidsFromElem(e: StructElem): List[(Int, Int)] =
    e.kids.flatMap {
      case KidMCID(page, mcid) => List((page, mcid))
      case KidElem(c) => mcidsFromElem(c)
    }
}
