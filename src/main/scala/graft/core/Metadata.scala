package graft.core

import PObj._
import DocStructure.{Dict, Document, findDict}

/** Metadata / outline / trailer query surface (reference src/PDF/Outlines.hs
  * and app/Cli/Misc.hs verbs `info`, `title`, `toc`, `trailer`, `refs`).
  * Emitted as structured rows rather than pretty prints so the Spark layer
  * can expose them as columns. */
object Metadata {

  final case class TocEntry(depth: Int, title: String, destPage: Int)

  /** /Info dict as a deterministic (sorted-key) JSON string. */
  def infoJson(doc: Document): Option[String] =
    doc.infoDict.toOption.map(dictToJson)

  def title(doc: Document): Option[String] =
    doc.infoDict.toOption.flatMap(_.get("/Title")).map {
      case PText(s) => s
      case other => ppObj(other)
    }

  def trailerJson(doc: Document): String = dictToJson(doc.trailer)

  def pageRefs(doc: Document): List[Int] =
    DocStructure.pageRefs(doc).getOrElse(Nil)

  /** Flattened outline tree in document order (Outlines.hs:47-106):
    * /Outlines -> /First -> /Next chain, children at depth+1, destinations
    * via /Dest arrays, /A GoTo actions, and the /Names/Dests name tree with
    * /Limits pruning. */
  def toc(doc: Document): List[TocEntry] = {
    val rootDictOpt = for {
      rootref <- doc.rootRef.toOption
      rootobj <- doc.objsByRef(rootref)
      dict <- findDict(rootobj)
    } yield dict
    rootDictOpt match {
      case None => Nil
      case Some(rootDict) =>
        val destsRoot = destsRootRef(rootDict, doc)
        val outline = rootDict.get("/Outlines") match {
          case Some(PRef(x)) => doc.findDictByRef(x)
          case _ => None
        }
        outline.flatMap(d => d.get("/First") match {
          case Some(PRef(first)) => doc.findDictByRef(first).map((_, destsRoot))
          case _ => None
        }) match {
          case Some((firstDict, dr)) => gather(firstDict, doc, dr, 0, Set.empty)
          case None => Nil
        }
    }
  }

  /** Outline nesting cap (Structure.scala uses the same bound for /K). */
  private val MaxTocDepth = 512

  /** The /Next sibling chain is walked ITERATIVELY (a 50k-entry chain
    * recursed one stack frame per sibling and threw StackOverflowError);
    * only /First (nesting) recurses, bounded by MaxTocDepth. Entry order
    * is identical to the recursive form: node, its subtree, next sibling.
    * The visited set accumulates across siblings (slightly more
    * conservative than path-threading on crafted shared structures — a
    * node referenced from two siblings expands once, which also bounds
    * diamond blowup). */
  private def gather(dict0: Dict, doc: Document, destsRoot: Option[Int],
      depth: Int, visited0: Set[Int]): List[TocEntry] = {
    if (depth > MaxTocDepth) return Nil
    val out = new scala.collection.mutable.ListBuffer[TocEntry]
    var visited = visited0
    var cur: Option[Dict] = Some(dict0)
    while (cur.isDefined) {
      val dict = cur.get
      val dest = findDest(dict, doc, destsRoot).headOption.getOrElse(0)
      val titleText = dict.get("/Title") match {
        case Some(PText(s)) => s
        case Some(PRef(r)) => doc.objsByRef(r) match {
          case Some(List(PText(s))) => s
          case _ => ""
        }
        case Some(x) => ppObj(x)
        case None => ""
      }
      out += TocEntry(depth, titleText, dest)
      dict.get("/First") match {
        case Some(PRef(r)) if !visited.contains(r) =>
          visited += r
          out ++= doc.findDictByRef(r)
            .map(gather(_, doc, destsRoot, depth + 1, visited)).getOrElse(Nil)
        case _ => ()
      }
      cur = dict.get("/Next") match {
        case Some(PRef(r)) if !visited.contains(r) =>
          visited += r
          doc.findDictByRef(r)
        case _ => None
      }
    }
    out.toList
  }

  /** /Root -> /Names -> /Dests named-destination tree root. */
  private def destsRootRef(rootDict: Dict, doc: Document): Option[Int] = {
    val names: Option[Dict] = rootDict.get("/Names") match {
      case Some(PDict(n)) => Some(n)
      case Some(PRef(r)) => doc.findDictByRef(r)
      case _ => None
    }
    names.flatMap(_.get("/Dests")).collect { case PRef(r) => r }
  }

  private def findDest(dict: Dict, doc: Document, destsRoot: Option[Int]): List[Int] =
    dict.get("/Dest") match {
      case Some(o) => destFromObj(o, doc)
      case None => dict.get("/A") match {
        case Some(PRef(r)) => doc.findDictByRef(r).map(destFromAction(_, doc, destsRoot)).getOrElse(Nil)
        case Some(PDict(d)) => destFromAction(d, doc, destsRoot)
        case _ => Nil
      }
    }

  private def destFromObj(o: PObj, doc: Document): List[Int] = o match {
    case PArray(a) => Lexer.refsOf(a)
    case PRef(r) => doc.objsByRef(r) match {
      case Some(oo :: _) => destFromObj(oo, doc)
      case _ => Nil
    }
    case PNum(n) if Util.hsTruncate(n) >= 0 => List(Util.hsTruncate(n))
    case _ => Nil
  }

  private def destFromAction(d: Dict, doc: Document, destsRoot: Option[Int]): List[Int] =
    d.get("/D") match {
      case Some(o) => objAsName(o) match {
        case Some(name) => lookupNamedDest(destsRoot, name, doc)
        case None => destFromObj(o, doc)
      }
      case None => Nil
    }

  private def objAsName(o: PObj): Option[String] = o match {
    case PName(n) => Some(n)
    case PText(t) => Some(t)
    case _ => None
  }

  private def lookupNamedDest(root: Option[Int], name: String, doc: Document): List[Int] =
    root match {
      case None => Nil
      case Some(r) => lookupNameNode(r, name, doc, Set.empty) match {
        case Some(o) => destFromNamedDest(o, doc)
        case None => Nil
      }
    }

  private def lookupNameNode(ref: Int, name: String, doc: Document,
      visited: Set[Int]): Option[PObj] = {
    if (visited.contains(ref)) return None
    doc.findDictByRef(ref).flatMap { d =>
      d.get("/Names") match {
        case Some(PArray(arr)) => lookupNamePair(arr.toList, name)
        case _ => d.get("/Kids") match {
          case Some(PArray(kids)) =>
            kids.collect { case PRef(r) => r }
              .filter(nameInLimits(name, _, doc))
              .view.flatMap(lookupNameNode(_, name, doc, visited + ref)).headOption
          case _ => None
        }
      }
    }
  }

  private def lookupNamePair(arr: List[PObj], name: String): Option[PObj] = arr match {
    case n :: v :: rest => objAsName(n) match {
      case Some(t) if t == name => Some(v)
      case _ => lookupNamePair(rest, name)
    }
    case _ => None
  }

  private def nameInLimits(name: String, ref: Int, doc: Document): Boolean =
    doc.findDictByRef(ref) match {
      case None => true
      case Some(d) => d.get("/Limits") match {
        case Some(PArray(Vector(lo, hi))) =>
          (objAsName(lo), objAsName(hi)) match {
            case (Some(a), Some(b)) => a <= name && name <= b
            case _ => true
          }
        case _ => true
      }
    }

  private def destFromNamedDest(o: PObj, doc: Document): List[Int] = o match {
    case PRef(r) => doc.objsByRef(r) match {
      case Some(destObj :: _) => destObj match {
        case PDict(d) => d.get("/D") match {
          case Some(dd) => destFromObj(dd, doc)
          case None => destFromObj(destObj, doc)
        }
        case _ => destFromObj(destObj, doc)
      }
      case _ => Nil
    }
    case PDict(d) => d.get("/D").map(destFromObj(_, doc)).getOrElse(Nil)
    case _ => destFromObj(o, doc)
  }

  /** `hpdft object -r N` analogue: pretty-print one object (streams
    * summarized). */
  def objectAt(doc: Document, ref: Int): Option[String] =
    doc.objsByRef(ref).map(os => "[" + os.map(ppObj).mkString(", ") + "]")

  // ---------- pretty-printing (Definition.hs ppObj) ----------

  def ppObj(o: PObj): String = o match {
    case PDict(d) => d.map { case (k, v) => s"\n$k: ${ppObj(v)}" }.mkString
    case PText(t) => t
    case PStream(s) => "\n  <stream " + s.length + " bytes>"
    case PNum(r) => r.toString
    case PHex(h) => h
    case PArray(a) => a.map(ppObj).mkString(", ")
    case PBool(b) => b.toString
    case PName(n) => n
    case PRef(i) => i.toString
    case PNull => ""
  }

  private def dictToJson(d: Dict): String = {
    def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def jsonVal(o: PObj): String = o match {
      case PDict(dd) => dd.map { case (k, v) => jsonStr(k) + ":" + jsonVal(v) }.mkString("{", ",", "}")
      case PText(t) => jsonStr(t)
      case PStream(s) => jsonStr(s"<stream ${s.length}>")
      case PNum(n) => if (n == n.toLong.toDouble) n.toLong.toString else n.toString
      case PHex(h) => jsonStr(h)
      case PArray(a) => a.map(jsonVal).mkString("[", ",", "]")
      case PBool(b) => b.toString
      case PName(n) => jsonStr(n)
      case PRef(i) => jsonStr(i + " 0 R")
      case PNull => "null"
    }
    d.map { case (k, v) => jsonStr(k) + ":" + jsonVal(v) }.mkString("{", ",", "}")
  }
}
