package graft.core

/** Paragraph region on a page: 1-based page number, 1-based paragraph
  * index, bounding box, and the paragraph text (reference PDF.Page
  * PageRegion, Page.hs:93-99). */
final case class PageRegion(page: Int, paragraph: Int, bbox: Rect, text: String)

/** Page-level structured-extraction API: paragraphs WITH geometry — the
  * layout-aware chunking primitive (RAG chunk boundaries, figure-caption
  * pairing). Mirrors the reference's public page API (Page.hs:26-117);
  * everything here composes the existing interpreter + layout kernel, so
  * region text is byte-identical to the paragraph text the document
  * extractors emit. */
object Page {

  /** Paragraph bounding box from its layout lines (Page.hs:147-154):
    * inline extent on x, [baseline - size, baseline] on y; the empty group
    * (a fallback page's placeholder) is Rect(0,0,0,0). */
  def paraBBox(ls: List[Line]): Rect = ls match {
    case Nil => Rect(0, 0, 0, 0)
    case _ => Rect(
      ls.iterator.map(_.inlineStart).min,
      ls.iterator.map(l => l.baseline - l.size).min,
      ls.iterator.map(_.inlineEnd).max,
      ls.iterator.map(_.baseline).max)
  }

  /** Per-page paragraph regions without document-level cross-page merge
    * (Page.hs:105-117): paragraph texts and line groups come from the SAME
    * layout pass, zipped positionally — layoutParagraphs and
    * pageItemParagraphGroups run the identical grouping, so index i of one
    * is paragraph i of the other (fallback pages produce empty groups and
    * a zero bbox, reference parity). */
  def pageRegions(pageNo: Int, opts: Layout.LayoutOptions,
      items: List[PageItem]): List[PageRegion] = {
    val texts = Layout.layoutParagraphs(opts, items)
    val groups = Layout.pageItemParagraphGroups(opts, items)
    texts.zip(groups).zipWithIndex.map { case ((txt, grp), i) =>
      PageRegion(pageNo, i + 1, paraBBox(grp), txt)
    }
  }
}
