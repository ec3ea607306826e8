package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Ruby pairing and footnote inlining on hand-built lines (mirrors the
  * reference Unit.hs ruby/footnote groups). */
class LayoutExtrasSpec extends AnyFunSuite {

  private def line(text: String, baseline: Double, start: Double, end: Double,
      size: Double, markers: List[(Int, String)] = Nil): Line =
    Line(baseline, start, end, size, start, 0, text, markers, lastSuper = false)

  test("ruby line merges into its base (suppressed by default)") {
    val body = line("漢字", 100, 50, 90, 10)
    val ruby = line("かんじ", 108, 50, 90, 5)
    val merged = Ruby.mergeInterleavedRubyLines(0, includeRuby = false, List(body, ruby))
    assert(merged.map(_.text) == List("漢字"))
  }

  test("ruby in Aozora notation when enabled") {
    val body = line("漢字", 100, 50, 90, 10)
    val ruby = line("かんじ", 108, 50, 90, 5)
    val merged = Ruby.mergeInterleavedRubyLines(0, includeRuby = true, List(body, ruby))
    assert(merged.map(_.text) == List("漢字《かんじ》"))
  }

  test("aozora bar for mixed-script bases") {
    assert(Ruby.aozoraRuby("漢字かな", "よみ") == "漢字かな｜《よみ》")
    assert(Ruby.aozoraRuby("漢字", "よみ") == "漢字《よみ》")
  }

  test("footnote block inlined at its body anchor") {
    val body = line("Main claim†1 continues", 700, 72, 300, 10, markers = List((10, "†1")))
    val other = line("Another body line here", 688, 72, 300, 10)
    val note = line("†1 Footnote body text", 50, 72, 200, 6)
    val out = Footnotes.inlineFootnotes(Nil, List(body, other, note))
    assert(out.map(_.text) == List(
      "Main claim<footnote>Footnote body text</footnote> continues",
      "Another body line here"))
  }

  test("unanchored footnote blocks are kept") {
    val body = line("No marker here at all!", 700, 72, 300, 10)
    val note = line("†2 Orphan footnote", 50, 72, 200, 6)
    val out = Footnotes.inlineFootnotes(Nil, List(body, note))
    assert(out.map(_.text) == List("No marker here at all!", "†2 Orphan footnote"))
  }
}
