package graft.functions

import scala.collection.mutable.ListBuffer

/** Minimal diff-match-patch text-patch engine (X6, SURVEY.md §2.10).
  *
  * Hive comment edits arrive as diff-match-patch patch text applied to
  * the stored body (reference: src/workers/hive-stream.ts:540-548).
  * We implement the published unidiff-like patch format ("@@ -l,s +l,s
  * @@" headers, ' '/'-'/'+' lines, %xx-encoded) from its public spec —
  * NOT a port of any dmp library. Divergence (documented): hunk
  * location uses exact context search (nearest match) instead of bitap
  * fuzzy matching; a hunk whose context cannot be found anywhere is
  * skipped — which composes with the reference's own fallback: any
  * *parse* failure replaces the body with the patch text verbatim
  * (hive-stream.ts:543-548), reproduced in [[applyOrReplace]].
  */
object Dmp {

  final case class Diff(op: Int, text: String) // -1 del, 0 eq, 1 ins
  final case class Patch(start1: Int, length1: Int,
                         start2: Int, length2: Int,
                         diffs: List[Diff])

  private val header =
    """^@@ -(\d+),?(\d*) \+(\d+),?(\d*) @@$""".r

  /** Decode %xx sequences (UTF-8), leaving malformed escapes alone —
    * mirrors decodeURI's tolerance for unencoded characters. */
  private[functions] def pctDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 <= s.length - 1) {
        val hex = s.substring(i + 1, i + 3)
        if (hex.forall(h => Character.digit(h, 16) >= 0)) {
          out.write(Integer.parseInt(hex, 16))
          i += 3
        } else { out.write(c.toString.getBytes("UTF-8")); i += 1 }
      } else {
        out.write(c.toString.getBytes("UTF-8")); i += 1
      }
    }
    out.toString("UTF-8")
  }

  private[functions] def pctEncode(s: String): String = {
    val keep = Set('!', '~', '*', '\'', '(', ')', ';', '/', '?', ':',
      '@', '&', '=', '+', '$', ',', '#', '-', '_', '.')
    s.flatMap {
      case c if c.isLetterOrDigit || keep(c) => c.toString
      case c => c.toString.getBytes("UTF-8")
        .map(b => f"%%${b & 0xff}%02X").mkString
    }
  }

  /** Parse patch text; throws IllegalArgumentException on malformed
    * input (the reference's catch branch relies on this). Empty input
    * parses to zero patches (⇒ apply is identity). */
  def patchFromText(text: String): List[Patch] = {
    if (text.isEmpty) return Nil
    val lines = text.split("\n", -1).toBuffer
    val patches = ListBuffer.empty[Patch]
    while (lines.nonEmpty && lines.head.nonEmpty) {
      val h = lines.head match {
        case header(s1, l1, s2, l2) =>
          val len1 = if (l1.isEmpty) 1 else l1.toInt
          val len2 = if (l2.isEmpty) 1 else l2.toInt
          // dmp headers are 1-based except length-0 hunks
          val st1 = if (len1 == 0) s1.toInt else s1.toInt - 1
          val st2 = if (len2 == 0) s2.toInt else s2.toInt - 1
          (st1, len1, st2, len2)
        case bad =>
          throw new IllegalArgumentException(s"Invalid patch string: $bad")
      }
      lines.remove(0)
      val diffs = ListBuffer.empty[Diff]
      var done = false
      while (lines.nonEmpty && !done) {
        val line = lines.head
        if (line.isEmpty) { lines.remove(0) } // blank line = empty ctx
        else line.charAt(0) match {
          case '@' => done = true
          case '+' => diffs += Diff(1, pctDecode(line.substring(1)))
            lines.remove(0)
          case '-' => diffs += Diff(-1, pctDecode(line.substring(1)))
            lines.remove(0)
          case ' ' => diffs += Diff(0, pctDecode(line.substring(1)))
            lines.remove(0)
          case other =>
            throw new IllegalArgumentException(
              s"Invalid patch mode '$other' in: $line")
        }
      }
      patches += Patch(h._1, h._2, h._3, h._4, diffs.toList)
    }
    patches.toList
  }

  def patchToText(patches: List[Patch]): String =
    patches.map { p =>
      val c1 = if (p.length1 == 0) s"${p.start1},0"
        else if (p.length1 == 1) s"${p.start1 + 1}"
        else s"${p.start1 + 1},${p.length1}"
      val c2 = if (p.length2 == 0) s"${p.start2},0"
        else if (p.length2 == 1) s"${p.start2 + 1}"
        else s"${p.start2 + 1},${p.length2}"
      s"@@ -$c1 +$c2 @@\n" + p.diffs.map { d =>
        val m = d.op match { case 1 => "+"; case -1 => "-"; case _ => " " }
        m + pctEncode(d.text) + "\n"
      }.mkString
    }.mkString

  /** Apply patches; returns (newText, perHunkApplied). Location: try
    * the expected offset first, then nearest exact occurrence of the
    * hunk's source text. */
  def patchApply(patches: List[Patch], text0: String)
      : (String, List[Boolean]) = {
    var text = text0
    var delta = 0
    val results = patches.map { p =>
      val expected = p.diffs.filter(d => d.op <= 0).map(_.text).mkString
      val replacement = p.diffs.filter(d => d.op >= 0).map(_.text).mkString
      val want = p.start2 + delta
      val at =
        if (expected.isEmpty) math.min(math.max(want, 0), text.length)
        else if (want >= 0 && want <= text.length - expected.length &&
          text.regionMatches(want, expected, 0, expected.length)) want
        else {
          val fwd = text.indexOf(expected, math.max(want, 0))
          val bwd = text.lastIndexOf(expected,
            math.min(want, text.length - 1))
          (fwd, bwd) match {
            case (-1, -1) => -1
            case (-1, b) => b
            case (f, -1) => f
            case (f, b) => if (math.abs(f - want) <= math.abs(b - want))
              f else b
          }
        }
      if (at < 0) false
      else {
        text = text.substring(0, at) + replacement +
          text.substring(at + expected.length)
        delta += replacement.length - expected.length
        true
      }
    }
    (text, results)
  }

  /** The reference's edit semantics (hive-stream.ts:540-548): parse
    * the incoming body as patch text and apply to the stored body; if
    * it isn't a parseable patch, the incoming body verbatim becomes
    * the new body. */
  def applyOrReplace(incoming: String, stored: String): String =
    try patchApply(patchFromText(incoming), stored)._1
    catch { case _: IllegalArgumentException => incoming }

  /** Build a patch from old→new text (single hunk, common prefix/
    * suffix trimmed, up to `margin` context chars) — enough to
    * round-trip with [[patchApply]] in tests and to emit edits. */
  def patchMake(a: String, b: String, margin: Int = 4): List[Patch] = {
    if (a == b) return Nil
    var pre = 0
    val maxPre = math.min(a.length, b.length)
    while (pre < maxPre && a.charAt(pre) == b.charAt(pre)) pre += 1
    var suf = 0
    val maxSuf = math.min(a.length, b.length) - pre
    while (suf < maxSuf &&
      a.charAt(a.length - 1 - suf) == b.charAt(b.length - 1 - suf)) suf += 1
    val delText = a.substring(pre, a.length - suf)
    val insText = b.substring(pre, b.length - suf)
    val ctxPre = a.substring(math.max(0, pre - margin), pre)
    val ctxSuf = a.substring(a.length - suf,
      math.min(a.length, a.length - suf + margin))
    val diffs = List(
      Option.when(ctxPre.nonEmpty)(Diff(0, ctxPre)),
      Option.when(delText.nonEmpty)(Diff(-1, delText)),
      Option.when(insText.nonEmpty)(Diff(1, insText)),
      Option.when(ctxSuf.nonEmpty)(Diff(0, ctxSuf))).flatten
    val start = pre - ctxPre.length
    val len1 = ctxPre.length + delText.length + ctxSuf.length
    val len2 = ctxPre.length + insText.length + ctxSuf.length
    List(Patch(start, len1, start, len2, diffs))
  }
}
