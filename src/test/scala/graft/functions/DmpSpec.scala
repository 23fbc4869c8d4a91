package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class DmpSpec extends AnyFunSuite {

  test("patchMake → patchToText → patchFromText → patchApply round-trips") {
    val a = "The quick brown fox jumps over the lazy dog"
    val b = "The quick red fox leaps over the lazy dog"
    val text = Dmp.patchToText(Dmp.patchMake(a, b))
    assert(text.startsWith("@@ "))
    val (applied, results) = Dmp.patchApply(Dmp.patchFromText(text), a)
    assert(applied == b)
    assert(results.forall(identity))
  }

  test("empty patch text applies as identity (reference: edit with empty body)") {
    assert(Dmp.patchFromText("").isEmpty)
    assert(Dmp.applyOrReplace("", "stored body") == "stored body")
  }

  test("non-patch body replaces verbatim (hive-stream.ts:543-548 fallback)") {
    assert(Dmp.applyOrReplace("just a new body", "old body")
      == "just a new body")
  }

  test("malformed hunk header falls back to replace") {
    assert(Dmp.applyOrReplace("@@ broken", "old") == "@@ broken")
  }

  test("percent-encoding round-trips specials and unicode") {
    val s = "a%b\nc d\tñ→"
    assert(Dmp.pctDecode(Dmp.pctEncode(s)) == s)
    assert(Dmp.pctDecode("caf%C3%A9") == "café")
  }

  test("patch applies at drifted offset via context search") {
    val a = "xxxx hello world yyyy"
    val b = "xxxx hello there world yyyy"
    val patch = Dmp.patchToText(Dmp.patchMake(a, b))
    // same edit against a shifted base
    val shifted = "PREFIX " + a
    val (applied, ok) = Dmp.patchApply(Dmp.patchFromText(patch), shifted)
    assert(ok.forall(identity))
    assert(applied == "PREFIX " + b)
  }

  test("unfindable context leaves text unchanged, reports failure") {
    val patch = Dmp.patchToText(Dmp.patchMake("abcdef", "abXdef"))
    val (applied, ok) = Dmp.patchApply(Dmp.patchFromText(patch),
      "completely different")
    assert(!ok.head)
    assert(applied == "completely different")
  }

  test("property: 500 random word edits round-trip through patch text") {
    val rng = new scala.util.Random(42)
    def word() = rng.alphanumeric.take(1 + rng.nextInt(8)).mkString
    (1 to 500).foreach { _ =>
      val ws = Vector.fill(3 + rng.nextInt(12))(word())
      val a = ws.mkString(" ")
      val b = ws.updated(rng.nextInt(ws.size), word()).mkString(" ")
      val text = Dmp.patchToText(Dmp.patchMake(a, b))
      assert(Dmp.applyOrReplace(text, a) == b,
        s"failed for a='$a' b='$b' patch='$text'")
    }
  }
}
