package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** F3 glob fidelity vs Python fnmatch semantics (SURVEY.md §5.2.3, §7.3). */
class GlobsSpec extends AnyFunSuite {

  /** Independent reference implementation of fnmatch-style matching
    * (recursive descent, no regex) to property-test globToRegex against.
    */
  private def refMatch(pat: String, name: String): Boolean = {
    def go(p: Int, n: Int): Boolean = {
      if (p >= pat.length) n >= name.length
      else pat(p) match {
        case '*' =>
          (n to name.length).exists(k => go(p + 1, k))
        case '?' =>
          n < name.length && go(p + 1, n + 1)
        case '[' =>
          var j = p + 1
          if (j < pat.length && pat(j) == '!') j += 1
          if (j < pat.length && pat(j) == ']') j += 1
          while (j < pat.length && pat(j) != ']') j += 1
          if (j >= pat.length) n < name.length && name(n) == '[' && go(p + 1, n + 1)
          else {
            if (n >= name.length) return false
            val neg = pat(p + 1) == '!'
            val body = pat.substring(if (neg) p + 2 else p + 1, j)
            val c = name(n)
            var hit = false
            var i = 0
            while (i < body.length) {
              if (i + 2 < body.length && body(i + 1) == '-') {
                if (body(i) <= c && c <= body(i + 2)) hit = true
                i += 3
              } else {
                if (body(i) == c) hit = true
                i += 1
              }
            }
            (hit != neg) && go(j + 1, n + 1)
          }
        case ch =>
          n < name.length && name(n) == ch && go(p + 1, n + 1)
      }
    }
    go(0, 0)
  }

  test("fixture glob matches the reference corpus") {
    assert(Globs.matches("data_*.zip", "data_20260811.zip"))
    assert(Globs.matches("data_*.zip", "data_20260812.zip"))
    assert(!Globs.matches("data_*.zip", "readme.txt"))
    assert(!Globs.matches("data_*.zip", "archive"))
    assert(!Globs.matches("data_*.zip", "data_x.zip.bak"))
  }

  test("glob metachars") {
    assert(Globs.matches("?.csv", "a.csv"))
    assert(!Globs.matches("?.csv", "ab.csv"))
    assert(Globs.matches("[abc]*", "b123"))
    assert(!Globs.matches("[!abc]*", "b123"))
    assert(Globs.matches("[a-c]x", "bx"))
    assert(Globs.matches("a[", "a["))          // unterminated class is literal
    assert(Globs.matches("*", ""))
    assert(Globs.matches("a.b", "a.b"))
    assert(!Globs.matches("a.b", "axb"))       // '.' must not be regex-dot
    assert(!Globs.matches("A*", "a"))          // POSIX case-sensitive
  }

  test("property: globToRegex agrees with the reference matcher (5000 seeded cases)") {
    val rnd = new scala.util.Random(42)
    val patAtoms = Seq("*", "?", ".", "-", "_", "[ab]", "[!a]", "[a-c]")
    val nameChars = "ab.z-_019"
    for (_ <- 1 to 5000) {
      val pat = Seq.fill(rnd.nextInt(6) + 1)(
        if (rnd.nextBoolean()) patAtoms(rnd.nextInt(patAtoms.length))
        else nameChars(rnd.nextInt(nameChars.length)).toString).mkString
      val name = Seq.fill(rnd.nextInt(8))(
        nameChars(rnd.nextInt(nameChars.length))).mkString
      assert(Globs.matches(pat, name) === refMatch(pat, name),
        s"pattern=$pat name=$name")
    }
  }
}
