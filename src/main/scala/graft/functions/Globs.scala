package graft.functions

/** Glob → Java/RE2-compatible regex, mirroring Python `fnmatch.translate`
  * semantics (reference operator F3, `data_downloader.py:155`): `*` matches
  * any run (including `/` — fnmatch is not path-aware), `?` any single char,
  * `[seq]` a character class, `[!seq]` its negation, unterminated `[`
  * literal. POSIX case-sensitivity is pinned (SURVEY.md §7.3).
  *
  * This is a plan-time helper: the produced regex is used as an `rlike`
  * literal, so Catalyst constant-folds it — no UDF, no codegen break.
  * Avoids `\Q..\E` quoting so the same regex is valid in RE2 (DuckDB oracle).
  */
object Globs {

  private val regexSpecial = "\\^$.|?*+()[]{}".toSet

  private def quoteChar(c: Char): String =
    if (regexSpecial(c)) "\\" + c else c.toString

  /** Translate a glob to an anchored regex (match must cover whole string). */
  def globToRegex(pat: String): String = {
    val sb = new StringBuilder("^(?s)")
    var i = 0
    while (i < pat.length) {
      val c = pat(i); i += 1
      c match {
        case '*' => sb.append(".*")
        case '?' => sb.append(".")
        case '[' =>
          var j = i
          if (j < pat.length && pat(j) == '!') j += 1
          if (j < pat.length && pat(j) == ']') j += 1
          while (j < pat.length && pat(j) != ']') j += 1
          if (j >= pat.length) sb.append("\\[")
          else {
            var stuff = pat.substring(i, j).replace("\\", "\\\\")
            i = j + 1
            if (stuff.startsWith("!")) stuff = "^" + stuff.substring(1)
            else if (stuff.startsWith("^")) stuff = "\\" + stuff
            sb.append('[').append(stuff).append(']')
          }
        case other => sb.append(quoteChar(other))
      }
    }
    sb.append("$").toString
  }

  /** Driver-side glob match (used by plan-time code and tests). */
  def matches(pat: String, name: String): Boolean =
    java.util.regex.Pattern.compile(globToRegex(pat)).matcher(name).find()
}
