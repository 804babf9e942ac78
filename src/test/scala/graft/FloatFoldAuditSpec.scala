package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static audit for SHUFFLE-ORDER-DEPENDENT float folds (VERDICT r11
  * #5, promoting PLANS.md's grep discipline to CI): a `sum`/`avg`/
  * `mean` whose ARGUMENT is double-typed folds IEEE adds in shuffle
  * arrival order — two runs of the same plan can differ in the last
  * ulp, and a 6-dp round only hides it until a boundary value lands
  * on the snap edge. The repo's determinism idioms are: fold exact
  * integers / DECIMAL(38,0) and cast to double AFTER (the
  * `sum(x).cast("double")` shape, which this audit ignores), or the
  * sorted-fold device (collect_list + sort_array + aggregate).
  *
  * The scan is paren-matched, not line-based, so multi-line
  * arguments can't hide a violation. Allowlisted exceptions must be
  * k-row-bounded folds with a documented snap.
  */
class FloatFoldAuditSpec extends AnyFunSuite {

  /** (file basename, substring of the offending argument) pairs that
    * are audited-safe:
    *  - marginBitext's two avg legs fold exactly k = 4 top-k scores
    *    per query (bounded, 6-dp snapped margin; oracle-matched by
    *    q_bitext_margin).
    */
  private val allowlist: Set[(String, String)] = Set(
    ("Similarity.scala", """avg(col("score").cast("double"))"""))

  private def scalaSources: Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    walk(new java.io.File("src/main/scala"))
  }

  /** Positions inside string/char literals or comments (r12 ADVICE:
    * a ')' inside a string within a fold argument truncated the
    * captured argument and could misclassify as the codebase grows).
    * The scan keeps the RAW text (line numbers, `cast("double")`
    * lookups inside arguments) and only consults this mask to (a)
    * drop call matches that start inside literals/comments — SQL twin
    * text is data, not code — and (b) skip masked parens while depth
    * matching. `${...}` interpolation BODIES stay UNMASKED (r13
    * ADVICE: a fold built inside an interpolated string must still be
    * scanned) — only the `${`/`}` delimiters and any string literal
    * nested inside the body are masked, so paren depth stays balanced
    * and the interior code is audited like any other code.
    */
  private def maskedRegions(text: String): Array[Boolean] = {
    val mask = new Array[Boolean](text.length)
    def mark(from: Int, until: Int): Int = {
      var k = from
      while (k < until && k < text.length) { mask(k) = true; k += 1 }
      math.min(until, text.length)
    }
    // Mask a plain `"..."` literal NESTED inside an interpolation
    // body (it is data again); returns the index after its close.
    def scanNested(start: Int): Int = {
      var k = start + 1
      mask(start) = true
      while (k < text.length && text.charAt(k) != '"') {
        if (text.charAt(k) == '\\') { mask(k) = true; k += 1 }
        if (k < text.length) { mask(k) = true; k += 1 }
      }
      if (k < text.length) { mask(k) = true; k += 1 }
      k
    }
    // Scan a string literal from its opening delimiter to its close,
    // masking literal text but leaving `${...}` bodies SCANNABLE
    // (delimiters and nested quoted literals masked). The terminator
    // search itself skips interpolation bodies, so a quote inside a
    // `${...}` does not end the literal. Returns the index after the
    // closing delimiter.
    def scanLiteral(start: Int, term: String): Int = {
      var k = mark(start, start + term.length)
      while (k < text.length && !text.startsWith(term, k)) {
        val ch = text.charAt(k)
        if (ch == '\\' && term == "\"") {
          mask(k) = true; k += 1
          if (k < text.length) { mask(k) = true; k += 1 }
        } else if (ch == '$' && k + 1 < text.length &&
            text.charAt(k + 1) == '$') {
          // "$$" is the interpolation ESCAPE for a literal '$'
          // (ADVICE r14): mask both, so a following '{' is literal
          // text, not an interpolation body to unmask.
          mask(k) = true; mask(k + 1) = true; k += 2
        } else if (ch == '$' && k + 1 < text.length &&
            text.charAt(k + 1) == '{') {
          mask(k) = true; mask(k + 1) = true; k += 2
          var depth = 1
          while (k < text.length && depth > 0) {
            val c2 = text.charAt(k)
            if (c2 == '"') k = scanNested(k)
            else {
              if (c2 == '{') depth += 1
              else if (c2 == '}') depth -= 1
              if (c2 == '{' || c2 == '}') mask(k) = true
              k += 1
            }
          }
        } else { mask(k) = true; k += 1 }
      }
      mark(k, k + term.length)
    }
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '"' && text.startsWith("\"\"\"", i)) {
        i = scanLiteral(i, "\"\"\"")
      } else if (c == '"') {
        i = scanLiteral(i, "\"")
      } else if (c == '\'' && i + 2 < text.length &&
          (text.charAt(i + 2) == '\'' ||
            (text.charAt(i + 1) == '\\' && i + 3 < text.length &&
              text.charAt(i + 3) == '\''))) {
        i = mark(i, if (text.charAt(i + 1) == '\\') i + 4 else i + 3)
      } else if (c == '/' && i + 1 < text.length &&
          text.charAt(i + 1) == '/') {
        var j = i
        while (j < text.length && text.charAt(j) != '\n') j += 1
        i = mark(i, j)
      } else if (c == '/' && i + 1 < text.length &&
          text.charAt(i + 1) == '*') {
        val end = text.indexOf("*/", i + 2)
        i = mark(i, if (end < 0) text.length else end + 2)
      } else i += 1
    }
    mask
  }

  test("no sum/avg/mean over a double-typed argument outside the " +
    "allowlist (fold exact, cast after — or sorted-fold)") {
    val callRe = """\b(sum|avg|mean)\(""".r
    val doubleRe = """cast\("double"\)|\.toDouble|lit\(\d+\.\d""".r
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    scalaSources.foreach { f =>
      val s = scala.io.Source.fromFile(f, "UTF-8")
      val text = try s.mkString finally s.close()
      val mask = maskedRegions(text)
      callRe.findAllMatchIn(text)
        .filterNot(m => mask(m.start)).foreach { m =>
        var depth = 1; var j = m.end
        while (depth > 0 && j < text.length) {
          if (mask(j)) ()
          else if (text.charAt(j) == '(') depth += 1
          else if (text.charAt(j) == ')') depth -= 1
          j += 1
        }
        val arg = text.substring(m.end, j - 1)
        // A fold whose OUTERMOST expression casts to an integral or
        // exact-decimal type sums exactly regardless of doubles inside
        // (e.g. sum(signum(dx).cast("long")) — the ±1 is snapped to a
        // long per row BEFORE the fold).
        val exactOutermost = arg.trim.replaceAll("\\s+", "")
          .matches("""(?s).*\.cast\("(long|int|bigint|decimal[^"]*)"\)$""")
        if (doubleRe.findFirstIn(arg).isDefined && !exactOutermost) {
          val call = s"${m.group(1)}($arg)".replaceAll("\\s+", " ")
          val allowed = allowlist.exists { case (base, frag) =>
            f.getName == base && call.replaceAll("\\s", "")
              .contains(frag.replaceAll("\\s", ""))
          }
          if (!allowed) {
            val line = text.substring(0, m.start).count(_ == '\n') + 1
            violations += s"${f.getPath}:$line: ${call.take(100)}"
          }
        }
      }
    }
    assert(violations.isEmpty,
      "shuffle-order-dependent float folds (fold exact ints/DECIMAL " +
        "and cast AFTER, or use the sorted-fold device):\n" +
        violations.mkString("\n"))
  }

  test("mask leaves ${...} interpolation bodies scannable (r13 ADVICE)") {
    // s"... ${sum(col("x").cast("double"))} ..." — the literal text is
    // masked, the interpolated fold is NOT, the nested "x"/"double"
    // literals inside the body ARE.
    val snippet = "val q = s\"SELECT ${sum(col(\"x\").cast(\"double\"))} t\""
    val mask = maskedRegions(snippet)
    assert(mask(snippet.indexOf("SELECT")), "literal text must be masked")
    assert(!mask(snippet.indexOf("sum(")), "interpolated call must be scannable")
    assert(!mask(snippet.indexOf(".cast")), "interpolated code must be scannable")
    assert(mask(snippet.indexOf("x")), "nested literal must be re-masked")
    assert(mask(snippet.indexOf("${") + 1), "delimiters must be masked")
    // Paren depth over unmasked chars stays balanced across the literal.
    val depth = snippet.indices.filterNot(mask).map(snippet.charAt).foldLeft(0) {
      case (d, '(') => d + 1
      case (d, ')') => d - 1
      case (d, _) => d
    }
    assert(depth === 0)
  }

  test("mask covers triple-quoted interpolation bodies the same way") {
    val tq = "\"\"\""
    val snippet = s"val q = s$tq a $${avg(col(${'"'}zz${'"'}))} b $tq"
    val mask = maskedRegions(snippet)
    assert(!mask(snippet.indexOf("avg(")))
    assert(mask(snippet.indexOf(" a ") + 1))
    assert(mask(snippet.indexOf("zz")))
  }
}
