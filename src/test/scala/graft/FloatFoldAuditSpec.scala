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
    * matching. Interpolated `${...}` parens are masked on both sides,
    * so the depth stays balanced.
    */
  private def maskedRegions(text: String): Array[Boolean] = {
    val mask = new Array[Boolean](text.length)
    def mark(from: Int, until: Int): Int = {
      var k = from
      while (k < until && k < text.length) { mask(k) = true; k += 1 }
      math.min(until, text.length)
    }
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '"' && text.startsWith("\"\"\"", i)) {
        val end = text.indexOf("\"\"\"", i + 3)
        i = mark(i, if (end < 0) text.length else end + 3)
      } else if (c == '"') {
        var j = i + 1
        while (j < text.length && text.charAt(j) != '"') {
          if (text.charAt(j) == '\\') j += 1
          j += 1
        }
        i = mark(i, j + 1)
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
}
