package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md rot gate (r13 VERDICT #3): the operator->gate inventory
  * went stale twice (r11, r13), so completeness is now CI-enforced the
  * way `CatalogIntegritySpec` enforces query/oracle pairing:
  *  - every `SparkEntry.queries` key must appear in COVERAGE.md (a new
  *    birth without an inventory row fails the suite);
  *  - every query named in the generated "Full catalog inventory"
  *    section must still exist in the catalog (no stale rows).
  */
class CoverageInventorySpec extends AnyFunSuite {

  private lazy val coverage = {
    val s = scala.io.Source.fromFile("COVERAGE.md", "UTF-8")
    try s.mkString finally s.close()
  }

  test("every catalog query appears in COVERAGE.md") {
    // Whole-token match (ADVICE r14): substring containment let a
    // query whose name prefixes another (q_ses inside q_ses_by_nation)
    // pass with no row of its own. `_` is a word char, so \b after
    // q_ses does NOT match inside q_ses_by_nation.
    val tokens = """\bq_\w+\b""".r.findAllIn(coverage).toSet
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(tokens)
    assert(missing.isEmpty,
      s"catalog queries without a COVERAGE.md row (add one to the " +
        s"current round's section AND the generated inventory):\n  " +
        missing.mkString("\n  "))
  }

  test("every inventory implementation cell names a real symbol") {
    // VERDICT r14 #6: the old generator attributed the nearest
    // preceding `def`, producing wrong impl cells (q_winnow ->
    // Bloom.build). tools/gen_coverage.py now attributes the first
    // graft call in the registration body; this gate pins that every
    // `Obj.meth` cell resolves to an object/class Obj whose file
    // defines meth (def or val).
    val idx = coverage.indexOf("## Full catalog inventory")
    assert(idx >= 0, "the generated inventory section is missing")
    val rows = """(?m)^\| (q_\w+) \| `([^`]+)` \| `([^`]+)` \|""".r
      .findAllMatchIn(coverage.substring(idx)).toSeq
    assert(rows.nonEmpty, "no inventory rows parsed")
    val srcDir = new java.io.File("src/main/scala/graft")
    def allScala(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(allScala)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val sources = allScala(srcDir).map { f =>
      val s = scala.io.Source.fromFile(f, "UTF-8")
      try s.mkString finally s.close()
    }
    val bad = rows.flatMap { m =>
      m.group(3) match {
        case "inline plan" => None
        case cell =>
          val Array(obj, meth) = cell.split("\\.", 2)
          val ok = sources.exists { src =>
            (s"""(?m)^\\s*(?:case\\s+)?(?:object|class)\\s+$obj\\b""").r
              .findFirstIn(src).isDefined &&
            (s"""(?m)\\b(?:def|val)\\s+$meth\\b""").r
              .findFirstIn(src).isDefined
          }
          if (ok) None else Some(s"${m.group(1)} -> $cell")
      }
    }
    assert(bad.isEmpty,
      s"inventory impl cells naming symbols that don't resolve:\n  " +
        bad.mkString("\n  "))
  }

  test("the generated inventory section has no stale rows") {
    val idx = coverage.indexOf("## Full catalog inventory")
    assert(idx >= 0, "the generated inventory section is missing")
    val known = SparkEntry.queries.keySet
    val stale = """\bq_\w+\b""".r.findAllIn(coverage.substring(idx))
      .toSet.filterNot(known)
    assert(stale.isEmpty,
      s"inventory rows for queries no longer in the catalog:\n  " +
        stale.toSeq.sorted.mkString("\n  "))
  }
}
