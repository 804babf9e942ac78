#!/usr/bin/env python3
"""Regenerate COVERAGE.md's "## Full catalog inventory" section.

Attribution rule (VERDICT r14 #6): the implementation cell names the
FIRST graft operator/function invoked inside the query's REGISTRATION
BODY — not the nearest preceding `def` in the file (the r14
generator's bug, which attributed q_winnow to Bloom.build, q_winsorize
to Graph.degreeGini, q_vocab to Profile.psiDrift). A registration
whose plan is built inline from Spark built-ins alone is labeled
`inline plan`.

Usage: python3 tools/gen_coverage.py          # rewrites COVERAGE.md
       python3 tools/gen_coverage.py --check  # exit 1 if stale
"""
import re, sys, subprocess, pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "src/main/scala/graft"
CATALOGS = ["RelationalCatalog.scala", "IngestCatalog.scala",
            "PipelineCatalog.scala", "ScaleCatalog.scala",
            "AnalyticsCatalog.scala"]
# Input/plumbing objects that never count as "the implementation".
BLOCK = {"Tables", "Canonical", "SparkEntry", "Bench", "Verify"}

def graft_objects():
    """(object name) -> file defining it, over all of src/main."""
    out = {}
    for p in SRC.rglob("*.scala"):
        for m in re.finditer(r"^\s*(?:case\s+)?(?:object|class)\s+(\w+)",
                             p.read_text(), re.M):
            out.setdefault(m.group(1), p)
    return out

def registrations():
    """[(query, file, line, body)] from each catalog's queries map
    (the region between `val queries` and `val oracleSql`)."""
    regs = []
    for cat in CATALOGS:
        path = SRC / cat
        text = path.read_text()
        lines = text.split("\n")
        start = next(i for i, l in enumerate(lines) if "val queries" in l)
        end = next(i for i, l in enumerate(lines) if "val oracleSql" in l)
        region = "\n".join(lines[start:end])
        hits = list(re.finditer(r'"(q_\w+)"\s*->', region))
        for i, m in enumerate(hits):
            body_end = hits[i + 1].start() if i + 1 < len(hits) else len(region)
            line = start + 1 + region[:m.start()].count("\n")
            regs.append((m.group(1), cat, line, region[m.end():body_end],
                         text))
    return regs

def local_helpers(cat_text, cat_name, objs):
    """File-local `def` helpers resolved one level deep: a registration
    that only calls `parsed(s, d)` is attributed to the graft operator
    the helper itself invokes (e.g. Parse.parsed), falling back to
    `<Catalog>.<helper>`."""
    out = {}
    defs = list(re.finditer(r"^  (?:private\s+)?def (\w+)\(", cat_text, re.M))
    for i, m in enumerate(defs):
        end = defs[i + 1].start() if i + 1 < len(defs) else len(cat_text)
        body = cat_text[m.end():end]
        direct = first_obj_call(body, objs)
        out[m.group(1)] = direct or f"{cat_name}.{m.group(1)}"
    return out

def first_obj_call(body, objs):
    for m in re.finditer(r"\b([A-Z]\w*)\.(\w+)\b", body):
        obj, meth = m.groups()
        if obj in objs and obj not in BLOCK and meth[:1].islower():
            return f"{obj}.{meth}"
    return None

def impl_of(body, objs, helpers):
    # First graft reference wins, whether a direct Object.method call
    # or a file-local helper (resolved through local_helpers).
    for m in re.finditer(r"\b([A-Z]\w*)\.(\w+)\b|\b([a-z]\w*)\(", body):
        if m.group(1):
            obj, meth = m.group(1), m.group(2)
            if obj in objs and obj not in BLOCK and meth[:1].islower():
                return f"{obj}.{meth}"
        elif m.group(3) in helpers:
            return helpers[m.group(3)]
    return "inline plan"

def main():
    objs = graft_objects()
    helper_cache = {}
    def helpers_for(cat, text):
        if cat not in helper_cache:
            helper_cache[cat] = local_helpers(text, cat[:-len(".scala")],
                                             objs)
        return helper_cache[cat]
    rows = sorted((q, f, ln, impl_of(b, objs, helpers_for(f, t)))
                  for q, f, ln, b, t in registrations())
    header = """## Full catalog inventory (mechanically generated — tools/gen_coverage.py)

One row per `SparkEntry.queries` entry — ALL are differentially
oracle-gated (rows+schema+hash vs DuckDB at sf0.01; builder full sweeps
at sf0.001). Line numbers are the registration sites at generation time
and may drift; `CoverageInventorySpec` gates NAME completeness (every
catalog query appears in this file, no stale rows) AND that every
implementation cell names a symbol that exists in the codebase, so the
inventory cannot rot silently again (r13 VERDICT #3, r14 VERDICT #6).
The implementation cell is the first graft operator the registration
body invokes; `inline plan` = the registration composes Spark
built-ins directly.

| query | registered in | implementation | gate |
|---|---|---|---|
"""
    table = "".join(f"| {q} | `{f}:{ln}` | `{i}` | oracle |\n"
                    for q, f, ln, i in rows)
    cov = (ROOT / "COVERAGE.md").read_text()
    idx = cov.index("## Full catalog inventory")
    new = cov[:idx] + header + table
    if "--check" in sys.argv:
        if new != cov:
            print("COVERAGE.md inventory is stale; run tools/gen_coverage.py")
            sys.exit(1)
        print("inventory up to date")
        return
    (ROOT / "COVERAGE.md").write_text(new)
    print(f"wrote {len(rows)} inventory rows")

if __name__ == "__main__":
    main()
