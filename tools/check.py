#!/usr/bin/env python3
"""Local differential harness mimicking the driver's t2 gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads <out>/oracle_sql.json, registers the sf parquet tables as DuckDB
views, runs each oracle, loads the Spark result parquet, and compares
(column names sorted, rows sorted, values normalized). Driver-side-only
tooling — not part of the shipped Scala library.
"""
import sys, os, json, glob, math
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        # unnormalized: a scale difference the driver's hash would catch
        # must fail locally too
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat()[:26])
    return v


def df_rows(rel):
    cols = [c.lower() for c in rel.columns]
    # Driver-canonical typing: the driver's hash renders values through a
    # float path, so DECIMAL (trailing-zero rendering) and HUGEINT (vs
    # Spark BIGINT) outputs hash-fail even when content matches. Flag them
    # here so a local green predicts the driver verdict.
    bad_types = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                 if "DECIMAL" in str(t) or "HUGEINT" in str(t)]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort(key=repr)
    return [cols[i] for i in order], rows, bad_types


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"MISSING  {name}: no spark result parquet")
            n_bad += 1
            continue
        try:
            ocols, orows, obad = df_rows(con.sql(oracle[name]))
        except Exception as e:
            print(f"ORAFAIL  {name}: {e}")
            n_bad += 1
            continue
        scols, srows, sbad = df_rows(
            con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        if obad or sbad:
            print(f"DECTYPE  {name}: spark={sbad} oracle={obad}")
            n_bad += 1
            continue
        if scols != ocols:
            print(f"SCHEMA   {name}: spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        if len(srows) != len(orows):
            print(f"ROWS     {name}: spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"VALUES   {name}: {len(bad)}/{len(srows)} rows differ; first:")
            print(f"  spark : {bad[0][0]}")
            print(f"  oracle: {bad[0][1]}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(srows)} rows)")
            n_ok += 1
    # queries with no oracle entry: rows-only presence check
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(d)
        if name not in oracle and (only == set() or name in only):
            n = con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"ROWSONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
