#!/usr/bin/env python3
"""Generate the sf1 SCALE-PROBE dataset (bench-only, never an oracle
input) as 10 disjoint key-shifted copies of /root/testdata/sf0.1 —
VERDICT r7 #5's "run the headline once at sf1" needs 10x data the
harness doesn't ship. Writes /root/repo/testdata_sf1/*.parquet with
byte-identical schemas to the sf0.1 originals.

Design choices that keep the probe HONEST (documented in PLANS.md):
- Every copy i shifts its primary/foreign keys by i*stride, so the 10
  copies are disjoint universes and join/group cardinalities scale
  linearly -- the shape a 10x corpus actually has.
- region/nation are NOT scaled (dimensions don't grow with data).
- Document texts are per-copy word-SHUFFLED (seeded by (copy, doc_id)):
  unigram statistics (tokens, quality, langid, tf/df) are preserved
  while shingle sets are fresh, so dedup queries see a realistic 10x
  corpus instead of a pathological one where every doc has 9 exact
  clones (which would quadratically blow up every inverted index and
  fake a super-linear scaling verdict).
- MEASURED r8 caveat: shuffling alone SATURATES the trigram vocabulary
  (27k -> 29k distinct shingles on 10x docs), so shingle df grows ~10x
  and candidate-PAIR density ~100-140x -- an adversarial boilerplate-
  heavy substrate, useful as a hot-key stress point but unlike a
  natural corpus, where n-gram vocabulary grows near-linearly (phrases
  are mostly novel). `--salt` additionally replaces every 7th word of
  copies > 0 with a copy-tagged variant: ~86% of unigram mass is
  preserved while most trigram windows become copy-unique, restoring
  the natural df regime. The r8 probe records BOTH substrates
  (PLANS.md): caps/prefix behavior under saturation, exponents under
  salt.
- Embeddings are per-copy cyclically ROLLED (preserves norm and value
  distribution, decorrelates cosine) for the same reason.
"""
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SALT = "--salt" in sys.argv
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
DST = _pos[0] if _pos else "/root/repo/testdata_sf1"
COPIES = 10
K = 10_000_000          # key stride for dimension-ish keys
KB = 100_000_000        # key stride for fact keys (orderkey, event_id)

SHIFTS = {
    "customer": {"c_custkey": K},
    "supplier": {"s_suppkey": K},
    "part": {"p_partkey": K},
    "orders": {"o_orderkey": KB, "o_custkey": K},
    "lineitem": {"l_orderkey": KB, "l_partkey": K, "l_suppkey": K},
    "events": {"event_id": KB, "user_id": K},
    "documents": {"doc_id": K},
    "embeddings": {"vec_id": K},
}


def shifted_copy(table, name, i):
    cols = {}
    for field in table.schema:
        col = table.column(field.name)
        stride = SHIFTS.get(name, {}).get(field.name)
        if stride:
            arr = col.to_numpy() + np.int64(i) * np.int64(stride)
            cols[field.name] = pa.array(arr, type=field.type)
        else:
            cols[field.name] = col
    t = pa.table(cols, schema=table.schema)
    if name == "documents" and i > 0:
        ids = table.column("doc_id").to_pylist()
        texts = table.column("text").to_pylist()
        out = []
        for doc_id, text in zip(ids, texts):
            words = text.split(" ")
            random.Random(i * 1_000_003 + doc_id).shuffle(words)
            if SALT:
                words = [w if j % 7 else f"{w}x{i}"
                         for j, w in enumerate(words)]
            out.append(" ".join(words))
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(out, type=pa.string()))
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pa.array([len(s) for s in out], type=pa.int64()))
    if name == "embeddings" and i > 0:
        vecs = table.column("embedding").to_pylist()
        rolled = [v[i % len(v):] + v[:i % len(v)] for v in vecs]
        t = t.set_column(
            t.schema.get_field_index("embedding"), "embedding",
            pa.array(rolled, type=t.schema.field("embedding").type))
    return t


def main():
    os.makedirs(DST, exist_ok=True)
    for fname in sorted(os.listdir(SRC)):
        name = fname.removesuffix(".parquet")
        table = pq.read_table(os.path.join(SRC, fname))
        if name in ("region", "nation"):
            out = table  # dimensions don't scale
        else:
            out = pa.concat_tables(
                [shifted_copy(table, name, i) for i in range(COPIES)])
        pq.write_table(out, os.path.join(DST, fname))
        print(f"{fname}: {table.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
