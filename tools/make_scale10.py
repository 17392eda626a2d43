#!/usr/bin/env python3
"""Build a 10x scale-probe dataset for the LLM-pipeline ops.

Naive 10x duplication would give every doc 9 identical twins, inflating
near-dup pair counts quadratically in the copy count and turning the
probe into a measurement of a pathological corpus. Instead each copy is
perturbed so WITHIN-copy structure (planted near-dups, session shapes,
vector clusters) is preserved while CROSS-copy similarity is destroyed:

- documents: per-copy Caesar rotation of [a-z0-9] (shingle sets stay
  isomorphic within a copy; cross-copy shingle overlap ~ 0), doc_id
  remapped by +copy*10^7.
- embeddings: per-copy fixed permutation of the 64 dims (norms and
  within-copy cosines preserved exactly; cross-copy cosines scrambled),
  vec_id remapped.
- events: user_id remapped by +copy*10^9 (10x users, identical per-user
  session timelines).

Other tables are copied 1x (the relational probe already exists).

Usage: python3 tools/make_scale10.py [src_dir] [dst_dir] [copies]
Dev tool only — driver-side python per the build brief.
"""
import shutil
import string
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10x")
copies = int(sys.argv[3] if len(sys.argv) > 3 else 10)
dst.mkdir(parents=True, exist_ok=True)

ALPHA = string.ascii_lowercase + string.digits


def rot_table(i):
    if i == 0:
        return None
    if i < len(ALPHA):
        # rotation (the original scheme — keeps the recorded 10x dataset
        # byte-identical)
        rot = ALPHA[i:] + ALPHA[:i]
    else:
        # rotations degenerate to identity at i >= len(ALPHA) (slices clamp),
        # which would make copies 36+ EXACT duplicates of copy 0 — a
        # pathological corpus. Seeded permutation instead.
        import random
        chars = list(ALPHA)
        random.Random(7000 + i).shuffle(chars)
        rot = "".join(chars)
    return str.maketrans(ALPHA, rot)


# documents
t = pq.read_table(src / "documents.parquet")
parts = []
for i in range(copies):
    tr = rot_table(i)
    texts = t.column("text").to_pylist()
    if tr is not None:
        texts = [s.translate(tr) if s is not None else None for s in texts]
    parts.append(pa.table({
        "doc_id": pa.array([d + i * 10_000_000 for d in t.column("doc_id").to_pylist()], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": t.column("lang"),
        "source": t.column("source"),
        "n_chars": t.column("n_chars"),
    }))
pq.write_table(pa.concat_tables(parts), dst / "documents.parquet")
print("documents:", sum(p.num_rows for p in parts))

# embeddings
t = pq.read_table(src / "embeddings.parquet")
vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
dim = vecs.shape[1]
parts = []
for i in range(copies):
    rng = np.random.RandomState(1000 + i)
    perm = np.arange(dim) if i == 0 else rng.permutation(dim)
    parts.append(pa.table({
        "vec_id": pa.array([v + i * 10_000_000 for v in t.column("vec_id").to_pylist()], pa.int64()),
        "embedding": pa.array(vecs[:, perm].tolist(), pa.list_(pa.float32())),
        "label": t.column("label"),
    }))
pq.write_table(pa.concat_tables(parts), dst / "embeddings.parquet")
print("embeddings:", sum(p.num_rows for p in parts))

# events (keep TIMESTAMP(NANOS) physical type like the source)
t = pq.read_table(src / "events.parquet")
parts = []
for i in range(copies):
    parts.append(pa.table({
        "event_id": pa.array([e + i * 10_000_000 for e in t.column("event_id").to_pylist()], pa.int64()),
        "ts": t.column("ts"),
        "user_id": pa.array([u + i * 1_000_000_000 for u in t.column("user_id").to_pylist()], pa.int64()),
        "event_type": t.column("event_type"),
        "value": t.column("value"),
        "props": t.column("props"),
    }))
pq.write_table(pa.concat_tables(parts), dst / "events.parquet",
               coerce_timestamps=None)
print("events:", sum(p.num_rows for p in parts))

# customer 10x (f1 redaction probe input): remap the key, keep the rest —
# the composed contact strings stay realistic and unique per copy.
t = pq.read_table(src / "customer.parquet")
parts = []
for i in range(copies):
    cols = {name: t.column(name) for name in t.column_names}
    cols["c_custkey"] = pa.array(
        [c + i * 10_000_000 for c in t.column("c_custkey").to_pylist()], pa.int64())
    parts.append(pa.table(cols))
pq.write_table(pa.concat_tables(parts), dst / "customer.parquet")
print("customer:", sum(p.num_rows for p in parts))

# remaining tables 1x
for name in ["region", "nation", "supplier", "part", "orders", "lineitem"]:
    shutil.copyfile(src / f"{name}.parquet", dst / f"{name}.parquet")
print("done ->", dst)
