#!/usr/bin/env python3
"""Synthesize a 10x ("sf1") benchmark dir from /root/testdata/sf0.1.

Dev-only scaling-audit tooling (the Scala library never depends on it):
the driver ships sf{0.001,0.01,0.1}; judging the 100 TB design claims
needs at least one decade of measured scaling, so this builds
/tmp/testdata_sf1 with the same schema and distributional shape:

- region/nation: dimension tables, copied (fixed size at every SF).
- customer/supplier/part/orders/lineitem/events: 10 key-shifted
  replicas (replica r shifts every key/id column by r * (max+1), so
  join relationships hold within each replica and keys stay unique).
  Value columns and timestamps are left as generated — the time RANGE
  stays one month while row density grows 10x, matching how the
  driver's own sf0.01 -> sf0.1 step behaves.
- documents: 10 replicas; replica 0 is identity, replicas 1..9 mutate
  each whitespace token with p=0.3 (deterministic crc32 of
  (replica, doc_id, pos, token)) — within-replica near-dup structure
  is preserved exactly while any 13-gram crosses a mutation w.p.
  1-0.7^13 ~ 0.99, so cross-replica shingle overlap ~ 0 and near-dup
  pair counts scale linearly (replicating text verbatim would grow
  pairs quadratically and benchmark an artifact, not the operator).
- embeddings: 4 replicas (the driver's own sf0.01 -> sf0.1 step grew
  embeddings 4x, not 10x); replica 0 identity, replicas 1..3 rotated
  by a seeded random orthogonal matrix — rotation preserves norms and
  within-replica cosines, while cross-replica cosines scatter to ~0,
  so pair relations again scale linearly.

Parquet physical types are preserved by writing through each source
table's original arrow schema (events.ts stays timestamp[ns], the
nanosAsLong read path keeps working).
"""
import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
os.makedirs(DST, exist_ok=True)

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# shift unit per key DOMAIN (custkey in orders must shift by the
# customer table's domain size, not its own max)
DOMAIN_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}

tables = {t: pq.read_table(f"{SRC}/{t}.parquet")
          for t in ["region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents",
                    "embeddings"]}
domain = {}
for col, (tab, src_col) in DOMAIN_OF.items():
    domain[col] = pc.max(tables[tab][src_col]).as_py() + 1

for t in ["region", "nation"]:
    pq.write_table(tables[t], f"{DST}/{t}.parquet")
    print(t, tables[t].num_rows, "(copied)")

for t, keys in KEY_COLS.items():
    src = tables[t]
    reps = []
    for r in range(10):
        rep = src
        if r > 0:
            for k in keys:
                i = rep.schema.get_field_index(k)
                shifted = pc.add(rep[k], r * domain[k])
                rep = rep.set_column(i, rep.schema.field(i),
                                     shifted.cast(rep.schema.field(i).type))
        reps.append(rep)
    out = pa.concat_tables(reps).combine_chunks()
    pq.write_table(out, f"{DST}/{t}.parquet")
    print(t, src.num_rows, "->", out.num_rows)

# documents: token mutation
docs = tables["documents"]
doc_ids = docs["doc_id"].to_pylist()
texts = docs["text"].to_pylist()
langs = docs["lang"].to_pylist()
sources = docs["source"].to_pylist()
D = max(doc_ids) + 1
out_ids, out_text, out_lang, out_src, out_n = [], [], [], [], []
for r in range(10):
    for i, did in enumerate(doc_ids):
        if r == 0:
            txt = texts[i]
        else:
            toks = texts[i].split(" ")
            for p, tok in enumerate(toks):
                h = zlib.crc32(f"{r}:{did}:{p}:{tok}".encode())
                if h % 10 < 3:  # p = 0.3
                    toks[p] = f"r{r}x{h % 9973}"
            txt = " ".join(toks)
        out_ids.append(did + r * D)
        out_text.append(txt)
        out_lang.append(langs[i])
        out_src.append(sources[i])
        out_n.append(len(txt))
doc_out = pa.table(
    {"doc_id": pa.array(out_ids, pa.int64()),
     "text": pa.array(out_text, pa.string()),
     "lang": pa.array(out_lang, pa.string()),
     "source": pa.array(out_src, pa.string()),
     "n_chars": pa.array(out_n, pa.int64())})
pq.write_table(doc_out, f"{DST}/documents.parquet")
print("documents", docs.num_rows, "->", doc_out.num_rows)

# embeddings: 4 replicas, rotated
emb = tables["embeddings"]
vec_ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
labels = np.asarray(emb["label"].to_pylist(), dtype=np.int32)
vecs = np.asarray(emb["embedding"].to_pylist(), dtype=np.float32)
V = int(vec_ids.max()) + 1
dim = vecs.shape[1]
rng = np.random.default_rng(42)
all_ids, all_lab, all_vec = [], [], []
for r in range(4):
    if r == 0:
        rot = vecs
    else:
        q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        rot = (vecs.astype(np.float64) @ q).astype(np.float32)
    all_ids.append(vec_ids + r * V)
    all_lab.append(labels)
    all_vec.append(rot)
emb_out = pa.table(
    {"vec_id": pa.array(np.concatenate(all_ids), pa.int64()),
     "embedding": pa.array([v for v in np.concatenate(all_vec)],
                           pa.list_(pa.float32())),
     "label": pa.array(np.concatenate(all_lab), pa.int32())})
pq.write_table(emb_out, f"{DST}/embeddings.parquet")
print("embeddings", emb.num_rows, "->", emb_out.num_rows)
print("done ->", DST)
