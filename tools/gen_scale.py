#!/usr/bin/env python3
"""Generate a ~10x scale-up of the sf0.1 documents/embeddings tables for
the index-path scale-slope measurements (graft.ScaleSlopes).

Deterministic by construction (seeded per replica+row):
- documents: replica k of doc d gets doc_id = d + k*10_000_000 and its
  token sequence deterministically shuffled with seed "k:d" (k=0 keeps
  the original text). The shuffle destroys n>=3 shingle overlap between
  replicas, so the near-dup structure per probe doc stays batch-sized
  instead of growing with the replica count -- the whole point is to
  grow the CORPUS without growing each probe's OUTPUT.
- embeddings: replica k of vector v gets vec_id = v + k*10_000_000 and
  its first coordinate scaled by (1 + 0.07*k) -- replicas separate in
  cosine, the distribution stays realistic, top-k outputs stay k-sized.

Usage: python3 tools/gen_scale.py [replicas=10] [outdir=/tmp/graft_sf1]
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def gen_documents(replicas: int, outdir: str) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    out = {c: [] for c in t.column_names}
    for k in range(replicas):
        for i in range(len(cols["doc_id"])):
            d = cols["doc_id"][i]
            text = cols["text"][i]
            if k > 0:
                toks = text.split()
                random.Random(f"{k}:{d}").shuffle(toks)
                text = " ".join(toks)
            out["doc_id"].append(d + k * 10_000_000)
            out["text"].append(text)
            out["lang"].append(cols["lang"][i])
            out["source"].append(cols["source"][i])
            out["n_chars"].append(len(text))
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()),
                        ("n_chars", pa.int64())])
    pq.write_table(pa.table(out, schema=schema),
                   f"{outdir}/documents.parquet")
    print(f"documents: {len(out['doc_id'])} rows -> {outdir}")


def gen_embeddings(replicas: int, outdir: str) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    out_id, out_emb, out_lbl = [], [], []
    for k in range(replicas):
        scale = 1.0 + 0.07 * k
        for i in range(len(vec_ids)):
            e = embs[i]
            if k > 0:
                e = [e[0] * scale] + e[1:]
            out_id.append(vec_ids[i] + k * 10_000_000)
            out_emb.append(e)
            out_lbl.append(labels[i])
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    pq.write_table(pa.table({"vec_id": out_id, "embedding": out_emb,
                             "label": out_lbl}, schema=schema),
                   f"{outdir}/embeddings.parquet")
    print(f"embeddings: {len(out_id)} rows -> {outdir}")


if __name__ == "__main__":
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    import os
    os.makedirs(outdir, exist_ok=True)
    gen_documents(replicas, outdir)
    gen_embeddings(replicas, outdir)
