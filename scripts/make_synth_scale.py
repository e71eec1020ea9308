"""Build a deterministic 10x synthetic scale dataset for A/B profiling ONLY.

Writes /tmp/synth_sf1/{documents,events,embeddings}.parquet as 10 variants
of each sf0.1 row (deterministic token-level perturbation so near-dup
structure exists but is not 100% pair-dense). Never used for results or
oracle checks — profiling input only (OPTIMIZATION_r06.md measurement
setup).
"""
import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_sf1"
K = int(os.environ.get("SYNTH_K", "10"))

os.makedirs(DST, exist_ok=True)

docs = pd.read_parquet(f"{SRC}/documents.parquet")
rng = np.random.default_rng(7)
out = []
for v in range(K):
    d = docs.copy()
    d["doc_id"] = d["doc_id"] + v * 1_000_000
    if v > 0:
        # deterministic per-variant perturbation: replace ~8% of tokens
        # with a variant-tagged token so most variant pairs fall below a
        # 0.8 jaccard at n=5 but some survive (mix of near/far pairs)
        def perturb(t, v=v):
            toks = t.split(" ")
            h = np.arange(len(toks))
            mask = ((h * 2654435761 + v * 97) % 100) < 8
            for i in np.nonzero(mask)[0]:
                toks[i] = f"v{v}tok{i % 50}"
            return " ".join(toks)
        d["text"] = d["text"].map(perturb)
    d["n_chars"] = d["text"].str.len()
    out.append(d)
docs10 = pd.concat(out, ignore_index=True)
docs10.to_parquet(f"{DST}/documents.parquet", index=False)
print("documents", docs10.shape)

ev = pd.read_parquet(f"{SRC}/events.parquet")
out = []
for v in range(K):
    e = ev.copy()
    e["event_id"] = e["event_id"] + v * 10_000_000
    e["user_id"] = e["user_id"] + v * 100_000
    e["ts"] = e["ts"] + pd.to_timedelta(v * 3, unit="h")
    out.append(e)
ev10 = pd.concat(out, ignore_index=True)
ev10["ts"] = ev10["ts"].astype("datetime64[us]")  # Spark rejects NANOS
ev10.to_parquet(f"{DST}/events.parquet", index=False)
print("events", ev10.shape)

emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
out = []
for v in range(K):
    e = emb.copy()
    e["vec_id"] = e["vec_id"] + v * 1_000_000
    if v > 0:
        nois = rng.normal(0, 0.05, size=(len(e),))
        e["embedding"] = [
            (np.asarray(vec, dtype=np.float64) * (1.0 + nois[i])).tolist()
            for i, vec in enumerate(e["embedding"])]
    out.append(e)
emb10 = pd.concat(out, ignore_index=True)
emb10.to_parquet(f"{DST}/embeddings.parquet", index=False)
print("embeddings", emb10.shape)
