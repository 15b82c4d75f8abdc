"""Generate a larger-SF slice of the documents / embeddings / events
tables for scaling probes (VERDICT r15 stretch #8).

The driver's testdata (TESTDATA.md, seed 42) is read-only and tops out
at sf0.1; this tool extrapolates the SAME distributions one decade up so
the headline LLM-pipeline ops can be timed at sf1 and their scaling
exponents measured (SCALING.md "Measured sf0.1 → sf1").  Distributional
fidelity, not row-identity, is the goal: fresh rows are drawn from the
shapes probed off sf0.1 —

- ``documents``: 31-word vocab texts, ~44–577 chars, 20 sources,
  5 langs (en-heavy), 10× rows;
- ``embeddings``: unit-norm 64-dim vectors with weak 10-label cluster
  structure (centroid pull ≈ 0.5 before renormalizing), 10× rows;
- ``events``: Jan-2024 µs timestamps, uniform 5 event types,
  exponential(50) values rounded to cents, 10× users (the driver scales
  |users| with SF), ``{"k": int}`` props.

Usage::

    python tools/gen_scale_slice.py /tmp/scale_sf1 [scale=10]

Writes ``documents.parquet`` / ``embeddings.parquet`` /
``events.parquet`` under the target dir.  Deterministic (numpy
PCG64(42)).  Pure pyarrow — no Spark session needed.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.35, 0.17, 0.17, 0.16, 0.15]
DIM = 64
N_LABELS = 10
BASE = {"documents": 5_000, "embeddings": 2_000, "events": 100_000, "users": 1_500}


def gen(out_dir: str, scale: int = 10) -> None:
    rng = np.random.default_rng(42)
    os.makedirs(out_dir, exist_ok=True)

    # documents ------------------------------------------------------------
    n_docs = BASE["documents"] * scale
    n_words = rng.integers(8, 100, n_docs)
    texts = [
        " ".join(rng.choice(VOCAB, size=k)) for k in n_words
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(LANGS, n_docs, p=LANG_W), pa.string()),
            "source": pa.array(
                [f"src{i}" for i in rng.integers(0, 20, n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    # embeddings -----------------------------------------------------------
    n_vec = BASE["embeddings"] * scale
    cents = rng.normal(size=(N_LABELS, DIM)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, n_vec).astype(np.int32)
    raw = 0.5 * cents[labels] + rng.normal(size=(n_vec, DIM)).astype(np.float32)
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vec), pa.int64()),
            "embedding": pa.array(list(raw), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))

    # events ---------------------------------------------------------------
    n_ev = BASE["events"] * scale
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64) - t0
    ts = t0 + rng.integers(0, span, n_ev)
    values = np.round(rng.exponential(50.0, n_ev), 2)
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, BASE["users"] * scale, n_ev), pa.int64()
            ),
            "event_type": pa.array(
                rng.choice(["view", "click", "purchase", "signup", "error"], n_ev),
                pa.string(),
            ),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
                pa.string(),
            ),
        }
    )
    pq.write_table(events, os.path.join(out_dir, "events.parquet"))
    print(f"wrote sf{scale / 10:g} slice to {out_dir}: "
          f"{n_docs} docs, {n_vec} vecs, {n_ev} events")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    gen(out, scale)
