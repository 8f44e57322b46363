"""Generate a MEASUREMENT-ONLY sf1.0-scale dataset mimicking the driver's
synthetic tables (TESTDATA.md schema, seed-deterministic).

The driver's round-end bench may run at sf1.0 (BENCH_r05.json: "sf": 1.0)
but only sf{0.001,0.01,0.1} are on disk. This tool scales sf0.1 up 10x so
optimization work can be measured where per-row costs dominate fixed job
overhead. Distributions are matched empirically:

- documents: 31-word vocab bag-of-words, ~5% near-identical dup pairs
  (observed 25 pairs / 500 docs at sf0.01), lang {en 40%, zh/es/fr/de 15%},
  source src0..src19 — same knobs the dedup/jaccard family keys on
- embeddings: 64-dim, 10 gaussian label clusters (500 -> 2000 -> 8000 rows)
- events: 30-day window, 10x users, same event_type mix / props shape
- TPC-H family: non-key columns bootstrap-sampled from sf0.1 rows (keeps
  joint distributions + filter selectivities), keys re-drawn in 10x ranges
- nation/region: copied (fixed dims)

NEVER used by oracle/correctness paths; bench.py reads whatever
$SPARK_GRAFT_SF_DIR points at.

Usage: python tools/gen_measure_sf.py --out /root/sf_measure/sf1.0 --mult 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"


def gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    vocab = np.array([
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window"])
    texts: list[str] = []
    n_words = rng.integers(8, 101, size=n)
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            # near-duplicate of an earlier doc: drop or append one word
            base = texts[rng.integers(0, i)].split()
            if rng.random() < 0.5 and len(base) > 9:
                del base[rng.integers(0, len(base))]
            else:
                base.append(str(rng.choice(vocab)))
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(rng.choice(vocab, size=n_words[i])))
    lang = rng.choice(["en", "zh", "es", "fr", "de"], size=n,
                      p=[0.4, 0.15, 0.15, 0.15, 0.15])
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": lang,
        "source": [f"src{i}" for i in rng.integers(0, 20, size=n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def gen_embeddings(rng: np.random.Generator, n: int) -> pd.DataFrame:
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    cents = rng.normal(0, 1, size=(10, 64)).astype(np.float32)
    vecs = cents[labels] + rng.normal(0, 0.35, size=(n, 64)).astype(np.float32)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.astype(np.float32) for v in vecs],
        "label": labels,
    })


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pd.DataFrame:
    start = np.datetime64("2024-01-01T00:00:00")
    span = np.timedelta64(30 * 24 * 3600, "s") / np.timedelta64(1, "s")
    offs = np.sort(rng.uniform(0, float(span) * 1e6, size=n)).astype("int64")
    ts = start + offs.astype("timedelta64[us]")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
        "event_type": rng.choice(
            ["signup", "purchase", "view", "click", "error"], size=n),
        "value": np.round(rng.uniform(0, 200, size=n), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)],
    })


def bootstrap_tpch(rng: np.random.Generator, name: str, mult: int,
                   key_ranges: dict[str, int]) -> pd.DataFrame:
    src = pd.read_parquet(os.path.join(SRC, f"{name}.parquet"))
    n = len(src) * mult
    out = src.iloc[rng.integers(0, len(src), size=n)].reset_index(drop=True)
    pk = {"customer": "c_custkey", "supplier": "s_suppkey",
          "part": "p_partkey", "orders": "o_orderkey"}.get(name)
    if pk:
        out[pk] = np.arange(n, dtype=np.int64)
    for col, hi in key_ranges.items():
        if col in out.columns and col != pk:
            out[col] = rng.integers(0, hi, size=n).astype(np.int64)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/sf_measure/sf1.0")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    m = args.mult
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    def w(name: str, df: pd.DataFrame) -> None:
        df.to_parquet(os.path.join(args.out, f"{name}.parquet"), index=False)
        print(name, len(df))

    for fixed in ("nation", "region"):
        w(fixed, pd.read_parquet(os.path.join(SRC, f"{fixed}.parquet")))
    w("documents", gen_documents(rng, 5_000 * m))
    w("embeddings", gen_embeddings(rng, 2_000 * (4 if m == 10 else m)))
    w("events", gen_events(rng, 100_000 * m, 1_500 * m))
    w("customer", bootstrap_tpch(rng, "customer", m, {}))
    w("supplier", bootstrap_tpch(rng, "supplier", m, {}))
    w("part", bootstrap_tpch(rng, "part", m, {}))
    w("orders", bootstrap_tpch(rng, "orders", m,
                               {"o_custkey": 15_000 * m}))
    w("lineitem", bootstrap_tpch(rng, "lineitem", m, {
        "l_orderkey": 150_000 * m, "l_partkey": 20_000 * m,
        "l_suppkey": 1_000 * m}))
    with open(os.path.join(args.out, "_DONE"), "w") as f:
        f.write("measurement-only synthetic scale-up; see tools/gen_measure_sf.py\n")


if __name__ == "__main__":
    main()
