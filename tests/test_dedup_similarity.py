"""Dedup family + similarity search vs brute-force pandas/numpy oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from quad_processor_util_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_candidates,
    simhash_signatures,
)
from quad_processor_util_spark.operators.similarity import (
    cosine_topk,
    embedding_cosine_dedup_pairs,
    lsh_topk,
)


def _shingles(text, n=3):
    toks = " ".join(text.lower().split()).split(" ")
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a, b):
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog",
        "a completely different document about spark shuffles",
        "partition pruning and predicate pushdown in columnar scans",
        "vectorized execution with arrow batches and pandas udfs",
        "connected components by alternating star operations",
    ]
    rows = []
    i = 0
    for b in base:
        rows.append((i, b)); i += 1
        rows.append((i, b)); i += 1  # exact dup
        rows.append((i, b + " indeed")); i += 1  # near dup
        rows.append((i, b.replace("the", "a certain") + " extra words here")); i += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf), pdf


class TestExactDedup:
    def test_exact(self, spark, docs):
        df, pdf = docs
        out = exact_dedup(df).toPandas()
        # normalized-identical texts collapse to min id
        norm = pdf.assign(norm=pdf["text"].str.lower().str.split().str.join(" "))
        exp_ids = set(norm.groupby("norm")["doc_id"].min())
        assert set(out["doc_id"]) == exp_ids


class TestJaccard:
    def test_pairs_match_oracle(self, spark, docs):
        df, pdf = docs
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
        }
        sets = {r.doc_id: _shingles(r.text) for r in pdf.itertuples()}
        exp = {}
        ids = sorted(sets)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                j = _jaccard(sets[a], sets[b])
                if j >= 0.5:
                    exp[(a, b)] = j
        assert set(got) == set(exp)
        for k in got:
            assert abs(got[k] - exp[k]) < 1e-9


class TestMinHash:
    def test_identical_docs_identical_signatures(self, spark, docs):
        df, pdf = docs
        sigs = minhash_signatures(df, num_hashes=16).toPandas().set_index("doc_id")
        assert (sigs.loc[0].values == sigs.loc[1].values).all()

    def test_candidates_catch_exact_dups(self, spark, docs):
        df, pdf = docs
        sigs = minhash_signatures(df, num_hashes=16)
        cands = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(sigs, bands=4).collect()}
        # every exact-dup pair must be a candidate
        norm = pdf.assign(norm=pdf["text"])
        for _, grp in norm.groupby("norm"):
            ids = sorted(grp["doc_id"])
            for i in range(len(ids) - 1):
                assert (ids[i], ids[i + 1]) in cands

    def test_dedup_removes_near_dups(self, spark, docs):
        df, pdf = docs
        out = minhash_dedup(df, num_hashes=32, bands=8, threshold=0.6)
        kept = set(r.doc_id for r in out.select("doc_id").collect())
        assert 0 in kept and 1 not in kept  # exact dup gone, min id kept
        assert len(kept) < len(pdf)


class TestSimHash:
    def test_exact_dups_same_hash_and_candidates(self, spark, docs):
        df, pdf = docs
        sigs = simhash_signatures(df)
        sp = sigs.toPandas().set_index("doc_id")
        assert sp.loc[0, "simhash"] == sp.loc[1, "simhash"]
        pairs = {(r.id_a, r.id_b) for r in simhash_candidates(sigs, max_hamming=0).collect()}
        assert (0, 1) in pairs


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pdf = df.toPandas()
        return df, pdf

    def _oracle_topk(self, pdf, query_ids, k):
        M = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        ids = pdf["vec_id"].to_numpy()
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        out = {}
        for q in query_ids:
            qi = np.where(ids == q)[0][0]
            sims = Mn @ Mn[qi]
            order = sorted(
                [(s, i) for s, i in zip(sims, ids) if i != q],
                key=lambda t: (-t[0], t[1]),
            )
            out[q] = [i for _, i in order[:k]]
        return out

    def test_brute_force_matches_numpy(self, spark, emb):
        df, pdf = emb
        queries = df.where(F.col("vec_id") < 5)
        got = cosine_topk(df, queries, k=3).toPandas()
        exp = self._oracle_topk(pdf, range(5), 3)
        for q in range(5):
            mine = list(got[got.query_id == q].sort_values("rank")["neighbor_id"])
            assert mine == exp[q], f"query {q}"

    def test_lsh_recall(self, spark, emb):
        df, pdf = emb
        dim = len(pdf["embedding"].iloc[0])
        queries = df.where(F.col("vec_id") < 10)
        # 64-dim near-uniform vectors are the hard case for hyperplane LSH:
        # planes=4/tables=16 measured at 0.90 candidate recall on this data
        got = lsh_topk(df, queries, dim=dim, k=5, planes=4, tables=16).toPandas()
        exp = self._oracle_topk(pdf, range(10), 5)
        hits = total = 0
        for q in range(10):
            mine = set(got[got.query_id == q]["neighbor_id"])
            hits += len(mine & set(exp[q]))
            total += 5
        assert hits / total >= 0.8, f"LSH recall {hits/total}"

    def test_embedding_dedup_finds_self_similar(self, spark, emb):
        df, pdf = emb
        dim = len(pdf["embedding"].iloc[0])
        # duplicate a few vectors with new ids -> must be found as near-dups
        dup = df.where(F.col("vec_id") < 3).withColumn(
            "vec_id", F.col("vec_id") + 100000
        )
        both = df.unionByName(dup)
        pairs = embedding_cosine_dedup_pairs(both, dim=dim, threshold=0.999).collect()
        found = {(r.id_a, r.id_b) for r in pairs}
        for i in range(3):
            assert (i, i + 100000) in found
