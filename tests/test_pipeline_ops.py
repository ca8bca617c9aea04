"""Round-4 pipeline operators: sequence packing, exact stratified
sampling, TF-IDF terms, distributed k-means."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chunker_spark.functions.text import token_count
from chunker_spark.ops.clustering import cluster_sizes, kmeans_assign, kmeans_fit
from chunker_spark.ops.curation import stratified_sample
from chunker_spark.ops.packing import pack_documents, packing_summary
from chunker_spark.ops.terms import tfidf_top_terms


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"alpha beta gamma delta token{i} " * (i % 7 + 1), "en" if i % 3 else "de")
        for i in range(40)
    ] + [(100, "", "en")]  # zero-token document
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---- packing ---------------------------------------------------------

def test_packing_layout_invariants(corpus):
    budget = 16
    packed = pack_documents(corpus, token_count("text"), budget=budget, n_shards=4)
    rows = sorted(packed.collect(), key=lambda r: (r["shard"], r["start_bin"], r["bin_offset"]))
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in corpus.collect()}
    for r in rows:
        assert 0 <= r["shard"] < 4
        assert 0 <= r["bin_offset"] < budget
        assert r["end_bin"] >= r["start_bin"]
        if r["tokens"] > 0:
            # the doc spans exactly the bins its token range covers
            first = r["start_bin"] * budget + r["bin_offset"]
            assert r["end_bin"] == (first + r["tokens"] - 1) // budget
    # within a shard the layout is gapless: cumulative tokens line up
    for shard in {r["shard"] for r in rows}:
        cursor = 0
        for r in [x for x in rows if x["shard"] == shard]:
            assert r["start_bin"] * budget + r["bin_offset"] == cursor
            cursor += r["tokens"]


def test_packing_zero_token_doc_occupies_no_tokens(corpus):
    packed = pack_documents(corpus, token_count("text"), budget=16, n_shards=4)
    r = packed.where(F.col("doc_id") == 100).collect()[0]
    assert r["tokens"] == 0
    assert r["end_bin"] == r["start_bin"]


def test_packing_stable_under_repartition(corpus):
    a = pack_documents(corpus, token_count("text"), budget=32, n_shards=4)
    b = pack_documents(
        corpus.repartition(7), token_count("text"), budget=32, n_shards=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_packing_summary_fill(corpus):
    packed = pack_documents(corpus, token_count("text"), budget=16, n_shards=2)
    summ = {r["shard"]: r for r in packing_summary(packed, budget=16).collect()}
    tot = packed.groupBy("shard").agg(F.sum("tokens").alias("t")).collect()
    for r in tot:
        s = summ[r["shard"]]
        assert s["total_tokens"] == r["t"]
        assert 0 < s["fill_ratio"] <= 1.0


def test_packing_validation(corpus):
    with pytest.raises(ValueError):
        pack_documents(corpus, token_count("text"), budget=0)
    with pytest.raises(ValueError):
        pack_documents(corpus, token_count("text"), budget=10, n_shards=0)


# ---- stratified sampling --------------------------------------------

def test_stratified_exact_ceil_counts(corpus):
    out = stratified_sample(corpus, ["lang"], 1, 5)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    want = {
        r["lang"]: -(-r["n"] // 5)  # ceil
        for r in corpus.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_stratified_deterministic_and_schema_preserved(corpus):
    a = stratified_sample(corpus, ["lang"], 1, 3)
    b = stratified_sample(corpus.repartition(9), ["lang"], 1, 3)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    assert a.columns == corpus.columns  # helper columns dropped


def test_stratified_edges_and_validation(corpus):
    n = corpus.count()
    assert stratified_sample(corpus, ["lang"], 1, 1).count() == n
    assert stratified_sample(corpus, ["lang"], 0, 1).count() == 0
    with pytest.raises(ValueError):
        stratified_sample(corpus, ["lang"], 2, 1)
    with pytest.raises(ValueError):
        stratified_sample(corpus, ["lang"], 1, 0)


# ---- tf-idf ----------------------------------------------------------

def test_tfidf_ubiquitous_term_scores_zero(spark):
    # "common" is in every doc -> idf = ln(N+1 / N+1) = 0 -> never ranks
    # above corpus-specific terms
    rows = [
        (0, "common apple apple apple", "en"),
        (1, "common banana banana", "en"),
        (2, "common cherry", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = tfidf_top_terms(df, k=2).collect()
    en = sorted([r for r in out if r["lang"] == "en"], key=lambda r: r["rank"])
    assert en[0]["term"] == "apple"  # tf 3 * ln(4/2)
    assert en[0]["score"] > 0
    assert all(r["term"] != "common" or r["score"] == 0.0 for r in out)


def test_tfidf_short_tokens_dropped_and_k_validated(spark):
    df = spark.createDataFrame(
        [(0, "a b ab xyz xyz", "en")], "doc_id long, text string, lang string"
    )
    terms = {r["term"] for r in tfidf_top_terms(df, k=10).collect()}
    assert "a" not in terms and "b" not in terms
    assert {"ab", "xyz"} <= terms
    with pytest.raises(ValueError):
        tfidf_top_terms(df, k=0)


# ---- k-means ---------------------------------------------------------

@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    centers = np.array([[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 5.0]])
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, (centers[c] + rng.normal(0, 0.3, 3)).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_assign_argmin_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [4.0, 0.0]), (2, [2.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [0.0, 0.0]), (1, [4.0, 0.0])]
    out = {r["vec_id"]: (r["cluster"], r["sq_dist"]) for r in kmeans_assign(df, cents).collect()}
    assert out[0] == (0, 0.0) and out[1] == (1, 0.0)
    assert out[2] == (0, 4.0)  # equidistant -> lower centroid id wins
    with pytest.raises(ValueError):
        kmeans_assign(df, [])


def _numpy_lloyd(x, k, iters):
    cents = x[:k].copy()  # ids 0..k-1 are the k smallest -> same init
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).round(6)
        assign = d.argmin(axis=1)  # ties -> lower id, same as the op
        for c in range(k):
            if (assign == c).any():
                cents[c] = x[assign == c].mean(axis=0)
    return cents


def test_kmeans_fit_matches_numpy_lloyd(vectors):
    x = np.array(
        [r["embedding"] for r in vectors.orderBy("vec_id").collect()], dtype=np.float64
    )
    got = kmeans_fit(vectors, k=3, iters=4)
    want = _numpy_lloyd(x, 3, 4)
    for (cid, vec), w in zip(got, want):
        assert np.allclose(vec, w, atol=1e-9), (cid, vec, w)


def test_kmeans_fit_recovers_planted_clusters(vectors):
    cents = kmeans_fit(vectors, k=3, iters=6)
    assigned = kmeans_assign(
        vectors.select("vec_id", F.col("embedding").alias("v")), cents, vec_col="v"
    )
    sizes = {r["cluster"]: r["n_vectors"] for r in cluster_sizes(assigned).collect()}
    assert sorted(sizes.values()) == [30, 30, 30]
    # every planted group lands in one cluster
    rows = assigned.select("vec_id", "cluster").collect()
    by_mod = {}
    for r in rows:
        by_mod.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_mod.values())


def test_kmeans_validation(vectors):
    with pytest.raises(ValueError):
        kmeans_fit(vectors, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(vectors, k=3, iters=-1)
