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


# ---- line-level boilerplate removal ----------------------------------

def test_boilerplate_cross_doc_lines_removed_order_kept(spark):
    from chunker_spark.ops.boilerplate import remove_boilerplate_lines

    banner = "Cookie Policy | Accept All"
    rows = [
        (1, f"{banner}\nunique alpha\nmiddle one\n{banner}"),
        (2, f"{banner}\nunique beta"),
        (3, "standalone text\nno shared lines here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_boilerplate_lines(df).collect()}
    # every occurrence of the cross-doc banner goes, in-order remainder stays
    assert got[1].clean_text == "unique alpha\nmiddle one"
    assert got[1].n_lines_removed == 2
    assert got[2].clean_text == "unique beta" and got[2].n_lines_removed == 1
    # untouched doc: text intact, zero removed (left-join null path)
    assert got[3].clean_text == rows[2][1] and got[3].n_lines_removed == 0


def test_boilerplate_df_is_document_frequency_not_term_frequency(spark):
    """A refrain repeated 3x WITHIN one doc is df=1 — kept. The same
    line appearing in a second doc flips df to 2 — all occurrences in
    both docs are removed."""
    from chunker_spark.ops.boilerplate import remove_boilerplate_lines

    refrain = "and miles to go before i sleep"
    solo = spark.createDataFrame(
        [(1, f"verse\n{refrain}\n{refrain}\n{refrain}")], "doc_id long, text string"
    )
    kept = remove_boilerplate_lines(solo).first()
    assert kept.n_lines_removed == 0 and kept.clean_text == solo.first().text

    both = spark.createDataFrame(
        [(1, f"verse\n{refrain}\n{refrain}"), (2, f"{refrain}\nother")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in remove_boilerplate_lines(both).collect()}
    assert got[1].clean_text == "verse" and got[1].n_lines_removed == 2
    assert got[2].clean_text == "other" and got[2].n_lines_removed == 1


def test_boilerplate_normalization_and_empty_result(spark):
    """Counting is lower+trim invariant ('  Privacy POLICY ' matches
    'privacy policy') but the KEPT text is byte-identical to the input;
    a doc that is 100% boilerplate comes back as ''."""
    from chunker_spark.ops.boilerplate import remove_boilerplate_lines

    rows = [
        (1, "  Privacy POLICY \nreal content"),
        (2, "privacy policy"),
        (3, "keep me\nAS IS"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_boilerplate_lines(df).collect()}
    assert got[1].clean_text == "real content"
    assert got[2].clean_text == "" and got[2].n_lines_removed == 1
    assert got[3].clean_text == "keep me\nAS IS"  # original bytes, not normalized


def test_boilerplate_min_docs_threshold_and_validation(spark):
    from chunker_spark.ops.boilerplate import remove_boilerplate_lines

    df = spark.createDataFrame(
        [(i, "shared line\nown line %d" % i) for i in range(3)],
        "doc_id long, text string",
    )
    # min_docs=4 > corpus df=3: nothing removed
    out = remove_boilerplate_lines(df, min_docs=4)
    assert all(r.n_lines_removed == 0 for r in out.collect())
    with pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(df, min_docs=1)


# ---- z-order layout --------------------------------------------------

def test_zorder_interleave_matches_reference_morton(spark):
    """The JVM bit-interleave equals a pure-Python Morton encode for
    every (x, y) in a 2-bit grid — and the minmax bucketing maps the
    value range onto the full grid."""
    from chunker_spark.ops.layout import zorder_value

    def morton(xs, bits):
        z = 0
        for i, x in enumerate(xs):
            for b in range(bits):
                z |= ((x >> b) & 1) << (b * len(xs) + i)
        return z

    # values 0..3 with min=0,max=3: bucket = v*4//4 = v exactly
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.zvalue
        for r in zorder_value(df, ["x", "y"], bits=2).collect()
    }
    assert got == {(x, y): morton((x, y), 2) for x, y in rows}
    # curve locality spot-checks: origin at 0, max corner fills 4 bits
    assert got[(0, 0)] == 0 and got[(3, 3)] == 0b1111


def test_zorder_nulls_and_validation(spark):
    from chunker_spark.ops.layout import zorder_value

    df = spark.createDataFrame([(1, 10), (None, 20), (4, None)], "x long, y long")
    got = zorder_value(df, ["x", "y"], bits=4).collect()
    assert all(r.zvalue is not None for r in got)  # nulls -> bucket 0, not null z
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_value(df, ["x"])
    with pytest.raises(ValueError, match="fit a long"):
        zorder_value(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="strategy"):
        zorder_value(df, ["x", "y"], strategy="zscore")


def test_zorder_quantile_buckets_are_equi_depth_under_skew(spark):
    """The production strategy: on a heavily skewed column (90% of mass
    at the low end) quantile bucketing still spreads rows evenly across
    buckets, where minmax collapses them into a few. Decoded bucket =
    even bits of the z-value."""
    from chunker_spark.ops.layout import zorder_value

    rows = [(i, i % 7, (i % 10) if i % 10 < 9 else 1000 + i) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, other long, skewed long")
    bits = 3

    def decode_first(z):  # bits of col index 0 live at positions 2b
        return sum(((z >> (2 * b)) & 1) << b for b in range(bits))

    for strategy, expect_spread in (("quantile", True), ("minmax", False)):
        out = zorder_value(df, ["skewed", "other"], bits=bits, strategy=strategy)
        counts = {}
        for r in out.collect():
            counts[decode_first(r.zvalue)] = counts.get(decode_first(r.zvalue), 0) + 1
        if expect_spread:
            assert len(counts) == 2**bits
            assert max(counts.values()) <= 3 * (2000 // 2**bits)
        else:
            # 90% of values share 9 raw values near min -> few buckets
            assert counts.get(0, 0) >= 1700


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """The point of the layout: after zorder_write on (l_partkey,
    l_suppkey), file-level min/max stats exclude most files for a point
    predicate on EITHER column; a linear l_partkey sort prunes only its
    own column (every file matches any l_suppkey). Measured from real
    parquet footers, sf0.01 (60k rows, 16 files)."""
    import glob

    import pyarrow.parquet as pq

    from chunker_spark.ops.layout import zorder_write

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_write(li, zdir, ["l_partkey", "l_suppkey"], n_files=16, bits=8)
    (li.repartitionByRange(16, "l_partkey").sortWithinPartitions("l_partkey")
       .write.mode("overwrite").parquet(ldir))

    def files_overlapping(path, col, val):
        hit = tot = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            stats = [
                md.row_group(rg).column(ci).statistics
                for rg in range(md.num_row_groups)
                for ci in range(md.num_columns)
                if md.row_group(rg).column(ci).path_in_schema == col
            ]
            tot += 1
            if min(s.min for s in stats) <= val <= max(s.max for s in stats):
                hit += 1
        return hit, tot

    zh_p, zt = files_overlapping(zdir, "l_partkey", 1000)
    zh_s, _ = files_overlapping(zdir, "l_suppkey", 50)
    lh_p, lt = files_overlapping(ldir, "l_partkey", 1000)
    lh_s, _ = files_overlapping(ldir, "l_suppkey", 50)
    assert zt == 16 and lt == 16
    assert zh_p <= 10 and zh_s <= 10   # z-order prunes BOTH dims (meas. 8 / 6)
    assert lh_p <= 2                   # linear is perfect on its sort col...
    assert lh_s == 16                  # ...and useless on the other


# ---- mixture + weighted sampling -------------------------------------

def test_mixture_exact_per_stratum_counts(corpus):
    from chunker_spark.ops.curation import mixture_sample

    out = mixture_sample(
        corpus, "lang", {"en": (1, 2), "de": (1, 1)}, default=(0, 1)
    ).collect()
    by_lang = {}
    for r in out:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    n_en = sum(1 for r in corpus.collect() if r.lang == "en")
    n_de = sum(1 for r in corpus.collect() if r.lang == "de")
    assert by_lang["en"] == -(-n_en // 2)  # ceil(n/2)
    assert by_lang["de"] == n_de           # (1,1) keeps all


def test_mixture_default_and_validation(corpus):
    from chunker_spark.ops.curation import mixture_sample

    # default (1,1): unlisted strata survive whole
    out = mixture_sample(corpus, "lang", {"en": (0, 1)}, default=(1, 1)).collect()
    assert all(r.lang == "de" for r in out)
    assert len(out) == sum(1 for r in corpus.collect() if r.lang == "de")
    with pytest.raises(ValueError, match="quota"):
        mixture_sample(corpus, "lang", {"en": (3, 2)})
    with pytest.raises(ValueError, match="default"):
        mixture_sample(corpus, "lang", {}, default=(1, 0))


def test_mixture_deterministic_and_nested_in_stratified(corpus):
    """Same spec twice -> same id set; a uniform mixture equals
    stratified_sample with that fraction (the mixture generalizes it)."""
    from chunker_spark.ops.curation import mixture_sample, stratified_sample

    spec = {"en": (1, 3), "de": (1, 3)}
    a = {r.doc_id for r in mixture_sample(corpus, "lang", spec).collect()}
    b = {r.doc_id for r in mixture_sample(corpus, "lang", spec).collect()}
    c = {r.doc_id for r in stratified_sample(corpus, ["lang"], 1, 3).collect()}
    assert a == b == c


def test_weighted_sample_is_weight_proportional(spark):
    """Statistical contract: over many distinct-content rows, heavy rows
    (weight 9) must be selected ~9x as often as light rows (weight 1)
    when sampling ~half the corpus. Deterministic draw, so the test is
    exact-replay stable."""
    from chunker_spark.ops.curation import weighted_sample

    rows = [(i, f"unique document body number {i}", 9 if i % 2 else 1)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w int")
    got = weighted_sample(df, k=1000, weight_col="w").collect()
    heavy = sum(1 for r in got if r.w == 9)
    light = 1000 - heavy
    # the draw is deterministic (content-hash uniforms), so the split
    # is exactly reproducible: 813/187 with this corpus — a 4.3:1 pull
    # toward the 9x-weighted rows at 50% draw depth (at that depth most
    # heavy rows are already in, so the ratio is depth-compressed, not
    # 9:1). Band, not pin, so cosmetic text edits don't break it.
    assert 4 * light < heavy, (heavy, light)
    assert 780 <= heavy <= 880, (heavy, light)
    # determinism + stability under repartition
    again = weighted_sample(df.repartition(13), k=1000, weight_col="w").collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in got}


def test_weighted_sample_duplicate_content_and_validation(spark):
    """Duplicate content draws the SAME uniform (the anti-leakage
    property): with equal weights, two identical texts share their
    sample_key; non-positive/null weights are excluded, never -inf."""
    from chunker_spark.ops.curation import weighted_sample

    rows = [(1, "twin", 5), (2, "twin", 5), (3, "other", 5),
            (4, "zero-w", 0), (5, "neg-w", -3), (6, None if False else "nullw", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w int")
    got = {r.doc_id: r.sample_key for r in weighted_sample(df, k=10, weight_col="w").collect()}
    assert got[1] == got[2]            # same content, same key
    assert {4, 5, 6}.isdisjoint(got)   # zero/negative/null weight: out
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, k=0, weight_col="w")


def test_export_jsonl_shards_roundtrip_deterministic_and_verified(spark, tmp_path):
    """The training-export sink: shard assignment is a pure hash of the
    id (partitioning-independent), rows sort within shards, so two
    exports of the same frame are byte-identical; the round-trip read
    recovers the exact corpus; verify_export passes on a clean export
    and fails the shard whose file is tampered with."""
    import glob
    import hashlib

    from chunker_spark.ops.export import export_jsonl_shards, verify_export

    rows = [(i, f"document body {i} " + "x" * (i % 37)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def digest_tree(p):
        out = {}
        for f in sorted(glob.glob(f"{p}/shard=*/part-*")):
            rel = f.split(p, 1)[1].rsplit("/", 1)[0]  # dir part; file names vary per job
            out.setdefault(rel, hashlib.sha256()).update(open(f, "rb").read())
        return {k: v.hexdigest() for k, v in out.items()}

    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    m1 = export_jsonl_shards(df, p1, n_shards=8)
    export_jsonl_shards(df.repartition(13), p2, n_shards=8)  # different input layout
    assert digest_tree(p1) == digest_tree(p2)  # byte-identical shard contents
    assert sum(r["n_docs"] for r in m1.collect()) == 300

    back = spark.read.option("basePath", p1).json(f"{p1}/shard=*")
    assert {(r["doc_id"], r["text"]) for r in back.collect()} == set(rows)

    ok = verify_export(spark, p1)
    assert all(r["ok"] for r in ok.collect())

    # tamper with one shard file: its row must fail, others stay green
    # (drop the local-FS .crc sidecar so the read reaches the manifest
    # check — object stores have no such sidecar)
    import os

    victim = sorted(glob.glob(f"{p1}/shard=*/part-*"))[0]
    d, b = os.path.split(victim)
    os.remove(os.path.join(d, f".{b}.crc"))
    with open(victim, "a") as f:
        f.write('{"doc_id": 999999, "text": "injected"}\n')
    res = {r["shard"]: r["ok"] for r in verify_export(spark, p1).collect()}
    assert sum(1 for v in res.values() if not v) == 1


def test_lm_score_ranks_gibberish_above_typical(spark):
    """The unigram quality scorer (CCNet perplexity-filter core):
    corpus-typical text scores LOW cross-entropy, OOV gibberish scores
    at the OOV ceiling, and the exact integer micro-nat score equals
    an independent Python recomputation of the same model."""
    import math
    from collections import Counter
    from decimal import Decimal

    from chunker_spark.ops.lm_score import lm_cross_entropy, unigram_model

    typical = "the quick brown fox jumps over the lazy dog"
    rows = [(i, typical + f" variant {i % 7}") for i in range(40)]
    rows.append((100, "zzqx vvkw jjqz xxoq pplm zzqx"))  # pure OOV gibberish
    df = spark.createDataFrame(rows, "doc_id long, text string")

    model = unigram_model(df, vocab_size=10)
    got = {
        r["doc_id"]: (r["n_tokens"], r["ce_micro_nats"])
        for r in lm_cross_entropy(df, model).collect()
    }
    assert got[100][1] > got[0][1]  # gibberish far from the corpus

    # independent scalar recomputation (same smoothing, same cut)
    words = []
    for _, t in rows:
        words += [w for w in "".join(c if c.isalpha() else " " for c in t.lower()).split()]
    counts = Counter(words)
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    denom = float(sum(tf for _, tf in vocab)) + len(vocab) + 1.0
    logp = {w: Decimal(str(round(math.log((tf + 1) / denom), 6))) for w, tf in vocab}
    oov = Decimal(str(round(math.log(1.0 / denom), 6)))

    for doc_id, text in rows:
        ws = [w for w in "".join(c if c.isalpha() else " " for c in text.lower()).split()]
        total = sum(logp.get(w, oov) for w in ws)
        p = int(-total * 1_000_000)
        n = len(ws)
        assert got[doc_id] == (n, (2 * p + n) // (2 * n)), doc_id


# ---------------------------------------------------------------------
# count-min sketch (ops/sketches.py)
# ---------------------------------------------------------------------


def test_cms_contract_on_skewed_keys(spark):
    """The two halves of the CMS contract on a deliberately skewed key
    column: never undercounts, overcounts by <= eps*N (deterministic
    with a fixed seed); an absent key's estimate is pure collision
    mass, also bounded by eps*N."""
    import math

    from pyspark.sql import functions as F

    from chunker_spark.ops.sketches import cms_estimates, cms_sketch_bytes

    # 10k rows, zipf-ish: key k repeated ~10000/(k+1) times
    rows = [(f"k{k}",) for k in range(50) for _ in range(10_000 // (k + 1))]
    df = spark.createDataFrame(rows, "key string").repartition(8)
    n = len(rows)
    exact = {}
    for k, in rows:
        exact[k] = exact.get(k, 0) + 1

    eps = 1e-3
    sk = cms_sketch_bytes(df, "key", eps=eps, confidence=0.99, seed=7)
    keys = sorted(exact) + ["absent-key"]
    est, total = cms_estimates(spark, sk, keys)
    assert total == n
    bound = math.ceil(eps * n)
    for k, c in exact.items():
        assert est[k] >= c, (k, est[k], c)
        assert est[k] <= c + bound, (k, est[k], c, bound)
    assert 0 <= est["absent-key"] <= bound


def test_cms_integral_keys_and_merge_equivalence(spark):
    """Integral keys round-trip through the py4j overload, and the
    distributed (partitioned, merged) sketch equals the single-
    partition sketch bit-for-bit — the map-side-combine contract."""
    from pyspark.sql import functions as F

    from chunker_spark.ops.sketches import cms_estimates, cms_sketch_bytes

    df = spark.range(0, 5_000).select((F.col("id") % 97).alias("key"))
    sk_many = cms_sketch_bytes(df.repartition(8), "key", seed=11)
    sk_one = cms_sketch_bytes(df.coalesce(1), "key", seed=11)
    assert sk_many == sk_one
    est, total = cms_estimates(spark, sk_many, [0, 1, 96])
    assert total == 5_000
    # 5000/97 = 51 r 53 -> keys 0..52 occur 52 times, the rest 51
    assert est[0] >= 52 and est[96] >= 51


def test_retain_canonical_argmax_ties_and_single_exchange(spark):
    """Exactly one kept per cluster; argmax by score with lowest-id
    tiebreak; singletons kept; and the plan carries ONE Exchange (both
    windows reuse the same cluster partitioning)."""
    from pyspark.sql import functions as F

    from chunker_spark.ops.curation import retain_canonical

    rows = [
        (1, "a", 10), (2, "a", 30), (3, "a", 30),   # tie at 30 -> id 2 wins
        (7, "b", 5),                                  # singleton
        (8, "c", 1), (9, "c", 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, cluster string, score long")
    out = retain_canonical(df)
    # capture before the action: a finalized AQE plan prints Final +
    # Initial sections and would double-count the one Exchange
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    plan = out._jdf.queryExecution().explainString(jmode)
    assert plan.count("Exchange") == 1, plan
    got = {r["doc_id"]: r for r in out.collect()}
    assert [got[i]["kept"] for i in (1, 2, 3)] == [False, True, False]
    assert got[7]["kept"] and got[7]["n_members"] == 1 and got[7]["rep"] == 7
    assert got[9]["kept"] and not got[8]["kept"]
    assert got[3]["rep"] == 1 and got[3]["n_members"] == 3
    per_cluster = (
        out.where("kept").groupBy("cluster").count().select("count").collect()
    )
    assert all(r["count"] == 1 for r in per_cluster)


# ---------------------------------------------------------------- bloom


def test_bloom_params_sizing():
    import math

    from chunker_spark.ops.bloom import bloom_params

    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    # classic sizing: ~9.59 bits/item at 1% fpp, k ~= 7
    assert 9 * 1000 <= m <= 11 * 1000
    assert k in (6, 7, 8)
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Every inserted member probes positive (mathematical guarantee);
    false positives over a 20x-larger non-member universe stay within
    ~3x the sizing fpp (generous gate: xxhash64 lanes are not the
    idealized independent hashes)."""
    from chunker_spark.ops.bloom import bloom_build, bloom_params, bloom_probe

    n_members, n_non = 500, 10_000
    m, k = bloom_params(n_members, 0.01)
    members = spark.range(n_members).select(F.xxhash64("id").alias("fp"))
    bloom = bloom_build(members, "fp", m, k)
    probe_members = spark.range(n_members).select(
        F.col("id"), F.xxhash64("id").alias("fp")
    )
    hits = bloom_probe(probe_members, bloom, "fp", "id", m, k)
    assert hits.where(~F.col("bloom_hit")).count() == 0  # no false negatives
    non = spark.range(10_000_000, 10_000_000 + n_non).select(
        F.col("id"), F.xxhash64("id").alias("fp")
    )
    fp_count = (
        bloom_probe(non, bloom, "fp", "id", m, k).where("bloom_hit").count()
    )
    assert fp_count <= int(3 * 0.01 * n_non) + 5


def test_bloom_probe_is_broadcast_join_no_shuffle_of_bitmap(spark):
    """The probe plan broadcasts the bitmap relation: no SortMergeJoin,
    no cartesian — the corpus side is never shuffled by the join (the
    only Exchange is the final fixed-width per-id AND-reduce)."""
    from chunker_spark.ops.bloom import bloom_build, bloom_params, bloom_probe

    m, k = bloom_params(100, 0.01)
    members = spark.range(100).select(F.xxhash64("id").alias("fp"))
    bloom = bloom_build(members, "fp", m, k)
    docs = spark.range(1000).select(F.col("id"), F.xxhash64("id").alias("fp"))
    plan = (
        bloom_probe(docs, bloom, "fp", "id", m, k)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_bloom_decontaminate_planted_duplicates(spark):
    """bloom_decontaminate flags the reference docs AND any training doc
    whose normalized content duplicates a reference doc (case/whitespace
    variants included); clean docs stay unflagged at this tiny scale
    (expected FPs ~ fpp * n << 1)."""
    from chunker_spark.ops.decontaminate import bloom_decontaminate

    rows = [(i, f"unique document body number {i} with words") for i in range(40)]
    rows.append((100, "UNIQUE   document Body number 7 WITH words"))  # dup of 7
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = docs.where("doc_id < 10").select("text")
    out = {r.doc_id: r.bloom_hit for r in bloom_decontaminate(docs, ref).collect()}
    assert all(out[i] for i in range(10))
    assert out[100] is True  # normalized duplicate of a reference doc
    assert not any(out[i] for i in range(10, 40))
