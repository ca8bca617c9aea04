"""T3: Spark manifest UDF over a files DataFrame matches the kernel
oracle, and the content-sha256 invariant holds (SURVEY.md §5.2)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from chunker_spark.cdc.events import GenSpec, content_at
from chunker_spark.functions.manifest import chunk_store, with_manifest
from chunker_spark.kernel import ChunkerParams, chunk_buffer

PARAMS = ChunkerParams(average_bits=10, min_size=512, max_size=8192)


@pytest.fixture(scope="module")
def files(spark):
    spec = GenSpec(seed=7, n_keys=40, mean_blocks=6)
    rows = []
    for k in range(40):
        repo, path = spec.key_repo_path(k)
        rows.append((repo, path, f"c{k}", "py", content_at(spec, k, 0)))
    return spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")


def test_manifest_matches_kernel(spark, files):
    out = with_manifest(files, params=PARAMS).select("repo", "path", "content", "content_sha256", "size", "manifest")
    for row in out.collect():
        data = row["content"].encode("utf-8")
        assert row["content_sha256"] == hashlib.sha256(data).hexdigest()
        assert row["size"] == len(data)
        expected = chunk_buffer(data, PARAMS)
        got = row["manifest"]
        assert len(got) == len(expected)
        for g, e in zip(got, expected):
            assert (g["offset"], g["length"], g["cut"]) == (e.offset, e.length, e.cut)
            assert g["chunk_sha256"] == hashlib.sha256(data[e.offset : e.end]).hexdigest()
        # manifest tiles the content exactly
        assert sum(g["length"] for g in got) == len(data)


def test_manifest_null_and_empty(spark):
    df = spark.createDataFrame([("a", None), ("b", "")], "path string, content string")
    out = {r["path"]: r["manifest"] for r in with_manifest(df, params=PARAMS).collect()}
    assert out["a"] is None
    assert out["b"] == []


def test_chunk_store_refcounts(spark, files):
    """Exploded chunk store: refcount sums to total manifest entries;
    duplicated content (same block appearing in two files) dedups."""
    two = files.limit(1)
    dup = files.limit(1).withColumn("path", F.lit("copy/of/first"))
    df = with_manifest(two.unionByName(dup), params=PARAMS)
    store = chunk_store(df)
    rows = store.collect()
    total_refs = sum(r["refcount"] for r in rows)
    total_chunks = df.select(F.sum(F.size("manifest"))).collect()[0][0]
    assert total_refs == total_chunks
    # identical contents → every chunk has refcount 2
    assert all(r["refcount"] == 2 for r in rows)


def test_expected_fixture_coverage_self_repair(tmp_path):
    """The expected-vector fixture extends itself when asked to cover a
    corpus it has never seen (VERDICT r3 item 1): build it over corpus A
    only, then request coverage of corpus B via extra_dirs and assert
    B's digests appear — the oracle's content-hash join can't shrink."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chunker_spark.functions.manifest import manifest_expected_fixture_path

    def corpus(name, texts):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.table({"text": pa.array(texts, pa.string())}),
                       str(d / "documents.parquet"))
        return str(d)

    a = corpus("sfA", ["alpha " * 50, "beta " * 80, None])
    b = corpus("sfB", ["gamma " * 120, "alpha " * 50])  # one overlap, one new
    base = str(tmp_path / "fix")

    p1 = manifest_expected_fixture_path(base=base, sf_dirs=(a,))
    n1 = pq.read_table(p1).num_rows
    assert n1 == 2  # two distinct non-null contents in A

    # second call with an uncovered corpus extends in place
    p2 = manifest_expected_fixture_path(base=base, sf_dirs=(a,), extra_dirs=(b,))
    assert p2 == p1
    t2 = pq.read_table(p2)
    assert t2.num_rows == 3  # + gamma only (alpha dedups by content hash)

    digs = set(t2.column("content_sha256").to_pylist())
    for text in ["alpha " * 50, "beta " * 80, "gamma " * 120]:
        assert hashlib.sha256(text.encode()).hexdigest() in digs

    # idempotent: covered corpora trigger no rewrite
    import os
    mtime = os.stat(p2).st_mtime_ns
    manifest_expected_fixture_path(base=base, sf_dirs=(a,), extra_dirs=(b,))
    assert os.stat(p2).st_mtime_ns == mtime
