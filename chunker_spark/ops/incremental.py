"""Incrementally-maintained dedup state from a change-data-feed.

The batch dedup ops (`ops/dedup.py`) answer "which documents are
duplicates" by scanning the corpus. At 100 TB the corpus barely
changes between ingest commits, so rescanning it per refresh is the
wrong cost model: the change feed (`LakeTable.changes`) already names
exactly the keys that moved. This module maintains a **fingerprint
store** — one fixed-width (key..., fp) row per live document — purely
from CDF intervals:

- upserted keys contribute sha2(content) computed MAP-SIDE on the
  interval's postimages (the content column never shuffles — only
  fixed-width key+fp rows do, plan-asserted in tests);
- every touched key's previous row is retracted with an anti-join
  against the interval's key set (broadcast-sized: an interval is a
  batch, not a corpus);
- deletes simply contribute no replacement row.

Invariant (tested after every commit): the maintained store equals
``sha2(content)`` over a full recompute of the resolved table. Dup
groups are then one groupBy(fp) over fixed-width rows — no text.

The persistence wrapper (`FingerprintStore`) keeps the store as
parquet beside a tiny JSON state file recording the last-applied
commit, applying intervals idempotently: a re-run of the same refresh
sees ``since == last_applied`` and no-ops, the same ledger discipline
the lake itself uses for batches. `SignatureStore` (MinHash near-dup)
and `WindowCountStore` (duplicated-substring window counts) share the
ledger machinery through `_CdfStoreBase`.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


class _CdfStoreBase:
    """Shared ledger machinery for CDF-maintained parquet stores: a
    JSON sidecar pinning the last-applied commit (and the store's
    creation-time parameters), atomic cutover via os.replace, and
    generation GC that keeps the new store AND its immediate
    predecessor — so a lazy DataFrame handed out by ``read()`` before
    a refresh stays readable for one more cycle instead of pointing at
    a deleted directory; only generations older than that are removed.

    Subclasses set ``_empty_schema`` (DDL string for the empty store)
    and implement ``_bootstrap(lake)`` / ``_update(lake, last, cur)``;
    parameterized stores override ``_params`` to pin their signature
    parameters in the sidecar (a reopen with different values is a
    hard error, not a silent mix of incomparable state).
    """

    _empty_schema: str = ""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _state_file(self) -> str:
        return os.path.join(self.path, "state.json")

    def last_applied(self) -> int | None:
        if not os.path.exists(self._state_file):
            return None
        with open(self._state_file) as f:
            return json.load(f)["last_commit"]

    def _data_dir(self, commit: int) -> str:
        return os.path.join(self.path, f"store-{commit:012d}")

    @property
    def _params(self) -> dict | None:
        return None

    def _check_params(self) -> None:
        if self._params is None or not os.path.exists(self._state_file):
            return
        with open(self._state_file) as f:
            saved = json.load(f).get("params")
        if saved is not None and saved != self._params:
            raise ValueError(
                f"{type(self).__name__} at {self.path} was built with {saved}, "
                f"reopened with {self._params}; delete the store to re-bootstrap"
            )

    def read(self) -> DataFrame:
        self._check_params()
        last = self.last_applied()
        if last is None:
            return self.spark.createDataFrame([], self._empty_schema)
        return self.spark.read.parquet(self._data_dir(last))

    def _bootstrap(self, lake) -> DataFrame:
        raise NotImplementedError

    def _update(self, lake, last: int, cur: int) -> DataFrame:
        raise NotImplementedError

    def refresh(self, lake) -> dict:
        """Advance the store to the lake's current commit. Bootstrap
        (first call) computes state from the full resolved table once;
        every later call processes only `changes(last, current)`.
        Returns {'applied': bool, 'from': ..., 'to': ...}."""
        self._check_params()
        cur = lake.current_commit()["commit_seq"]
        last = self.last_applied()
        if last is not None and cur <= last:
            return {"applied": False, "from": last, "to": cur}
        new_store = self._bootstrap(lake) if last is None else self._update(lake, last, cur)
        new_store.write.mode("overwrite").parquet(self._data_dir(cur))
        tmp = f"{self._state_file}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"last_commit": cur, "params": self._params}, f)
        os.replace(tmp, self._state_file)  # atomic cutover, crash-safe
        keep = {f"store-{cur:012d}"}
        if last is not None:
            keep.add(f"store-{last:012d}")  # predecessor survives one cycle
        for d in os.listdir(self.path):
            if d.startswith("store-") and d not in keep:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        return {"applied": True, "from": last, "to": cur}


def update_fingerprint_store(
    store: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path"),
    content_col: str = "content",
) -> DataFrame:
    """Apply one CDF interval to a (key..., fp) store; returns the new
    store. ``changes`` is the `LakeTable.changes` output (net change
    per key: insert / update_postimage / delete)."""
    keys = list(key_cols)
    upserts = (
        changes.where(F.col("_change_type") != "delete")
        .select(*keys, F.sha2(F.col(content_col).cast("binary"), 256).alias("fp"))
    )
    touched = changes.select(*keys).distinct()
    survivors = store.join(F.broadcast(touched), on=keys, how="left_anti")
    return survivors.unionByName(upserts)


def dup_groups(store: DataFrame, key_cols: tuple[str, ...] = ("repo", "path")) -> DataFrame:
    """Duplicate-content groups from the store alone: (fp, n_copies,
    example key columns minimum). Fixed-width aggregate; the corpus
    text is never touched."""
    keys = list(key_cols)
    return (
        store.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            *[F.min(k).alias(f"min_{k}") for k in keys],
        )
        .where(F.col("n_copies") > 1)
    )


class FingerprintStore(_CdfStoreBase):
    """Parquet-persisted fingerprint store with exactly-once interval
    application (last-applied commit in a JSON sidecar)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: tuple[str, ...] = ("repo", "path"),
        content_col: str = "content",
    ) -> None:
        super().__init__(spark, path)
        self.key_cols = tuple(key_cols)
        self.content_col = content_col

    @property
    def _empty_schema(self) -> str:
        return ", ".join([f"{k} string" for k in self.key_cols] + ["fp string"])

    def _bootstrap(self, lake) -> DataFrame:
        return lake.read().select(
            *self.key_cols,
            F.sha2(F.col(self.content_col).cast("binary"), 256).alias("fp"),
        )

    def _update(self, lake, last: int, cur: int) -> DataFrame:
        return update_fingerprint_store(
            self.read(),
            lake.changes(since=last, until=cur),
            key_cols=self.key_cols,
            content_col=self.content_col,
        )


# ---- incrementally-maintained MinHash signatures (near-dup) ----------


def update_signature_store(
    store: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path"),
    content_col: str = "content",
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 1,
) -> DataFrame:
    """Apply one CDF interval to a (key..., sig) MinHash-signature
    store. Same retraction discipline as the fingerprint store; the
    expensive Pandas-UDF signature computation runs over the INTERVAL's
    postimages only — at 100 TB that is the difference between
    re-shingling a corpus nightly and re-shingling a batch."""
    from .dedup import minhash_udf

    keys = list(key_cols)
    upserts = changes.where(F.col("_change_type") != "delete").select(
        *keys,
        minhash_udf(num_hashes, shingle_k, seed)(F.col(content_col)).alias("sig"),
    )
    touched = changes.select(*keys).distinct()
    survivors = store.join(F.broadcast(touched), on=keys, how="left_anti")
    return survivors.unionByName(upserts)


def near_dup_pairs_from_store(
    store: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path"),
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    probe: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs from the signature store alone — the corpus
    text is never read. With ``probe`` (a frame of key columns, e.g.
    the latest CDF interval's upserted keys) only pairs INVOLVING a
    probe key are generated: probe-side band rows join the full store's
    band index, so the per-refresh cost is O(interval x bucket width),
    not O(corpus^2) — the incremental query an ingest pipeline runs
    after every commit ("which existing documents does this batch
    near-duplicate?").

    Returns (key_a, key_b, jaccard_est) where each key is the
    unit-separator join of ``key_cols`` and key_a < key_b.
    """
    from .dedup import band_rows, jaccard_est_expr

    rows_per_band = num_hashes // bands
    keys = list(key_cols)
    tagged = store.select(
        F.concat_ws("\x1f", *keys).alias("id"), F.col("sig")
    )
    banded = band_rows(tagged, ["id"], bands, rows_per_band)
    if probe is None:
        left = banded
    else:
        probe_ids = probe.select(F.concat_ws("\x1f", *keys).alias("id")).distinct()
        left = banded.join(F.broadcast(probe_ids), "id", "left_semi")
    cand = (
        left.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkt") == F.col("r.bkt"))
            & (F.col("l.id") != F.col("r.id")),
        )
        # normalize so a pair of two probe keys appears once
        .select(
            F.least("l.id", "r.id").alias("id_a"),
            F.greatest("l.id", "r.id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    withsigs = cand.join(
        tagged.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(tagged.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    return (
        withsigs.withColumn("jaccard_est", jaccard_est_expr())
        .where(F.col("jaccard_est") >= threshold)
        .select(F.col("id_a").alias("key_a"), F.col("id_b").alias("key_b"), "jaccard_est")
    )


class SignatureStore(_CdfStoreBase):
    """Parquet-persisted MinHash-signature store with exactly-once CDF
    interval application — the near-dup sibling of `FingerprintStore`
    (same JSON-sidecar ledger, atomic cutover, generation GC).

    Signatures are a pure function of (num_hashes, shingle_k, seed):
    reopening an existing store with different values would silently
    mix incomparable signatures into one table on the next incremental
    refresh, so the sidecar pins the creation-time values and a
    mismatch is a hard error, not a degradation."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: tuple[str, ...] = ("repo", "path"),
        content_col: str = "content",
        num_hashes: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        seed: int = 1,
    ) -> None:
        super().__init__(spark, path)
        self.key_cols = tuple(key_cols)
        self.content_col = content_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_k = shingle_k
        self.seed = seed

    @property
    def _params(self) -> dict:
        return {
            "num_hashes": self.num_hashes,
            "shingle_k": self.shingle_k,
            "seed": self.seed,
        }

    @property
    def _empty_schema(self) -> str:
        return ", ".join(
            [f"{k} string" for k in self.key_cols] + ["sig array<bigint>"]
        )

    def _bootstrap(self, lake) -> DataFrame:
        from .dedup import minhash_udf

        mk_sig = minhash_udf(self.num_hashes, self.shingle_k, self.seed)
        return lake.read().select(
            *self.key_cols, mk_sig(F.col(self.content_col)).alias("sig")
        )

    def _update(self, lake, last: int, cur: int) -> DataFrame:
        return update_signature_store(
            self.read(),
            lake.changes(since=last, until=cur),
            key_cols=self.key_cols,
            content_col=self.content_col,
            num_hashes=self.num_hashes,
            shingle_k=self.shingle_k,
            seed=self.seed,
        )

    def near_dups(self, threshold: float = 0.6, probe: DataFrame | None = None) -> DataFrame:
        return near_dup_pairs_from_store(
            self.read(),
            key_cols=self.key_cols,
            num_hashes=self.num_hashes,
            bands=self.bands,
            threshold=threshold,
            probe=probe,
        )


# ---- incrementally-maintained substring-window counts -----------------


def update_window_counts(
    counts: DataFrame,
    changes: DataFrame,
    content_col: str = "content",
    k: int = 8,
    assume_preimages: bool = False,
) -> DataFrame:
    """Apply one CDF interval (read with ``include_preimages=True``) to
    the corpus-wide (h, n) k-window digest counts — the state behind
    incremental duplicated-substring detection (`ops/substrings.py`):

    - every insert / update_postimage row contributes +1 per window of
      its content;
    - every update_preimage / delete row contributes -1 per window of
      its OLD content (this is exactly why the preimage feed exists:
      counts are retractable aggregates).

    A changes frame read WITHOUT preimages corrupts the store silently
    (deletes carry null content → the retraction vanishes; updates add
    with no matching subtract), so this function requires the
    ``include_preimages`` marker `LakeTable.changes` stamps on
    ``_change_type``; pass ``assume_preimages=True`` only for
    hand-built frames that really do carry preimage rows.

    One map-side explode of the interval's rows (fixed-width
    (digest, ±1) rows — the corpus text never shuffles), one partial
    aggregate of the deltas, one full-outer merge with the store;
    zero-or-negative counts drop out. Cost per refresh is O(interval
    tokens + store), never O(corpus tokens)."""
    from .substrings import window_digests

    if not assume_preimages:
        meta = (
            changes.schema["_change_type"].metadata
            if "_change_type" in changes.columns
            else {}
        )
        if not meta.get("cdf_preimages"):
            raise ValueError(
                "update_window_counts needs the retraction feed: read the "
                "interval with lake.changes(..., include_preimages=True), or "
                "pass assume_preimages=True for a hand-built frame that "
                "carries update_preimage rows and pre-delete payloads"
            )
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = (
        changes.select(
            F.explode(window_digests(content_col, k)).alias("h"), sign.alias("d")
        )
        .groupBy("h")
        .agg(F.sum("d").alias("d"))
    )
    merged = counts.join(deltas, "h", "full_outer").select(
        "h",
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("d"), F.lit(0))).alias("n"),
    )
    return merged.where(F.col("n") > 0)


class WindowCountStore(_CdfStoreBase):
    """Parquet-persisted k-window digest counts with exactly-once CDF
    interval application — the duplicated-substring sibling of
    `FingerprintStore` (same JSON-sidecar ledger, atomic cutover,
    generation GC). ``dup_windows()`` is the live duplicated-window
    set; joining it against a batch's window digests answers "does
    this new document repeat anything in the corpus" without a corpus
    scan."""

    _empty_schema = "h string, n bigint"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        content_col: str = "content",
        k: int = 8,
    ) -> None:
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        super().__init__(spark, path)
        self.content_col = content_col
        self.k = int(k)

    @property
    def _params(self) -> dict:
        return {"k": self.k}

    def dup_windows(self, min_count: int = 2) -> DataFrame:
        return self.read().where(F.col("n") >= min_count)

    def _bootstrap(self, lake) -> DataFrame:
        from .substrings import window_digests

        return (
            lake.read()
            .select(F.explode(window_digests(self.content_col, self.k)).alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def _update(self, lake, last: int, cur: int) -> DataFrame:
        return update_window_counts(
            self.read(),
            lake.changes(since=last, until=cur, include_preimages=True),
            content_col=self.content_col,
            k=self.k,
        )


def probe_window_duplicates(
    store_or_counts,
    batch: DataFrame,
    id_cols: tuple[str, ...] = ("repo", "path"),
    content_col: str | None = None,
    k: int | None = None,
    min_count: int = 2,
) -> DataFrame:
    """Probe-mode duplicated-substring check for an incoming batch: for
    each batch document, how many of its k-token windows already read
    duplicated in the CURRENT corpus index — the per-commit question
    ("does this new content repeat anything we have?") answered against
    the maintained counts alone, O(batch tokens + dup set), with no
    corpus scan and no shuffle of any text.

    ``store_or_counts`` is a ``WindowCountStore`` or a raw (h, n)
    frame. With a store, ``k`` and ``content_col`` default to the
    store's pinned values and an explicit mismatch is a hard error
    (digests computed with a different k never match the index — the
    probe would silently report zero duplicates); with a raw frame
    they default to k=8 / "content" and the caller owns the match.

    Returns (id..., n_windows, n_dup_windows, dup_fraction). Note the
    index reflects the corpus as of its last refresh: windows
    duplicated only WITHIN the probe batch itself are not counted —
    refresh first if self-duplication matters."""
    from .substrings import window_digests

    if isinstance(store_or_counts, WindowCountStore):
        store = store_or_counts
        if k is not None and k != store.k:
            raise ValueError(
                f"probe k={k} does not match the store's pinned k={store.k}"
            )
        if content_col is not None and content_col != store.content_col:
            raise ValueError(
                f"probe content_col={content_col!r} does not match the "
                f"store's pinned content_col={store.content_col!r}"
            )
        k, content_col = store.k, store.content_col
        counts = store.read()
    else:
        counts = store_or_counts
        k = 8 if k is None else k
        content_col = "content" if content_col is None else content_col
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
    dup = counts.where(F.col("n") >= min_count).select("h", F.lit(1).alias("_dup"))
    ids = list(id_cols)
    win = batch.select(*ids, F.explode(window_digests(content_col, k)).alias("h"))
    # one pass: dup digests are unique (grouped counts), so the left
    # join never multiplies rows and both counts come from one aggregate
    stats = (
        win.join(dup, "h", "left")
        .groupBy(*ids)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count("_dup").alias("n_dup_windows"),
        )
    )
    return (
        batch.select(*ids)
        .distinct()
        .join(stats, ids, "left")
        .select(
            *ids,
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.coalesce("n_dup_windows", F.lit(0))
                / F.col("n_windows").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )
