"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
``mapInPandas`` stages over Arrow batches. The decode step is probed at
use: ``decoder="real"`` decodes IMAGE payloads with PIL when it is
installed (thumbnail-grayscale feature vector, deterministic) and
raises NotImplementedError otherwise — the exact seam where a
deployment's imaging stack plugs in; audio/video real decode stays a
NotImplementedError seam (ffmpeg). The default deterministic fake
decoder keyed on payload bytes keeps every oracle environment-
independent. The Spark-side plumbing — schema, batch iteration,
partition sizing — is real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", StructType([
            StructField("format", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_ms", LongType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_sha256", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _pil():
    """PIL.Image if installed, else None — probed at use, never at
    module import, so the package imports identically everywhere."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a unit vector seeded
    by the payload digest. Replace with PIL/torchaudio/ffmpeg here."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _real_image_decode(payload: bytes, dim: int) -> np.ndarray:
    """Actual image decode (PIL): grayscale thumbnail, row-major pixel
    vector truncated to ``dim``, scaled to [0,1] and L2-normalized —
    deterministic for a given payload, like every decoder here."""
    from io import BytesIO

    img = _pil().open(BytesIO(payload)).convert("L")
    k = int(np.ceil(np.sqrt(dim)))
    arr = np.asarray(img.resize((k, k)), dtype=np.float32).ravel()[:dim]
    arr = arr / np.float32(255.0)
    n = float(np.linalg.norm(arr))
    return arr / np.float32(n) if n else arr


def extract_features(
    media: DataFrame, dim: int = 16, decoder: str = "fake", batch_limit: int = 256
) -> DataFrame:
    """media table -> feature table via mapInPandas.

    ``decoder='real'`` runs the PIL image decode when PIL is installed
    (driver-probed — executors on a homogeneous cluster share the
    environment) and raises NotImplementedError otherwise; audio/video
    rows under the real decoder raise executor-side (the ffmpeg seam).
    ``decoder='fake'`` (default) is the deterministic environment-
    independent path the oracles pin.
    """
    if decoder == "real" and _pil() is None:
        raise NotImplementedError(
            "decoder='real' requires PIL (pip install pillow); this "
            "environment does not have it — use decoder='fake' "
            "(deterministic) for plumbing tests"
        )

    def decode(kind: str, payload: bytes) -> list[float]:
        if decoder == "real":
            if kind == "image":
                return _real_image_decode(payload, dim).tolist()
            raise NotImplementedError(
                f"real {kind} decode requires ffmpeg/torchaudio — seam "
                "not implemented; filter kind='image' or use decoder='fake'"
            )
        return _fake_decode(payload, dim).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # bound per-output-batch size: payloads may be large
            for lo in range(0, len(b), batch_limit):
                part = b.iloc[lo : lo + batch_limit]
                payloads = part["payload"].map(lambda p: bytes(p) if p is not None else b"")
                yield pd.DataFrame(
                    {
                        "media_id": part["media_id"],
                        "kind": part["kind"],
                        "payload_sha256": payloads.map(
                            lambda p: hashlib.sha256(p).hexdigest()
                        ),
                        "feature": [
                            decode(k, p)
                            for k, p in zip(part["kind"], payloads)
                        ],
                    }
                )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (JVM-side sequence explode; the decode of each frame is
    the stubbed seam above)."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_fixture_path(n: int = 48, seed: int = 5, base: str = "/tmp/chunker_spark_fixtures") -> str:
    """Write the deterministic media fixture as parquet once and return
    its path. Stored flat (no meta struct) with a generation-time
    ``payload_sha256`` column: the oracle reads that column back while
    the Spark query *recomputes* the digest through the mapInPandas
    decode path — the comparison pins the binary round-trip
    parquet -> Spark binary column -> Arrow batch -> pandas bytes.
    Written with pyarrow directly so oracle_sql() can materialize it
    without a SparkSession."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{base}/media_v1_n{n}_s{seed}.parquet"
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, digests = [], [], [], []
    for i in range(n):
        payload = rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8).tobytes()
        ids.append(i)
        kind_col.append(kinds[i % 3])
        payloads.append(payload)
        digests.append(hashlib.sha256(payload).hexdigest())
    table = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "payload_sha256": pa.array(digests, pa.string()),
        }
    )
    os.makedirs(base, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic: concurrent writers converge
    return path


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic media fixture (binary payloads of varied size)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {
                    "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                    "width": 640 if kind != "audio" else None,
                    "height": 480 if kind != "audio" else None,
                    "duration_ms": int(rng.integers(1000, 10000)) if kind != "image" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
