"""Multimodal-column plumbing — BASELINE.json north-star.

Images/audio/video are opaque `binary` columns with typed metadata.
The decode libraries aren't in this container, so the *decode kernels*
are stubs (`NotImplementedError` behind an import-try, plus a
deterministic fake used in tests), but the Spark-side plumbing is real
and oracle-checked: binary casting, Arrow-batched `mapInPandas` with an
explicit output schema, per-batch vectorized work, frame-offset
explosion.

At 100 TB this is the pattern that matters: blobs stay columnar in
parquet, the decode UDF is Arrow-batched (no per-row Python), and
partition sizing bounds decode memory (maxPartitionBytes vs frame
buffer).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binancedatapipelineinaws_spark.registry import register
from binancedatapipelineinaws_spark.session import prepare
from binancedatapipelineinaws_spark.tables import load_table

META_SCHEMA = (
    "doc_id long, n_bytes long, head_hex string, content_md5 string, "
    "fake_width int, fake_height int"
)


def decode_image(data: bytes) -> "object":
    """Real decode kernel — requires an image library not present in
    this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires pillow; container ships without it — "
            "use fake_decode_meta for deterministic tests"
        ) from exc
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(data)) here")


def fake_decode_meta(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decoded (width, height): derived from
    the content hash, so the oracle can reproduce it."""
    h = hashlib.md5(data).hexdigest()
    return int(h[:8], 16) % 1920, int(h[8:16], 16) % 1080


def make_extract_meta_kernel():
    """Build the mapInPandas kernel as a closure: cloudpickle then
    serializes it BY VALUE, so Spark's Python workers don't need this
    package importable on their own sys.path (the external driver may
    launch from any CWD)."""

    def extract_meta_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # one Arrow batch in, one metadata frame out; vectorized per batch
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            blobs = pdf["blob"]
            digests = [_hashlib.md5(b).hexdigest() for b in blobs]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in blobs],
                    "head_hex": [b[:8].hex() for b in blobs],
                    "content_md5": digests,
                    "fake_width": [int(h[:8], 16) % 1920 for h in digests],
                    "fake_height": [int(h[8:16], 16) % 1080 for h in digests],
                }
            )

    return extract_meta_batches


# module-level alias for unit tests (driver-side use only)
extract_meta_batches = make_extract_meta_kernel()


@register(
    "q_ext_multimodal_meta",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS head_hex,
       md5(text) AS content_md5,
       CAST(("""
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(text), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    + """) % 1920 AS INTEGER) AS fake_width,
       CAST(("""
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(text), {i + 9}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    + """) % 1080 AS INTEGER) AS fake_height
FROM documents
""",
)
def q_ext_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction through Arrow-batched
    mapInPandas (documents.text cast to binary stands in for image
    bytes; ASCII corpus, so byte length == char length)."""
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return blobs.mapInPandas(make_extract_meta_kernel(), schema=META_SCHEMA)


@register(
    "q_ext_multimodal_frames",
    oracle="""
SELECT doc_id,
       CAST(f.frame_idx AS BIGINT) AS frame_idx,
       CAST(f.frame_idx * 256 AS BIGINT) AS byte_offset,
       least(CAST((f.frame_idx + 1) * 256 AS BIGINT),
             CAST(length(text) AS BIGINT)) AS byte_end
FROM documents,
     LATERAL (SELECT unnest(range(CAST(ceil(length(text) / 256.0) AS BIGINT)))
              AS frame_idx) f
""",
)
def q_ext_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: explode each blob into fixed-size frame
    windows (offset plan only — the decode of each frame is the stubbed
    kernel).  posexplode keeps this a map-only plan."""
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.ceil(F.length("text") / 256.0).cast("long")
    return (
        docs.select(
            "doc_id",
            F.length("text").cast("long").alias("n_bytes"),
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            (F.col("frame_idx") * 256).cast("long").alias("byte_offset"),
            F.least((F.col("frame_idx") + 1) * 256, F.col("n_bytes"))
            .cast("long")
            .alias("byte_end"),
        )
    )
