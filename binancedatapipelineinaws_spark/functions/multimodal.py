"""Multimodal-column plumbing — BASELINE.json north-star.

Images/audio/video are opaque `binary` columns with typed metadata.
Lossless raster decode is REAL and dependency-free: `png_decode`
(stdlib zlib inflate + full five-filter unfiltering, r9) and
`bmp_decode` (24-bit BI_RGB) run inside Arrow-batched kernels;
entropy-coded formats (JPEG/video/audio) raise ValueError — they need
a codec library this container doesn't ship, and that is a codec
limitation, not missing plumbing.  The Spark-side plumbing is real and
oracle-checked throughout: binary casting, Arrow-batched `mapInPandas`
with an explicit output schema, per-batch vectorized work,
frame-offset explosion.

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
    "img_format string, fake_width int, fake_height int"
)


def decode_image(data: bytes) -> "object":
    """Full pixel decode — requires an image library not present in
    this container.  Header-only metadata (format, width, height) does
    NOT need it: `parse_image_header` below is dependency-free."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "pixel decode requires pillow; container ships without it — "
            "parse_image_header covers format/dimensions without any "
            "library, fake_decode_meta is the deterministic test fake"
        ) from exc
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(data)) here")


def make_header_parser():
    """Dependency-free image-header parser factory (struct module
    only).  Built as a closure so cloudpickle ships it BY VALUE inside
    the mapInPandas kernel — Spark's Python workers never import this
    package.

    Recognizes PNG (IHDR), BMP (BITMAPCOREHEADER / BITMAPINFOHEADER
    family) and JPEG (SOF marker scan).  Validation is strict enough
    that plain ASCII text can never parse: PNG and JPEG magics contain
    non-ASCII bytes, and the BMP branch requires the little-endian DIB
    header size at offset 14 to be a known constant (ASCII bytes there
    decode to >= 0x20202020) — this is what keeps the text-corpus
    oracle on the deterministic-fake branch on both engines."""
    bmp_dib_sizes = frozenset({12, 40, 52, 56, 64, 108, 124})

    def parse_image_header(data: bytes):
        import struct

        if (
            len(data) >= 24
            and data[:8] == b"\x89PNG\r\n\x1a\n"
            and data[12:16] == b"IHDR"
        ):
            w, h = struct.unpack(">II", data[16:24])
            return ("png", int(w), int(h))
        if len(data) >= 26 and data[:2] == b"BM":
            dib = struct.unpack("<I", data[14:18])[0]
            if dib in bmp_dib_sizes:
                if dib == 12:  # BITMAPCOREHEADER: 16-bit dimensions
                    w, h = struct.unpack("<HH", data[18:22])
                else:  # INFOHEADER+: 32-bit signed, height<0 = top-down
                    w, h = struct.unpack("<ii", data[18:26])
                return ("bmp", int(w), abs(int(h)))
        if len(data) >= 4 and data[:3] == b"\xff\xd8\xff":
            i = 2
            while i + 9 <= len(data):
                if data[i] != 0xFF:
                    break
                marker = data[i + 1]
                if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                    i += 2  # standalone markers carry no length
                    continue
                if i + 4 > len(data):
                    break
                (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
                if (
                    0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)
                    and i + 9 <= len(data)
                ):
                    h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                    return ("jpeg", int(w), int(h))
                i += 2 + seglen
        return None

    return parse_image_header


# module-level alias for unit tests (driver-side use only)
parse_image_header = make_header_parser()


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

    parse = make_header_parser()  # closure-local: pickled by value

    def extract_meta_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # one Arrow batch in, one metadata frame out; vectorized per batch
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            blobs = pdf["blob"]
            digests = [_hashlib.md5(b).hexdigest() for b in blobs]
            headers = [parse(b) for b in blobs]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in blobs],
                    "head_hex": [b[:8].hex() for b in blobs],
                    "content_md5": digests,
                    "img_format": [
                        hdr[0] if hdr else None for hdr in headers
                    ],
                    # real header dimensions when the blob IS an image;
                    # the md5-derived deterministic fake otherwise (the
                    # oracle's text corpus always takes the fake branch)
                    "fake_width": [
                        hdr[1] if hdr else int(h[:8], 16) % 1920
                        for hdr, h in zip(headers, digests)
                    ],
                    "fake_height": [
                        hdr[2] if hdr else int(h[8:16], 16) % 1080
                        for hdr, h in zip(headers, digests)
                    ],
                }
            )

    return extract_meta_batches


# module-level alias for unit tests (driver-side use only)
extract_meta_batches = make_extract_meta_kernel()


def _frame_seq(n_frames):
    """[0, n_frames) as an array column, EMPTY when n_frames == 0.
    A bare F.sequence(0, n_frames - 1) on a zero-length blob yields the
    DESCENDING [0, -1] (Spark's sequence auto-steps downward), emitting
    two spurious frame rows where the oracle's range(0) is empty
    (ADVICE r8)."""
    return F.when(
        n_frames > 0, F.sequence(F.lit(0).cast("long"), n_frames - 1)
    ).otherwise(F.array().cast("array<long>"))


@register(
    "q_ext_multimodal_meta",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS head_hex,
       md5(text) AS content_md5,
       -- ASCII text can never satisfy the header parser's magic-byte
       -- checks, so img_format is NULL for the whole oracle corpus
       CAST(NULL AS VARCHAR) AS img_format,
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
    bytes; ASCII corpus, so byte length == char length).  Blobs that
    ARE images (PNG/BMP/JPEG) get their real header dimensions via the
    dependency-free parser; everything else gets the md5-derived
    deterministic fake — the text corpus exercises only the fake
    branch, which is what the oracle reproduces."""
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
            F.explode(_frame_seq(n_frames)).alias("frame_idx"),
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


# --- chunk-level blob dedup (CAS accounting) ---------------------------------
# Storage-level dedup for multimodal lakes: blobs are sliced into the
# same fixed 256-byte frames as q_ext_multimodal_frames, each chunk
# content-addressed by md5, and the dedup ledger reports how many
# bytes a content-addressable store would hold vs raw — the
# sub-asset-granularity complement of whole-blob exact dedup
# (near-identical videos/images share most chunks even when their
# whole-file hashes differ).  Everything is exact integers + hashes;
# the corpus-sized stages are one explode projection and one
# chunk-hash aggregate (uniform keys — content hashes don't skew).

CHUNK_BYTES = 256


@register(
    "q_ext_multimodal_chunk_dedup",
    oracle=f"""
WITH chunks AS (
  SELECT doc_id,
         md5(substr(text, CAST(f.frame_idx * {CHUNK_BYTES} + 1 AS BIGINT),
                    {CHUNK_BYTES})) AS chunk_md5,
         least(CAST((f.frame_idx + 1) * {CHUNK_BYTES} AS BIGINT),
               CAST(length(text) AS BIGINT))
           - CAST(f.frame_idx * {CHUNK_BYTES} AS BIGINT) AS n_bytes
  FROM documents,
       LATERAL (SELECT unnest(range(CAST(ceil(length(text) / {CHUNK_BYTES}.0)
                                    AS BIGINT))) AS frame_idx) f
), ledger AS (
  SELECT chunk_md5, count(*) AS n_refs, min(n_bytes) AS n_bytes
  FROM chunks GROUP BY chunk_md5
)
SELECT CAST(sum(n_refs) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_unique_chunks,
       CAST(sum(n_refs * n_bytes) AS BIGINT) AS bytes_raw,
       CAST(sum(n_bytes) AS BIGINT) AS bytes_stored,
       CAST(sum(CASE WHEN n_refs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS shared_chunks
FROM ledger
""",
)
def q_ext_multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable chunk ledger over the blob corpus (see
    block comment): total vs unique {CHUNK_BYTES}-byte chunks and the
    raw vs stored byte footprint a CAS would see.  A chunk's size is
    min() over its references — identical content implies identical
    length, so min is just the deterministic pick.

    Plan: explode each blob's frame plan (map-only, same shape as
    q_ext_multimodal_frames), md5 per chunk in JVM codegen, one
    partial-agged shuffle on the uniform chunk hash, then a 1-row
    rollup."""
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.ceil(F.length("text") / float(CHUNK_BYTES)).cast("long")
    chunks = docs.select(
        "doc_id",
        "text",
        F.explode(_frame_seq(n_frames)).alias("frame_idx"),
        F.length("text").cast("long").alias("blob_bytes"),
    ).select(
        F.md5(
            F.expr(f"substring(text, frame_idx * {CHUNK_BYTES} + 1, {CHUNK_BYTES})")
        ).alias("chunk_md5"),
        (
            F.least(
                (F.col("frame_idx") + 1) * CHUNK_BYTES, F.col("blob_bytes")
            )
            - F.col("frame_idx") * CHUNK_BYTES
        ).alias("n_bytes"),
    )
    ledger = chunks.groupBy("chunk_md5").agg(
        F.count("*").alias("n_refs"), F.min("n_bytes").alias("n_bytes")
    )
    return ledger.agg(
        F.sum("n_refs").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_unique_chunks"),
        F.sum(F.col("n_refs") * F.col("n_bytes"))
        .cast("long")
        .alias("bytes_raw"),
        F.sum("n_bytes").cast("long").alias("bytes_stored"),
        F.sum((F.col("n_refs") > 1).cast("long"))
        .cast("long")
        .alias("shared_chunks"),
    )
