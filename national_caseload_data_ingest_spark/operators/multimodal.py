"""Multimodal column support: opaque binary payloads + typed metadata, with
Pandas-UDF (Arrow-batched) decode/feature plumbing.

Model: a modality column is ``binary`` next to typed metadata columns
(mime, byte length) — the pattern for image/audio/video at 100 TB, where
payloads stay opaque to the planner and all pixel/sample work happens in
vectorized Python batches via ``mapInPandas``.

The container ships no image/audio codecs, so the real decoders are STUBS
behind ``try: import`` (``decode_image`` raises ``NotImplementedError``
without PIL); the *Spark-side plumbing* — schema, batch iteration, Arrow
transfer, partition preservation — is real and oracle-checked using a
deterministic byte-level feature extractor over the documents' UTF-8 bytes
standing in for media payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from national_caseload_data_ingest_spark.operators.registry import query
from national_caseload_data_ingest_spark.session import load_tables

FEATURE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, first_byte int, "
    "head_checksum bigint"
)


def decode_image(payload: bytes) -> object:
    """Decode an image payload — STUB: requires PIL, not in this container.

    The plumbing (binary column → mapInPandas batch → feature row) is
    exercised with ``extract_byte_features``; swap this in when codecs are
    available."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; container has no codecs — "
            "use extract_byte_features for the plumbing path"
        ) from e
    import io  # noqa: PLC0415

    return Image.open(io.BytesIO(payload))


def extract_byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic per-payload features: size, first byte, checksum of the
    first 8 bytes.  Shape-identical to a real decode-and-featurize UDF:
    one output row per payload, vectorized per Arrow batch."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1
                ).astype("int32"),
                "head_checksum": payloads.map(
                    lambda b: int(sum(b[:8]))
                ).astype("int64"),
            }
        )


def with_binary_payload(d: DataFrame) -> DataFrame:
    """documents → multimodal shape: (doc_id, mime, payload binary)."""
    return d.select(
        "doc_id",
        F.lit("text/plain").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


@query(
    "multimodal_byte_features",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
           CAST(list_sum(list_transform(range(1, least(LENGTH(text), 8) + 1),
                i -> ascii(substr(text, i, 1)))) AS BIGINT) AS head_checksum
    FROM documents
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the full multimodal path:
    encode → binary column → ``mapInPandas`` (Arrow batches) → typed rows.

    The oracle recomputes the same features from character codes (the corpus
    is ASCII, so char codes == UTF-8 bytes), proving the Python batch path
    produces exactly what a pure-SQL engine derives — i.e. the plumbing adds
    no skew, loss, or reordering.
    """
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return with_binary_payload(d).mapInPandas(
        extract_byte_features, schema=FEATURE_SCHEMA
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload — STUB: requires PIL, not in this container.

    Plumbing parity lives in :func:`sample_frames`, which exercises the
    same batch shape (binary in → derived binary out)."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "image resize requires PIL; container has no codecs"
        ) from e
    import io  # noqa: PLC0415

    img = Image.open(io.BytesIO(payload)).resize((width, height))
    out = io.BytesIO()
    img.save(out, format="PNG")
    return out.getvalue()


FRAME_BYTES = 64  # deterministic stand-in for a decoded video frame
FRAME_STRIDE = 3  # keep every 3rd frame

FRAME_SCHEMA = "doc_id bigint, frame_no int, frame_bytes int, frame_checksum bigint"


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame-sampling kernel: each payload explodes into one row per kept
    frame (every ``FRAME_STRIDE``-th fixed-size chunk) — the 1→N batch
    shape of real video frame extraction, with a deterministic fake
    "decode" (chunking) standing in for the codec."""
    for pdf in batches:
        doc_ids, frame_nos, sizes, sums = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
            for f in range(0, n_frames, FRAME_STRIDE):
                chunk = payload[f * FRAME_BYTES : (f + 1) * FRAME_BYTES]
                doc_ids.append(doc_id)
                frame_nos.append(f)
                sizes.append(len(chunk))
                sums.append(int(sum(chunk)))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_no": pd.Series(frame_nos, dtype="int32"),
                "frame_bytes": pd.Series(sizes, dtype="int32"),
                "frame_checksum": pd.Series(sums, dtype="int64"),
            }
        )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, octet_length(encode(text)) AS n, text
        FROM documents
    ),
    frames AS (
        SELECT doc_id, CAST(fr AS INTEGER) AS frame_no,
               CAST(least(n - fr * {FRAME_BYTES}, {FRAME_BYTES}) AS INTEGER)
                 AS frame_bytes,
               CAST(list_sum(list_transform(
                    range(fr * {FRAME_BYTES} + 1,
                          least(n, (fr + 1) * {FRAME_BYTES}) + 1),
                    i -> ascii(substr(text, i, 1)))) AS BIGINT)
                 AS frame_checksum
        FROM f, unnest(range(0, CAST(ceil(n / {FRAME_BYTES}.0) AS BIGINT),
                             {FRAME_STRIDE})) AS t(fr)
    )
    SELECT doc_id, frame_no, frame_bytes, frame_checksum FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling through the multimodal path: binary
    payload → ``mapInPandas`` 1→N explosion → one typed row per kept frame.

    The oracle re-derives the same frames from character codes (ASCII
    corpus), proving the Python batch path's row explosion is lossless and
    deterministic.  At scale the chunking fake swaps for a codec call; the
    plan shape (narrow map, no shuffle) is unchanged.
    """
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return with_binary_payload(d).mapInPandas(sample_frames, schema=FRAME_SCHEMA)
