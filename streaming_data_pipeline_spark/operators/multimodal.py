"""Multimodal column plumbing (SURVEY.md §2.12).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside. The Spark-side machinery that matters at 100 TB —
schema, Arrow-batched transfer, ``mapInPandas`` batch shape, partition
sizing — is real and tested here; the codec itself is STUBBED because
decode libraries (PIL/ffmpeg/...) are not in this container:

- ``decode_stub``: raises NotImplementedError (the marked integration
  point for a real decoder);
- ``fake_decode``: deterministic arithmetic on the payload bytes, so
  the pipeline is end-to-end testable and oracle-checkable.

Pattern: one ``mapInPandas`` over binary batches (Arrow transfers the
bytes zero-copy), emitting fixed-schema feature rows. At scale, set
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits in
executor memory, and repartition by a content-hash for skewed media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, fake_width long, fake_height long"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (fixture: utf-8 bytes of the text —
    a stand-in for an image/audio blob) plus media-type metadata."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def decode_stub(payload: bytes) -> tuple[int, int]:
    """The real decoder integration point (PIL/torchaudio/ffmpeg)."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; wire a real decoder here (e.g. PIL.Image.open)"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in 'decode': pretend dimensions derived from
    the byte length (oracle-expressible: octet_length arithmetic)."""
    n = len(payload)
    return (n % 640) + 1, (n * 7 % 480) + 1


def extract_features(df: DataFrame, use_stub: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves each batch of (doc_id, payload) into pandas; the decoder
    runs per-payload; output rows follow FEATURE_SCHEMA. Swap
    ``fake_decode`` for a real codec via ``use_stub=True`` once
    libraries exist (currently raises, by design).
    """
    decoder = decode_stub if use_stub else fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "fake_width": [w for w, _ in dims],
                    "fake_height": [h for _, h in dims],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_len long"


def sample_frames(df: DataFrame, frame_size: int = 64, stride: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads.

    The payload is treated as consecutive ``frame_size``-byte frames
    (the stand-in for decoded video frames); every ``stride``-th frame
    is emitted as its own row — the classic keyframe-sampling shape. The
    fan-out runs inside ``mapInPandas`` so one input batch yields one
    Arrow batch of frame rows; at 100 TB the downstream per-frame work
    (embedding, OCR, ...) hangs off this exploded, repartitionable
    relation rather than off whole videos (which skew: one 2 GB video
    must not pin one task).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n = len(p)
                n_frames = (n + frame_size - 1) // frame_size
                for i in range(0, n_frames, stride):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_len"].append(min(frame_size, n - i * frame_size))
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def resize_dims(df: DataFrame, target_w: int = 224) -> DataFrame:
    """Aspect-preserving resize planning over decoded dimensions.

    Pure integer column arithmetic (floor division — identical in every
    engine) over the feature relation from :func:`extract_features`; the
    actual pixel resample is the decoder's job (stubbed in this
    container), but the dimension plan, schema, and partition shape are
    the real thing.
    """
    return df.select(
        "doc_id",
        "fake_width",
        "fake_height",
        F.lit(target_w).cast("long").alias("new_width"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"(fake_height * {target_w}) div fake_width"),
        ).alias("new_height"),
    )
