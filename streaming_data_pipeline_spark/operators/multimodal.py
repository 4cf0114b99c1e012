"""Multimodal column plumbing (SURVEY.md §2.12).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside. The Spark-side machinery that matters at 100 TB —
schema, Arrow-batched transfer, ``mapInPandas`` batch shape, partition
sizing — is real and tested here. Decode status by format:

- AUDIO (WAV/RIFF) decode is REAL: ``synth_wav_payloads`` writes actual
  RIFF containers (stdlib ``wave``) and ``decode_wav_features`` parses
  them back chunk-by-chunk into exact integer features — oracle-checked
  end to end (`multimodal_wav_decode`).
- IMAGE (PNG) decode is REAL: ``synth_png_payloads`` emits spec-valid
  grayscale PNGs (full filter set incl. Paeth, correct CRCs) and
  ``decode_png_features`` walks the chunk stream, verifies CRCs,
  inflates IDAT, and unfilters every scanline — oracle-checked
  (`multimodal_png_decode`).
- Formats needing codecs outside the stdlib (JPEG/H.264/...) remain
  stubs: ``decode_stub`` raises NotImplementedError (the marked
  integration point for PIL/ffmpeg); ``fake_decode`` is a deterministic
  stand-in so that pipeline stays end-to-end testable too.

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


WAV_SAMPLE_RATE = 8000
WAV_FEATURE_SCHEMA = (
    "doc_id long, sample_rate long, n_samples long, sum_sq long, peak long"
)


def _pcm_samples(doc_id: int):
    """Deterministic int16 PCM for a doc: n = 200 + doc_id % 100 samples
    of s_i = ((doc_id*7919 + i*104729) mod 65536) - 32768. Pure integer
    arithmetic so the decode oracle can regenerate it in SQL."""
    import numpy as np

    n = 200 + doc_id % 100
    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 7919 + i * 104729) % 65536) - 32768).astype(np.int16)


def synth_wav_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL WAV (RIFF) payload per row — stdlib ``wave`` writes
    an actual mono/16-bit/8kHz container around the deterministic PCM,
    so downstream decode exercises a genuine media format, not a
    stand-in blob."""
    import io
    import wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_SAMPLE_RATE)
                    w.writeframes(_pcm_samples(int(doc_id)).tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(run, "doc_id long, payload binary")


def decode_wav_features(df: DataFrame) -> DataFrame:
    """REAL audio decode (no codec libraries needed): stdlib ``wave``
    parses the RIFF/fmt/data chunks of each payload, the PCM frames are
    reinterpreted as int16 and reduced to exact integer features
    (sample count, energy sum-of-squares, peak amplitude). This is the
    decoder integration point made concrete — the same mapInPandas
    batch shape carries PIL/ffmpeg for formats whose codecs aren't in
    the stdlib (those remain documented stubs in ``decode_stub``)."""
    import io
    import wave

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "sample_rate": [],
                "n_samples": [],
                "sum_sq": [],
                "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    if w.getnchannels() != 1 or w.getsampwidth() != 2:
                        raise ValueError("expected mono 16-bit PCM")
                    rate = w.getframerate()
                    pcm = np.frombuffer(
                        w.readframes(w.getnframes()), dtype=np.int16
                    ).astype(np.int64)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(pcm))
                rows["sum_sq"].append(int((pcm * pcm).sum()))
                rows["peak"].append(int(np.abs(pcm).max()) if len(pcm) else 0)
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, WAV_FEATURE_SCHEMA)


PNG_FEATURE_SCHEMA = (
    "doc_id long, width long, height long, pixel_sum long, corner long"
)


def _png_pixels(doc_id: int):
    """Deterministic 8-bit grayscale image for a doc: width 16 +
    doc_id % 16, height 12 + doc_id % 8, pixel(r,c) = (doc_id*31 +
    r*17 + c*7) mod 256 — integer arithmetic the oracle regenerates."""
    w = 16 + doc_id % 16
    h = 12 + doc_id % 8
    return [
        [(doc_id * 31 + r * 17 + c * 7) % 256 for c in range(w)] for r in range(h)
    ]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def synth_png_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL PNG per row: signature + IHDR/IDAT/IEND chunks with
    correct CRCs, scanlines filtered with the full PNG filter set
    (None/Sub/Up/Average/Paeth cycling by row — so decoding must
    implement every predictor), zlib-compressed. Only stdlib zlib +
    struct; the output is a spec-valid grayscale PNG any reader opens."""
    import struct
    import zlib

    def encode(doc_id: int) -> bytes:
        px = _png_pixels(doc_id)
        h, w = len(px), len(px[0])
        raw = bytearray()
        prev = [0] * w
        for r in range(h):
            row = px[r]
            f = r % 5
            raw.append(f)
            for i in range(w):
                left = row[i - 1] if i else 0
                up = prev[i]
                ul = prev[i - 1] if i else 0
                c = row[i]
                if f == 0:
                    v = c
                elif f == 1:
                    v = c - left
                elif f == 2:
                    v = c - up
                elif f == 3:
                    v = c - (left + up) // 2
                else:
                    v = c - _paeth(left, up, ul)
                raw.append(v % 256)
            prev = row

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [encode(int(d)) for d in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, "doc_id long, payload binary")


def _decode_png(payload: bytes):
    """Parse a grayscale-8 PNG to (w, h, rows): CRC-verified chunk walk,
    IDAT inflate, scanline unfiltering with all five predictors."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    pos, w, h, idat = 8, None, None, b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(typ + data) & 0xFFFFFFFF):
            raise ValueError("bad CRC")
        if typ == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            if depth != 8 or color != 0:
                raise ValueError("unsupported PNG subtype")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError("bad scanline length")
    rows = []
    px_prev = [0] * w
    for r in range(h):
        line = raw[r * (w + 1) : (r + 1) * (w + 1)]
        f, vals = line[0], line[1:]
        row = [0] * w
        for i in range(w):
            left = row[i - 1] if i else 0
            up = px_prev[i]
            ul = px_prev[i - 1] if i else 0
            v = vals[i]
            if f == 0:
                c = v
            elif f == 1:
                c = v + left
            elif f == 2:
                c = v + up
            elif f == 3:
                c = v + (left + up) // 2
            elif f == 4:
                c = v + _paeth(left, up, ul)
            else:
                raise ValueError(f"unknown filter {f}")
            row[i] = c % 256
        rows.append(row)
        px_prev = row
    return w, h, rows


def decode_png_features(df: DataFrame) -> DataFrame:
    """REAL image decode, stdlib-only: walks the chunk stream (verifying
    every CRC), reads IHDR, inflates the concatenated IDAT stream, and
    UNFILTERS each scanline — all five PNG predictors including Paeth —
    back to pixels, reduced to exact integer features. A wrong
    predictor, CRC skip, or header misread flips the oracle row red."""

    def decode(payload: bytes):
        w, h, rows = _decode_png(payload)
        return w, h, sum(sum(r) for r in rows), rows[-1][-1]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "width": [],
                "height": [],
                "pixel_sum": [],
                "corner": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, total, corner = decode(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pixel_sum"].append(total)
                rows["corner"].append(corner)
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, PNG_FEATURE_SCHEMA)


RESIZE_FEATURE_SCHEMA = (
    "doc_id long, out_w long, out_h long, resized_sum long, resized_corner long"
)


def resize_png_pixels(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """REAL pixel resample (nearest neighbor) over decoded PNG pixels:
    out(r,c) = in(r*h // out_h, c*w // out_w) — pure integer index
    arithmetic, so the oracle can regenerate the resized image from the
    pixel formula without any codec. Completes the decode -> transform
    story the plumbing-only `resize_dims` plans for; the same Arrow
    batch shape carries a convolutional resampler when a real image lib
    is available."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "out_w": [],
                "out_h": [],
                "resized_sum": [],
                "resized_corner": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = _decode_png(bytes(payload))
                resized = [
                    [rows[r * h // out_h][c * w // out_w] for c in range(out_w)]
                    for r in range(out_h)
                ]
                out["doc_id"].append(doc_id)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["resized_sum"].append(sum(sum(r) for r in resized))
                out["resized_corner"].append(resized[-1][-1])
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_FEATURE_SCHEMA)


DHASH_SCHEMA = "doc_id long, h_lo long, h_hi long"


def dhash_png(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over DECODED pixels: resize
    the unfiltered grayscale image to a 9x8 grid (nearest neighbor,
    integer index arithmetic), then bit(r,c) = [px[r][c+1] > px[r][c]]
    for c in 0..7 — 64 gradient-sign bits, invariant to global
    brightness shifts, the standard screen for visually-identical
    images. Packed as two uint32-valued longs (bits 0-31 -> h_lo,
    32-63 -> h_hi) so XOR/bit_count stay sign-safe in both Spark and
    the SQL oracle. Same Arrow mapInPandas shape as the other decode
    stages; at 100 TB this is one narrow pass producing 2 longs per
    image, and all pairing happens on the hashes, never the pixels.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "h_lo": [], "h_hi": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rows = _decode_png(bytes(payload))
                grid = [
                    [rows[r * h // 8][c * w // 9] for c in range(9)]
                    for r in range(8)
                ]
                lo = hi = 0
                for r in range(8):
                    for c in range(8):
                        if grid[r][c + 1] > grid[r][c]:
                            k = r * 8 + c
                            if k < 32:
                                lo |= 1 << k
                            else:
                                hi |= 1 << (k - 32)
                out["doc_id"].append(doc_id)
                out["h_lo"].append(lo)
                out["h_hi"].append(hi)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, DHASH_SCHEMA)


WAV_FRAME_SCHEMA = (
    "doc_id long, frame_idx long, n long, sum_sq long, peak long"
)


def decode_wav_frames(df: DataFrame, frame: int = 50) -> DataFrame:
    """Framed audio decode: same stdlib WAV parse as
    ``decode_wav_features`` but the PCM stream is cut into fixed
    ``frame``-sample windows and reduced per window (exact integer
    energy + peak). The mapInPandas fan-out is bounded: one input doc
    yields ceil(n_samples/frame) rows — the Arrow batch shape for any
    frame-level audio featurizer (VAD, loudness normalization)."""
    import io
    import wave

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "n": [],
                "sum_sq": [],
                "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    if w.getnchannels() != 1 or w.getsampwidth() != 2:
                        raise ValueError("expected mono 16-bit PCM")
                    pcm = np.frombuffer(
                        w.readframes(w.getnframes()), dtype=np.int16
                    ).astype(np.int64)
                for k in range(0, len(pcm), frame):
                    seg = pcm[k : k + frame]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(k // frame)
                    rows["n"].append(len(seg))
                    rows["sum_sq"].append(int((seg * seg).sum()))
                    rows["peak"].append(int(np.abs(seg).max()))
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(run, WAV_FRAME_SCHEMA)
