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
- IMAGE (JPEG) decode is REAL: ``synth_jpeg_payloads`` writes spec-valid
  baseline-sequential JFIF (canonical Huffman entropy coding, byte
  stuffing) and ``decode_jpeg_features`` re-parses the container,
  entropy-decodes (DC prediction, AC run/size with EOB+ZRL), dequantizes
  and runs a fixed-point integer IDCT — oracle-checked
  (`multimodal_jpeg_decode`).
- Formats needing codecs outside the stdlib (H.264/AV1/Opus/...) remain
  stubs: ``decode_stub`` raises NotImplementedError (the marked
  integration point for ffmpeg); ``fake_decode`` is a deterministic
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
            # NULL payload = missing/corrupt blob: emit NULL features
            # (downstream filters decide), never feed None to a decoder
            dims = [
                (None, None) if p is None else decoder(p)
                for p in pdf["payload"]
            ]
            # pandas nullable Int64, not object/float64: Arrow must see
            # a null-capable INTEGER column or the long cast goes unsafe
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        [None if p is None else len(p) for p in pdf["payload"]],
                        dtype="Int64",
                    ),
                    "fake_width": pd.array(
                        [w for w, _ in dims], dtype="Int64"
                    ),
                    "fake_height": pd.array(
                        [h for _, h in dims], dtype="Int64"
                    ),
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
                if p is None:
                    continue  # missing blob -> no frames (matches the oracle)
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


def synth_decode_wav_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth -> decode -> features twin of
    ``decode_wav_features(synth_wav_payloads(df))`` — the RIFF container
    is still written by stdlib ``wave`` and re-parsed by the same
    ``wave`` read path, but the payload bytes never cross the
    JVM<->Python boundary between the stages (guide §4.1; same fusion as
    ``synth_dhash_png``)."""
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
            for doc_id in pdf[id_col]:
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_SAMPLE_RATE)
                    w.writeframes(_pcm_samples(int(doc_id)).tobytes())
                with wave.open(io.BytesIO(buf.getvalue()), "rb") as w:
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

    return df.select(id_col).mapInPandas(run, WAV_FEATURE_SCHEMA)


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


def _encode_png(doc_id: int) -> bytes:
    """One spec-valid grayscale PNG for a doc (see synth_png_payloads)."""
    import struct
    import zlib

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


def synth_png_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL PNG per row: signature + IHDR/IDAT/IEND chunks with
    correct CRCs, scanlines filtered with the full PNG filter set
    (None/Sub/Up/Average/Paeth cycling by row — so decoding must
    implement every predictor), zlib-compressed. Only stdlib zlib +
    struct; the output is a spec-valid grayscale PNG any reader opens."""
    encode = _encode_png

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
                lo, hi = _dhash_of(bytes(payload))
                out["doc_id"].append(doc_id)
                out["h_lo"].append(lo)
                out["h_hi"].append(hi)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, DHASH_SCHEMA)


def _dhash_of(payload: bytes) -> tuple[int, int]:
    """Decode one PNG payload and compute its packed 64-bit dHash
    (the per-payload body of :func:`dhash_png`)."""
    w, h, rows = _decode_png(payload)
    grid = [
        [rows[r * h // 8][c * w // 9] for c in range(9)] for r in range(8)
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
    return lo, hi


def synth_dhash_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth -> decode -> dHash in ONE Python stage: the PNG is
    still encoded (full filter set, CRCs) and fully decoded by the same
    `_encode_png` / `_dhash_of` code paths as the two-stage
    ``dhash_png(synth_png_payloads(df))`` composition — but the payload
    bytes never cross the JVM<->Python boundary between the stages, and
    the plan carries one MapInPandas node instead of two chained Python
    evaluations (guide §4.1: you control how many columns cross and how
    often; the composition shipped every payload out of Python and
    straight back in)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "h_lo": [], "h_hi": []}
            for doc_id in pdf[id_col]:
                lo, hi = _dhash_of(_encode_png(int(doc_id)))
                out["doc_id"].append(doc_id)
                out["h_lo"].append(lo)
                out["h_hi"].append(hi)
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(run, DHASH_SCHEMA)


def synth_decode_png_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth -> decode -> features twin of
    ``decode_png_features(synth_png_payloads(df))`` — same codec code
    paths, one Python stage instead of two (see synth_dhash_png)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "width": [],
                "height": [],
                "pixel_sum": [],
                "corner": [],
            }
            for doc_id in pdf[id_col]:
                w, h, px = _decode_png(_encode_png(int(doc_id)))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pixel_sum"].append(sum(sum(r) for r in px))
                rows["corner"].append(px[-1][-1])
            yield pd.DataFrame(rows)

    return df.select(id_col).mapInPandas(run, PNG_FEATURE_SCHEMA)


def synth_resize_png_pixels(
    df: DataFrame, out_w: int = 8, out_h: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Fused synth -> decode -> resample twin of
    ``resize_png_pixels(synth_png_payloads(df))`` — same codec code
    paths, one Python stage instead of two (see synth_dhash_png)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "out_w": [],
                "out_h": [],
                "resized_sum": [],
                "resized_corner": [],
            }
            for doc_id in pdf[id_col]:
                w, h, px = _decode_png(_encode_png(int(doc_id)))
                resized = [
                    [px[r * h // out_h][c * w // out_w] for c in range(out_w)]
                    for r in range(out_h)
                ]
                out["doc_id"].append(doc_id)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["resized_sum"].append(sum(sum(r) for r in resized))
                out["resized_corner"].append(resized[-1][-1])
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(run, RESIZE_FEATURE_SCHEMA)


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


def synth_decode_wav_frames(
    df: DataFrame, frame: int = 50, id_col: str = "doc_id"
) -> DataFrame:
    """Fused synth -> decode -> framed-features twin of
    ``decode_wav_frames(synth_wav_payloads(df))`` — same ``wave``
    write/read code paths, one Python stage instead of two (guide §4.1;
    see synth_decode_wav_features)."""
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
            for doc_id in pdf[id_col]:
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_SAMPLE_RATE)
                    w.writeframes(_pcm_samples(int(doc_id)).tobytes())
                with wave.open(io.BytesIO(buf.getvalue()), "rb") as w:
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

    return df.select(id_col).mapInPandas(run, WAV_FRAME_SCHEMA)


# --------------------------------------------------------------------------
# Baseline JPEG (the last codec stub made real, stdlib+numpy only).
#
# The reference treats media as opaque blobs; re-expressed Spark-first the
# decode is an Arrow mapInPandas stage like the WAV/PNG paths above. The
# encoder writes spec-valid baseline-sequential JFIF (SOI/APP0/DQT/SOF0/
# DHT/SOS/EOI, canonical Huffman DC+AC entropy coding with byte stuffing);
# the decoder re-parses the container, canonical-decodes the entropy
# stream (DC prediction, run/size AC with EOB+ZRL, EXTEND sign recovery),
# dezigzags, dequantizes, and runs a FIXED-POINT integer IDCT — every
# arithmetic op is int64 multiply/add/shift, so the decode is bit-exact on
# any platform and a DC-only block reduces to the closed form
# ``(724*724*dc + 2^21) >> 22`` the SQL oracle can evaluate.

# Zigzag scan order: zigzag index -> natural (row-major) index (T.81 fig 5).
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Quantization table in NATURAL order: q[0]=6 sized so the fixture's DC
# range (+-200 quantized) drives pixels past BOTH clamp rails.
_JPEG_Q_NAT = [6] + [1 + ((i * 5) % 16) for i in range(1, 64)]

# Huffman table specs (DHT (bits, values) form — canonical codes follow
# from lengths alone). Mixed code lengths so the decoder's MINCODE walk
# is genuinely exercised; Kraft sums < 1 so no all-ones code exists.
_DC_BITS = [0, 1, 2, 4, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))  # categories 0..11
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 2, 0, 100, 60, 0, 0, 0, 0, 0, 0, 0]

# Fixed-point IDCT basis, M[u][x] = round(2^11 * C(u)/2 * cos((2x+1)u*pi/16))
# (C(0)=1/sqrt(2)): embedded as literals so no libm call can perturb the
# decode. pixel = (M^T F M + 2^21) >> 22, within +-2 of the float IDCT.
_IDCT_M = [
    [724, 724, 724, 724, 724, 724, 724, 724],
    [1004, 851, 569, 200, -200, -569, -851, -1004],
    [946, 392, -392, -946, -946, -392, 392, 946],
    [851, -200, -1004, -569, 569, 1004, 200, -851],
    [724, -724, -724, 724, 724, -724, -724, 724],
    [569, -1004, 200, 851, -851, -200, 1004, -569],
    [392, -946, 946, -392, -392, 946, -946, 392],
    [200, -569, 851, -1004, 1004, -851, 569, -200],
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                b = self._acc
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self._acc = self._n = 0

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _jpeg_coef_blocks(doc_id: int, wb: int, hb: int) -> list[list[int]]:
    """Deterministic quantized coefficients (ZIGZAG order) per block:
    even-index blocks are DC-only (flat after IDCT — the oracle's exact
    pixel path), odd blocks carry ACs at zigzag 1/20/40 — the 19-zero
    gap before zz40 forces a ZRL(16-zero) code, so run-length encoding
    is on the oracle-checked path, not just in unit tests."""
    blocks = []
    for b in range(wb * hb):
        zz = [0] * 64
        zz[0] = ((doc_id * 7 + b * 13) % 401) - 200
        if b % 2 == 1:
            zz[1] = ((doc_id + b * 3) % 21) - 10
            zz[20] = ((doc_id * 5 + b) % 11) - 5
            zz[40] = ((doc_id * 11 + b * 7) % 7) - 3
        blocks.append(zz)
    return blocks


def _jpeg_encode(width: int, height: int, blocks: list[list[int]]) -> bytes:
    """Spec-valid baseline-sequential JFIF around quantized ZIGZAG-order
    coefficient blocks (grayscale, 1x1 sampling, one scan, no restarts)."""
    import struct

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)

    w = _JpegBitWriter()
    prev_dc = 0
    for zz in blocks:
        diff = zz[0] - prev_dc
        prev_dc = zz[0]
        t = diff if diff >= 0 else -diff
        size = t.bit_length()
        code, length = dc_codes[size]
        w.put(code, length)
        if size:
            w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = ac_codes[0xF0]  # ZRL: 16 zeros
                w.put(zc, zl)
                run -= 16
            size = (v if v >= 0 else -v).bit_length()
            code, length = ac_codes[(run << 4) | size]
            w.put(code, length)
            w.put(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            ec, el = ac_codes[0x00]  # EOB
            w.put(ec, el)
    scan = w.flush()

    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = bytes([0x00]) + bytes(_JPEG_Q_NAT[_ZIGZAG[k]] for k in range(64))
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xFFE0, app0)
        + seg(0xFFDB, dqt)
        + seg(0xFFC0, sof0)
        + seg(0xFFC4, dht)
        + seg(0xFFDA, sos)
        + scan
        + b"\xff\xd9"
    )


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; raises on any marker or truncation inside the scan."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated entropy stream")
                nxt = self.data[self.pos]
                if nxt != 0x00:
                    raise ValueError("unexpected marker inside scan")
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_tables(bits: list[int], vals: list[int]):
    """(code, length) -> symbol map for canonical decoding."""
    return {cl: sym for sym, cl in _huff_codes(bits, vals).items()}


def _read_symbol(r: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_jpeg(payload: bytes):
    """Parse a baseline grayscale JFIF back to (width, height,
    coef_blocks_zigzag_quantized, pixel_blocks, quant_table_natural).
    Strict: rejects bad
    signatures, non-baseline frames (e.g. progressive SOF2), missing
    tables, invalid codes, coefficient overruns, and truncation."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature (no SOI)")
    pos = 2
    qtab: dict[int, list[int]] = {}
    hufftabs: dict[tuple[int, int], dict] = {}
    width = height = None
    qsel = 0
    while True:
        # T.81 B.1.1.2: any marker may be preceded by any number of
        # 0xFF fill bytes — skip them so spec-legal padding parses.
        while (
            pos + 1 < len(payload)
            and payload[pos] == 0xFF
            and payload[pos + 1] == 0xFF
        ):
            pos += 1
        if pos + 4 > len(payload):
            raise ValueError("truncated before SOS")
        marker, ln = struct.unpack(">HH", payload[pos : pos + 4])
        if marker >> 8 != 0xFF:
            raise ValueError("bad marker alignment")
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated segment")
        pos += 2 + ln
        m = marker & 0xFF
        if m == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                zz = body[i + 1 : i + 65]
                if len(zz) != 64:
                    raise ValueError("short quant table")
                nat = [0] * 64
                for k in range(64):
                    nat[_ZIGZAG[k]] = zz[k]
                qtab[tq] = nat
                i += 65
        elif m == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit grayscale baseline supported")
            if width == 0 or height == 0:
                raise ValueError("zero image dimension")
            qsel = body[8]
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline-sequential JPEG not supported")
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) != n:
                    raise ValueError("short Huffman table")
                hufftabs[(tc, th)] = _huff_decode_tables(bits, vals)
                i += 17 + n
        elif m == 0xDA:  # SOS
            if width is None:
                raise ValueError("SOS before SOF")
            td, ta = body[2] >> 4, body[2] & 0xF
            break
        elif m == 0xD9:
            raise ValueError("EOI before scan data")
        # else: APPn/COM — skipped via the length field
    if qsel not in qtab:
        raise ValueError("missing quantization table")
    if (0, td) not in hufftabs or (1, ta) not in hufftabs:
        raise ValueError("missing Huffman table")
    dc_tab, ac_tab = hufftabs[(0, td)], hufftabs[(1, ta)]
    q = qtab[qsel]

    wb = (width + 7) // 8
    hb = (height + 7) // 8
    r = _JpegBitReader(payload, pos)
    Mn = np.array(_IDCT_M, dtype=np.int64)
    coef_blocks: list[list[int]] = []
    pixel_blocks: list[np.ndarray] = []
    prev_dc = 0
    for _ in range(wb * hb):
        zz = [0] * 64
        size = _read_symbol(r, dc_tab)
        diff = _extend(r.bits(size), size) if size else 0
        prev_dc += diff
        zz[0] = prev_dc
        k = 1
        while k < 64:
            sym = _read_symbol(r, ac_tab)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0xF
            k += run
            if k > 63:
                raise ValueError("coefficient run past end of block")
            zz[k] = _extend(r.bits(size), size)
            k += 1
        coef_blocks.append(zz)
        fnat = np.zeros((8, 8), dtype=np.int64)
        for kk in range(64):
            if zz[kk]:
                nat = _ZIGZAG[kk]
                fnat[nat // 8, nat % 8] = zz[kk] * q[nat]
        px = ((Mn.T @ fnat @ Mn + (1 << 21)) >> 22) + 128
        pixel_blocks.append(np.clip(px, 0, 255))
    # Byte-align, then the stream must close with EOI (fill bytes
    # before it are spec-legal padding).
    end = r.pos
    while (
        end + 1 < len(payload)
        and payload[end] == 0xFF
        and payload[end + 1] == 0xFF
    ):
        end += 1
    if payload[end : end + 2] != b"\xff\xd9":
        raise ValueError("missing EOI after scan")
    # q is the payload's OWN natural-order quant table: feature math
    # downstream must use it, not the encoder's module constant, so the
    # decode path stays self-contained for arbitrary baseline JPEGs.
    return width, height, coef_blocks, pixel_blocks, q


JPEG_FEATURE_SCHEMA = (
    "doc_id long, width long, height long, n_blocks long, "
    "dc_dequant_sum long, ac_dequant_sum long, flat_pixel_sum long"
)


def synth_jpeg_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL baseline JPEG per row: deterministic quantized
    coefficients (``_jpeg_coef_blocks``) entropy-coded into a spec-valid
    JFIF container. Image geometry per doc: 2+doc_id%3 x 1+doc_id%2
    blocks, with the pixel dims cropped below the block grid
    (w = 8*wb - doc_id%4, h = 8*hb - doc_id%3) so partial edge blocks
    are on the decode path too."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                doc_id = int(d)
                wb, hb = 2 + doc_id % 3, 1 + doc_id % 2
                w, h = 8 * wb - doc_id % 4, 8 * hb - doc_id % 3
                payloads.append(
                    _jpeg_encode(w, h, _jpeg_coef_blocks(doc_id, wb, hb))
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(run, "doc_id long, payload binary")


def decode_jpeg_features(df: DataFrame) -> DataFrame:
    """REAL JPEG decode, stdlib+numpy only: container parse, canonical
    Huffman entropy decode (DC prediction + EXTEND, AC run/size with
    EOB and ZRL), dezigzag, dequantization, fixed-point integer IDCT,
    level shift, clamp — reduced to exact integer features:

    - ``dc_dequant_sum`` / ``ac_dequant_sum``: sums of dequantized
      coefficients using the quant table PARSED FROM THE PAYLOAD's DQT
      segment (huffman+zigzag+DQT must all be exact, and a payload
      whose DQT differs from the synth encoder's dequantizes with its
      own table — the feature path is self-contained);
    - ``flat_pixel_sum``: the VISIBLE (cropped) pixels of even-index
      blocks summed from the IDCT output — those blocks are DC-only by
      construction, so the oracle evaluates the decoder's own DC-only
      closed form ``clamp(128 + (724^2*dc + 2^21) >> 22)`` without a
      SQL IDCT; the decoder doesn't know which blocks are flat, it just
      sums what the full pipeline produced.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "n_blocks": [],
                "dc_dequant_sum": [], "ac_dequant_sum": [], "flat_pixel_sum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, coefs, pixels, q = _decode_jpeg(bytes(payload))
                wb = (w + 7) // 8
                dc_sum = ac_sum = flat_sum = 0
                for b, zz in enumerate(coefs):
                    dc_sum += zz[0] * q[0]
                    ac_sum += sum(
                        zz[k] * q[_ZIGZAG[k]] for k in range(1, 64)
                    )
                    if b % 2 == 0:
                        bx, by = b % wb, b // wb
                        vis = pixels[b][
                            : min(8, h - 8 * by), : min(8, w - 8 * bx)
                        ]
                        flat_sum += int(vis.sum())
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_blocks"].append(len(coefs))
                out["dc_dequant_sum"].append(dc_sum)
                out["ac_dequant_sum"].append(ac_sum)
                out["flat_pixel_sum"].append(flat_sum)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, JPEG_FEATURE_SCHEMA)


def synth_decode_jpeg_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused synth -> decode -> features twin of
    ``decode_jpeg_features(synth_jpeg_payloads(df))`` — the spec-valid
    JFIF bytes are still produced by ``_jpeg_encode`` and fully re-parsed
    by ``_decode_jpeg`` (container, Huffman, dezigzag, dequant, integer
    IDCT), but the payload never crosses the JVM<->Python boundary
    between the stages (guide §4.1; same fusion as synth_dhash_png)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "n_blocks": [],
                "dc_dequant_sum": [], "ac_dequant_sum": [], "flat_pixel_sum": [],
            }
            for d in pdf[id_col]:
                did = int(d)
                wb0, hb0 = 2 + did % 3, 1 + did % 2
                w0, h0 = 8 * wb0 - did % 4, 8 * hb0 - did % 3
                payload = _jpeg_encode(w0, h0, _jpeg_coef_blocks(did, wb0, hb0))
                w, h, coefs, pixels, q = _decode_jpeg(payload)
                wb = (w + 7) // 8
                dc_sum = ac_sum = flat_sum = 0
                for b, zz in enumerate(coefs):
                    dc_sum += zz[0] * q[0]
                    ac_sum += sum(
                        zz[k] * q[_ZIGZAG[k]] for k in range(1, 64)
                    )
                    if b % 2 == 0:
                        bx, by = b % wb, b // wb
                        vis = pixels[b][
                            : min(8, h - 8 * by), : min(8, w - 8 * bx)
                        ]
                        flat_sum += int(vis.sum())
                out["doc_id"].append(d)
                out["width"].append(w)
                out["height"].append(h)
                out["n_blocks"].append(len(coefs))
                out["dc_dequant_sum"].append(dc_sum)
                out["ac_dequant_sum"].append(ac_sum)
                out["flat_pixel_sum"].append(flat_sum)
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(run, JPEG_FEATURE_SCHEMA)
