"""Arrow-batched multimodal decode / feature-extract plumbing.

Rich pipelines decode image/audio/video payloads with native libs
(PIL, ffmpeg, torchaudio). Those libs are NOT in this container, but
the stdlib can genuinely parse three formats — ``wave`` (RIFF/WAVE
PCM audio), ``zlib`` (DEFLATE), and uncompressed 24-bit BMP (pure
``struct`` header walk + bottom-up padded pixel rows; no imaging lib
needed) — so ``decode_payload`` genuinely decodes those container
formats, dispatched on magic bytes, and falls back to
``fake_features`` (a deterministic byte-math stand-in with the same
Spark surface) for everything else. A user with PIL/ffmpeg adds their
branch to the same dispatch; the Arrow batching, 1:N frame shape and
no-payload-shuffle plumbing are format-independent.

Scale notes: this is a narrow map (no shuffle); batch size is governed
by spark.sql.execution.arrow.maxRecordsPerBatch, and the iterator form
of mapInPandas keeps peak memory to one batch per core regardless of
partition size — the shape that survives 100 TB of payload bytes.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, n_frames int, frame_signature string, "
    "mean_byte double"
)

WAV_SAMPLE_RATE = 8000


def build_wav(pcm: bytes) -> bytes:
    """Wrap raw bytes as a REAL RIFF/WAVE container: 8-bit unsigned
    mono PCM at 8 kHz, written by the stdlib ``wave`` encoder (so the
    header, chunk layout and sizes are a genuine WAV file any player
    parses)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(WAV_SAMPLE_RATE)
        w.writeframes(pcm)
    return buf.getvalue()


def sniff_mime(payload: bytes) -> str:
    """Magic-byte container sniff (the dispatch key for decode)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    # BMP: 'BM' is a weak magic (any text starting "BM" matches), so
    # require the full header story to hold — declared file size ==
    # actual, pixel offset past both headers, BITMAPINFOHEADER (40),
    # AND the shape decode_bmp actually parses (24 bpp, BI_RGB
    # uncompressed) — before claiming the payload is an image. The
    # sniff and the decoder must agree: a valid-but-unsupported BMP
    # (32 bpp, RLE) must fall to the byte-math path, not crash decode.
    if (
        len(payload) >= 54
        and payload[:2] == b"BM"
        and struct.unpack_from("<I", payload, 2)[0] == len(payload)
        and struct.unpack_from("<I", payload, 10)[0] >= 54
        and struct.unpack_from("<I", payload, 14)[0] == 40
        and struct.unpack_from("<H", payload, 28)[0] == 24
        and struct.unpack_from("<I", payload, 30)[0] == 0
    ):
        return "image/bmp"
    # zlib has a 2-byte header, not a true magic: CMF low nibble 0x8
    # (compression method 8 = deflate; the high nibble is the window
    # size, 0x08..0x78 all valid — streams written with wbits < 15
    # are still zlib) then a check byte making the pair a multiple of
    # 31. Heuristic — the decode branch therefore verifies by
    # actually inflating and falls back on zlib.error rather than
    # trusting the sniff.
    # PNG: 8-byte signature is a true magic; additionally require the
    # shape decode_png parses (IHDR first chunk, 8-bit grayscale,
    # deflate, filter method 0, non-interlaced) — sniff and decoder
    # must agree on supported shapes (the BMP lesson): a valid-but-
    # unsupported PNG (16-bit, RGBA, Adam7) falls to byte-math.
    if (
        len(payload) >= 33
        and payload[:8] == b"\x89PNG\r\n\x1a\n"
        and payload[8:16] == b"\x00\x00\x00\x0dIHDR"
        and payload[24:29] == bytes((8, 0, 0, 0, 0))
    ):
        return "image/png"
    if len(payload) >= 2 and (payload[0] & 0x0F) == 0x08 and (
        payload[0] >> 4
    ) <= 7 and ((payload[0] << 8 | payload[1]) % 31 == 0):
        return "application/zlib"
    return "application/octet-stream"


def pcm_mean(pcm: bytes, sample_width: int) -> float:
    """Mean of the DECODED samples (all channels pooled) for PCM of
    any width — averaging raw frame bytes is only correct for 8-bit
    audio; 16/24/32-bit samples are little-endian signed, so the byte
    mean of interleaved halves is meaningless for them."""
    if not pcm:
        return 0.0
    if sample_width == 1:
        return sum(pcm) / len(pcm)  # 8-bit WAV PCM is unsigned
    import struct

    n = len(pcm) // sample_width
    if sample_width == 2:
        vals = struct.unpack(f"<{n}h", pcm[: n * 2])
    elif sample_width == 4:
        vals = struct.unpack(f"<{n}i", pcm[: n * 4])
    else:  # 24-bit: no struct code; decode 3-byte groups signed
        vals = [
            int.from_bytes(pcm[i : i + 3], "little", signed=True)
            for i in range(0, n * 3, 3)
        ]
    return sum(vals) / n


def decode_payload(payload: bytes) -> dict:
    """Decode a media payload: REAL codec where the stdlib has one
    (WAV via ``wave``, DEFLATE via ``zlib``), deterministic byte-math
    stand-in otherwise. Returns a tagged dict; a corrupt payload that
    carries a true container magic (RIFF/WAVE) fails LOUDLY — silent
    fallback would mislabel broken audio as opaque bytes."""
    payload = bytes(payload)
    mime = sniff_mime(payload)
    if mime == "audio/wav":
        with wave.open(io.BytesIO(payload), "rb") as w:
            n = w.getnframes()
            pcm = w.readframes(n)
            return {
                "mime": mime,
                "n_channels": w.getnchannels(),
                "sample_rate": w.getframerate(),
                "sample_width": w.getsampwidth(),
                "n_samples": n,
                "mean_sample": pcm_mean(pcm, w.getsampwidth()),
                "pcm_md5": hashlib.md5(pcm).hexdigest(),
            }
    if mime == "image/bmp":
        return decode_bmp(payload)
    if mime == "image/png":
        return decode_png(payload)
    if mime == "application/zlib":
        try:
            raw = zlib.decompress(payload)
        except zlib.error:
            pass  # sniff false-positive (no real magic) — treat as bytes
        else:
            return {
                "mime": mime,
                "decoded_bytes": len(raw),
                "decoded_md5": hashlib.md5(raw).hexdigest(),
            }
    n_bytes, n_frames, signature, mean_byte = fake_features(payload)
    return {
        "mime": "application/octet-stream",
        "n_bytes": n_bytes,
        "n_frames": n_frames,
        "frame_signature": signature,
        "mean_byte": mean_byte,
    }


def fake_features(payload: bytes) -> tuple[int, int, str, float]:
    """Deterministic stand-in for decode+feature-extract.

    'Frames' are 256-byte chunks; the signature is the md5 of every
    64th byte; mean_byte is an exact integer-ratio double.
    """
    n_bytes = len(payload)
    n_frames = n_bytes // 256 + 1
    sampled = payload[::64]
    signature = hashlib.md5(sampled).hexdigest()
    mean_byte = (sum(payload) / n_bytes) if n_bytes else 0.0
    return n_bytes, n_frames, signature, mean_byte


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """documents-with-payload → per-doc feature rows via mapInPandas."""

    # Self-contained closure: no references to module-level symbols, so
    # cloudpickle ships it by value and workers need no etl_spark on
    # their PYTHONPATH (the driver process may run from any cwd).
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _feats(payload: bytes) -> tuple[int, int, str, float]:
            n_bytes = len(payload)
            n_frames = n_bytes // 256 + 1
            signature = _hashlib.md5(payload[::64]).hexdigest()
            mean_byte = (sum(payload) / n_bytes) if n_bytes else 0.0
            return n_bytes, n_frames, signature, mean_byte

        for pdf in it:
            feats = [_feats(p) for p in pdf[payload_col]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [f[0] for f in feats],
                    "n_frames": [f[1] for f in feats],
                    "frame_signature": [f[2] for f in feats],
                    "mean_byte": [f[3] for f in feats],
                }
            )

    # A NULL payload has nothing to decode — skip it (empty payloads
    # b"" are decoded normally). Without this, `len(None)` would kill
    # the whole task on the first row with a missing payload.
    return (
        df.select("doc_id", payload_col)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=FEATURE_SCHEMA)
    )


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the deterministic binary payload + metadata struct."""
    return docs.withColumn("payload", F.encode("text", "utf-8")).withColumn(
        "meta",
        F.struct(
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
        ),
    )


FRAME_BYTES = 256
FRAME_SAMPLE_EVERY = 2

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_md5 string"


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = FRAME_BYTES,
    every_n: int = FRAME_SAMPLE_EVERY,
) -> DataFrame:
    """Frame-sampling stage: split each payload into fixed-size frames
    (the stand-in for video frame extraction) and emit every
    ``every_n``-th frame as its own row — a 1:N mapInPandas whose
    output batch is LARGER than its input batch, the shape a video
    pipeline needs (decode libs absent; frames are byte chunks).

    Narrow map: the payload is framed where it sits, only the sampled
    frame rows continue downstream.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in it:
            ids, idxs, sizes, md5s = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                payload = bytes(payload)
                n_frames = len(payload) // frame_bytes + 1
                for idx in range(0, n_frames, every_n):
                    frame = payload[idx * frame_bytes : (idx + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(idx)
                    sizes.append(len(frame))
                    md5s.append(_hashlib.md5(frame).hexdigest())
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "frame_idx": _pd.Series(idxs, dtype="int32"),
                    "frame_bytes": _pd.Series(sizes, dtype="int32"),
                    "frame_md5": _pd.Series(md5s, dtype="object"),
                }
            )

    # NULL payloads: nothing to frame — skip (see extract_features).
    return (
        df.select("doc_id", payload_col)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=FRAME_SCHEMA)
    )


RESIZE_TARGET_BYTES = 512

RESIZE_SCHEMA = (
    "doc_id bigint, orig_bytes int, new_bytes int, resized_md5 string"
)


def resize_payload(
    df: DataFrame,
    payload_col: str = "payload",
    target_bytes: int = RESIZE_TARGET_BYTES,
) -> DataFrame:
    """Resize stage (stand-in for image resize): truncate payloads over
    the target, zero-pad payloads under it — a deterministic 1:1
    transform with the exact batch shape a real resize has (binary in,
    binary-derived features out, constant output size)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in it:
            orig, md5s = [], []
            for payload in pdf[payload_col]:
                payload = bytes(payload)
                orig.append(len(payload))
                resized = payload[:target_bytes].ljust(target_bytes, b"\x00")
                md5s.append(_hashlib.md5(resized).hexdigest())
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "orig_bytes": _pd.Series(orig, dtype="int32"),
                    "new_bytes": _pd.Series(
                        [target_bytes] * len(orig), dtype="int32"
                    ),
                    "resized_md5": _pd.Series(md5s, dtype="object"),
                }
            )

    # NULL payloads: nothing to resize — skip (see extract_features).
    return (
        df.select("doc_id", payload_col)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=RESIZE_SCHEMA)
    )


WAV_DECODE_SCHEMA = (
    "doc_id bigint, mime string, n_channels int, sample_rate int, "
    "n_samples bigint, mean_sample double, pcm_md5 string"
)


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode stage: payloads are genuine RIFF/WAVE
    containers (see ``build_wav``), parsed on the workers by the
    stdlib ``wave`` codec — header walk, fmt-chunk fields, PCM frame
    extraction. Narrow map, one container decoded per row, Arrow
    batch in/out; the exact stage shape a torchaudio-backed pipeline
    has, with a real (if humble) codec in the decode slot."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import io as _io
        import struct as _struct
        import wave as _wave

        import pandas as _pd

        def _mean(pcm: bytes, width: int) -> float:
            # Self-contained twin of pcm_mean (workers can't import
            # etl_spark); the driver-vs-worker parity test pins them.
            if not pcm:
                return 0.0
            if width == 1:
                return sum(pcm) / len(pcm)
            n = len(pcm) // width
            if width == 2:
                vals = _struct.unpack(f"<{n}h", pcm[: n * 2])
            elif width == 4:
                vals = _struct.unpack(f"<{n}i", pcm[: n * 4])
            else:
                vals = [
                    int.from_bytes(pcm[i : i + 3], "little", signed=True)
                    for i in range(0, n * 3, 3)
                ]
            return sum(vals) / n

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                with _wave.open(_io.BytesIO(bytes(payload)), "rb") as w:
                    n = w.getnframes()
                    pcm = w.readframes(n)
                    channels = w.getnchannels()
                    rate = w.getframerate()
                    width = w.getsampwidth()
                rows.append(
                    (
                        doc_id,
                        "audio/wav",
                        channels,
                        rate,
                        n,
                        _mean(pcm, width),
                        _hashlib.md5(pcm).hexdigest(),
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "n_channels", "sample_rate",
                    "n_samples", "mean_sample", "pcm_md5",
                ],
            ).astype(
                {
                    "doc_id": "int64", "n_channels": "int32",
                    "sample_rate": "int32", "n_samples": "int64",
                    "mean_sample": "float64",
                }
            )

    return (
        df.select("doc_id", payload_col)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=WAV_DECODE_SCHEMA)
    )


DEFLATE_DECODE_SCHEMA = (
    "doc_id bigint, mime string, decoded_bytes bigint, decoded_md5 string"
)


def decode_deflate(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL decompression decode stage: inflate zlib-DEFLATE payloads
    on the workers (stdlib zlib, sniffed by the same header check as
    ``sniff_mime``) and fingerprint the recovered bytes. Non-zlib
    payloads fall back to raw-byte fingerprinting, mirroring
    ``decode_payload``'s dispatch. Narrow map; payload never
    shuffles."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import zlib as _zlib

        import pandas as _pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                payload = bytes(payload)
                raw, mime = None, "application/octet-stream"
                # Inlined sniff_mime zlib branch (closure stays
                # self-contained for workers): CMF low nibble 0x8 =
                # deflate, high nibble <= 7 = any valid window size,
                # header pair % 31 == 0.
                if (
                    len(payload) >= 2
                    and (payload[0] & 0x0F) == 0x08
                    and (payload[0] >> 4) <= 7
                    and (payload[0] << 8 | payload[1]) % 31 == 0
                ):
                    try:
                        raw = _zlib.decompress(payload)
                        mime = "application/zlib"
                    except _zlib.error:
                        raw = None
                if raw is None:
                    raw = payload
                rows.append(
                    (doc_id, mime, len(raw), _hashlib.md5(raw).hexdigest())
                )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "mime", "decoded_bytes", "decoded_md5"],
            ).astype({"doc_id": "int64", "decoded_bytes": "int64"})

    return (
        df.select("doc_id", payload_col)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=DEFLATE_DECODE_SCHEMA)
    )


def with_deflate_payload(docs: DataFrame, src: str = "text", spread: bool = True) -> DataFrame:
    """Fixture builder: attach a zlib-DEFLATE-compressed payload of
    the document's utf-8 bytes (stdlib zlib encoder, default level —
    a genuine compressed stream, not byte math)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib as _zlib

        import pandas as _pd

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        _zlib.compress(t.encode("utf-8")) for t in pdf[src]
                    ],
                }
            )

    out = docs.select("doc_id", src).where(F.col(src).isNotNull())
    if spread:
        # Single-file scans plateau decode parallelism (one parquet
        # file -> one input partition at bench SFs; SCALING.md's sf1
        # note). Spread the TEXT before payload construction so the
        # decode map runs on every core while payloads still never
        # cross an Exchange.
        out = out.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return out.mapInPandas(batches, schema="doc_id bigint, payload binary")


def with_wav_payload(docs: DataFrame, pcm_from: str = "text", spread: bool = True) -> DataFrame:
    """Fixture builder: attach a real WAV container whose 8-bit mono
    PCM samples are the document's utf-8 bytes (deterministic, so the
    decoded features replay in SQL from the text). Container bytes are
    assembled by the stdlib ``wave`` ENCODER inside the batch — the
    payload column carries genuine WAV files, not byte math."""
    _rate = WAV_SAMPLE_RATE  # plain-int local -> pickled by value

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        import pandas as _pd

        def _wav(pcm: bytes) -> bytes:
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(1)
                w.setframerate(_rate)  # captured by value: stays
                # in sync with build_wav without importing etl_spark
                w.writeframes(pcm)
            return buf.getvalue()

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        _wav(t.encode("utf-8")) for t in pdf[pcm_from]
                    ],
                }
            )

    out = docs.select("doc_id", pcm_from).where(F.col(pcm_from).isNotNull())
    if spread:
        # Single-file scans plateau decode parallelism (one parquet
        # file -> one input partition at bench SFs; SCALING.md's sf1
        # note). Spread the TEXT before payload construction so the
        # decode map runs on every core while payloads still never
        # cross an Exchange.
        out = out.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return out.mapInPandas(batches, schema="doc_id bigint, payload binary")


# Analysis frame length for audio feature extraction: 160 samples =
# 20 ms at the 8 kHz fixture rate — the standard speech frame. The
# trailing partial frame is KEPT (real feature extractors emit it
# with its true length; energy normalizes by frame_n, not FRAME).
AUDIO_FRAME = 160


def frame_audio_energy(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Frame-level audio feature extraction: decode each WAV payload
    (stdlib ``wave``), split the 8-bit PCM into AUDIO_FRAME-sample
    analysis frames, and emit per-frame energy features — the stage a
    torchaudio/librosa pipeline runs between decode and model:

      frame_n   samples in the frame (trailing frame may be short)
      frame_sum sum of centered samples  (s - 128; 8-bit midpoint)
      frame_sq  sum of squared centered samples
      rms       sqrt(frame_sq / frame_n)

    frame_sum / frame_sq are EXACT integers so downstream thresholds
    (the voice-activity flag in mm_audio_frame_energy) can be integer
    cross-multiplies instead of float comparisons; rms is a single
    correctly-rounded divide + sqrt of those integers, bit-identical
    across engines. Narrow Arrow map; the payload never shuffles —
    only the 5-column feature rows continue. Per-frame math is a
    numpy reshape + einsum over the whole clip, not a Python loop
    per frame."""
    _FRAME = AUDIO_FRAME  # captured by value; workers can't import us

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        cols = ["doc_id", "frame_idx", "frame_n", "frame_sum", "frame_sq"]

        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                with _wave.open(_io.BytesIO(bytes(payload)), "rb") as w:
                    if w.getsampwidth() != 1:
                        # Loud, not wrong: treating 16/24/32-bit PCM
                        # bytes as samples would frame interleaved
                        # half-words into garbage energies (the BMP
                        # sniff/decode-agreement lesson applied here).
                        raise ValueError(
                            "frame_audio_energy expects 8-bit PCM, got "
                            f"sample width {w.getsampwidth()}"
                        )
                    pcm = w.readframes(w.getnframes())
                n = len(pcm)
                if n == 0:
                    continue
                s = _np.frombuffer(pcm, dtype=_np.uint8).astype(_np.int64) - 128
                n_frames = -(-n // _FRAME)
                padded = _np.zeros(n_frames * _FRAME, dtype=_np.int64)
                padded[:n] = s  # zero-pad: pads add 0 to sum and sq
                grid = padded.reshape(n_frames, _FRAME)
                fsum = grid.sum(axis=1)
                fsq = _np.einsum("ij,ij->i", grid, grid)
                fn = _np.full(n_frames, _FRAME, dtype=_np.int64)
                fn[-1] = n - (n_frames - 1) * _FRAME
                out.append(
                    _pd.DataFrame(
                        {
                            "doc_id": _np.full(n_frames, doc_id, dtype=_np.int64),
                            "frame_idx": _np.arange(n_frames, dtype=_np.int32),
                            "frame_n": fn.astype(_np.int32),
                            "frame_sum": fsum,
                            "frame_sq": fsq,
                        }
                    )
                )
            yield (
                _pd.concat(out, ignore_index=True)
                if out
                else _pd.DataFrame(columns=cols).astype(
                    {
                        "doc_id": "int64",
                        "frame_idx": "int32",
                        "frame_n": "int32",
                        "frame_sum": "int64",
                        "frame_sq": "int64",
                    }
                )
            )

    frames = df.mapInPandas(
        batches,
        schema=(
            "doc_id bigint, frame_idx int, frame_n int, "
            "frame_sum bigint, frame_sq bigint"
        ),
    )
    return frames.withColumn(
        "rms",
        F.sqrt(F.col("frame_sq").cast("double") / F.col("frame_n")),
    )


# ---------------------------------------------------------------------------
# BMP: REAL uncompressed 24-bit bitmap encode/parse, stdlib-only
# ---------------------------------------------------------------------------

# Fixture grid width (pixels per row). 24 keeps sf0.01 docs (~200-2000
# chars) at tens of rows — big enough to exercise multi-row bottom-up
# storage and per-row padding, small enough that the oracle's
# per-character replay stays cheap.
BMP_WIDTH = 24

BMP_DECODE_SCHEMA = (
    "doc_id bigint, mime string, width int, height int, bpp int, "
    "n_pixels bigint, luma_sum bigint, luma_md5 string"
)


def build_bmp(gray: bytes, width: int = BMP_WIDTH) -> bytes:
    """Encode a grayscale byte grid as a REAL uncompressed 24-bit BMP
    (BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, BGR triplets,
    bottom-up row order, rows padded to 4 bytes) — any image viewer
    opens the result. Pixels are gray (B = G = R = byte value), rows
    are ``width`` wide, and a trailing partial row is dropped, so the
    image holds exactly ``(len(gray) // width) * width`` pixels."""
    height = len(gray) // width
    if height == 0:
        raise ValueError(
            f"need at least {width} gray bytes for one row, got {len(gray)}"
        )
    gray = gray[: width * height]
    row_pad = (-(width * 3)) % 4
    row_size = width * 3 + row_pad
    data_size = row_size * height
    offset = 14 + 40
    file_header = struct.pack(
        "<2sIHHI", b"BM", offset + data_size, 0, 0, offset
    )
    # biHeight > 0 = bottom-up (the standard orientation); 2835 px/m
    # = 72 DPI, the conventional placeholder resolution.
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size,
        2835, 2835, 0, 0,
    )
    pad = b"\x00" * row_pad
    rows = [
        b"".join(
            bytes((v, v, v)) for v in gray[y * width : (y + 1) * width]
        )
        + pad
        for y in range(height - 1, -1, -1)
    ]
    return file_header + info_header + b"".join(rows)


def decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed 24-bit BMP: header walk, bottom-up (or
    top-down when biHeight < 0) row un-flip, padding strip, integer
    ITU-R 601 luma per pixel ((299R + 587G + 114B) // 1000 — exact
    integer math, equal to the byte value on gray pixels). Returns
    the decode summary; ``luma_md5`` is over the TOP-DOWN row-major
    luma bytes, the orientation a downstream vision model consumes.
    Fails LOUDLY on a malformed container (sniff_mime verified the
    header, so a parse error here is corruption, not a false sniff).
    """
    magic, file_size, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    (dib_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if magic != b"BM" or dib_size != 40:
        raise ValueError("not a BITMAPINFOHEADER BMP")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    luma = bytearray(width * height)
    for out_y in range(height):
        src_y = out_y if top_down else height - 1 - out_y
        base = offset + src_y * row_size
        row = payload[base : base + width * 3]
        for x in range(width):
            b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            luma[out_y * width + x] = (299 * r + 587 * g + 114 * b) // 1000
    luma = bytes(luma)
    return {
        "mime": "image/bmp",
        "width": width,
        "height": height,
        "bpp": bpp,
        "n_pixels": width * height,
        "luma_sum": sum(luma),
        "luma_md5": hashlib.md5(luma).hexdigest(),
    }


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick the neighbor (left,
    up, up-left) closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def build_png(gray: bytes, width: int = BMP_WIDTH) -> bytes:
    """Encode a grayscale byte grid as a REAL PNG (signature, IHDR,
    one zlib IDAT, IEND, all CRCs) — 8-bit grayscale, top-down rows,
    trailing partial row dropped (the BMP fixture contract). Row y is
    filtered with type y % 5, so every decoder filter branch (None/
    Sub/Up/Average/Paeth) is load-bearing on every image taller than
    4 rows — a filter-reconstruction bug cannot hide."""
    height = len(gray) // width
    if height == 0:
        raise ValueError(
            f"need at least {width} gray bytes for one row, got {len(gray)}"
        )
    gray = gray[: width * height]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        row = gray[y * width : (y + 1) * width]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[x] - (row[x - 1] if x else 0)) & 0xFF
                for x in range(width)
            )
        elif ft == 2:  # Up
            raw += bytes((row[x] - prev[x]) & 0xFF for x in range(width))
        elif ft == 3:  # Average
            raw += bytes(
                (row[x] - ((row[x - 1] if x else 0) + prev[x]) // 2) & 0xFF
                for x in range(width)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - 1] if x else 0,
                        prev[x],
                        prev[x - 1] if x else 0,
                    )
                )
                & 0xFF
                for x in range(width)
            )
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def png_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Chunk walk + zlib inflate + per-row filter reconstruction for
    an 8-bit grayscale non-interlaced PNG: (width, height, top-down
    row-major gray bytes). CRCs are verified — a corrupt payload that
    carries the true PNG magic fails LOUDLY, like the WAV branch."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = None
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if crc != zlib.crc32(tag + data):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, fm, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, comp, fm, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={ctype} "
                    f"interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(idat)
    stride = w + 1
    if len(raw) != stride * h:
        raise ValueError("PNG scanline data size mismatch")
    return w, h, _unfilter_png(raw, w, h).tobytes()


def _unfilter_png(raw: bytes, w: int, h: int) -> "np.ndarray":
    """PNG filter reconstruction, numpy-vectorized where the filter
    math allows: None is a copy, Up is one wrapping uint8 vector add,
    Sub is a cumulative sum mod 256 (rec[x] = Σ line[..x] mod 256 —
    the recurrence telescopes). Average and Paeth genuinely read the
    just-reconstructed left neighbor, so those rows keep a Python
    loop (over plain lists, not numpy scalars). With build_png's
    y % 5 filter cycle, 3/5 of all rows take the vector path.
    Returns the top-down (h, w) uint8 luminance grid."""
    stride = w + 1
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        ft = int(mat[y, 0])
        line = mat[y, 1:]
        if ft == 0:
            out[y] = line
        elif ft == 1:  # Sub
            out[y] = np.cumsum(line, dtype=np.uint64).astype(np.uint8)
        elif ft == 2:  # Up: uint8 addition wraps mod 256 by definition
            out[y] = line + prev
        elif ft in (3, 4):  # Average / Paeth: true left recurrence
            li, pl = line.tolist(), prev.tolist()
            rec = bytearray(w)
            a = 0
            if ft == 3:
                for x in range(w):
                    a = (li[x] + (a + pl[x]) // 2) & 0xFF
                    rec[x] = a
            else:
                for x in range(w):
                    b = pl[x]
                    c = pl[x - 1] if x else 0
                    a = (li[x] + _paeth(a, b, c)) & 0xFF
                    rec[x] = a
            out[y] = np.frombuffer(bytes(rec), dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        prev = out[y]
    return out


def decode_png(payload: bytes) -> dict:
    """Decode summary for an 8-bit grayscale PNG — the compressed-
    raster sibling of decode_bmp: the gray samples ARE the luminance,
    so the summary matches decode_bmp's for the same pixel grid."""
    w, h, gray = png_gray(payload)
    return {
        "mime": "image/png",
        "width": w,
        "height": h,
        "bpp": 8,
        "n_pixels": w * h,
        "luma_sum": sum(gray),
        "luma_md5": hashlib.md5(gray).hexdigest(),
    }


def _lzw_encode(data: bytes, min_code: int) -> bytes:
    """GIF-variant LZW (LSB-first variable-width codes, CLEAR/END
    codes, 12-bit cap). The code WIDTH the decoder expects depends on
    the DECODER's table size, which lags the encoder's by one insert —
    the classic GIF off-by-one trap. Instead of replicating that
    arithmetic, the encoder SIMULATES the decoder's table counter in
    lockstep (dec_next) and widens exactly when the decoder will:
    correct by construction, verified by the >4096-entry roundtrip
    stress in tests/test_gif_decode.py."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, end + 1

    table, next_code = fresh()
    width = min_code + 1
    dec_next, dec_first = end + 1, True
    emit(clear, width)

    def emitted(code: int) -> None:
        # lockstep decoder simulation: the decoder inserts one entry
        # per code AFTER the first post-clear code, then widens when
        # its counter reaches the current width's capacity
        nonlocal dec_next, dec_first, width
        if dec_first:
            dec_first = False
            return
        dec_next += 1
        if dec_next == (1 << width) and width < 12:
            width += 1

    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        emitted(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:
            # table full: flush CLEAR and restart both sides
            emit(clear, width)
            table, next_code = fresh()
            width = min_code + 1
            dec_next, dec_first = end + 1, True
        w = bytes([byte])
    if w:
        emit(table[w], width)
        emitted(table[w])
    emit(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


#: Per-min_code base symbol tables, built once — re-allocating 256
#: singleton bytes per CLEAR dominated decode cost on the small
#: per-doc payloads the corpus queries feed (round-10 LZW probe:
#: SCALING.md 'GIF LZW at scale').
_LZW_BASES: dict[int, list[bytes]] = {}


def _lzw_decode(data: bytes, min_code: int) -> bytes:
    """GIF-variant LZW decoder: variable width LSB-first, CLEAR
    resets, the KwKwK case (code == next entry), 12-bit cap.

    Hot-loop form (measured 1.3-1.4x over the naive loop, the best
    Python-reachable shape found by the round-10 probe): the base
    table is copied from a module cache instead of rebuilt per CLEAR,
    the previous ENTRY rides as bytes (no double table indexing), and
    the width mask is maintained incrementally."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = _LZW_BASES.get(min_code)
    if base is None:
        base = [bytes([i]) for i in range(clear)] + [b"", b""]
        _LZW_BASES[min_code] = base
    pos = bitbuf = nbits = 0
    out = bytearray()
    table = base.copy()
    append = table.append
    width = min_code + 1
    mask = (1 << width) - 1
    next_code = end + 1
    prev_entry = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream ended without END code")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & mask
        bitbuf >>= width
        nbits -= width
        if code >= clear:
            if code == clear:
                table = base.copy()
                append = table.append
                width = min_code + 1
                mask = (1 << width) - 1
                next_code, prev_entry = end + 1, None
                continue
            if code == end:
                return bytes(out)
        if prev_entry is None:
            if code >= clear:
                raise ValueError(f"bad first LZW code {code}")
            prev_entry = table[code]
            out += prev_entry
            continue
        if code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev_entry + prev_entry[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} beyond table {next_code}")
        out += entry
        if next_code < 4096:
            append(prev_entry + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
                mask = (1 << width) - 1
        prev_entry = entry


def _gif_subblocks(stream: bytes) -> bytes:
    return (
        b"".join(
            bytes([len(stream[i : i + 255])]) + stream[i : i + 255]
            for i in range(0, len(stream), 255)
        )
        + b"\x00"
    )


_GIF_GRAY_GCT = bytes(v for i in range(256) for v in (i, i, i))


def build_gif(gray: bytes, width: int = BMP_WIDTH) -> bytes:
    """Encode a grayscale byte grid as a REAL GIF89a (logical screen
    descriptor, 256-entry gray-identity global color table, image
    descriptor, genuine LZW-compressed index stream in sub-blocks,
    trailer) — the third raster container next to build_bmp and
    build_png, same grid contract (BMP_WIDTH pixels per row, trailing
    partial row dropped). Gray-identity palette makes index == luma,
    so all three containers hold the SAME image."""
    height = len(gray) // width
    if height == 0:
        raise ValueError(
            f"need at least {width} gray bytes for one row, got {len(gray)}"
        )
    gray = gray[: width * height]
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
        + _GIF_GRAY_GCT
        + struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
        + bytes([8])
        + _gif_subblocks(_lzw_encode(gray, 8))
        + b"\x3B"
    )


def gif_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Block walk + LZW inflate for an 8-bit non-interlaced GIF with a
    gray-identity palette: (width, height, top-down row-major gray
    bytes). Violations fail LOUDLY (wrong palette, interlace, local
    color table, size mismatch), like the PNG/WAV branches."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if packed & 0x80:
        gct_len = 3 * (2 << (packed & 0x07))
        gct = payload[pos : pos + gct_len]
        if gct != _GIF_GRAY_GCT[: gct_len]:
            raise ValueError("GIF palette is not gray-identity")
        pos += gct_len
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            min_code = payload[pos]
            pos += 1
            stream = bytearray()
            while payload[pos]:
                ln = payload[pos]
                stream += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            gray = _lzw_decode(bytes(stream), min_code)
            if len(gray) != w * h:
                raise ValueError("GIF pixel data size mismatch")
            return w, h, gray
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF without image data")


def decode_gif(payload: bytes) -> dict:
    """Decode summary for an 8-bit gray GIF — the LZW sibling of
    decode_png/decode_bmp: same pixel grid, same summary."""
    w, h, gray = gif_gray(payload)
    return {
        "mime": "image/gif",
        "width": w,
        "height": h,
        "bpp": 8,
        "n_pixels": w * h,
        "luma_sum": sum(gray),
        "luma_md5": hashlib.md5(gray).hexdigest(),
    }


def with_bmp_payload(docs: DataFrame, src: str = "text", spread: bool = True) -> DataFrame:
    """Fixture builder: attach a REAL 24-bit BMP whose gray pixel grid
    is the document's utf-8 bytes, BMP_WIDTH pixels per row (trailing
    partial row dropped by the encoder). Narrow Arrow map; requires
    ``length(src) >= BMP_WIDTH`` upstream."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        _W = BMP_WIDTH

        def _bmp(gray: bytes) -> bytes:
            # Self-contained twin of build_bmp (workers can't import
            # etl_spark); tests pin driver-vs-worker byte parity.
            h = len(gray) // _W
            gray = gray[: _W * h]
            pad = (-( _W * 3)) % 4
            data = ( _W * 3 + pad) * h
            head = _struct.pack("<2sIHHI", b"BM", 54 + data, 0, 0, 54)
            dib = _struct.pack(
                "<IiiHHIIiiII", 40, _W, h, 1, 24, 0, data, 2835, 2835, 0, 0
            )
            rows = [
                b"".join(
                    bytes((v, v, v)) for v in gray[y * _W : (y + 1) * _W]
                )
                + b"\x00" * pad
                for y in range(h - 1, -1, -1)
            ]
            return head + dib + b"".join(rows)

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        _bmp(t.encode("utf-8")) for t in pdf[src]
                    ],
                }
            )

    out = docs.select("doc_id", src).where(F.col(src).isNotNull())
    if spread:
        # Single-file scans plateau decode parallelism (one parquet
        # file -> one input partition at bench SFs; SCALING.md's sf1
        # note). Spread the TEXT before payload construction so the
        # decode map runs on every core while payloads still never
        # cross an Exchange.
        out = out.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return out.mapInPandas(batches, schema="doc_id bigint, payload binary")


def with_png_payload(docs: DataFrame, src: str = "text", spread: bool = True) -> DataFrame:
    """Fixture builder: attach a REAL 8-bit grayscale PNG whose pixel
    grid is the document's utf-8 bytes, BMP_WIDTH pixels per row
    (same grid contract as with_bmp_payload, so the two containers
    hold the SAME image). Narrow Arrow map; requires
    ``length(src) >= BMP_WIDTH`` upstream."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        _W = BMP_WIDTH

        def _png(gray: bytes) -> bytes:
            # Self-contained twin of build_png (workers can't import
            # etl_spark); tests pin driver-vs-worker byte parity.
            h = len(gray) // _W
            gray = gray[: _W * h]

            def _ck(tag, data):
                return (
                    _struct.pack(">I", len(data)) + tag + data
                    + _struct.pack(">I", _zlib.crc32(tag + data))
                )

            def _pth(a, b, c):
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

            raw = bytearray()
            prev = bytes(_W)
            for y in range(h):
                row = gray[y * _W : (y + 1) * _W]
                ft = y % 5
                raw.append(ft)
                for x in range(_W):
                    left = row[x - 1] if x else 0
                    if ft == 0:
                        v = row[x]
                    elif ft == 1:
                        v = row[x] - left
                    elif ft == 2:
                        v = row[x] - prev[x]
                    elif ft == 3:
                        v = row[x] - (left + prev[x]) // 2
                    else:
                        v = row[x] - _pth(left, prev[x], prev[x - 1] if x else 0)
                    raw.append(v & 0xFF)
                prev = row
            return (
                b"\x89PNG\r\n\x1a\n"
                + _ck(b"IHDR", _struct.pack(">IIBBBBB", _W, h, 8, 0, 0, 0, 0))
                + _ck(b"IDAT", _zlib.compress(bytes(raw)))
                + _ck(b"IEND", b"")
            )

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        _png(t.encode("utf-8")) for t in pdf[src]
                    ],
                }
            )

    out = docs.select("doc_id", src).where(F.col(src).isNotNull())
    if spread:
        # Single-file scans plateau decode parallelism (one parquet
        # file -> one input partition at bench SFs; SCALING.md's sf1
        # note). Spread the TEXT before payload construction so the
        # decode map runs on every core while payloads still never
        # cross an Exchange.
        out = out.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return out.mapInPandas(batches, schema="doc_id bigint, payload binary")


def with_gif_payload(docs: DataFrame, src: str = "text", spread: bool = True) -> DataFrame:
    """Fixture builder: attach a REAL GIF89a whose pixel grid is the
    document's utf-8 bytes (same grid contract as with_bmp_payload /
    with_png_payload, so all three containers hold the SAME image).
    The worker closure ships the driver encoder by value (build_gif's
    pure-function helpers close over nothing module-level), keeping it
    self-contained; tests pin driver-vs-worker byte parity."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        _W = BMP_WIDTH
        _GCT = bytes(v for i in range(256) for v in (i, i, i))

        def _lzw(data: bytes) -> bytes:
            # Self-contained twin of _lzw_encode (min_code = 8): the
            # decoder-lockstep width simulation, verbatim.
            clear, end = 256, 257
            out = bytearray()
            bb = nb = 0

            def emit(code, width):
                nonlocal bb, nb
                bb |= code << nb
                nb += width
                while nb >= 8:
                    out.append(bb & 0xFF)
                    bb >>= 8
                    nb -= 8

            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
            dec_next, dec_first = 258, True
            emit(clear, width)

            def emitted():
                nonlocal dec_next, dec_first, width
                if dec_first:
                    dec_first = False
                    return
                dec_next += 1
                if dec_next == (1 << width) and width < 12:
                    width += 1

            w = b""
            for byte in data:
                wk = w + bytes([byte])
                if wk in table:
                    w = wk
                    continue
                emit(table[w], width)
                emitted()
                if next_code < 4096:
                    table[wk] = next_code
                    next_code += 1
                else:
                    emit(clear, width)
                    table = {bytes([i]): i for i in range(256)}
                    next_code, width = 258, 9
                    dec_next, dec_first = 258, True
                w = bytes([byte])
            if w:
                emit(table[w], width)
                emitted()
            emit(end, width)
            if nb:
                out.append(bb & 0xFF)
            return bytes(out)

        def _gif(gray: bytes) -> bytes:
            h = len(gray) // _W
            gray = gray[: _W * h]
            stream = _lzw(gray)
            blocks = b"".join(
                bytes([len(stream[i : i + 255])]) + stream[i : i + 255]
                for i in range(0, len(stream), 255)
            ) + b"\x00"
            return (
                b"GIF89a"
                + _struct.pack("<HHBBB", _W, h, 0xF7, 0, 0)
                + _GCT
                + _struct.pack("<BHHHHB", 0x2C, 0, 0, _W, h, 0)
                + bytes([8])
                + blocks
                + b"\x3B"
            )

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        _gif(t.encode("utf-8")) for t in pdf[src]
                    ],
                }
            )

    out = docs.select("doc_id", src).where(F.col(src).isNotNull())
    if spread:
        out = out.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return out.mapInPandas(batches, schema="doc_id bigint, payload binary")


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode stage: payloads are genuine raster containers
    — uncompressed 24-bit BMP (``build_bmp``), 8-bit grayscale PNG
    (``build_png``) or LZW-compressed GIF89a (``build_gif``) —
    dispatched on magic bytes and parsed on the workers: struct header
    walk + un-flip + integer luma for BMP; chunk walk + zlib inflate +
    per-row filter reconstruction for PNG; block walk + variable-width
    LZW for GIF. Narrow map, Arrow batch in/out; the exact stage shape
    a PIL-backed pipeline has, with the three raster codecs the stdlib
    plus ~80 lines of LZW can express in the decode slot."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import struct as _struct
        import zlib as _zlib

        import numpy as _np
        import pandas as _pd

        def _png_gray(payload: bytes) -> tuple:
            # Self-contained twin of png_gray (workers can't import
            # etl_spark): chunk walk, inflate, unfilter. Filter
            # reconstruction is sequential within a row by definition
            # (Sub/Average/Paeth read the just-reconstructed left
            # neighbor), so this is a per-pixel loop — rows are
            # BMP_WIDTH wide, bounded per doc.
            pos = 8
            idat = b""
            w = h = None
            while pos + 8 <= len(payload):
                ln, tag = _struct.unpack_from(">I4s", payload, pos)
                data = payload[pos + 8 : pos + 8 + ln]
                if tag == b"IHDR":
                    w, h = _struct.unpack(">II", data[:8])
                elif tag == b"IDAT":
                    idat += data
                elif tag == b"IEND":
                    break
                pos += 12 + ln
            raw = _zlib.decompress(idat)
            # Vectorized unfilter (operators/media.py::_unfilter_png
            # twin): None=copy, Sub=cumsum mod 256, Up=wrapping uint8
            # add; Average/Paeth keep the genuine left-recurrence loop.
            m = _np.frombuffer(raw, dtype=_np.uint8).reshape(h, w + 1)
            out = _np.empty((h, w), dtype=_np.uint8)
            prev = _np.zeros(w, dtype=_np.uint8)
            for y in range(h):
                ft = int(m[y, 0])
                line = m[y, 1:]
                if ft == 0:
                    out[y] = line
                elif ft == 1:
                    out[y] = _np.cumsum(line, dtype=_np.uint64).astype(
                        _np.uint8
                    )
                elif ft == 2:
                    out[y] = line + prev
                else:
                    li, pl = line.tolist(), prev.tolist()
                    rec = bytearray(w)
                    a = 0
                    for x in range(w):
                        b = pl[x]
                        if ft == 3:
                            a = (li[x] + (a + b) // 2) & 0xFF
                        else:
                            c = pl[x - 1] if x else 0
                            p = a + b - c
                            pa, pb, pc = (
                                abs(p - a), abs(p - b), abs(p - c),
                            )
                            a = (
                                li[x]
                                + (
                                    a
                                    if (pa <= pb and pa <= pc)
                                    else (b if pb <= pc else c)
                                )
                            ) & 0xFF
                        rec[x] = a
                    out[y] = _np.frombuffer(bytes(rec), dtype=_np.uint8)
                prev = out[y]
            return w, h, out.tobytes()

        # base symbol table built once per Arrow batch, copied per
        # CLEAR — same hot-loop form as operators/media._lzw_decode
        # (the closure stays self-contained for the worker)
        _lzw_base = [bytes([i]) for i in range(256)] + [b"", b""]

        def _lzw_dec(data: bytes) -> bytes:
            # Self-contained twin of _lzw_decode (min_code = 8):
            # variable-width LSB-first GIF LZW with CLEAR/KwKwK.
            clear, end = 256, 257
            pos = bb = nb = 0
            out = bytearray()
            table = _lzw_base.copy()
            append = table.append
            width, mask, next_code, prev_entry = 9, 511, 258, None
            while True:
                while nb < width:
                    bb |= data[pos] << nb
                    pos += 1
                    nb += 8
                code = bb & mask
                bb >>= width
                nb -= width
                if code >= clear:
                    if code == clear:
                        table = _lzw_base.copy()
                        append = table.append
                        width, mask = 9, 511
                        next_code, prev_entry = 258, None
                        continue
                    if code == end:
                        return bytes(out)
                if prev_entry is None:
                    prev_entry = table[code]
                    out += prev_entry
                    continue
                entry = (
                    table[code]
                    if code < next_code
                    else prev_entry + prev_entry[:1]
                )
                out += entry
                if next_code < 4096:
                    append(prev_entry + entry[:1])
                    next_code += 1
                    if next_code == (1 << width) and width < 12:
                        width += 1
                        mask = (1 << width) - 1
                prev_entry = entry

        def _gif_gray(payload: bytes) -> tuple:
            # Self-contained twin of gif_gray (builder always writes
            # min_code=8, 256-gray GCT, no extensions/interlace).
            packed = payload[10]
            pos = 13
            if packed & 0x80:
                pos += 3 * (2 << (packed & 0x07))
            while payload[pos] == 0x21:
                pos += 2
                while payload[pos]:
                    pos += payload[pos] + 1
                pos += 1
            _l, _t, w, h, _ip = _struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 11  # descriptor (10) + min-code-size byte
            stream = bytearray()
            while payload[pos]:
                ln = payload[pos]
                stream += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            return w, h, _lzw_dec(bytes(stream))

        def _decode(payload: bytes) -> tuple:
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                w, h, gray = _png_gray(payload)
                arr = _np.frombuffer(gray, dtype=_np.uint8)
                return (
                    "image/png",
                    w,
                    h,
                    8,
                    w * h,
                    int(arr.astype(_np.int64).sum()),
                    _hashlib.md5(gray).hexdigest(),
                )
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                w, h, gray = _gif_gray(payload)
                arr = _np.frombuffer(gray, dtype=_np.uint8)
                return (
                    "image/gif",
                    w,
                    h,
                    8,
                    w * h,
                    int(arr.astype(_np.int64).sum()),
                    _hashlib.md5(gray).hexdigest(),
                )
            # Self-contained twin of decode_bmp, vectorized with
            # numpy (rows decode as a (h, row_size) uint8 matrix; the
            # BGR->luma dot product and the bottom-up flip are array
            # ops, not per-pixel Python).
            offset = _struct.unpack_from("<I", payload, 10)[0]
            (_ds, w, h, _p, bpp, comp) = _struct.unpack_from(
                "<IiiHHI", payload, 14
            )
            if bpp != 24 or comp != 0:
                raise ValueError(f"unsupported BMP bpp={bpp} comp={comp}")
            top_down = h < 0
            h = abs(h)
            row_size = (w * 3 + 3) & ~3
            mat = _np.frombuffer(
                payload, dtype=_np.uint8, count=h * row_size, offset=offset
            ).reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
            if not top_down:
                mat = mat[::-1]
            bgr = mat.astype(_np.int64)
            luma = (
                299 * bgr[:, :, 2] + 587 * bgr[:, :, 1] + 114 * bgr[:, :, 0]
            ) // 1000
            luma_bytes = luma.astype(_np.uint8).tobytes()
            return (
                "image/bmp",
                w,
                h,
                bpp,
                w * h,
                int(luma.sum()),
                _hashlib.md5(luma_bytes).hexdigest(),
            )

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                mime, w, h, bpp, npx, lsum, lmd5 = _decode(bytes(payload))
                rows.append((doc_id, mime, w, h, bpp, npx, lsum, lmd5))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "width", "height", "bpp",
                    "n_pixels", "luma_sum", "luma_md5",
                ],
            ).astype(
                {
                    "doc_id": "int64", "width": "int32", "height": "int32",
                    "bpp": "int32", "n_pixels": "int64", "luma_sum": "int64",
                }
            )

    return (
        df.select("doc_id", payload_col)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=BMP_DECODE_SCHEMA)
    )


def thumbnail_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image transform stage: decode each raster payload (BMP or
    PNG, dispatched on magic bytes) and 2x2 box-downsample the
    luminance grid — the thumbnailing/resolution-bucketing step every
    multimodal training pipeline runs before feature extraction. Odd
    trailing row/column are cropped (floor semantics); each output
    pixel is the FLOOR of the mean of its 2x2 block, computed in
    exact integer arithmetic so the result replays byte-for-byte in
    SQL. Emits per doc:

      out_w, out_h   downsampled geometry
      luma_sum       sum of downsampled pixels (exact)
      luma_wsum      position-weighted sum((i+1) * v[i]) over the
                     row-major downsampled grid — order-SENSITIVE, so
                     a transposed / flipped / mis-strided downsample
                     cannot hash-collide with the correct one

    Narrow Arrow map: payloads never shuffle; the downsample is a
    strided numpy add (four shifted views), no Python per pixel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import numpy as _np
        import pandas as _pd

        def _gray(payload: bytes) -> "_np.ndarray":
            # Self-contained raster decode twin (decode_image /
            # perceptual_hash share the pattern; workers can't import
            # etl_spark): returns the top-down (h, w) luminance grid.
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                pos, idat, w, h = 8, b"", None, None
                while pos + 8 <= len(payload):
                    ln, tag = _struct.unpack_from(">I4s", payload, pos)
                    data = payload[pos + 8 : pos + 8 + ln]
                    if tag == b"IHDR":
                        w, h = _struct.unpack(">II", data[:8])
                    elif tag == b"IDAT":
                        idat += data
                    elif tag == b"IEND":
                        break
                    pos += 12 + ln
                raw = _zlib.decompress(idat)
                # Vectorized unfilter twin (see _unfilter_png): only
                # Average/Paeth rows keep the left-recurrence loop.
                m = _np.frombuffer(raw, dtype=_np.uint8).reshape(h, w + 1)
                out = _np.empty((h, w), dtype=_np.uint8)
                prev = _np.zeros(w, dtype=_np.uint8)
                for y in range(h):
                    ft = int(m[y, 0])
                    line = m[y, 1:]
                    if ft == 0:
                        out[y] = line
                    elif ft == 1:
                        out[y] = _np.cumsum(
                            line, dtype=_np.uint64
                        ).astype(_np.uint8)
                    elif ft == 2:
                        out[y] = line + prev
                    else:
                        li, pl = line.tolist(), prev.tolist()
                        rec = bytearray(w)
                        a = 0
                        for x in range(w):
                            b = pl[x]
                            if ft == 3:
                                a = (li[x] + (a + b) // 2) & 0xFF
                            else:
                                c = pl[x - 1] if x else 0
                                p = a + b - c
                                pa, pb, pc = (
                                    abs(p - a), abs(p - b), abs(p - c),
                                )
                                a = (
                                    li[x]
                                    + (
                                        a
                                        if (pa <= pb and pa <= pc)
                                        else (b if pb <= pc else c)
                                    )
                                ) & 0xFF
                            rec[x] = a
                        out[y] = _np.frombuffer(
                            bytes(rec), dtype=_np.uint8
                        )
                    prev = out[y]
                return out.astype(_np.int64)
            # BMP: header walk, bottom-up un-flip, padding strip,
            # integer ITU-R 601 luma (exact /1000 floor). Anything
            # else fails LOUDLY — blindly struct-parsing a non-raster
            # payload as a BMP would produce garbage geometry, not an
            # error.
            if payload[:2] != b"BM":
                raise ValueError(
                    "thumbnail_features expects a BMP or PNG payload"
                )
            offset = _struct.unpack_from("<I", payload, 10)[0]
            (_ds, w, h, _p, _bpp, _c) = _struct.unpack_from(
                "<IiiHHI", payload, 14
            )
            row_size = (w * 3 + 3) & ~3
            mat = _np.frombuffer(
                payload, dtype=_np.uint8, count=row_size * h, offset=offset
            ).reshape(h, row_size)[::-1, : w * 3]
            px = mat.reshape(h, w, 3).astype(_np.int64)
            return (
                px[:, :, 2] * 299 + px[:, :, 1] * 587 + px[:, :, 0] * 114
            ) // 1000

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                g = _gray(bytes(payload))
                h2, w2 = g.shape[0] // 2, g.shape[1] // 2
                if h2 == 0 or w2 == 0:
                    continue
                g = g[: h2 * 2, : w2 * 2]
                ds = (
                    g[0::2, 0::2] + g[0::2, 1::2]
                    + g[1::2, 0::2] + g[1::2, 1::2]
                ) // 4
                flat = ds.ravel()
                weights = _np.arange(1, flat.size + 1, dtype=_np.int64)
                rows.append(
                    (
                        doc_id,
                        w2,
                        h2,
                        int(flat.sum()),
                        int((weights * flat).sum()),
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "out_w", "out_h", "luma_sum", "luma_wsum"],
            ).astype(
                {
                    "doc_id": "int64",
                    "out_w": "int32",
                    "out_h": "int32",
                    "luma_sum": "int64",
                    "luma_wsum": "int64",
                }
            )

    return df.mapInPandas(
        batches,
        schema=(
            "doc_id bigint, out_w int, out_h int, "
            "luma_sum bigint, luma_wsum bigint"
        ),
    )


PHASH_SEGMENTS = 60
PHASH_SCHEMA = "doc_id bigint, phash bigint"
# Deterministic "re-encode" noise model: +1 on every 17th byte — the
# stand-in for the byte-local jitter a lossy re-compression applies to
# an image. Same length, tiny per-segment sum shift, so a perceptual
# hash survives it while an exact md5 cannot.
PHASH_NOISE_STRIDE = 17
# Variant rows get doc_id + this offset; far above any real doc_id
# (make_sfbig shifts by 10M per copy, max ~100M at sf1).
PHASH_VARIANT_OFFSET = 1_000_000_000


def perceptual_hash(
    docs: DataFrame,
    payload_col: str = "payload",
    noisy_variant: bool = False,
    carry: tuple[tuple[str, str], ...] = (),
    pixel_decode: bool = False,
) -> DataFrame:
    """aHash-style perceptual fingerprint over payload bytes.

    The image-pipeline shape (average-hash: resize to a tiny grid,
    threshold each cell against the global mean) applied to the
    deterministic byte-math stand-in: the payload is split into
    PHASH_SEGMENTS contiguous byte segments (boundaries at
    (s*n)//SEG — the integer "resize"), and bit s is set iff the
    segment's byte mean is >= the whole payload's byte mean. The
    comparison is done as an exact integer cross-multiply
    (seg_sum * n >= total_sum * seg_len), so the 60-bit fingerprint
    is bit-identical across engines — no float thresholds.

    With ``noisy_variant`` the stage ALSO emits, per input payload, a
    second fingerprint row (doc_id + PHASH_VARIANT_OFFSET) hashed from
    the payload with re-encode noise applied (+1 every 17th byte) —
    the fixture for "same image, different bytes after recompression".
    The noise is applied inside this stage, so the variant payload
    never materializes anywhere.

    Narrow map: payload bytes never shuffle; only (doc_id, phash)
    continues downstream.

    ``pixel_decode=True`` IS the real image pipeline: payloads are
    parsed as BMP containers (the same struct walk as decode_image)
    and the fingerprint runs over the decoded top-down luminance grid
    instead of raw container bytes — headers, padding and bottom-up
    storage order no longer leak into the hash, so the fingerprint is
    a property of the IMAGE, not its serialization. Banding and the
    Hamming join downstream are unchanged, exactly as documented.
    The noisy variant then perturbs pixel VALUES (+1 per stride-th
    luma sample — re-encode jitter where it physically lands), not
    header bytes.
    """

    # Plain-int locals: the mapInPandas closure captures these BY VALUE
    # (free variables pickle with the function), keeping the worker
    # self-contained — etl_spark is not importable on workers when the
    # driver runs from another cwd — while single-sourcing the
    # constants the oracle SQL and tests mirror.
    _SEG = PHASH_SEGMENTS
    _STRIDE = PHASH_NOISE_STRIDE
    _OFF = PHASH_VARIANT_OFFSET
    _PIXELS = pixel_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import numpy as _np
        import pandas as _pd

        _BITS = 1 << _np.arange(_SEG, dtype=_np.int64)

        def _luma(payload: bytes) -> "_np.ndarray":
            # Inline raster parse (decode_image's twin; closures stay
            # self-contained for workers): top-down luminance grid,
            # flattened row-major — the array the fingerprint sees.
            # Dispatch on magic: PNG (chunk walk + inflate + per-row
            # unfilter; gray IS luma) or BMP (header walk + un-flip +
            # integer luma) — so the fingerprint is container-blind.
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                pos, idat, w, h = 8, b"", None, None
                while pos + 8 <= len(payload):
                    ln, tag = _struct.unpack_from(">I4s", payload, pos)
                    data = payload[pos + 8 : pos + 8 + ln]
                    if tag == b"IHDR":
                        w, h = _struct.unpack(">II", data[:8])
                    elif tag == b"IDAT":
                        idat += data
                    elif tag == b"IEND":
                        break
                    pos += 12 + ln
                raw = _zlib.decompress(idat)
                # Vectorized unfilter twin (see _unfilter_png): only
                # Average/Paeth rows keep the left-recurrence loop.
                m = _np.frombuffer(raw, dtype=_np.uint8).reshape(h, w + 1)
                out = _np.empty((h, w), dtype=_np.uint8)
                prev = _np.zeros(w, dtype=_np.uint8)
                for y in range(h):
                    ft = int(m[y, 0])
                    line = m[y, 1:]
                    if ft == 0:
                        out[y] = line
                    elif ft == 1:
                        out[y] = _np.cumsum(
                            line, dtype=_np.uint64
                        ).astype(_np.uint8)
                    elif ft == 2:
                        out[y] = line + prev
                    else:
                        li, pl = line.tolist(), prev.tolist()
                        rec = bytearray(w)
                        a = 0
                        for x in range(w):
                            b = pl[x]
                            if ft == 3:
                                a = (li[x] + (a + b) // 2) & 0xFF
                            else:
                                c = pl[x - 1] if x else 0
                                p = a + b - c
                                pa, pb, pc = (
                                    abs(p - a), abs(p - b), abs(p - c),
                                )
                                a = (
                                    li[x]
                                    + (
                                        a
                                        if (pa <= pb and pa <= pc)
                                        else (b if pb <= pc else c)
                                    )
                                ) & 0xFF
                            rec[x] = a
                        out[y] = _np.frombuffer(
                            bytes(rec), dtype=_np.uint8
                        )
                    prev = out[y]
                return out.reshape(-1).astype(_np.int64)
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                # Self-contained GIF twin (min_code=8 builder contract;
                # see gif_gray/_lzw_decode).
                clear, end = 256, 257
                packed = payload[10]
                pos = 13
                if packed & 0x80:
                    pos += 3 * (2 << (packed & 0x07))
                while payload[pos] == 0x21:
                    pos += 2
                    while payload[pos]:
                        pos += payload[pos] + 1
                    pos += 1
                _l, _t, w, h, _ip = _struct.unpack_from(
                    "<HHHHB", payload, pos + 1
                )
                pos += 11
                stream = bytearray()
                while payload[pos]:
                    ln = payload[pos]
                    stream += payload[pos + 1 : pos + 1 + ln]
                    pos += ln + 1
                data = bytes(stream)
                p2 = bb = nb = 0
                outb = bytearray()
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width, next_code, prev = 9, 258, None
                while True:
                    while nb < width:
                        bb |= data[p2] << nb
                        p2 += 1
                        nb += 8
                    code = bb & ((1 << width) - 1)
                    bb >>= width
                    nb -= width
                    if code == clear:
                        table = [bytes([i]) for i in range(256)] + [b"", b""]
                        width, next_code, prev = 9, 258, None
                        continue
                    if code == end:
                        break
                    if prev is None:
                        outb += table[code]
                        prev = code
                        continue
                    entry = (
                        table[code]
                        if code < next_code
                        else table[prev] + table[prev][:1]
                    )
                    outb += entry
                    if next_code < 4096:
                        table.append(table[prev] + entry[:1])
                        next_code += 1
                        if next_code == (1 << width) and width < 12:
                            width += 1
                    prev = code
                return _np.frombuffer(bytes(outb), dtype=_np.uint8).astype(
                    _np.int64
                )
            offset = _struct.unpack_from("<I", payload, 10)[0]
            (_ds, w, h, _p, _bpp, _c) = _struct.unpack_from(
                "<IiiHHI", payload, 14
            )
            top_down = h < 0
            h = abs(h)
            row_size = (w * 3 + 3) & ~3
            mat = _np.frombuffer(
                payload, dtype=_np.uint8, count=h * row_size, offset=offset
            ).reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
            if not top_down:
                mat = mat[::-1]
            bgr = mat.astype(_np.int64)
            return (
                (
                    299 * bgr[:, :, 2]
                    + 587 * bgr[:, :, 1]
                    + 114 * bgr[:, :, 0]
                )
                // 1000
            ).reshape(-1)

        def _phash(arr: "_np.ndarray") -> int:
            # One cumsum per payload instead of 60 sliced sums: segment
            # boundaries (s*n)//SEG are exact integer math, so the
            # result is bit-identical to the per-segment loop the
            # oracle replays. Empty segments (n < SEG) contribute bit 0
            # — 0*n >= total*0 would SET the bit and make all short
            # payloads look alike, so they are masked out; registered
            # queries filter length >= SEG and never hit this branch.
            n = len(arr)
            bounds = (_np.arange(_SEG + 1, dtype=_np.int64) * n) // _SEG
            csum = _np.concatenate(([0], _np.cumsum(arr)))
            ssums = csum[bounds[1:]] - csum[bounds[:-1]]
            slens = bounds[1:] - bounds[:-1]
            total = int(csum[-1])
            bits = ((ssums * n) >= (total * slens)) & (slens > 0)
            return int(_BITS[bits].sum())

        for pdf in it:
            ids, hashes = [], []
            carried: list[list] = [[] for _ in _carry_names]
            for row_i, (doc_id, payload) in enumerate(
                zip(pdf["doc_id"], pdf[payload_col])
            ):
                payload = bytes(payload)
                arr = (
                    _luma(payload)
                    if _PIXELS
                    else _np.frombuffer(payload, dtype=_np.uint8).astype(
                        _np.int64
                    )
                )
                ids.append(doc_id)
                hashes.append(_phash(arr))
                reps = 1
                if noisy_variant:
                    noisy = arr.copy()
                    noisy[::_STRIDE] += 1
                    ids.append(doc_id + _OFF)
                    hashes.append(_phash(noisy))
                    reps = 2
                for ci, cname in enumerate(_carry_names):
                    carried[ci].extend([pdf[cname].iloc[row_i]] * reps)
            out = {"doc_id": ids, "phash": hashes}
            for ci, cname in enumerate(_carry_names):
                out[cname] = carried[ci]
            yield _pd.DataFrame(out)

    _carry_names = tuple(name for name, _ in carry)
    schema = PHASH_SCHEMA + "".join(
        f", {name} {typ}" for name, typ in carry
    )
    return (
        docs.select("doc_id", payload_col, *_carry_names)
        .where(F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=schema)
    )


# Autocorrelation lags for the periodicity features: samples (not
# frames), so lag L compares s[i] with s[i+L].
AUTOCORR_LAGS = (1, 2, 4)


def audio_autocorr(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Clip-level autocorrelation features: decode each WAV payload
    (stdlib ``wave``, 8-bit PCM only — same loud sample-width guard as
    frame_audio_energy) and emit, per clip,

      n_samples  decoded sample count
      r0         Σ s[i]²            (energy; autocorr at lag 0)
      r<L>       Σ s[i]·s[i+L]      for each L in AUTOCORR_LAGS

    over centered samples s = byte − 128. Autocorrelation at short
    lags is the classic periodicity/voicing signal (speech vs noise vs
    silence) and — unlike spectral features — it is EXACT integer
    math: each r is an int64 dot product, so the oracle can replay it
    from the fixture text and normalized ratios downstream are single
    exact divisions. Narrow Arrow map: one row out per clip, the
    payload never shuffles, per-clip work is numpy dot products."""
    _LAGS = AUTOCORR_LAGS  # captured by value; workers can't import us

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        cols = ["doc_id", "n_samples", "r0"] + [f"r{L}" for L in _LAGS]
        dtypes = {c: "int64" for c in cols}

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                with _wave.open(_io.BytesIO(bytes(payload)), "rb") as w:
                    if w.getsampwidth() != 1:
                        raise ValueError(
                            "audio_autocorr expects 8-bit PCM, got "
                            f"sample width {w.getsampwidth()}"
                        )
                    pcm = w.readframes(w.getnframes())
                n = len(pcm)
                if n == 0:
                    continue
                s = _np.frombuffer(pcm, dtype=_np.uint8).astype(_np.int64) - 128
                row = [int(doc_id), n, int(_np.dot(s, s))]
                for L in _LAGS:
                    row.append(int(_np.dot(s[:-L], s[L:])) if n > L else 0)
                rows.append(row)
            yield (
                _pd.DataFrame(rows, columns=cols)
                if rows
                else _pd.DataFrame(columns=cols).astype(dtypes)
            )

    return df.mapInPandas(
        batches,
        schema="doc_id bigint, n_samples bigint, r0 bigint, "
        + ", ".join(f"r{L} bigint" for L in _LAGS),
    )
