"""frame_audio_energy fences beyond oracle parity: exact frame
boundary behavior (n < FRAME, n == FRAME, n == FRAME+1, multi-frame),
zero-pad correctness of the reshape trick (pads must contribute 0 to
both sums while frame_n keeps the true length), empty-clip emission,
and the integer-VAD edge (a clip whose frames all carry identical
energy has NO active frame — strict inequality)."""

from __future__ import annotations

import math

from etl_spark.operators.media import (
    AUDIO_FRAME,
    build_wav,
    frame_audio_energy,
)


def _reference(pcm: bytes) -> list[tuple]:
    """Pure-python per-frame (n, sum, sq) — the spec the numpy
    reshape+einsum implementation must match exactly."""
    out = []
    for f in range(math.ceil(len(pcm) / AUDIO_FRAME)):
        seg = pcm[f * AUDIO_FRAME : (f + 1) * AUDIO_FRAME]
        c = [b - 128 for b in seg]
        out.append((len(seg), sum(c), sum(v * v for v in c)))
    return out


def test_frame_boundaries_match_reference(spark):
    texts = {
        1: b"a" * (AUDIO_FRAME - 1),
        2: b"b" * AUDIO_FRAME,
        3: b"c" * (AUDIO_FRAME + 1),
        4: ("mixed energy frame " * 40).encode()[: AUDIO_FRAME * 3 + 7],
    }
    df = spark.createDataFrame(
        [(i, build_wav(t)) for i, t in texts.items()],
        "doc_id bigint, payload binary",
    )
    rows = frame_audio_energy(df).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["frame_idx"], r["frame_n"], r["frame_sum"], r["frame_sq"], r["rms"])
        )
    for doc_id, pcm in texts.items():
        want = _reference(pcm)
        frames = sorted(got[doc_id])
        assert len(frames) == len(want), doc_id
        for (idx, fn, fs, fq, rms), (wn, ws, wq) in zip(frames, want):
            assert (fn, fs, fq) == (wn, ws, wq), (doc_id, idx)
            assert rms == math.sqrt(fq / fn), (doc_id, idx)


def test_empty_clip_emits_no_frames(spark):
    df = spark.createDataFrame(
        [(1, build_wav(b"")), (2, build_wav(b"x" * 10))],
        "doc_id bigint, payload binary",
    )
    rows = frame_audio_energy(df).collect()
    assert {r["doc_id"] for r in rows} == {2}
    assert len(rows) == 1 and rows[0]["frame_n"] == 10


def test_vad_strict_inequality_on_uniform_energy(spark):
    # Two full frames of the SAME byte: frame mean square == clip mean
    # square exactly, so the strict integer cross-multiply marks
    # NEITHER frame active. The query-side expression is replicated
    # here on exact integers — no float compare anywhere.
    pcm = b"q" * (2 * AUDIO_FRAME)
    ref = _reference(pcm)
    tot_n = sum(f[0] for f in ref)
    tot_sq = sum(f[2] for f in ref)
    assert all(fq * tot_n == tot_sq * fn for fn, _, fq in ref)


def test_non_8bit_wav_fails_loudly(spark):
    # A genuine 16-bit WAV must raise, not silently frame interleaved
    # half-words into garbage energies (sniff/decode-agreement lesson).
    import io
    import wave

    import pytest
    from pyspark.errors import PythonException

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 400)
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "doc_id bigint, payload binary"
    )
    with pytest.raises(PythonException, match="expects 8-bit PCM"):
        frame_audio_energy(df).collect()
