"""Reference audio encoders + the pinned codec fixture (VERDICT r7 task #8).

The encoders here are quantize-then-mirror-the-decoder state machines per
the published specs (IMA "Recommended Practices for Enhancing Digital Audio
Compatibility" / RFC 3551 §4.5.1; the Microsoft multimedia standards update
for WAV format tag 2).  They are deliberately written as plain sequential
Python — NOT the numpy block-vectorized decoders in operators/multimodal.py
— so that "decoder reproduces the encoder's internal predictions exactly"
is a meaningful cross-implementation check, both in pytest and in the
driver-contract `audio_decode_check` oracle slot.

codec_fixture() pins a small deterministic set of (payload, expected int16
samples) covering every REAL codec family: integer PCM (8/16-bit), G.711
mu-law/A-law (expected via an independent inline ITU-T expansion, not the
decoder's table), IEEE float32 (on an exactly-representable grid), IMA/DVI
ADPCM, MS ADPCM (several predictor pairs), and 'fact'-chunk-trimmed ADPCM.
Every expected value is integer-exact: decode_audio returns float32 in
[-1, 1] whose round(x * 32768) recovers the int16 losslessly for all of
these constructions.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def write_wav(codes: bytes, fmt_code: int, nch: int = 1,
              sr: int = 8000, bits: int = 8,
              block_align: int | None = None,
              n_frames: int | None = None) -> bytes:
    """Minimal RIFF writer for non-integer-PCM WAVs (wFormatTag 6 = A-law,
    7 = mu-law, 3 = IEEE float, 0x11 = IMA ADPCM, 0x02 = MS ADPCM) —
    stdlib wave refuses to WRITE these, so the fixture brings its own
    container.  ``n_frames`` emits the optional 'fact' chunk (true
    per-channel sample count, ADVICE r7 #3)."""
    ba = nch * (bits // 8) if block_align is None else block_align
    fmt = struct.pack("<HHIIHH", fmt_code, nch, sr,
                      sr * nch * max(bits // 8, 1), ba, bits)
    fact = (b"" if n_frames is None
            else b"fact" + struct.pack("<II", 4, n_frames))
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + fact
            + b"data" + struct.pack("<I", len(codes)) + codes
            + (b"\x00" if len(codes) % 2 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ima_encode(channels, block_align):
    """Reference IMA ADPCM encoder: returns (data bytes, the encoder's own
    decoded predictions per channel) — what a spec-conforming decoder must
    reproduce EXACTLY.  Sequential Python mirror of the published IMA
    state machine (tables shared with the decoder: published constants)."""
    from rabbittclust_spark.operators import multimodal as mm

    nch = len(channels)
    spb = 1 + (block_align - 4 * nch) * 2 // nch  # samples/block/channel
    nblocks = len(channels[0]) // spb
    idx = [0] * nch
    out = b""
    decoded = [[] for _ in range(nch)]
    for b in range(nblocks):
        nibs = [[] for _ in range(nch)]
        for c in range(nch):
            block = channels[c][b * spb:(b + 1) * spb]
            pred = int(block[0])
            out += struct.pack("<hBB", pred, idx[c], 0)  # headers first,
            decoded[c].append(pred)                      # one per channel
            for s in block[1:]:
                step = int(mm._IMA_STEP_TABLE[idx[c]])
                diff = int(s) - pred
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                d = (step >> 3) + (step >> 2 if nib & 1 else 0) \
                    + (step >> 1 if nib & 2 else 0) + (step if nib & 4 else 0)
                pred = max(-32768, min(32767, pred - d if nib & 8 else pred + d))
                idx[c] = max(0, min(88, idx[c] + int(mm._IMA_INDEX_TABLE[nib])))
                nibs[c].append(nib)
                decoded[c].append(pred)
        # data: 4-byte words per channel, channels interleaved per word
        for g in range(len(nibs[0]) // 8):
            for c in range(nch):
                w = nibs[c][g * 8:(g + 1) * 8]
                out += bytes(w[i] | (w[i + 1] << 4) for i in range(0, 8, 2))
    return out, [np.array(d, dtype=np.int16) for d in decoded]


def ms_encode(channels, block_align, predictors=None, init_delta=128):
    """Reference MS ADPCM encoder (two-tap predictor + adaptive delta, per
    the published Microsoft spec): returns (data bytes, the encoder's own
    decoded predictions per channel).  Python's ``>>`` on negative ints is
    the same arithmetic shift the decoder's numpy lanes use."""
    from rabbittclust_spark.operators import multimodal as mm

    nch = len(channels)
    spc = 2 + (block_align - 7 * nch) * 2 // nch  # samples/block/channel
    nblocks = len(channels[0]) // spc
    predictors = predictors or [0] * nch
    out = b""
    decoded = [[] for _ in range(nch)]
    for b in range(nblocks):
        samp2 = [int(channels[c][b * spc]) for c in range(nch)]
        samp1 = [int(channels[c][b * spc + 1]) for c in range(nch)]
        delta = [init_delta] * nch
        c1 = [int(mm._MS_COEF1[predictors[c]]) for c in range(nch)]
        c2 = [int(mm._MS_COEF2[predictors[c]]) for c in range(nch)]
        out += bytes(predictors)
        out += b"".join(struct.pack("<h", delta[c]) for c in range(nch))
        out += b"".join(struct.pack("<h", samp1[c]) for c in range(nch))
        out += b"".join(struct.pack("<h", samp2[c]) for c in range(nch))
        for c in range(nch):
            decoded[c] += [samp2[c], samp1[c]]
        nibs = []
        for s in range(2, spc):           # frame-by-frame, channels in turn
            for c in range(nch):
                pred = (samp1[c] * c1[c] + samp2[c] * c2[c]) >> 8
                err = int(channels[c][b * spc + s]) - pred
                snib = max(-8, min(7, int(round(err / delta[c]))))
                samp = max(-32768, min(32767, pred + snib * delta[c]))
                samp2[c], samp1[c] = samp1[c], samp
                delta[c] = max(16, (int(mm._MS_ADAPT[snib & 0xF]) * delta[c]) >> 8)
                nibs.append(snib & 0xF)
                decoded[c].append(samp)
        out += bytes((nibs[i] << 4) | nibs[i + 1]
                     for i in range(0, len(nibs), 2))  # HIGH nibble first
    return out, [np.array(d, dtype=np.int16) for d in decoded]


def _ulaw_expand_independent(code: int) -> int:
    """ITU-T G.711 mu-law expansion, written straight from the published
    formula — INDEPENDENT of operators/multimodal._g711_decode_table so the
    fixture's expected values are not decode-vs-decode."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return 0x84 - t if u & 0x80 else t - 0x84


def _alaw_expand_independent(code: int) -> int:
    a = code ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = t + 8 if seg == 0 else (t + 0x108) << max(seg - 1, 0)
    return t if a & 0x80 else -t


def _interleave(per_channel) -> list[int]:
    """Frame-major channel-interleaved flattening — decode_audio's
    (frames, channels) array raveled row-major."""
    return [int(v) for frame in zip(*per_channel) for v in frame]


def codec_fixture() -> list[dict]:
    """The pinned (payload, expected) rows.  Deterministic, no RNG state
    shared with anything else; expected values are encoder-side (ADPCM),
    formula-side (G.711), or grid-exact (PCM / float)."""
    rows = []

    def add(codec, payload, expected, n_frames, nch):
        rows.append({"sample_id": len(rows), "codec": codec,
                     "payload": payload, "expected": expected,
                     "n_frames": n_frames, "nch": nch})

    t = np.arange(64, dtype=np.float64)

    # 16-bit PCM mono + stereo via stdlib wave
    pcm = (7001 * np.sin(t / 3.0)).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())
    add("pcm16", buf.getvalue(), [int(v) for v in pcm], 64, 1)
    l = (5000 * np.sin(t / 2.0)).astype(np.int16)
    r = (-4000 * np.cos(t / 5.0)).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(np.column_stack([l, r]).astype("<i2").tobytes())
    add("pcm16_stereo", buf.getvalue(), _interleave([l, r]), 64, 2)

    # 8-bit PCM (unsigned): decoded x = (b-128)/128 -> expected (b-128)*256
    b8 = ((np.arange(48) * 5 + 3) % 256).astype(np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(b8.tobytes())
    add("pcm8", buf.getvalue(),
        [(int(v) - 128) * 256 for v in b8], 48, 1)

    # G.711 mu-law / A-law: every residue class of codes, independent
    # formula expectations
    codes = bytes(((np.arange(40) * 7 + 1) % 256).astype(np.uint8))
    add("ulaw", write_wav(codes, 7),
        [_ulaw_expand_independent(c) for c in codes], 40, 1)
    add("alaw", write_wav(codes, 6),
        [_alaw_expand_independent(c) for c in codes], 40, 1)

    # IEEE float32 on the s/32768 grid (exactly representable; round-trips
    # to the int16 s losslessly)
    fs = (9000 * np.sin(t / 4.0)).astype(np.int16)
    add("float32",
        write_wav((fs.astype(np.float32) / 32768.0).astype("<f4").tobytes(),
                  3, bits=32),
        [int(v) for v in fs], 64, 1)

    # IMA ADPCM mono (2 blocks) + stereo + fact-trimmed
    sine = (3000 * np.sin(t[:34] / 3.0)).astype(np.int16)
    data, ref = ima_encode([sine], block_align=12)
    add("ima", write_wav(data, 0x11, bits=4, block_align=12),
        [int(v) for v in ref[0]], 34, 1)
    il = (2000 * np.sin(t[:18] / 2.5)).astype(np.int16)
    ir = (-1500 * np.cos(t[:18] / 4.0)).astype(np.int16)
    sdata, sref = ima_encode([il, ir], block_align=16)
    add("ima_stereo", write_wav(sdata, 0x11, nch=2, bits=4, block_align=16),
        _interleave(sref), 18, 2)
    add("ima_fact", write_wav(data, 0x11, bits=4, block_align=12,
                              n_frames=30),
        [int(v) for v in ref[0][:30]], 30, 1)

    # MS ADPCM: three predictor pairs mono, one stereo, one fact-trimmed
    msine = (6000 * np.sin(t[:60] / 4.0)).astype(np.int16)
    for pred in (0, 1, 4):
        data, ref = ms_encode([msine], block_align=21, predictors=[pred])
        add(f"ms_p{pred}", write_wav(data, 0x02, bits=4, block_align=21),
            [int(v) for v in ref[0]], 60, 1)
    ml = (5000 * np.sin(t[:40] / 3.0)).astype(np.int16)
    mr = (-4000 * np.cos(t[:40] / 5.0)).astype(np.int16)
    mdata, mref = ms_encode([ml, mr], block_align=32, predictors=[1, 4])
    add("ms_stereo", write_wav(mdata, 0x02, nch=2, bits=4, block_align=32),
        _interleave(mref), 40, 2)
    add("ms_fact", write_wav(mdata, 0x02, nch=2, bits=4, block_align=32,
                             n_frames=33),
        _interleave([mref[0][:33], mref[1][:33]]), 33, 2)

    return rows


def expected_stats(row: dict) -> dict:
    """The integer aggregates BOTH engines must produce for a fixture row —
    computed here from the pinned expected samples (the DuckDB side inlines
    these as literals; the Spark side recomputes them from the decoded
    payload)."""
    s = np.asarray(row["expected"], dtype=np.int64)
    w = (np.arange(s.size) % 97) + 1
    return {
        "sample_id": row["sample_id"],
        "codec": row["codec"],
        "n_frames": int(row["n_frames"]),
        "n_channels": int(row["nch"]),
        "sum_s": int(s.sum()),
        "min_s": int(s.min()),
        "max_s": int(s.max()),
        "wsum": int((s * w).sum()),
    }
