"""Multimodal plumbing: schemas, Arrow batching, stubbed decode kernels."""

import numpy as np
import pytest

from rabbittclust_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    resize_metadata,
)


def _media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes 1", (640, 480, None, None)),
        (2, "image", b"\x89PNG fake bytes 2", (1920, 1080, None, None)),
        (3, "audio", b"RIFF fake wav", (None, None, 16000, 5000)),
        (4, "video", b"\x00\x00ftyp fake mp4", (1280, 720, None, 60000)),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, kind string, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>")


def test_feature_extraction_shape_and_determinism(spark):
    m = _media(spark)
    f1 = {r.doc_id: r.feature for r in extract_features(m).collect()}
    f2 = {r.doc_id: r.feature for r in extract_features(m).collect()}
    assert set(f1) == {1, 2, 3, 4}
    for d in f1:
        assert len(f1[d]) == FEATURE_DIM
        assert np.allclose(f1[d], f2[d])
    assert not np.allclose(f1[1], f1[2])  # different payloads differ


def test_strict_mode_raises(spark):
    m = _media(spark)
    with pytest.raises(Exception):  # codecs raise inside the UDF: the
        # audio/video stubs always; image on the fixture's junk bytes
        # whether PIL decodes for real (UnidentifiedImageError) or the
        # no-PIL stub fires (NotImplementedError)
        extract_features(m, strict=True).collect()
    from rabbittclust_spark.operators import multimodal as mm
    if mm._PILImage is None:
        with pytest.raises(NotImplementedError):
            decode_image(b"x")
    else:
        with pytest.raises(Exception):  # junk bytes are not an image
            decode_image(b"x")


def test_byte_histogram_exact(spark):
    """byte_histogram (r7) matches collections.Counter per payload, emits
    nothing for empty/NULL payloads, and carries exact integer counts
    through the Arrow binary path (the property the DuckDB oracle relies
    on for multimodal_hist)."""
    from collections import Counter

    from rabbittclust_spark.operators.multimodal import byte_histogram

    payloads = {1: b"\x89PNG fake bytes 1", 2: b"\x00\x00\xff\xff\x00",
                3: "héllo wörld".encode(), 4: b"", 5: None}
    m = spark.createDataFrame(
        [(d, "blob", p) for d, p in payloads.items()],
        "doc_id long, kind string, payload binary")
    rows = byte_histogram(m).collect()
    got = {}
    for r in rows:
        assert r.kind == "blob"
        got.setdefault(r.doc_id, {})[r.byte] = r.n
    assert set(got) == {1, 2, 3}        # empty and NULL emit no rows
    for d in got:
        want = Counter(payloads[d])
        assert got[d] == dict(want)


def test_resize_metadata(spark):
    m = _media(spark)
    t = {r.doc_id: (r.target.width, r.target.height)
         for r in resize_metadata(m, max_side=512).collect()}
    assert t[1] == (512, 384)      # 640x480 -> 512x384
    assert t[3] == (None, None)    # audio has no dims
    assert t[2] == (512, 288)      # 1920x1080 -> 512x288


def test_decode_image_real_or_stub():
    """decode_image is REAL when PIL is importable (round-trips a generated
    PNG to HxWx3 uint8) and an honest NotImplementedError stub otherwise —
    both branches of the import gate are pinned."""
    from rabbittclust_spark.operators import multimodal as mm

    if mm._PILImage is not None:
        import io

        img = mm._PILImage.new("RGB", (3, 2), (255, 0, 0))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        arr = mm.decode_image(buf.getvalue())
        assert arr.shape == (2, 3, 3) and arr.dtype.name == "uint8"
        assert (arr[..., 0] == 255).all() and (arr[..., 1:] == 0).all()
    else:
        with pytest.raises(NotImplementedError, match="PIL not importable"):
            mm.decode_image(b"\x89PNG\r\n\x1a\n")


def test_decode_audio_wav_roundtrip():
    """decode_audio is REAL for WAV via the stdlib wave module: a generated
    16-bit stereo PCM file round-trips to float32 samples bit-exactly
    (within int16 quantization), and non-WAV payloads keep the honest
    NotImplementedError (mirrors the decode_image real-or-stub pattern)."""
    import io
    import wave

    import numpy as np

    from rabbittclust_spark.operators import multimodal as mm

    sr, frames = 8000, 800
    t = np.arange(frames) / sr
    left = np.sin(2 * np.pi * 440 * t)
    right = np.sin(2 * np.pi * 220 * t)
    pcm = np.round(np.stack([left, right], axis=1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    out = mm.decode_audio(buf.getvalue())
    assert out.shape == (frames, 2) and out.dtype == np.float32
    assert np.allclose(out, pcm.astype(np.float32) / 32768.0)

    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x04 not a wav")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"")


# the RIFF writer + reference encoders moved to the shared fixture module
# (rabbittclust_spark/fixtures/audio.py) in r8 so the driver-contract
# audio_decode_check oracle and these tests pin the SAME state machines
from rabbittclust_spark.fixtures.audio import write_wav as _write_g711_wav


def test_decode_audio_g711():
    """G.711 mu-law/A-law WAVs decode via the numpy expansion tables:
    spot values from the published ITU-T G.711 expansion (mu-law 0xFF -> 0,
    0x00 -> -32124; A-law 0x55 -> -8, 0xD5 -> +8, 0x2A -> -32256), stereo
    deinterleave, and honest refusal for format tags with no codec."""
    import numpy as np

    from rabbittclust_spark.operators import multimodal as mm

    ulaw = mm.decode_audio(_write_g711_wav(bytes([0xFF, 0x00, 0x7F]), 7))
    assert ulaw.shape == (3, 1) and ulaw.dtype == np.float32
    assert np.allclose(ulaw[:, 0] * 32768.0, [0.0, -32124.0, 0.0])

    alaw = mm.decode_audio(_write_g711_wav(bytes([0x55, 0xD5, 0x2A]), 6))
    assert np.allclose(alaw[:, 0] * 32768.0, [-8.0, 8.0, -32256.0])

    # stereo interleave: LRLR order lands as (frames, 2)
    st = mm.decode_audio(
        _write_g711_wav(bytes([0xFF, 0x00, 0xFF, 0x00]), 7, nch=2))
    assert st.shape == (2, 2)
    assert np.allclose(st[:, 1] * 32768.0, [-32124.0, -32124.0])
    assert np.allclose(st[:, 0], 0.0)

    # monotone ramp: each mu-law segment is monotone in the code, so the
    # decoded magnitudes of 0x00..0x7F (negatives) must be non-decreasing
    tab = mm._g711_decode_table("ulaw")
    assert (np.diff(tab[:128].astype(np.int64)) >= 0).all()
    assert tab.min() >= -32768 and tab.max() <= 32767

    # a fmt-3 container whose bits field is NOT a float width (8 here)
    # stays an honest refusal, with the NotImplementedError type (not a
    # leaked wave.Error — ADVICE r5); real IEEE-float WAVs (bits 32/64)
    # decode in test_decode_audio_ieee_float
    with pytest.raises(NotImplementedError):
        mm.decode_audio(_write_g711_wav(b"\x00\x00\x00\x00", 3))


def test_decode_audio_ieee_float():
    """IEEE-float WAVs (wFormatTag 3, r7) decode via frombuffer + clip:
    32-bit ramp round-trips bit-exactly, overs clip to +-1 (the format
    permits them), stereo deinterleaves, and the 64-bit variant decodes
    through the same path."""
    import struct

    import numpy as np

    from rabbittclust_spark.operators import multimodal as mm

    ramp = np.array([-1.0, -0.5, 0.0, 0.25, 1.0], dtype=np.float32)
    out = mm.decode_audio(_write_g711_wav(ramp.tobytes(), 3, bits=32))
    assert out.shape == (5, 1) and out.dtype == np.float32
    assert np.array_equal(out[:, 0], ramp)

    # overs clip (1.5 -> 1.0, -2.0 -> -1.0)
    overs = np.array([1.5, -2.0, 0.5], dtype=np.float32)
    got = mm.decode_audio(_write_g711_wav(overs.tobytes(), 3, bits=32))
    assert np.array_equal(got[:, 0], [1.0, -1.0, 0.5])

    # stereo LRLR deinterleave
    st = np.array([0.1, -0.1, 0.2, -0.2], dtype=np.float32)
    got = mm.decode_audio(_write_g711_wav(st.tobytes(), 3, nch=2, bits=32))
    assert got.shape == (2, 2)
    assert np.allclose(got[:, 0], [0.1, 0.2])
    assert np.allclose(got[:, 1], [-0.1, -0.2])

    # 64-bit floats narrow to float32 through the same path
    d = np.array([-0.75, 0.75], dtype=np.float64)
    got = mm.decode_audio(_write_g711_wav(d.tobytes(), 3, bits=64))
    assert got.dtype == np.float32 and np.allclose(got[:, 0], [-0.75, 0.75])

    # a truncated payload (dangling half-sample) drops the tail instead
    # of raising in frombuffer
    got = mm.decode_audio(
        _write_g711_wav(ramp.tobytes() + b"\x00\x01", 3, bits=32))
    assert got.shape == (5, 1)

    # MS ADPCM (tag 2) is still the honest refusal
    with pytest.raises(NotImplementedError):
        mm.decode_audio(_write_g711_wav(b"\x00" * 8, 2, bits=4))


from rabbittclust_spark.fixtures.audio import ima_encode as _ima_encode


def test_decode_audio_ima_adpcm():
    """IMA/DVI ADPCM WAVs (wFormatTag 0x11, r7) decode via the
    block-vectorized numpy quantizer: the decoder must reproduce the
    reference encoder's internal predictions EXACTLY (both mirror the same
    published state machine), track a smooth waveform within quantization
    error, deinterleave stereo, and keep honest refusals for malformed
    block aligns."""
    import numpy as np
    import pytest

    from rabbittclust_spark.operators import multimodal as mm

    # mono, 2 blocks of block_align=12 -> 17 samples per block
    t = np.arange(34, dtype=np.float64)
    sine = (3000 * np.sin(t / 3.0)).astype(np.int16)
    data, ref = _ima_encode([sine], block_align=12)
    out = mm.decode_audio(_write_g711_wav(data, 0x11, bits=4, block_align=12))
    assert out.shape == (34, 1) and out.dtype == np.float32
    got = np.round(out[:, 0] * 32768.0).astype(np.int16)
    assert np.array_equal(got, ref[0])          # exact vs the state machine
    # with initial step index 0 the quantizer spends the first samples
    # ramping its step size up (adaptation lag is inherent to ADPCM), so
    # tracking accuracy is asserted on the adapted tail
    tail = np.abs(got[-10:].astype(np.int32) - sine[-10:].astype(np.int32))
    assert tail.max() < 400

    # stereo: 4-byte words interleave per channel within each block
    left = (2000 * np.sin(t[:18] / 2.5)).astype(np.int16)
    right = (-1500 * np.cos(t[:18] / 4.0)).astype(np.int16)
    data, ref = _ima_encode([left, right], block_align=16)  # 9 frames/block
    out = mm.decode_audio(
        _write_g711_wav(data, 0x11, nch=2, bits=4, block_align=16))
    assert out.shape == (18, 2)
    assert np.array_equal(
        np.round(out[:, 0] * 32768.0).astype(np.int16), ref[0])
    assert np.array_equal(
        np.round(out[:, 1] * 32768.0).astype(np.int16), ref[1])

    # a trailing partial block is dropped, not misparsed
    out = mm.decode_audio(
        _write_g711_wav(data + b"\x01\x02", 0x11, nch=2, bits=4,
                        block_align=16))
    assert out.shape == (18, 2)

    # malformed block align (not room for the per-channel headers, or
    # data shorter than one block) refuses with the single strict-mode type
    with pytest.raises(NotImplementedError):
        mm.decode_audio(_write_g711_wav(b"\x00" * 16, 0x11, nch=2, bits=4,
                                        block_align=6))
    with pytest.raises(NotImplementedError):
        mm.decode_audio(_write_g711_wav(b"\x00" * 8, 0x11, bits=4,
                                        block_align=12))


def test_decode_audio_ima_fact_chunk_trims_padding():
    """A 'fact' chunk's dwSampleLength trims the final block's zero-padded
    nibbles, which otherwise decode as real-looking samples (ADVICE r7 #3);
    an absent or full-length fact chunk leaves the decode unchanged."""
    import numpy as np

    from rabbittclust_spark.operators import multimodal as mm

    t = np.arange(34, dtype=np.float64)
    sine = (3000 * np.sin(t / 3.0)).astype(np.int16)
    data, ref = _ima_encode([sine], block_align=12)  # 2 blocks x 17 samples
    # pretend only 30 of the 34 encoded samples are real (a partially
    # filled final block): fact says 30, decode must trim to 30
    out = mm.decode_audio(_write_g711_wav(data, 0x11, bits=4,
                                          block_align=12, n_frames=30))
    assert out.shape == (30, 1)
    assert np.array_equal(np.round(out[:, 0] * 32768.0).astype(np.int16),
                          ref[0][:30])
    # fact == full length: no-op
    out = mm.decode_audio(_write_g711_wav(data, 0x11, bits=4,
                                          block_align=12, n_frames=34))
    assert out.shape == (34, 1)
    # stereo: fact counts FRAMES (per-channel samples), not flat samples
    left = (2000 * np.sin(t[:18] / 2.5)).astype(np.int16)
    right = (-1500 * np.cos(t[:18] / 4.0)).astype(np.int16)
    data, ref = _ima_encode([left, right], block_align=16)
    out = mm.decode_audio(_write_g711_wav(data, 0x11, nch=2, bits=4,
                                          block_align=16, n_frames=13))
    assert out.shape == (13, 2)
    assert np.array_equal(np.round(out[:, 1] * 32768.0).astype(np.int16),
                          ref[1][:13])


from rabbittclust_spark.fixtures.audio import ms_encode as _ms_encode


def test_decode_audio_ms_adpcm():
    """MS ADPCM WAVs (wFormatTag 0x02, r8 — the last WAV-family refusal)
    decode via the block-vectorized two-tap-predictor quantizer: the decoder
    must reproduce the reference encoder's internal predictions EXACTLY,
    per predictor pair, deinterleave stereo, honor the 'fact' trim, and
    keep honest refusals for malformed blocks."""
    import numpy as np
    import pytest

    from rabbittclust_spark.operators import multimodal as mm

    t = np.arange(60, dtype=np.float64)
    sine = (6000 * np.sin(t / 4.0)).astype(np.int16)
    # mono, block_align=21 -> 7 header bytes + 14 data bytes = 30 samples
    for pred in range(7):  # every published coefficient pair
        data, ref = _ms_encode([sine], block_align=21, predictors=[pred])
        out = mm.decode_audio(
            _write_g711_wav(data, 0x02, bits=4, block_align=21))
        assert out.shape == (60, 1) and out.dtype == np.float32
        got = np.round(out[:, 0] * 32768.0).astype(np.int16)
        assert np.array_equal(got, ref[0]), f"predictor {pred}"

    # stereo: nibbles alternate channels frame by frame
    left = (5000 * np.sin(t[:40] / 3.0)).astype(np.int16)
    right = (-4000 * np.cos(t[:40] / 5.0)).astype(np.int16)
    data, ref = _ms_encode([left, right], block_align=32,
                           predictors=[1, 4])  # 20 frames/block, 2 blocks
    out = mm.decode_audio(
        _write_g711_wav(data, 0x02, nch=2, bits=4, block_align=32))
    assert out.shape == (40, 2)
    assert np.array_equal(np.round(out[:, 0] * 32768.0).astype(np.int16),
                          ref[0])
    assert np.array_equal(np.round(out[:, 1] * 32768.0).astype(np.int16),
                          ref[1])

    # 'fact' chunk trims zero-padded tail samples (shared with IMA)
    out = mm.decode_audio(_write_g711_wav(data, 0x02, nch=2, bits=4,
                                          block_align=32, n_frames=33))
    assert out.shape == (33, 2)
    assert np.array_equal(np.round(out[:, 1] * 32768.0).astype(np.int16),
                          ref[1][:33])

    # a trailing partial block is dropped, not misparsed
    out = mm.decode_audio(_write_g711_wav(data + b"\x01\x02", 0x02, nch=2,
                                          bits=4, block_align=32))
    assert out.shape == (40, 2)

    # refusals: no room for headers / shorter than a block / bad predictor
    with pytest.raises(NotImplementedError):
        mm.decode_audio(_write_g711_wav(b"\x00" * 20, 0x02, nch=2, bits=4,
                                        block_align=14))
    with pytest.raises(NotImplementedError):
        mm.decode_audio(_write_g711_wav(b"\x00" * 10, 0x02, bits=4,
                                        block_align=21))
    bad = b"\x09" + data[1:len(data) // 2 * 2]
    with pytest.raises(NotImplementedError):
        mm.decode_audio(_write_g711_wav(bad[:32], 0x02, nch=2, bits=4,
                                        block_align=32))


def _write_avi(frames, rate=25):
    """Minimal uncompressed-AVI writer (BI_RGB 24-bit, bottom-up DIB rows,
    4-byte row padding) — the stdlib has no AVI writer, so the round-trip
    test brings its own, mirroring how the WAV test uses ``wave``."""
    import struct

    h, w, _ = frames[0].shape

    def chunk(cid, body):
        return (cid + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    row = (w * 3 + 3) & ~3

    def dib(fr):
        buf = np.zeros((h, row), np.uint8)
        buf[:, :w * 3] = fr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        return buf.tobytes()

    avih = struct.pack("<14I", 1_000_000 // rate, 0, 0, 0, len(frames),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB "
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, rate, 0,
                          len(frames), 0, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_sample_video_frames_avi_roundtrip():
    """sample_video_frames is REAL for uncompressed RIFF AVI: 10 generated
    25-fps frames (3x2, odd row width so DIB padding is exercised)
    round-trip pixel-exactly, every_ms sampling keeps the right subset, and
    non-AVI / compressed payloads keep the honest NotImplementedError."""
    from rabbittclust_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, size=(2, 3, 3)).astype(np.uint8)
              for _ in range(10)]
    payload = _write_avi(frames, rate=25)  # frame period 40 ms

    out = mm.sample_video_frames(payload, every_ms=1)  # keep every frame
    assert len(out) == 10
    for got, want in zip(out, frames):
        assert got.shape == (2, 3, 3) and got.dtype == np.uint8
        assert (got == want).all()

    # 120 ms sampling at 40 ms/frame -> frames 0, 3, 6, 9
    sampled = mm.sample_video_frames(payload, every_ms=120)
    assert len(sampled) == 4
    for got, want in zip(sampled, (frames[0], frames[3], frames[6],
                                   frames[9])):
        assert (got == want).all()

    with pytest.raises(NotImplementedError):  # mp4 container
        mm.sample_video_frames(b"\x00\x00\x00 ftypisom fake mp4")
    with pytest.raises(NotImplementedError):  # not even RIFF
        mm.sample_video_frames(b"")
    # a compressed AVI (biCompression != 0) must refuse, not mis-decode
    compressed = bytearray(_write_avi(frames[:1]))
    i = compressed.index(b"strf")
    compressed[i + 8 + 16:i + 8 + 20] = b"H264"
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        mm.sample_video_frames(bytes(compressed))


def test_strict_features_use_decoded_content(spark):
    """strict=True features come from the DECODED content, not the raw
    bytes: audio = RMS envelope of the WAV samples, video = frame-pooled
    pixel grid of the AVI frames — each checked against a direct numpy
    computation on the decoded arrays, distributed through mapInPandas."""
    import io
    import wave

    from rabbittclust_spark.operators import multimodal as mm

    sr, n = 8000, 1600
    pcm = np.round(np.sin(2 * np.pi * 330 * np.arange(n) / sr)
                   * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    wav = buf.getvalue()

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(6, 8, 3)).astype(np.uint8)
              for _ in range(3)]
    avi = _write_avi(frames, rate=25)

    # the same tone as IMA ADPCM (17 samples per block_align=12 block)
    adpcm_pcm = (np.sin(2 * np.pi * 330 * np.arange(17 * 94) / sr)
                 * 20000).astype(np.int16)
    adpcm_data, _ = _ima_encode([adpcm_pcm], block_align=12)
    adpcm = _write_g711_wav(adpcm_data, 0x11, bits=4, block_align=12, sr=sr)

    # the same tone again as MS ADPCM (r8: 30 samples per block_align=21
    # mono block) — the distributed strict path must decode tag 2 too
    ms_pcm = (np.sin(2 * np.pi * 330 * np.arange(30 * 53) / sr)
              * 20000).astype(np.int16)
    ms_data, _ = _ms_encode([ms_pcm], block_align=21, predictors=[4])
    ms = _write_g711_wav(ms_data, 0x02, bits=4, block_align=21, sr=sr)

    media = spark.createDataFrame(
        [(1, "audio", bytearray(wav), (None, None, sr, n * 1000 // sr)),
         (2, "video", bytearray(avi), (8, 6, None, 120)),
         (3, "audio", bytearray(adpcm), (None, None, sr, None)),
         (4, "audio", bytearray(ms), (None, None, sr, None))],
        schema=mm.MEDIA_SCHEMA)
    feats = {r.doc_id: np.array(r.feature, np.float32)
             for r in mm.extract_features(media, strict=True).collect()}

    want_audio = mm._audio_feature(mm.decode_audio(wav))
    assert np.allclose(feats[1], want_audio, atol=1e-6)
    want_adpcm = mm._audio_feature(mm.decode_audio(adpcm))
    assert np.allclose(feats[3], want_adpcm, atol=1e-6)
    assert not np.allclose(feats[3], mm._fake_feature(adpcm), atol=1e-3)
    want_ms = mm._audio_feature(mm.decode_audio(ms))
    assert np.allclose(feats[4], want_ms, atol=1e-6)
    assert not np.allclose(feats[4], mm._fake_feature(ms), atol=1e-3)
    sampled = mm.sample_video_frames(avi)  # default 1000 ms -> frame 0 only
    assert len(sampled) == 1 and (sampled[0] == frames[0]).all()
    pooled = np.mean([mm._pool_image_feature(f) for f in sampled], axis=0)
    want_video = (pooled / np.linalg.norm(pooled)).astype(np.float32)
    assert np.allclose(feats[2], want_video, atol=1e-6)
    # decoded-content features are NOT the byte-histogram fallback
    assert not np.allclose(feats[1], mm._fake_feature(wav), atol=1e-3)
    assert not np.allclose(feats[2], mm._fake_feature(avi), atol=1e-3)


def test_audio_stats_distributed_matches_fixture(spark):
    """The driver-contract codec oracle's Spark half: audio_stats (the
    production Arrow-binary mapInPandas path) over the pinned codec fixture
    reproduces the ENCODER-derived expected aggregates for every codec
    family, distributed (r8, VERDICT r7 task #8)."""
    from rabbittclust_spark.fixtures.audio import codec_fixture, expected_stats
    from rabbittclust_spark.operators.multimodal import audio_stats

    fixture = codec_fixture()
    media = spark.createDataFrame(
        [(r["sample_id"], bytearray(r["payload"])) for r in fixture],
        "doc_id long, payload binary").repartition(4)
    got = {r.doc_id: (r.n_frames, r.n_channels, r.sum_s, r.min_s, r.max_s,
                      r.wsum)
           for r in audio_stats(media).collect()}
    assert len(got) == len(fixture)
    codecs = set()
    for row in fixture:
        e = expected_stats(row)
        codecs.add(row["codec"].split("_")[0])
        assert got[e["sample_id"]] == (
            e["n_frames"], e["n_channels"], e["sum_s"], e["min_s"],
            e["max_s"], e["wsum"]), row["codec"]
    # every real codec family is pinned
    assert {"pcm16", "pcm8", "ulaw", "alaw", "float32", "ima", "ms"} <= codecs


def test_g711_fixture_formula_independent():
    """The fixture's inline ITU-T G.711 expansions agree with the decoder's
    numpy tables on every code — two independent writings of the published
    formula (the cross-check that makes the ulaw/alaw oracle rows
    encoder-independent)."""
    from rabbittclust_spark.fixtures.audio import (
        _alaw_expand_independent, _ulaw_expand_independent)
    from rabbittclust_spark.operators import multimodal as mm

    ut = mm._g711_decode_table("ulaw")
    at = mm._g711_decode_table("alaw")
    for c in range(256):
        assert _ulaw_expand_independent(c) == int(ut[c]), f"ulaw {c}"
        assert _alaw_expand_independent(c) == int(at[c]), f"alaw {c}"


def test_media_kernels_spread_single_partition_input(spark):
    """The media decode kernels are the CPU-heavy step of the binary path
    and, like the ICWS sketch, must not run serial just because the input
    arrived in one partition (r8: _spread_for_cpu_kernel on all three
    mapInPandas sites).  In-memory frames report zero input files, so the
    guard must fan them out."""
    from pyspark.sql import functions as F

    import rabbittclust_spark.operators.multimodal as mm

    rows = [(i, "audio", bytearray(bytes([i % 251] * 64)),
             (None, None, 8000, None)) for i in range(200)]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA).coalesce(1)
    for out in (mm.extract_features(media),
                mm.byte_histogram(media)):
        n_parts = (out.withColumn("p", F.spark_partition_id())
                   .select("p").distinct().count())
        assert n_parts > 1, out
