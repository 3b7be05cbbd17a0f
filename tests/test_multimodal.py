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
