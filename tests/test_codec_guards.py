"""Pins for the lossy-codec self-upgrade guards (r11 verdict #8).

``decode_image_real`` / ``decode_audio_real`` promise two behaviors:

1. WITHOUT PIL / soundfile installed (this container), a lossy payload
   raises the documented NotImplementedError while the stdlib BMP/PNG/WAV
   paths keep decoding — pinned unconditionally so the guard text and the
   fallthrough order can't rot;
2. WITH the library installed, the same call upgrades itself to a real
   decode — pinned by skipif-not-installed tests, so any environment that
   gains the library automatically starts exercising the promise.
"""

import importlib.util

import pytest

from distributed_graph_database_simulation_spark.operators.multimodal import (
    decode_audio_real,
    decode_image_real,
    encode_bmp_rgb24,
    encode_wav_pcm8,
)

HAVE_PIL = importlib.util.find_spec("PIL") is not None
HAVE_SOUNDFILE = importlib.util.find_spec("soundfile") is not None

# A tiny truncated JPEG (SOI + APP0 + EOI, no SOF/SOS): routes to the
# VENDORED baseline decoder (r14), which must reject it loudly.
FAKE_JPEG = b"\xff\xd8\xff\xe0" + b"\x00\x12" + b"\x00" * 16 + b"\xff\xd9"
# A WebP capture pattern: the format that still needs PIL post-r14, so it
# exercises the lossy guard / injected-module upgrade path.
FAKE_WEBP = b"RIFF" + b"\x00\x00\x00\x00" + b"WEBP" + b"\x00" * 12
# An OGG capture pattern, same idea for the audio branch.
FAKE_OGG = b"OggS" + b"\x00" * 24


def test_stdlib_paths_still_decode():
    # the executable codec paths are untouched by the guard branch
    img = decode_image_real(encode_bmp_rgb24(b"\x01\x02\x03" * 4, 2, 2))
    assert img is not None
    samples, rate = decode_audio_real(encode_wav_pcm8(b"\x00\x80\xff", 8000))
    assert rate == 8000 and len(samples) == 3


@pytest.mark.skipif(HAVE_PIL, reason="PIL installed: guard upgrades instead")
def test_image_guard_raises_without_pil():
    # post-r14 the guard covers formats BEYOND baseline JPEG
    with pytest.raises(NotImplementedError, match="lossy image codecs"):
        decode_image_real(FAKE_WEBP)


@pytest.mark.skipif(
    HAVE_SOUNDFILE, reason="soundfile installed: guard upgrades instead"
)
def test_audio_guard_raises_without_soundfile():
    with pytest.raises(NotImplementedError, match="lossy audio codecs"):
        decode_audio_real(FAKE_OGG)


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
def test_vendored_jpeg_cross_validates_against_pil():
    # With a reference library present, the vendored decoder must agree
    # with it: decode a PIL-encoded JPEG through BOTH and compare pixels.
    # (This is the independent-decoder check that a self-written
    # encoder/decoder pair cannot fake; it runs in any env with PIL.)
    import io

    import numpy as np
    from PIL import Image

    src = Image.new("RGB", (16, 16), (10, 20, 30))
    buf = io.BytesIO()
    src.save(buf, format="JPEG", quality=90)
    meta, rgb = decode_image_real(buf.getvalue())
    ours = np.frombuffer(rgb, dtype=np.uint8).reshape(
        meta["height"], meta["width"], 3
    )
    theirs = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert ours.shape == theirs.shape
    assert np.abs(ours.astype(int) - theirs.astype(int)).mean() < 2.0


@pytest.mark.skipif(not HAVE_SOUNDFILE, reason="soundfile not installed")
def test_audio_guard_upgrades_with_soundfile():
    import io

    import numpy as np
    import soundfile

    buf = io.BytesIO()
    soundfile.write(
        buf, np.zeros(16, dtype=np.float32), 8000, format="OGG", subtype="VORBIS"
    )
    samples, rate = decode_audio_real(buf.getvalue())
    assert rate == 8000 and len(samples) == 16


# --- upgrade-contract exercise WITHOUT the real libraries (r12 verdict #5)
#
# The two skipif tests above never run in this container (no PIL /
# soundfile), so the upgrade path had never executed anywhere. These tests
# inject a minimal module satisfying the guard's exact import contract
# (`from PIL import Image` + `Image.open(BytesIO)`; `import soundfile` +
# `soundfile.read(BytesIO)`) and prove (a) a lossy payload reaches the
# injected library with the right bytes, (b) its return value propagates
# out unchanged, and (c) the stdlib BMP/WAV fast paths still route AROUND
# the library. The real-library tests stay as skipif pins for environments
# that have the codecs.


def test_image_guard_upgrade_contract_via_injected_module(monkeypatch):
    import sys
    import types

    seen = {}

    class _FakeImage:
        @staticmethod
        def open(buf):
            seen["payload"] = buf.read()
            return "decoded-by-injected-pil"

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _FakeImage
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)

    assert decode_image_real(FAKE_WEBP) == "decoded-by-injected-pil"
    assert seen["payload"] == FAKE_WEBP
    # BMP still takes the stdlib parser, not the injected library
    img = decode_image_real(encode_bmp_rgb24(b"\x01\x02\x03" * 4, 2, 2))
    assert img != "decoded-by-injected-pil"
    # JPEG now takes the VENDORED decoder, never the library (r14)
    from distributed_graph_database_simulation_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )

    meta, rgb = decode_image_real(
        encode_jpeg_baseline(b"\x40\x80\xc0" * 4, 2, 2, quality=95)
    )
    assert meta["width"] == 2 and meta["height"] == 2
    assert "payload" not in seen or seen["payload"] == FAKE_WEBP


def test_audio_guard_upgrade_contract_via_injected_module(monkeypatch):
    import sys
    import types

    seen = {}
    fake_sf = types.ModuleType("soundfile")

    def _read(buf):
        seen["payload"] = buf.read()
        return ([0.0, 0.5, -0.5], 4321)

    fake_sf.read = _read
    monkeypatch.setitem(sys.modules, "soundfile", fake_sf)

    samples, rate = decode_audio_real(FAKE_OGG)
    assert rate == 4321 and len(samples) == 3
    assert seen["payload"] == FAKE_OGG
    # WAV still takes the stdlib parser, not the injected library
    samples, rate = decode_audio_real(encode_wav_pcm8(b"\x00\x80\xff", 8000))
    assert rate == 8000 and len(samples) == 3


# --- vendored baseline JPEG codec (r13 verdict #8, option A) --------------
#
# functions/jpeg.py is a real spec decoder (tables from the STREAM, not
# assumptions), so these pins exercise: roundtrip quality bounds for both
# subsampling modes, quantization-only loss equivalence (the zigzag-
# mismatch regression), near-losslessness at q100, and loud rejection of
# truncated / progressive streams.


def _gradient_rgb(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_vendored_jpeg_roundtrip_444_and_420():
    import numpy as np

    from distributed_graph_database_simulation_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    rgb = _gradient_rgb(24, 40)
    for sub, bound in (("444", 2.0), ("420", 4.0)):
        data = encode_jpeg_baseline(rgb.tobytes(), 24, 40, 90, subsample=sub)
        h, w, out = decode_jpeg(data)
        assert (h, w) == (24, 40)
        dec = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)
        mae = np.abs(dec.astype(int) - rgb.astype(int)).mean()
        assert mae < bound, (sub, mae)


def test_vendored_jpeg_q100_near_lossless_on_noise():
    # q100 => all-ones quant tables: the only loss is transform/color
    # rounding. This isolates entropy coding + zigzag + DCT from
    # quantization — the exact combination that hid the row-major-vs-
    # zigzag dequant bug (q100 decoded fine, every other quality garbled).
    import numpy as np

    from distributed_graph_database_simulation_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    rgb = np.random.RandomState(7).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    data = encode_jpeg_baseline(rgb.tobytes(), 16, 16, quality=100)
    _, _, out = decode_jpeg(data)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(16, 16, 3)
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.mean() < 0.6 and err.max() <= 3


def test_vendored_jpeg_quant_loss_matches_pure_transform_sim():
    # Decoded error on noise at q95 must equal the quantization-only
    # numpy simulation (~3.2 MAE) — the zigzag regression showed ~45.
    import numpy as np

    from distributed_graph_database_simulation_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    rgb = np.random.RandomState(7).randint(0, 256, (16, 16, 3)).astype(np.uint8)
    data = encode_jpeg_baseline(rgb.tobytes(), 16, 16, quality=95)
    _, _, out = decode_jpeg(data)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(16, 16, 3)
    mae = np.abs(dec.astype(int) - rgb.astype(int)).mean()
    assert mae < 5.0, mae


def test_vendored_jpeg_odd_dimensions():
    import numpy as np

    from distributed_graph_database_simulation_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    rgb = _gradient_rgb(13, 22)
    for sub in ("444", "420"):
        data = encode_jpeg_baseline(rgb.tobytes(), 13, 22, 92, subsample=sub)
        h, w, out = decode_jpeg(data)
        assert (h, w) == (13, 22)
        assert len(out) == 13 * 22 * 3
        dec = np.frombuffer(out, dtype=np.uint8).reshape(13, 22, 3)
        assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 6.0, sub


def test_vendored_jpeg_rejects_truncated_and_progressive():
    import struct

    from distributed_graph_database_simulation_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )

    with pytest.raises(ValueError):
        decode_jpeg(FAKE_JPEG)  # no SOF/SOS
    with pytest.raises(ValueError):
        decode_jpeg(b"BM" + b"\x00" * 20)  # not a JPEG at all
    # flip a valid stream's SOF0 marker to SOF2 (progressive) — must raise,
    # never mis-decode
    data = bytearray(encode_jpeg_baseline(b"\x10\x20\x30" * 4, 2, 2, 90))
    idx = bytes(data).find(b"\xff\xc0")
    assert idx > 0
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    # sanity: the SOF length field we flipped around still parses
    assert struct.unpack(">H", bytes(data[idx + 2:idx + 4]))[0] == 17


def test_decode_image_real_routes_jpeg_to_vendored_codec():
    import numpy as np

    from distributed_graph_database_simulation_spark.functions.jpeg import (
        encode_jpeg_baseline,
    )

    rgb = _gradient_rgb(8, 8)
    meta, out = decode_image_real(
        encode_jpeg_baseline(rgb.tobytes(), 8, 8, quality=95)
    )
    assert (meta["height"], meta["width"]) == (8, 8)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(8, 8, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 3.0
