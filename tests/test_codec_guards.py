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

# A tiny valid JPEG (SOI + EOI markers only — enough to route past the
# BMP/PNG sniffers into the lossy branch; PIL would reject it as truncated,
# which the upgrade test accounts for by using a PIL-encoded payload).
FAKE_JPEG = b"\xff\xd8\xff\xe0" + b"\x00" * 16 + b"\xff\xd9"
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
    with pytest.raises(NotImplementedError, match="lossy image codecs"):
        decode_image_real(FAKE_JPEG)


@pytest.mark.skipif(
    HAVE_SOUNDFILE, reason="soundfile installed: guard upgrades instead"
)
def test_audio_guard_raises_without_soundfile():
    with pytest.raises(NotImplementedError, match="lossy audio codecs"):
        decode_audio_real(FAKE_OGG)


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")
def test_image_guard_upgrades_with_pil():
    # encode a real JPEG with PIL, then the guard must decode it
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (4, 4), (10, 20, 30)).save(buf, format="JPEG")
    img = decode_image_real(buf.getvalue())
    assert img.size == (4, 4)


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

    assert decode_image_real(FAKE_JPEG) == "decoded-by-injected-pil"
    assert seen["payload"] == FAKE_JPEG
    # BMP still takes the stdlib parser, not the injected library
    img = decode_image_real(encode_bmp_rgb24(b"\x01\x02\x03" * 4, 2, 2))
    assert img != "decoded-by-injected-pil"


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
