"""MP3/OGG decode via the SDL_mixer backend (audio/compressed.py).

Golden strategy without ffmpeg in the image: the pygame wheel ships the
same recording encoded as BOTH MP3 and Ogg Vorbis. The two decodes run
through entirely different codec paths, so a high cross-correlation between
them (after compensating the MP3 codec delay) is strong evidence both are
decoded correctly — a shared bug in container parsing, rate handling, or
channel layout would destroy the alignment.
"""
import os
import struct

import numpy as np
import pytest

from qwen3_asr_tpu.audio.codec import decode_audio, AudioDecodeError
from qwen3_asr_tpu.audio.compressed import sniff_mp3, sniff_ogg

_DATA = os.path.join(os.path.dirname(pytest.importorskip("pygame").__file__),
                     "examples", "data")
_MP3 = os.path.join(_DATA, "house_lo.mp3")
_OGG = os.path.join(_DATA, "house_lo.ogg")

needs_fixtures = pytest.mark.skipif(
    not (os.path.exists(_MP3) and os.path.exists(_OGG)),
    reason="pygame example audio not present")


# --- header sniffing (pure parsing, no SDL) ----------------------------------

def _mp3_header(version_bits, layer_bits, bitrate_idx, sr_idx, mode):
    b1 = 0xE0 | (version_bits << 3) | (layer_bits << 1)
    b2 = (bitrate_idx << 4) | (sr_idx << 2)
    b3 = mode << 6
    return bytes([0xFF, b1, b2, b3]) + b"\x00" * 64


def test_sniff_mp3_tables():
    # MPEG1 Layer III, 44100, stereo
    assert sniff_mp3(_mp3_header(3, 1, 9, 0, 0)) == (44100, 2)
    # MPEG2, 24000, joint stereo
    assert sniff_mp3(_mp3_header(2, 1, 9, 1, 1)) == (24000, 2)
    # MPEG2.5, 8000, mono
    assert sniff_mp3(_mp3_header(0, 1, 9, 2, 3)) == (8000, 1)


def test_sniff_mp3_skips_id3_and_junk():
    tag_body = b"\x00" * 100
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, len(tag_body)]) + tag_body
    assert sniff_mp3(id3 + _mp3_header(3, 1, 9, 0, 3)) == (44100, 1)
    # invalid headers (bad bitrate/sr indices) are skipped, not trusted
    bad = _mp3_header(3, 1, 0, 0, 0)[:4] + _mp3_header(3, 1, 15, 3, 0)[:4]
    assert sniff_mp3(bad + b"\x00" * 32) is None


def test_sniff_ogg_vorbis_and_opus():
    def page(payload):
        return (b"OggS" + b"\x00" * 22 + bytes([1, len(payload)]) + payload)

    vorbis = b"\x01vorbis" + b"\x00\x00\x00\x00" + bytes([2]) \
        + struct.pack("<I", 22050) + b"\x00" * 16
    assert sniff_ogg(page(vorbis)) == (22050, 2)
    opus = b"OpusHead" + bytes([1, 1]) + b"\x00\x00" \
        + struct.pack("<I", 16000) + b"\x00" * 8
    assert sniff_ogg(page(opus)) == (48000, 1)  # Opus decodes at 48 kHz
    assert sniff_ogg(b"OggS" + b"\x00" * 10) is None
    assert sniff_ogg(b"nope") is None


@needs_fixtures
def test_sniff_real_files():
    assert sniff_mp3(open(_MP3, "rb").read()) == (11025, 1)
    assert sniff_ogg(open(_OGG, "rb").read()) == (11025, 1)


# --- decoding ----------------------------------------------------------------

@needs_fixtures
def test_decode_mp3_native_rate():
    audio, sr = decode_audio(open(_MP3, "rb").read())
    assert sr == 11025  # native rate, NOT the SDL default
    assert audio.dtype == np.float32 and audio.ndim == 1
    assert 6.5 < len(audio) / sr < 8.0  # ~7.3 s recording
    assert 0.05 < np.sqrt(np.mean(audio ** 2)) < 1.0  # real signal


@needs_fixtures
def test_decode_ogg_native_rate():
    audio, sr = decode_audio(open(_OGG, "rb").read())
    assert sr == 11025
    assert audio.dtype == np.float32 and audio.ndim == 1
    assert 6.5 < len(audio) / sr < 8.0
    assert 0.05 < np.sqrt(np.mean(audio ** 2)) < 1.0


@needs_fixtures
def test_mp3_ogg_cross_correlation():
    """Same recording through two unrelated codecs must align (r > 0.95)."""
    a, sr_a = decode_audio(open(_MP3, "rb").read())
    b, sr_b = decode_audio(open(_OGG, "rb").read())
    assert sr_a == sr_b
    n = min(len(a), len(b))
    # find the MP3 encoder/decoder delay on a 3 s slice
    seg = 3 * sr_a
    c = np.correlate(a[:seg].astype(np.float64),
                     b[:seg].astype(np.float64), mode="full")
    lag = int(c.argmax()) - (seg - 1)
    assert 0 <= lag < 4000  # Layer III priming delay, ~1100 samples here
    x, y = a[lag:n], b[:n - lag]
    m = min(len(x), len(y))
    r = np.corrcoef(x[:m], y[:m])[0, 1]
    assert r > 0.95, f"cross-codec correlation {r}"


@needs_fixtures
def test_raw_mpeg_frames_without_id3():
    """A stream starting at a raw frame sync (no ID3 tag) still decodes."""
    data = open(_MP3, "rb").read()
    assert data[0] == 0xFF and (data[1] & 0xE0) == 0xE0  # fixture is raw
    audio, sr = decode_audio(data)
    assert len(audio) > sr  # got at least a second


def test_corrupt_mp3_raises_decode_error():
    junk = _mp3_header(3, 1, 9, 0, 0)[:4] + os.urandom(64)
    with pytest.raises(AudioDecodeError):
        decode_audio(junk)


def test_unknown_format_lists_compressed_support():
    with pytest.raises(AudioDecodeError, match="MP3, OGG"):
        decode_audio(b"\x01\x02\x03\x04" + b"\x00" * 64)
