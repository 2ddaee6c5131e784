"""Tests for the pure-numpy audio codec."""
import struct

import numpy as np
import pytest

from qwen3_asr_tpu.audio.codec import (
    AudioDecodeError,
    UnsupportedFormatError,
    decode_audio,
    encode_wav,
)
from tests.util_audio import tone


def test_wav_roundtrip():
    audio = tone(0.5, 440.0)
    wav = encode_wav(audio, 16000)
    decoded, sr = decode_audio(wav)
    assert sr == 16000
    assert decoded.dtype == np.float32
    assert len(decoded) == len(audio)
    assert np.max(np.abs(decoded - audio)) < 1e-3  # 16-bit quantization


def test_wav_float32():
    audio = tone(0.1)
    pcm = audio.astype("<f4").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
    hdr += b"data" + struct.pack("<I", len(pcm))
    decoded, sr = decode_audio(hdr + pcm)
    assert np.allclose(decoded, audio, atol=1e-6)


def test_wav_stereo_to_mono():
    audio = tone(0.1)
    stereo = np.stack([audio, -audio], axis=1).reshape(-1)
    pcm = np.clip(stereo * 32767, -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    decoded, sr = decode_audio(hdr + pcm)
    assert len(decoded) == len(audio)
    assert np.max(np.abs(decoded)) < 1e-3  # L+R cancel


def test_wav_24bit():
    audio = tone(0.05)
    vals = np.clip(audio * (2**23 - 1), -(2**23), 2**23 - 1).astype(np.int32)
    b = np.zeros((len(vals), 3), dtype=np.uint8)
    b[:, 0] = vals & 0xFF
    b[:, 1] = (vals >> 8) & 0xFF
    b[:, 2] = (vals >> 16) & 0xFF
    pcm = b.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 48000, 3, 24)
    hdr += b"data" + struct.pack("<I", len(pcm))
    decoded, _ = decode_audio(hdr + pcm)
    assert np.max(np.abs(decoded - audio)) < 1e-4


def test_aiff_decode():
    audio = tone(0.1)
    pcm = np.clip(audio * 32767, -32768, 32767).astype(">i2").tobytes()
    # 80-bit extended float for 16000.0: exponent 16383+13=16396, mantissa top bits
    sr80 = struct.pack(">H", 16396) + struct.pack(">II", 0xFA000000, 0)
    comm = struct.pack(">HI", 1, len(audio)) + struct.pack(">H", 16) + sr80
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = (b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    buf = b"FORM" + struct.pack(">I", len(body)) + body
    decoded, sr = decode_audio(buf)
    assert sr == 16000
    assert np.max(np.abs(decoded - audio)) < 1e-3


def test_au_decode():
    audio = tone(0.1)
    pcm = np.clip(audio * 32767, -32768, 32767).astype(">i2").tobytes()
    hdr = struct.pack(">IIIIII", 0x2E736E64, 24, len(pcm), 3, 16000, 1)
    decoded, sr = decode_audio(hdr + pcm)
    assert sr == 16000
    assert np.max(np.abs(decoded - audio)) < 1e-3


def _caf(desc_body: bytes, data_pcm: bytes, data_size: int = None) -> bytes:
    data_body = struct.pack(">I", 0) + data_pcm  # uint32 edit count
    size = len(data_body) if data_size is None else data_size
    return (b"caff" + struct.pack(">HH", 1, 0)
            + b"desc" + struct.pack(">q", 32) + desc_body
            + b"data" + struct.pack(">q", size) + data_body)


def _caf_desc(sr: float, flags: int, ch: int, bits: int) -> bytes:
    bpf = ch * ((bits + 7) // 8)
    return (struct.pack(">d", sr) + b"lpcm"
            + struct.pack(">IIIII", flags, bpf, 1, ch, bits))


_W64_GUID_SUFFIX = bytes.fromhex("2E91CF11A5D628DB04C10000")


def _w64_chunk(fourcc: bytes, body: bytes) -> bytes:
    size = 24 + len(body)
    return (fourcc + _W64_GUID_SUFFIX + struct.pack("<q", size)
            + body + b"\0" * ((-size) % 8))


def test_w64_decode():
    audio = tone(0.1)
    pcm = np.clip(audio * 32767, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    payload = _w64_chunk(b"fmt ", fmt) + _w64_chunk(b"data", pcm)
    buf = (b"riff" + _W64_GUID_SUFFIX + struct.pack("<q", 40 + len(payload))
           + b"wave" + _W64_GUID_SUFFIX + payload)
    decoded, sr = decode_audio(buf)
    assert sr == 16000
    assert np.max(np.abs(decoded - audio)) < 1e-3


def test_w64_corrupt_chunk_size_rejected():
    buf = (b"riff" + _W64_GUID_SUFFIX + struct.pack("<q", 64)
           + b"wave" + _W64_GUID_SUFFIX
           + b"fmt " + _W64_GUID_SUFFIX + struct.pack("<q", 3))  # size < 24
    with pytest.raises(AudioDecodeError):
        decode_audio(buf)


def test_caf_int16_be():
    audio = tone(0.1)
    pcm = np.clip(audio * 32767, -32768, 32767).astype(">i2").tobytes()
    buf = _caf(_caf_desc(16000.0, 0, 1, 16), pcm)
    decoded, sr = decode_audio(buf)
    assert sr == 16000
    assert np.max(np.abs(decoded - audio)) < 1e-3


def test_caf_float32_le_stereo_and_open_ended_data():
    """Little-endian float LPCM, stereo, with the streaming-writer data
    size of -1 (chunk extends to EOF)."""
    audio = tone(0.1)
    stereo = np.stack([audio, audio], axis=1).astype("<f4").tobytes()
    flags = 0x1 | 0x2  # IsFloat | IsLittleEndian
    buf = _caf(_caf_desc(16000.0, flags, 2, 32), stereo, data_size=-1)
    decoded, sr = decode_audio(buf)
    assert sr == 16000
    assert np.max(np.abs(decoded - audio)) < 1e-6


def test_caf_non_lpcm_rejected():
    desc = struct.pack(">d", 16000.0) + b"aac " + struct.pack(">IIIII",
                                                              0, 0, 0, 2, 0)
    with pytest.raises(AudioDecodeError):
        decode_audio(_caf(desc, b"\x00" * 64))


def test_garbage_rejected():
    with pytest.raises(AudioDecodeError):
        decode_audio(b"this is not audio at all, sorry")


def test_truncated_wav_rejected():
    wav = encode_wav(tone(0.1), 16000)
    with pytest.raises(AudioDecodeError):
        decode_audio(wav[:20])


def test_corrupt_compressed_rejected():
    # MP3/OGG route through the SDL backend now (audio/compressed.py);
    # garbage with a compressed magic is a decode error, not silence.
    with pytest.raises(AudioDecodeError):
        decode_audio(b"OggS" + b"\x00" * 100)
    with pytest.raises(AudioDecodeError):
        decode_audio(b"ID3\x04" + b"\x00" * 100)


def test_corrupt_flac_rejected():
    # FLAC is natively supported now; corrupt FLAC is a decode error,
    # not an unsupported format.
    with pytest.raises(AudioDecodeError):
        decode_audio(b"fLaC" + b"\x00" * 100)


def test_rf64_decode():
    """RF64 (64-bit WAV): ds64 chunk carries the real data size."""
    audio = tone(0.1)
    pcm = np.clip(audio * 32767, -32768, 32767).astype("<i2").tobytes()
    ds64 = struct.pack("<QQQ", 0, len(pcm), len(audio)) + struct.pack("<I", 0)
    body = b"WAVE"
    body += b"ds64" + struct.pack("<I", len(ds64)) + ds64
    body += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
    body += b"data" + struct.pack("<I", 0xFFFFFFFF) + pcm
    buf = b"RF64" + struct.pack("<I", 0xFFFFFFFF) + body
    decoded, sr = decode_audio(buf)
    assert sr == 16000
    assert len(decoded) == len(audio)
    assert np.max(np.abs(decoded - audio)) < 1e-3


def test_wav_zero_sample_rate_rejected():
    """A header-declared sr of 0 must be AUDIO_DECODE_FAILED material, not an
    OverflowError deep inside the resampler."""
    audio = tone(0.1)
    pcm = np.clip(audio * 32767, -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    with pytest.raises(AudioDecodeError):
        decode_audio(hdr + pcm)


def test_wav_implausible_sample_rate_rejected():
    """A ~2^32 rate would make the Kaiser lowpass allocate tens of GB."""
    audio = tone(0.01)
    pcm = np.clip(audio * 32767, -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 4294967291, 0, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    with pytest.raises(AudioDecodeError):
        decode_audio(hdr + pcm)


def test_aiff_negative_sample_rate_rejected():
    """AIFF encodes the rate as an 80-bit float; a set sign bit must not
    reach np.empty(negative) in the resampler."""
    pcm = np.zeros(160, dtype=">i2").tobytes()
    # float80 for -16000: sign bit | exponent for 2^14, mantissa normalized
    f80 = struct.pack(">H", 0x8000 | (16383 + 13)) + struct.pack(
        ">II", 0xFA000000, 0)
    comm = struct.pack(">HIH", 1, 160, 16) + f80
    ssnd = struct.pack(">II", 0, 0) + pcm
    buf = (b"FORM" + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(ssnd))
           + b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
           + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    with pytest.raises(AudioDecodeError):
        decode_audio(buf)
