"""MP3 / Ogg (Vorbis, Opus) decode via SDL_mixer, native-rate correct.

The reference decodes compressed uploads through libsndfile/ffmpeg
(reference src/server.py:200-203, Dockerfile:18-20). The TPU build's
host-side equivalent is SDL_mixer (baked into this image via pygame): a C
codec library driven from Python, used ONLY for the entropy-coded formats
the pure-numpy codec (audio/codec.py, audio/flac.py) does not cover.

SDL_mixer converts every stream to the rate/layout the mixer was
initialized with, so naive use would resample behind our back with SDL's
converter. Instead the container/frame headers are parsed HERE (pure
struct — `sniff_mp3`, `sniff_ogg`) and the mixer is (re)initialized at the
stream's native rate and channel count: SDL does only the codec work, and
the framework's polyphase resampler (audio/resample.py) owns the 16 kHz
conversion exactly as on every other input path.

Decoding is serialized by a module lock (the SDL mixer is global state);
compressed-upload decode is a host-side, pre-queue operation so this does
not sit on the device hot path.
"""
from __future__ import annotations

import io
import struct
import threading
from typing import Optional, Tuple

import numpy as np

from .codec import AudioDecodeError, UnsupportedFormatError, check_stream_params

_SUPPORTED = "supported formats: WAV, W64, RF64, AIFF/AIFC, AU/SND, CAF, FLAC, MP3, OGG"

# MPEG audio sample-rate table, indexed by version bits (header bits 19-20):
# 0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1 (1 is reserved).
_MPEG_SR = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def sniff_mp3(data: bytes, scan_limit: int = 1 << 16
              ) -> Optional[Tuple[int, int]]:
    """Parse the first valid MPEG audio frame header → (sample_rate,
    channels), or None. Pure header math — no decoding."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        tag_size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + tag_size
    end = min(len(data) - 4, pos + scan_limit)
    while pos < end:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            version = (data[pos + 1] >> 3) & 3
            layer = (data[pos + 1] >> 1) & 3
            bitrate_idx = (data[pos + 2] >> 4) & 15
            sr_idx = (data[pos + 2] >> 2) & 3
            mode = (data[pos + 3] >> 6) & 3
            if version != 1 and layer != 0 and 0 < bitrate_idx < 15 \
                    and sr_idx != 3:
                return _MPEG_SR[version][sr_idx], (1 if mode == 3 else 2)
        pos += 1
    return None


def sniff_ogg(data: bytes) -> Optional[Tuple[int, int]]:
    """Parse the first Ogg page's codec identification header →
    (sample_rate, channels), or None. Handles Vorbis and Opus (Opus always
    DECODES at 48 kHz regardless of the original input rate)."""
    if data[:4] != b"OggS" or len(data) < 28:
        return None
    n_segments = data[26]
    payload = 27 + n_segments
    ident = data[payload:payload + 8]
    if ident.startswith(b"\x01vorbis") and len(data) >= payload + 16:
        channels = data[payload + 11]
        (sr,) = struct.unpack("<I", data[payload + 12:payload + 16])
        return sr, channels
    if ident.startswith(b"OpusHead") and len(data) >= payload + 10:
        channels = data[payload + 9]
        return 48000, channels  # Opus output rate is always 48 kHz
    return None


_lock = threading.Lock()
_mixer_state: Optional[Tuple[int, int]] = None


def _mixer(sr: int, channels: int):
    """Import pygame lazily (headless) and (re)init its mixer at the
    stream-native format. Returns the pygame module."""
    import os
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    try:
        import pygame
        import pygame.sndarray  # noqa: F401 — probe availability
    except Exception as e:  # pragma: no cover - environment-dependent
        raise UnsupportedFormatError(
            f"compressed-audio decode backend unavailable ({e}); "
            f"{_SUPPORTED}") from e
    global _mixer_state
    if _mixer_state != (sr, channels):
        prev = _mixer_state
        _mixer_state = None  # if quit/init raises, never claim the old state
        if prev is not None:
            pygame.mixer.quit()
        try:
            pygame.mixer.init(frequency=sr, size=-16, channels=channels,
                              buffer=512)
        except Exception as e:
            raise AudioDecodeError(
                f"audio backend rejected stream format "
                f"(rate={sr}, channels={channels}): {e}") from e
        _mixer_state = (sr, channels)
    return pygame


def decode_compressed(data: bytes, kind: str) -> Tuple[np.ndarray, int]:
    """Decode MP3/OGG bytes → (mono float32 in [-1, 1], native sample rate).

    kind: "MP3" | "OGG" (from the container magic — see codec.decode_audio).
    """
    sniffed = sniff_mp3(data) if kind == "MP3" else sniff_ogg(data)
    sr, channels = sniffed if sniffed else (44100, 2)
    channels = max(1, min(2, int(channels)))  # SDL mixes down >2 itself
    check_stream_params(sr)  # sniffed rate is attacker-controlled header data
    with _lock:
        pygame = _mixer(sr, channels)
        try:
            sound = pygame.mixer.Sound(file=io.BytesIO(data))
            arr = pygame.sndarray.array(sound)
        except Exception as e:
            raise AudioDecodeError(
                f"corrupt {kind} stream: {e}; {_SUPPORTED}") from e
    audio = np.asarray(arr, dtype=np.float32) / 32768.0
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    if audio.size == 0:
        raise AudioDecodeError(f"empty {kind} stream")
    return audio, sr
