"""Native FLAC codec — pure Python/numpy, no libsndfile/ffmpeg.

The reference accepts any upload libsndfile/ffmpeg can decode (reference
src/server.py:200-203, Dockerfile:18-20); FLAC is the one compressed format
it commonly sees. This module implements:

* ``decode_flac(bytes) -> (mono float32, sample_rate)`` — a full decoder:
  STREAMINFO parsing, fixed + LPC + constant + verbatim subframes, Rice /
  Rice2 residual partitions (incl. escape codes), wasted bits, and
  left/side, right/side, mid/side stereo decorrelation.
* ``encode_flac(float32, sr, ...)`` — a minimal conforming encoder (fixed
  predictors order 0-2, single-partition Rice, optional stereo modes).
  Used for round-trip tests and the debug tooling; real-world files come
  from arbitrary encoders and hit the decoder only.

The per-sample work — Rice/raw residual decoding and the LPC/fixed
prediction recurrence — dispatches to C++ (native/audio_dsp.cpp:
``flac_rice_decode`` / ``flac_raw_decode`` / ``flac_predict``) via absolute
bit-offset handoff with the Python ``_BitReader``; the pure-Python loops
remain the reference implementation and the automatic fallback
(tests/test_flac.py asserts both paths agree).
"""
from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from .codec import AudioDecodeError


class FlacError(AudioDecodeError):
    pass


# ───────────────────────────── bit reader ──────────────────────────────────


class _BitReader:
    __slots__ = ("data", "byte_pos", "bit_buf", "bit_cnt")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.byte_pos = byte_pos
        self.bit_buf = 0
        self.bit_cnt = 0

    def read(self, n: int) -> int:
        """Read n bits, MSB-first, unsigned."""
        while self.bit_cnt < n:
            if self.byte_pos >= len(self.data):
                raise FlacError("unexpected end of FLAC stream")
            self.bit_buf = (self.bit_buf << 8) | self.data[self.byte_pos]
            self.byte_pos += 1
            self.bit_cnt += 8
        self.bit_cnt -= n
        out = self.bit_buf >> self.bit_cnt
        self.bit_buf &= (1 << self.bit_cnt) - 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        """Count 0-bits until the terminating 1-bit."""
        q = 0
        while True:
            if self.bit_cnt == 0:
                if self.byte_pos >= len(self.data):
                    raise FlacError("unexpected end of FLAC stream")
                self.bit_buf = self.data[self.byte_pos]
                self.byte_pos += 1
                self.bit_cnt = 8
            if self.bit_buf == 0:  # whole remaining buffer is zeros
                q += self.bit_cnt
                self.bit_cnt = 0
                continue
            top = self.bit_buf.bit_length()
            zeros = self.bit_cnt - top
            q += zeros
            # consume the zeros and the 1-bit
            self.bit_cnt = top - 1
            self.bit_buf &= (1 << self.bit_cnt) - 1
            return q

    def align(self) -> None:
        self.bit_cnt = 0
        self.bit_buf = 0

    def bit_pos(self) -> int:
        """Absolute bit offset into the stream (for C++ handoff)."""
        return self.byte_pos * 8 - self.bit_cnt

    def seek(self, abs_bit: int) -> None:
        """Resume reading at an absolute bit offset."""
        self.byte_pos = abs_bit >> 3
        self.bit_buf = 0
        self.bit_cnt = 0
        if abs_bit & 7:
            self.read(abs_bit & 7)


# ───────────────────────────── decoder ─────────────────────────────────────

_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SR_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
             7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    mask = 0x40
    while b0 & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0 or n_extra > 6:
        raise FlacError("invalid UTF-8 coded number")
    val = b0 & (mask - 1)
    for _ in range(n_extra):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise FlacError("invalid UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _read_raw(br: _BitReader, n: int, bits: int) -> np.ndarray:
    """n two's-complement values of `bits` bits → int64 array (C++ hot path,
    Python fallback)."""
    out = np.empty(n, np.int64)
    if n == 0:
        return out
    from . import native
    lib = native.get_lib()
    if lib is not None:
        data = np.frombuffer(br.data, np.uint8)
        new = lib.flac_raw_decode(data, len(data), br.bit_pos(), n, bits, out)
        if new < 0:
            raise FlacError("unexpected end of FLAC stream")
        br.seek(new)
    else:
        for i in range(n):
            out[i] = br.read_signed(bits)
    return out


def _read_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise FlacError(f"reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    n_parts = 1 << po
    if blocksize % n_parts:
        raise FlacError("partition order does not divide block size")
    part_samples = blocksize >> po
    if part_samples < order or (part_samples == order and n_parts == 1):
        # Partition 0 holds part_samples - order residuals; a negative
        # count (or zero with nothing in later partitions) is malformed
        # and would otherwise decode to shifted/uninitialized PCM.
        raise FlacError("invalid partition size")
    from . import native
    lib = native.get_lib()
    data = np.frombuffer(br.data, np.uint8) if lib is not None else None
    out = np.empty(blocksize - order, np.int64)
    pos = 0
    read, read_unary = br.read, br.read_unary
    for part in range(n_parts):
        n = part_samples - (order if part == 0 else 0)
        param = read(plen)
        seg = out[pos:pos + n]
        pos += n
        if param == escape:
            raw_bits = read(5)
            if raw_bits == 0:
                seg[:] = 0
            elif lib is not None:
                new = lib.flac_raw_decode(data, len(data), br.bit_pos(), n,
                                          raw_bits, seg)
                if new < 0:
                    raise FlacError("unexpected end of FLAC stream")
                br.seek(new)
            else:
                sign = 1 << (raw_bits - 1)
                full = 1 << raw_bits
                for i in range(n):
                    v = read(raw_bits)
                    seg[i] = v - full if v & sign else v
        elif lib is not None:
            new = lib.flac_rice_decode(data, len(data), br.bit_pos(), n,
                                       param, seg)
            if new < 0:
                raise FlacError("unexpected end of FLAC stream")
            br.seek(new)
        else:
            for i in range(n):
                u = (read_unary() << param) | (read(param) if param else 0)
                seg[i] = (u >> 1) ^ -(u & 1)
    return out


def _predict(warm: np.ndarray, resid: np.ndarray, coeffs: np.ndarray,
             shift: int) -> np.ndarray:
    """Restore samples from warmup + residual via the prediction recurrence
    (buf[i] += (coeffs · history) >> shift), in C++ when available."""
    order = len(coeffs)
    buf = np.empty(order + len(resid), np.int64)
    buf[:order] = warm
    buf[order:] = resid
    if order == 0:
        return buf
    from . import native
    lib = native.get_lib()
    if lib is not None:
        lib.flac_predict(buf, len(buf),
                         np.ascontiguousarray(coeffs, np.int32), order, shift)
    else:
        b = buf.tolist()  # plain ints: the recurrence in exact arithmetic
        cs = [int(c) for c in coeffs]
        for i in range(order, len(b)):
            pred = 0
            for j in range(order):
                pred += cs[j] * b[i - 1 - j]
            b[i] += pred >> shift
        buf = np.array(b, np.int64)
    return buf


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise FlacError("invalid subframe padding bit")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps -= wasted
    if bps <= 0:
        raise FlacError("wasted bits exceed sample size")

    if sf_type == 0:  # CONSTANT
        samples = np.full(blocksize, br.read_signed(bps), np.int64)
    elif sf_type == 1:  # VERBATIM
        samples = _read_raw(br, blocksize, bps)
    elif 8 <= sf_type <= 12:  # FIXED, order = sf_type - 8
        order = sf_type - 8
        warm = _read_raw(br, order, bps)
        resid = _read_residual(br, blocksize, order)
        samples = _predict(warm, resid,
                           np.array(_FIXED_COEFFS[order], np.int64), 0)
    elif sf_type >= 32:  # LPC, order = (sf_type & 31) + 1
        order = (sf_type & 31) + 1
        warm = _read_raw(br, order, bps)
        precision = br.read(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coeffs = np.array([br.read_signed(precision) for _ in range(order)],
                          np.int64)
        resid = _read_residual(br, blocksize, order)
        samples = _predict(warm, resid, coeffs, shift)
    else:
        raise FlacError(f"reserved subframe type {sf_type}")

    if wasted:
        samples = samples << wasted
    return samples


def _parse_streaminfo(data: bytes) -> dict:
    if data[:4] != b"fLaC":
        raise FlacError("missing fLaC magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata")
        hdr = struct.unpack(">I", data[pos:pos + 4])[0]
        last = hdr >> 31
        btype = (hdr >> 24) & 0x7F
        blen = hdr & 0xFFFFFF
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0:
            if blen < 34:
                raise FlacError("short STREAMINFO")
            br = _BitReader(body)
            info = {
                "min_blocksize": br.read(16), "max_blocksize": br.read(16),
                "min_framesize": br.read(24), "max_framesize": br.read(24),
                "sample_rate": br.read(20),
                "channels": br.read(3) + 1,
                "bps": br.read(5) + 1,
                "total_samples": br.read(36),
            }
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise FlacError("no STREAMINFO block")
    if info["sample_rate"] == 0:
        raise FlacError("invalid sample rate")
    info["audio_start"] = pos
    return info


def decode_flac(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode a FLAC stream → (mono float32 in [-1,1], sample_rate)."""
    info = _parse_streaminfo(data)
    sr, n_ch, bps0 = info["sample_rate"], info["channels"], info["bps"]
    br = _BitReader(data, info["audio_start"])
    chans: List[List[np.ndarray]] = [[] for _ in range(n_ch)]
    total = info["total_samples"]
    got = 0

    while br.byte_pos < len(data) and (total == 0 or got < total):
        try:
            sync = br.read(14)
        except FlacError:
            break
        if sync != 0x3FFE:
            if total == 0 and got:
                # Unknown stream length (streamed/piped encodes write
                # total_samples=0): trailing padding/tags after the last
                # frame end the stream, they don't invalidate it.
                break
            raise FlacError(f"lost frame sync at byte {br.byte_pos}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 0:
            raise FlacError("reserved block size code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise FlacError("invalid sample rate code")
        bps = _BPS_TABLE.get(bps_code, bps0) if bps_code else bps0
        br.read(8)  # header CRC-8 (not verified)

        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise FlacError("channel count changed mid-stream")
            subs = [_decode_subframe(br, blocksize, bps)
                    for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise FlacError("stereo decorrelation in non-stereo stream")
            bps_a = bps + (1 if ch_code == 9 else 0)
            bps_b = bps + (1 if ch_code in (8, 10) else 0)
            a = _decode_subframe(br, blocksize, bps_a)
            b = _decode_subframe(br, blocksize, bps_b)
            if ch_code == 8:      # left/side
                subs = [a, a - b]
            elif ch_code == 9:    # right/side: a=side, b=right
                subs = [b + a, b]
            else:                 # mid/side
                mid2 = (a << 1) | (b & 1)
                subs = [(mid2 + b) >> 1, (mid2 - b) >> 1]
        else:
            raise FlacError(f"reserved channel assignment {ch_code}")

        br.align()
        br.read(16)  # frame CRC-16 (not verified)
        for c in range(n_ch):
            chans[c].append(subs[c])
        got += blocksize

    if not chans[0]:
        raise FlacError("no audio frames decoded")
    pcm = np.stack([np.concatenate(c) for c in chans], axis=1)
    if total:
        pcm = pcm[:total]
    mono = pcm.mean(axis=1)
    return (mono / float(1 << (bps0 - 1))).astype(np.float32), sr


# ───────────────────────────── encoder ─────────────────────────────────────


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, value: int, n: int) -> None:
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.cnt += n
        while self.cnt >= 8:
            self.cnt -= 8
            self.buf.append((self.acc >> self.cnt) & 0xFF)
        self.acc &= (1 << self.cnt) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.cnt:
            self.write(0, 8 - self.cnt)

    def bytes(self) -> bytes:
        assert self.cnt == 0
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _write_utf8_number(bw: _BitWriter, val: int) -> None:
    if val < 0x80:
        bw.write(val, 8)
        return
    limits = [(1, 11), (2, 16), (3, 21), (4, 26), (5, 31), (6, 36)]
    for n_extra, bits in limits:
        if val < (1 << bits):
            break
    lead = (0xFF << (7 - n_extra)) & 0xFF
    bw.write(lead | (val >> (6 * n_extra)), 8)
    for i in range(n_extra - 1, -1, -1):
        bw.write(0x80 | ((val >> (6 * i)) & 0x3F), 8)


def _best_rice_param(resid: np.ndarray, plen: int) -> int:
    if len(resid) == 0:
        return 0
    u = np.abs(resid.astype(np.int64)) * 2
    mean = max(float(u.mean()), 0.1)
    param = max(0, int(np.log2(mean)) - 0)
    return min(param, (1 << plen) - 2)


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    """Choose the cheapest of fixed orders 0-2 (single Rice partition)."""
    x = x.astype(np.int64)
    best_order, best_cost, best_resid = 0, None, x
    for order in (0, 1, 2):
        if len(x) <= order:
            break
        resid = x.copy()
        for _ in range(order):
            resid = np.diff(resid)
        param = _best_rice_param(resid, 4)
        u = (np.abs(resid) * 2 - (resid < 0).astype(np.int64))
        cost = int((u >> param).sum()) + len(resid) * (1 + param) + order * bps
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_resid = order, cost, resid
    order, resid = best_order, best_resid

    bw.write(0, 1)                       # pad
    bw.write(8 + order, 6)               # FIXED type
    bw.write(0, 1)                       # no wasted bits
    for i in range(order):               # warmup
        bw.write(int(x[i]), bps)
    # residual: method 0 (rice 4-bit), partition order 0
    bw.write(0, 2)
    bw.write(0, 4)
    param = _best_rice_param(resid, 4)
    bw.write(param, 4)
    for e in resid:
        e = int(e)
        u = (e << 1) if e >= 0 else ((-e) << 1) - 1
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _write_rice_residual(bw: _BitWriter, resid: np.ndarray, order: int,
                         partition_order: int, rice2: bool,
                         escape: bool) -> None:
    """Residual section: method/partition header + per-partition codes."""
    plen = 5 if rice2 else 4
    bw.write(1 if rice2 else 0, 2)
    bw.write(partition_order, 4)
    n_parts = 1 << partition_order
    blocksize = len(resid) + order
    part_samples = blocksize >> partition_order
    pos = 0
    for part in range(n_parts):
        n = part_samples - (order if part == 0 else 0)
        seg = resid[pos:pos + n]
        pos += n
        if escape:
            peak = int(np.abs(seg).max()) if len(seg) else 0
            raw_bits = max(peak.bit_length() + 1, 2)
            bw.write((1 << plen) - 1, plen)
            bw.write(raw_bits, 5)
            for v in seg:
                bw.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
        else:
            param = _best_rice_param(seg, plen)
            bw.write(param, plen)
            for e in seg:
                e = int(e)
                u = (e << 1) if e >= 0 else ((-e) << 1) - 1
                bw.write_unary(u >> param)
                if param:
                    bw.write(u & ((1 << param) - 1), param)


def _write_subframe_ex(bw: _BitWriter, x: np.ndarray, bps: int, *,
                       mode: str = "fixed", fixed_order: int = 1,
                       lpc_coeffs: Tuple[int, ...] = (7, -3),
                       lpc_shift: int = 2, lpc_precision: int = 5,
                       partition_order: int = 0, rice2: bool = False,
                       wasted: int = 0, escape: bool = False) -> None:
    """Subframe writer exercising the decoder paths real encoders use but
    the cost-optimizing ``_write_subframe`` never emits: LPC subframes,
    multi-partition Rice, Rice2 (5-bit params), escape partitions, and
    wasted bits. Test-support surface — behavior-compatible with any
    conforming decoder."""
    x = x.astype(np.int64)
    if wasted:
        x = (x >> wasted)  # caller's samples lose low bits; decoder shifts back
    eff_bps = bps - wasted
    blocksize = len(x)

    bw.write(0, 1)  # pad
    if mode == "verbatim":
        bw.write(1, 6)
        _write_wasted(bw, wasted)
        for v in x:
            bw.write(int(v) & ((1 << eff_bps) - 1), eff_bps)
        return
    if mode == "lpc":
        order = len(lpc_coeffs)
        bw.write(32 + (order - 1), 6)
        _write_wasted(bw, wasted)
        for i in range(order):
            bw.write(int(x[i]) & ((1 << eff_bps) - 1), eff_bps)
        bw.write(lpc_precision - 1, 4)
        bw.write(lpc_shift & 0x1F, 5)
        for c in lpc_coeffs:
            bw.write(int(c) & ((1 << lpc_precision) - 1), lpc_precision)
        resid = np.empty(blocksize - order, np.int64)
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += lpc_coeffs[j] * int(x[i - 1 - j])
            resid[i - order] = int(x[i]) - (pred >> lpc_shift)
    else:
        order = fixed_order
        bw.write(8 + order, 6)
        _write_wasted(bw, wasted)
        for i in range(order):
            bw.write(int(x[i]) & ((1 << eff_bps) - 1), eff_bps)
        resid = x.copy()
        for _ in range(order):
            resid = np.diff(resid)
    _write_rice_residual(bw, resid, order, partition_order, rice2, escape)


def _write_wasted(bw: _BitWriter, wasted: int) -> None:
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


def encode_flac(audio: np.ndarray, sr: int, bps: int = 16,
                blocksize: int = 4096, stereo_mode: str = "independent",
                channels: Optional[np.ndarray] = None,
                subframe_opts: Optional[dict] = None) -> bytes:
    """Encode float32 [-1,1] (mono, or [N,2] via ``channels``) to FLAC.

    stereo_mode: independent | left_side | right_side | mid_side
    (decorrelation modes exist to exercise the decoder in tests).
    subframe_opts: kwargs for ``_write_subframe_ex`` (LPC / multi-partition
    Rice / Rice2 / escape / wasted-bits subframes — the paths real libFLAC
    encodes that the minimal cost-picking writer never emits)."""
    if channels is not None:
        pcm = np.clip(channels, -1.0, 1.0)
    else:
        pcm = np.clip(np.asarray(audio, np.float64), -1.0, 1.0)[:, None]
    n_ch = pcm.shape[1]
    scale = (1 << (bps - 1)) - 1
    ints = np.round(pcm * scale).astype(np.int64)
    n = len(ints)

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # 18 bytes of fields + unset md5
    out += struct.pack(">I", (1 << 31) | (0 << 24) | len(body))
    out += body

    frame_idx = 0
    for start in range(0, n, blocksize):
        block = ints[start:start + blocksize]
        bs = len(block)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)          # fixed blocking
        bw.write(7, 4)          # 16-bit blocksize-1 at end of header
        bw.write(13, 4)         # 16-bit sample rate (Hz) at end of header
        if n_ch == 2 and stereo_mode != "independent":
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[
                stereo_mode]
        else:
            ch_code = n_ch - 1
        bw.write(ch_code, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        _write_utf8_number(bw, frame_idx)
        bw.write(bs - 1, 16)
        bw.write(sr & 0xFFFF, 16)
        bw.align()
        header = bw.bytes()
        bw = _BitWriter()
        for b in header:
            bw.write(b, 8)
        bw.write(_crc8(header), 8)

        if ch_code < 8:
            for c in range(n_ch):
                if subframe_opts is not None:
                    _write_subframe_ex(bw, block[:, c], bps, **subframe_opts)
                else:
                    _write_subframe(bw, block[:, c], bps)
        else:
            left, right = block[:, 0], block[:, 1]
            side = left - right
            if ch_code == 8:
                _write_subframe(bw, left, bps)
                _write_subframe(bw, side, bps + 1)
            elif ch_code == 9:
                _write_subframe(bw, side, bps + 1)
                _write_subframe(bw, right, bps)
            else:
                mid = (left + right) >> 1
                _write_subframe(bw, mid, bps)
                _write_subframe(bw, side, bps + 1)
        bw.align()
        frame = bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_idx += 1
    return bytes(out)
