"""Pure-Python FLAC codec (compressed audio container for the multimodal
column surface) — the audio analog of the PNG/GIF/JPEG image set: WAV is
the uncompressed carrier, FLAC the lossless-compressed one.

Decoder coverage (native FLAC, fixed-blocksize streams): STREAMINFO +
skipped metadata blocks, frame headers (blocksize/sample-rate/sample-size
code tables, UTF-8-coded frame number, CRC-8 verify), all four channel
assignments (independent, left/side, right/side, mid/side), all subframe
types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC any order with
quantized-coefficient shift), wasted-bits, partitioned Rice / Rice2
residuals including the escape-to-raw code, frame CRC-16 verify.
Encoder (fixture source): 8/16-bit mono or stereo, FIXED predictor with
per-frame best order 0-2, single-partition Rice with a
mean-magnitude-derived parameter, independent / left-side / mid-side
stereo decorrelation — every decoder path above is exercised by real
streams plus hand-built LPC/escape frames in tests.

Bit order is MSB-first throughout; Rice quotients are unary as q zero
bits terminated by a one. Raises ValueError on malformed input —
undecodable media must fail loudly, not yield garbage features.
"""

from __future__ import annotations

import struct

import numpy as np


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
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream ended early")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        out = (self.acc >> (self.n - bits)) & ((1 << bits) - 1)
        self.n -= bits
        self.acc &= (1 << self.n) - 1
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway FLAC unary code")
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos - (self.n // 8)


def _utf8_number_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_number_decode(rd: _BitReader) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad FLAC UTF-8 coded number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = rd.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation byte")
        n = (n << 6) | (b & 0x3F)
    return n


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}
_SAMPLE_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _read_residuals(rd: _BitReader, blocksize: int, order: int) -> list[int]:
    method = rd.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = rd.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        param = rd.read(pbits)
        if param == escape:
            raw = rd.read(5)
            for _ in range(n):
                out.append(rd.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = rd.read_unary()
                r = rd.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))
    return out


def _decode_subframe(rd: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if rd.read(1) != 0:
        raise ValueError("bad FLAC subframe sync bit")
    ftype = rd.read(6)
    wasted = 0
    if rd.read(1):  # wasted-bits flag: unary count - 1 follows
        wasted = rd.read_unary() + 1
    ebps = bps - wasted
    if ftype == 0:  # CONSTANT
        v = rd.read_signed(ebps)
        out = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array(
            [rd.read_signed(ebps) for _ in range(blocksize)], dtype=np.int64
        )
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        warm = [rd.read_signed(ebps) for _ in range(order)]
        resid = _read_residuals(rd, blocksize, order)
        coefs = _FIXED_COEFFS[order]
        vals = list(warm)
        for r in resid:
            pred = sum(c * vals[-i - 1] for i, c in enumerate(coefs))
            vals.append(pred + r)
        out = np.array(vals, dtype=np.int64)
    elif ftype >= 32:  # LPC, order = ftype - 31
        order = ftype - 31
        warm = [rd.read_signed(ebps) for _ in range(order)]
        prec = rd.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = rd.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [rd.read_signed(prec) for _ in range(order)]
        resid = _read_residuals(rd, blocksize, order)
        vals = list(warm)
        for r in resid:
            pred = sum(c * vals[-i - 1] for i, c in enumerate(coefs)) >> shift
            vals.append(pred + r)
        out = np.array(vals, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return out << wasted


def decode_flac(content: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream → (mono float64 samples in [-1, 1],
    sample_rate) — the same contract as ``decode_wav`` (stereo averaged
    to mono after reconstruction, so decorrelated channel assignments
    are fully exercised)."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated FLAC metadata")
        hdr = content[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        blen = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = content[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if blen < 34:
                raise ValueError("short FLAC STREAMINFO")
            sr = (int.from_bytes(body[10:13], "big") >> 4) & 0xFFFFF
            nch = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = (
                (body[13] & 0x0F) << 32
            ) | int.from_bytes(body[14:18], "big")
            info = (sr, nch, bps, total)
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    sr0, nch, bps0, total = info
    channels: list[list[int]] = [[] for _ in range(nch)]
    decoded = 0
    while pos < len(content) and (total == 0 or decoded < total):
        frame_start = pos
        rd = _BitReader(content, pos)
        sync = rd.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        rd.read(1)  # reserved
        rd.read(1)  # blocking strategy (fixed streams: frame number)
        bs_code = rd.read(4)
        sr_code = rd.read(4)
        ch_code = rd.read(4)
        ss_code = rd.read(3)
        rd.read(1)  # reserved
        _utf8_number_decode(rd)
        if bs_code == 6:
            blocksize = rd.read(8) + 1
        elif bs_code == 7:
            blocksize = rd.read(16) + 1
        elif bs_code in _BLOCKSIZE_TABLE:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        else:
            raise ValueError(f"reserved FLAC blocksize code {bs_code}")
        if sr_code == 0:
            sr = sr0
        elif sr_code in _SAMPLE_RATE_TABLE:
            sr = _SAMPLE_RATE_TABLE[sr_code]
        elif sr_code == 12:
            sr = rd.read(8) * 1000
        elif sr_code == 13:
            sr = rd.read(16)
        elif sr_code == 14:
            sr = rd.read(16) * 10
        else:
            raise ValueError(f"invalid FLAC sample-rate code {sr_code}")
        bps = bps0 if ss_code == 0 else _SAMPLE_SIZE_TABLE.get(ss_code)
        if bps is None:
            raise ValueError(f"reserved FLAC sample-size code {ss_code}")
        hdr_end = rd.byte_pos()
        crc8 = rd.read(8)
        if _crc8(content[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            nsub = ch_code + 1
            sub_bps = [bps] * nsub
        elif ch_code == 8:  # left/side
            nsub, sub_bps = 2, [bps, bps + 1]
        elif ch_code == 9:  # right/side
            nsub, sub_bps = 2, [bps + 1, bps]
        elif ch_code == 10:  # mid/side
            nsub, sub_bps = 2, [bps, bps + 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        if (ch_code < 8 and nsub != nch) or (ch_code >= 8 and nch != 2):
            raise ValueError("FLAC frame channel count disagrees with STREAMINFO")
        subs = [
            _decode_subframe(rd, blocksize, sub_bps[c]) for c in range(nsub)
        ]
        rd.align()
        crc_end = rd.byte_pos()
        crc16 = rd.read(16)
        if _crc16(content[frame_start:crc_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = rd.byte_pos()
        if ch_code == 8:
            left = subs[0]
            right = left - subs[1]
            chans = [left, right]
        elif ch_code == 9:
            right = subs[1]
            left = subs[0] + right
            chans = [left, right]
        elif ch_code == 10:
            side = subs[1]
            mid = (subs[0] << 1) | (side & 1)
            chans = [(mid + side) >> 1, (mid - side) >> 1]
        else:
            chans = subs
        for c, vals in enumerate(chans):
            channels[c].extend(int(v) for v in vals)
        decoded += blocksize
    if total and decoded < total:
        raise ValueError("FLAC stream ended before total_samples")
    n = min(len(c) for c in channels)
    if total:
        n = min(n, total)
    arr = np.array([c[:n] for c in channels], dtype=np.float64)
    mono = arr.mean(axis=0) / float(1 << (bps0 - 1))
    return mono, sr0


def _encode_subframe_fixed(
    wr: _BitWriter, vals: np.ndarray, bps: int
) -> None:
    n = len(vals)
    v = vals.astype(np.int64)
    best_order, best_resid, best_cost = 0, v, None
    for order in range(0, min(3, n)):
        resid = v.copy()
        for _ in range(order):
            resid = np.diff(resid)  # k-th difference: length n-k
        cost = int(np.abs(resid).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_resid = order, cost, resid
    order, resid = best_order, best_resid
    wr.write(0, 1)
    wr.write(8 + order, 6)
    wr.write(0, 1)  # no wasted bits
    for i in range(order):
        wr.write_signed(int(v[i]), bps)
    mean = int(np.abs(resid).mean()) if len(resid) else 0
    param = max(0, min(14, mean.bit_length()))
    wr.write(0, 2)   # Rice method (4-bit params)
    wr.write(0, 4)   # partition order 0
    wr.write(param, 4)
    for r in resid:
        r = int(r)
        zz = (abs(r) << 1) - 1 if r < 0 else (r << 1)
        wr.write_unary(zz >> param)
        if param:
            wr.write(zz & ((1 << param) - 1), param)


def encode_flac(
    samples,
    sample_rate: int,
    bps: int = 16,
    blocksize: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """Encode PCM → native FLAC (fixture/test source). ``samples`` is a
    float array in [-1, 1]: 1-D for mono, (2, n) for stereo. FIXED
    predictor (per-frame best order 0-2), single-partition Rice,
    ``stereo_mode`` in independent / left_side / mid_side exercising the
    decoder's decorrelation paths."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        chans = [np.clip(arr, -1, 1)]
    elif arr.ndim == 2 and arr.shape[0] == 2:
        chans = [np.clip(arr[0], -1, 1), np.clip(arr[1], -1, 1)]
    else:
        raise ValueError("samples must be 1-D mono or (2, n) stereo")
    if stereo_mode not in ("independent", "left_side", "mid_side"):
        raise ValueError(f"unsupported stereo_mode {stereo_mode!r}")
    scale = float(1 << (bps - 1))
    pcm = [
        np.clip(np.round(c * scale), -scale, scale - 1).astype(np.int64)
        for c in chans
    ]
    nch = len(pcm)
    n = len(pcm[0])

    info = bytearray(34)
    struct.pack_into(">HH", info, 0, blocksize, blocksize)
    # min/max framesize left 0 (unknown — legal)
    sr_packed = (sample_rate << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4)
    info[10:13] = sr_packed.to_bytes(3, "big")
    info[13] = (((bps - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F)
    info[14:18] = (n & 0xFFFFFFFF).to_bytes(4, "big")

    out = bytearray(b"fLaC")
    out.append(0x80)  # last metadata block, STREAMINFO
    out += len(info).to_bytes(3, "big")
    out += info

    for fi, start in enumerate(range(0, n, blocksize)):
        cur = [c[start : start + blocksize] for c in pcm]
        bs = len(cur[0])
        wr = _BitWriter()
        wr.write(0x3FFE, 14)
        wr.write(0, 1)
        wr.write(0, 1)  # fixed blocksize strategy
        wr.write(7, 4)  # blocksize: 16-bit value follows
        wr.write(0, 4)  # sample rate from STREAMINFO
        if nch == 1:
            ch_code = 0
        elif stereo_mode == "independent":
            ch_code = 1
        elif stereo_mode == "left_side":
            ch_code = 8
        else:
            ch_code = 10
        wr.write(ch_code, 4)
        wr.write(4 if bps == 16 else (1 if bps == 8 else 6), 3)
        wr.write(0, 1)
        for b in _utf8_number_encode(fi):
            wr.write(b, 8)
        wr.write(bs - 1, 16)
        hdr = bytes(wr.buf)
        wr.write(_crc8(hdr), 8)
        if nch == 1 or stereo_mode == "independent":
            subs = [(c, bps) for c in cur]
        elif stereo_mode == "left_side":
            subs = [(cur[0], bps), (cur[0] - cur[1], bps + 1)]
        else:
            mid = (cur[0] + cur[1]) >> 1
            side = cur[0] - cur[1]
            subs = [(mid, bps), (side, bps + 1)]
        for vals, sbps in subs:
            _encode_subframe_fixed(wr, vals, sbps)
        wr.align()
        frame = bytes(wr.buf)
        wr.write(_crc16(frame), 16)
        out += wr.bytes()
    return bytes(out)
