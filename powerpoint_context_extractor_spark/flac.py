"""Minimal real FLAC codec (pure stdlib) — the lossless web/archive
audio format next to wav.py's PCM/mu-law/ADPCM family (reference
analog: the media enrichment batch,
/root/reference/pptx_extractor/recommendations/generator.py:306-343).
Lossless means the decode is bit-exact by construction, so decoded
sample statistics sit directly under the integer oracle.

Subset (honest ValueError outside it): 8/12/16/20/24-bit samples,
mono or stereo — independent channels AND all three decorrelations
(left/side, right/side, mid/side; the side channel carries bps+1
bits), CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes (any order
and quantized-coefficient precision on decode; the encoder emits an
order-2 model), Rice residual method 0 with any partition order and
the 5-bit raw-bits escape, wasted-bits shifting, fixed- AND
variable-blocksize streams (r7: the strategy bit switches the frame
varint between frame index and starting sample; both are verified
in sequence on decode).
STREAMINFO is required first; other metadata blocks are skipped.
Frame header CRC-8 and whole-frame CRC-16 are verified; the
STREAMINFO MD5 of the unencoded audio is written by the encoder and
verified by the decoder when present.

Bit-level notes: everything is MSB-first (opposite of GIF); Rice
unary is q ZERO bits then a one; residuals zigzag as
z = 2r (r >= 0) / -2r - 1 (r < 0); the frame number is a UTF-8-style
variable-length integer.
"""

from __future__ import annotations

import hashlib
import struct

FIXED_COEFFS = ([], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1])

_BLOCKSIZE_CODE = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
                   4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
                   2048: 0b1011, 4096: 0b1100, 8192: 0b1101,
                   16384: 0b1110, 32768: 0b1111}
_RATE_TABLE = {0b0001: 88200, 0b0010: 176400, 0b0011: 192000,
               0b0100: 8000, 0b0101: 16000, 0b0110: 22050, 0b0111: 24000,
               0b1000: 32000, 0b1001: 44100, 0b1010: 48000, 0b1011: 96000}
_BPS_TABLE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(v: int) -> bytes:
    """UTF-8-style variable-length frame number (an n-byte form
    carries (7-n) + 6(n-1) = 5n+1 payload bits; n=7 carries 36)."""
    if v < 0x80:
        return bytes([v])
    for n in range(2, 8):
        if v < (1 << (5 * n + 1)):
            break
    else:
        raise ValueError("flac: frame number too large")
    first_bits = 7 - n if n < 7 else 0
    lead = (0xFF << (8 - n)) & 0xFF
    out = [lead | ((v >> (6 * (n - 1))) & ((1 << first_bits) - 1))]
    for k in range(n - 2, -1, -1):
        out.append(0x80 | ((v >> (6 * k)) & 0x3F))
    return bytes(out)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def put_signed(self, value: int, nbits: int) -> None:
        self.put(value & ((1 << nbits) - 1), nbits)

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def get(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            if self.byte >= len(self.data):
                raise ValueError("flac: truncated bitstream")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def get_signed(self, nbits: int) -> int:
        v = self.get(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def get_unary(self) -> int:
        n = 0
        while self.get(1) == 0:
            n += 1
            if n > 1 << 20:
                raise ValueError("flac: runaway unary code")
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-r << 1) - 1


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def _rice_param(zs: list) -> int:
    if not zs:
        return 0
    mean = sum(zs) // len(zs)
    p = mean.bit_length()
    return min(p, 14)


def _write_residual(w: _BitWriter, res: list) -> None:
    w.put(0, 2)                       # method 0: 4-bit rice
    w.put(0, 4)                       # partition order 0
    zs = [_zigzag(r) for r in res]
    p = _rice_param(zs)
    w.put(p, 4)
    for z in zs:
        q = z >> p
        w.put(0, q) if q else None    # q zero bits
        w.put(1, 1)
        w.put(z & ((1 << p) - 1), p)


def _read_residual(r: _BitReader, block_size: int, order: int) -> list:
    method = r.get(2)
    if method != 0:
        raise ValueError(f"flac: residual method {method} unsupported")
    porder = r.get(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("flac: block size not divisible by partitions")
    out: list = []
    for part in range(nparts):
        n = block_size // nparts - (order if part == 0 else 0)
        param = r.get(4)
        if param == 0xF:              # raw-bits escape
            raw = r.get(5)
            out.extend(r.get_signed(raw) if raw else 0
                       for _ in range(n))
            continue
        for _ in range(n):
            q = r.get_unary()
            z = (q << param) | r.get(param)
            out.append(_unzigzag(z))
    return out


# the encoder's one LPC model (order 2, precision 12, shift 10):
# prediction = (1536*s[i-1] - 512*s[i-2]) >> 10, i.e. 1.5/-0.5 — a
# deliberately NON-fixed predictor so LPC decode is distinguishable
# from fixed(2)
_LPC_COEFS, _LPC_PREC, _LPC_SHIFT = (1536, -512), 12, 10


def _encode_subframe(w: _BitWriter, ch_samples: list, bps: int,
                     use_lpc: bool = False) -> None:
    n = len(ch_samples)
    if n and all(s == ch_samples[0] for s in ch_samples):
        w.put(0, 1)
        w.put(0b000000, 6)            # CONSTANT
        w.put(0, 1)
        w.put_signed(ch_samples[0], bps)
        return
    if n <= 4:
        w.put(0, 1)
        w.put(0b000001, 6)            # VERBATIM
        w.put(0, 1)
        for s in ch_samples:
            w.put_signed(s, bps)
        return
    order = 2
    if use_lpc:
        w.put(0, 1)
        w.put(0b100000 | (order - 1), 6)     # LPC, order 2
        w.put(0, 1)
        for s in ch_samples[:order]:
            w.put_signed(s, bps)
        w.put(_LPC_PREC - 1, 4)
        w.put_signed(_LPC_SHIFT, 5)
        for c in _LPC_COEFS:
            w.put_signed(c, _LPC_PREC)
        res = [ch_samples[i]
               - ((_LPC_COEFS[0] * ch_samples[i - 1]
                   + _LPC_COEFS[1] * ch_samples[i - 2]) >> _LPC_SHIFT)
               for i in range(order, n)]
        _write_residual(w, res)
        return
    w.put(0, 1)
    w.put(0b001000 | order, 6)        # FIXED order 2
    w.put(0, 1)
    for s in ch_samples[:order]:
        w.put_signed(s, bps)
    res = [ch_samples[i] - 2 * ch_samples[i - 1] + ch_samples[i - 2]
           for i in range(order, n)]
    _write_residual(w, res)


_STEREO_CODES = {"independent": None, "left_side": 8,
                 "right_side": 9, "mid_side": 10}


def render_flac(samples: list, sample_rate: int = 8000,
                channels: int = 1, bps: int = 16,
                block_size: int = 4096, use_lpc: bool = False,
                stereo_mode: str = "independent",
                block_sizes: list | None = None) -> bytes:
    """Encode interleaved integer ``samples`` as a FLAC stream
    (constant / verbatim / fixed(2) — or order-2 LPC with
    ``use_lpc`` — subframes, rice partition order 0). ``stereo_mode``
    picks a decorrelation for 2-channel input: left_side / right_side
    / mid_side store a (bps+1)-bit difference channel, per spec.
    ``block_sizes`` (r7) switches to a VARIABLE-blocksize stream:
    frame f holds ``block_sizes[f]`` samples (sum must equal the
    total), the blocking-strategy bit is 1, and the frame-header
    varint carries the starting SAMPLE number instead of the frame
    index — the last fixed-subset gap. Lossless in every mode:
    decode_flac returns exactly ``samples``."""
    if channels not in (1, 2):
        raise ValueError("flac: 1 or 2 channels only")
    if stereo_mode not in _STEREO_CODES:
        raise ValueError(f"flac: unknown stereo mode {stereo_mode!r}")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("flac: stereo decorrelation needs 2 channels")
    if bps not in (8, 12, 16, 20, 24):
        raise ValueError("flac: unsupported bits per sample")
    if len(samples) % channels:
        raise ValueError("flac: sample count not divisible by channels")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError("flac: bad sample rate")
    lim = 1 << (bps - 1)
    if any(not -lim <= s < lim for s in samples):
        raise ValueError("flac: sample out of range for bps")
    n_total = len(samples) // channels
    chans = [samples[c::channels] for c in range(channels)]
    # MD5 of the unencoded audio: interleaved little-endian bytes
    raw = bytearray()
    nbytes = (bps + 7) // 8
    for i in range(n_total):
        for c in range(channels):
            raw += int(chans[c][i]).to_bytes(nbytes, "little", signed=True)
    md5 = hashlib.md5(bytes(raw)).digest()
    if block_sizes is not None:
        if (not block_sizes or sum(block_sizes) != n_total
                or any(not 1 <= b <= 65535 for b in block_sizes)):
            raise ValueError("flac: block_sizes must be in [1, 65535] "
                             "and sum to the per-channel sample count")
        sizes = list(block_sizes)
        offs = [sum(sizes[:i]) for i in range(len(sizes))]
        variable = True
    else:
        sizes = [min(block_size, n_total - off) or block_size
                 for off in range(0, max(n_total, 1), block_size)]
        offs = list(range(0, n_total, block_size))
        variable = False
    w = _BitWriter()
    w.put(min(sizes) if n_total else block_size, 16)
    w.put(max(sizes) if n_total else block_size, 16)
    w.put(0, 24)
    w.put(0, 24)
    w.put(sample_rate, 20)
    w.put(channels - 1, 3)
    w.put(bps - 1, 5)
    w.put(n_total, 36)
    streaminfo = w.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    for fi, off in enumerate(offs):
        bs = sizes[fi]
        fw = _BitWriter()
        fw.put(0b11111111111110, 14)
        fw.put(0, 1)                  # reserved
        fw.put(1 if variable else 0, 1)      # blocking strategy
        fw.put(0b0111, 4)             # blocksize: 16-bit at header end
        fw.put(0b0000, 4)             # rate: from STREAMINFO
        chan_code = _STEREO_CODES[stereo_mode]
        fw.put(channels - 1 if chan_code is None else chan_code, 4)
        fw.put({8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101,
                24: 0b110}[bps], 3)
        fw.put(0, 1)                  # reserved
        fw.pad_to_byte()
        hdr = bytearray(fw.bytes())
        # variable streams number frames by starting SAMPLE, fixed by
        # frame index (the spec's one semantic use of the strategy bit)
        hdr += _utf8_number(off if variable else fi)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))
        bw = _BitWriter()
        if chan_code is None:
            for c in range(channels):
                _encode_subframe(bw, chans[c][off:off + bs], bps,
                                 use_lpc)
        else:
            left = chans[0][off:off + bs]
            right = chans[1][off:off + bs]
            side = [a - b for a, b in zip(left, right)]
            if chan_code == 8:        # left/side
                subs = [(left, bps), (side, bps + 1)]
            elif chan_code == 9:      # right/side
                subs = [(side, bps + 1), (right, bps)]
            else:                     # mid/side
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                subs = [(mid, bps), (side, bps + 1)]
            for ch_samples, sub_bps in subs:
                _encode_subframe(bw, ch_samples, sub_bps, use_lpc)
        bw.pad_to_byte()
        frame = bytes(hdr) + bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> list:
    if r.get(1):
        raise ValueError("flac: bad subframe sync bit")
    ftype = r.get(6)
    wasted = 0
    if r.get(1):                      # wasted-bits flag
        wasted = r.get_unary() + 1
        bps -= wasted
    if ftype == 0b000000:
        out = [r.get_signed(bps)] * bs
    elif ftype == 0b000001:
        out = [r.get_signed(bps) for _ in range(bs)]
    elif 0b001000 <= ftype <= 0b001100:
        order = ftype & 0x07
        out = [r.get_signed(bps) for _ in range(order)]
        res = _read_residual(r, bs, order)
        coef = FIXED_COEFFS[order]
        for v in res:
            pred = sum(c * out[-1 - k] for k, c in enumerate(coef))
            out.append(v + pred)
    elif ftype >= 0b100000:
        order = (ftype & 0x1F) + 1
        out = [r.get_signed(bps) for _ in range(order)]
        prec = r.get(4) + 1
        if prec == 16:                # 0b1111 is invalid per spec
            raise ValueError("flac: invalid LPC precision code")
        shift = r.get_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [r.get_signed(prec) for _ in range(order)]
        res = _read_residual(r, bs, order)
        for v in res:
            pred = sum(c * out[-1 - k]
                       for k, c in enumerate(coefs)) >> shift
            out.append(v + pred)
    else:
        raise ValueError(f"flac: reserved subframe type {ftype:06b}")
    return [s << wasted for s in out] if wasted else out


def decode_flac(data: bytes) -> tuple:
    """-> (sample_rate, channels, interleaved samples list)."""
    if len(data) < 8 or data[:4] != b"fLaC":
        raise ValueError("flac: bad signature")
    pos = 4
    info = None
    md5 = b""
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        last = bool(data[pos] & 0x80)
        btype = data[pos] & 0x7F
        ln = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            if ln != 34:
                raise ValueError("flac: bad STREAMINFO size")
            r = _BitReader(body)
            r.get(16), r.get(16), r.get(24), r.get(24)
            rate = r.get(20)
            channels = r.get(3) + 1
            bps = r.get(5) + 1
            n_total = r.get(36)
            md5 = body[18:34]
            info = (rate, channels, bps, n_total)
        pos += 4 + ln
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    rate, channels, bps, n_total = info
    if channels > 2:
        raise ValueError("flac: more than 2 channels unsupported")
    chans: list = [[] for _ in range(channels)]
    got = 0
    n_frames = 0
    while got < n_total:
        start = pos
        r = _BitReader(data, pos)
        if r.get(14) != 0b11111111111110:
            raise ValueError("flac: bad frame sync")
        r.get(1)
        variable = bool(r.get(1))     # blocking strategy
        bs_code = r.get(4)
        rate_code = r.get(4)
        chan_code = r.get(4)
        bps_code = r.get(3)
        r.get(1)
        # frame/sample number: UTF-8-style varint. VERIFIED (r7):
        # variable-blocksize streams number frames by starting
        # sample, fixed streams by frame index — an out-of-sequence
        # value means a lost/reordered frame, not just noise
        first = r.get(8)
        if first < 0x80:
            fnum = first
        else:
            n_cont = 0
            mask = 0x40
            while first & mask:
                n_cont += 1
                mask >>= 1
            if n_cont < 1:
                raise ValueError("flac: bad frame number coding")
            fnum = first & (mask - 1)
            for _ in range(n_cont):
                b = r.get(8)
                if b & 0xC0 != 0x80:
                    raise ValueError("flac: bad frame number coding")
                fnum = (fnum << 6) | (b & 0x3F)
        if fnum != (got if variable else n_frames):
            raise ValueError(
                f"flac: frame number {fnum} out of sequence "
                f"(expected {got if variable else n_frames})")
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        if bs_code == 0b0110:
            bs = r.get(8) + 1
        elif bs_code == 0b0111:
            bs = r.get(16) + 1
        else:
            bs = _BLOCKSIZE_CODE_INV[bs_code]
        if rate_code == 0b0000:
            frate = rate
        elif rate_code in _RATE_TABLE:
            frate = _RATE_TABLE[rate_code]
        elif rate_code == 0b1100:
            frate = r.get(8) * 1000
        elif rate_code == 0b1101:
            frate = r.get(16)
        elif rate_code == 0b1110:
            frate = r.get(16) * 10
        else:
            raise ValueError("flac: invalid sample rate code")
        if frate != rate:
            raise ValueError("flac: frame rate != STREAMINFO rate")
        if chan_code > 10:
            raise ValueError("flac: reserved channel assignment")
        if chan_code < 8 and chan_code + 1 != channels:
            raise ValueError("flac: frame channels != STREAMINFO")
        if chan_code >= 8 and channels != 2:
            raise ValueError("flac: decorrelated frame in non-stereo "
                             "stream")
        fbps = bps if bps_code == 0 else _BPS_TABLE.get(bps_code)
        if fbps is None:
            raise ValueError("flac: reserved sample size code")
        if fbps != bps:
            raise ValueError("flac: frame bps != STREAMINFO bps")
        r.align()
        hdr_end = r.byte              # reader sits AT the CRC-8 byte
        if hdr_end >= len(data):
            raise ValueError("flac: truncated frame header")
        if _crc8(data[start:hdr_end]) != data[hdr_end]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        r.byte = hdr_end + 1          # consume the CRC-8 byte
        if chan_code < 8:
            for c in range(channels):
                chans[c].extend(_decode_subframe(r, bs, bps))
        else:
            # decorrelated stereo: the SIDE subframe carries bps+1
            b0, b1 = ((bps, bps + 1) if chan_code in (8, 10)
                      else (bps + 1, bps))
            s0 = _decode_subframe(r, bs, b0)
            s1 = _decode_subframe(r, bs, b1)
            if chan_code == 8:                    # left/side
                left, right = s0, [a - b for a, b in zip(s0, s1)]
            elif chan_code == 9:                  # right/side
                left, right = [a + b for a, b in zip(s1, s0)], s1
            else:                                 # mid/side
                left, right = [], []
                for m, s in zip(s0, s1):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
            chans[0].extend(left)
            chans[1].extend(right)
        r.align()
        if r.byte + 2 > len(data):
            raise ValueError("flac: truncated frame CRC")
        (crc,) = struct.unpack(">H", data[r.byte:r.byte + 2])
        if _crc16(data[start:r.byte]) != crc:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = r.byte + 2
        got += bs
        n_frames += 1
    if got != n_total:
        raise ValueError("flac: sample count mismatch")
    out = []
    for i in range(n_total):
        for c in range(channels):
            out.append(chans[c][i])
    if md5 != bytes(16):
        nbytes = (bps + 7) // 8
        raw = b"".join(int(s).to_bytes(nbytes, "little", signed=True)
                       for s in out)
        if hashlib.md5(raw).digest() != md5:
            raise ValueError("flac: decoded audio MD5 mismatch")
    return rate, channels, out


_BLOCKSIZE_CODE_INV = {v: k for k, v in _BLOCKSIZE_CODE.items()}
