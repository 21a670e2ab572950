"""Pure-stdlib RIFF/WAVE PCM16 subset codec (no Spark imports).

Makes the U1 audio enrichment seam REAL for one payload class (r4
VERDICT "next round" #7): the container has no torchaudio/ffmpeg, but
canonical PCM WAV needs only ``struct``. The writer emits spec-valid
RIFF/WAVE files (RIFF header, ``fmt `` chunk, ``data`` chunk, even-byte
chunk padding); the reader validates the container, walks chunks, and
decodes 16-bit mono PCM samples — so the Spark feature path parses
real audio bytes, not a byte-statistics stand-in.

Subset (documented, raises ValueError outside it): PCM (format tag 1,
16-bit little-endian) or G.711 mu-law (format tag 7, 8-bit — the
telephony/web-audio companding codec; r6), mono or stereo (r6 adds
2-channel interleaved). Reference analog: the media enrichment batch
at `pptx_extractor/recommendations/generator.py:306-343`.
"""

from __future__ import annotations

import struct

__all__ = ["render_wav", "decode_wav", "ulaw_encode", "ulaw_decode"]

_ULAW_CLIP, _ULAW_BIAS = 32635, 0x84


def ulaw_encode(s: int) -> int:
    """G.711 mu-law compress one int16 sample -> one byte (the public
    CCITT algorithm: bias, segment exponent = bit position, 4-bit
    mantissa, ones-complement). Pure integer math."""
    sign = 0x80 if s < 0 else 0
    m = min(-s if s < 0 else s, _ULAW_CLIP) + _ULAW_BIAS
    e = m.bit_length() - 8                 # 132..32767 -> exponent 0..7
    return ~(sign | (e << 4) | ((m >> (e + 3)) & 0x0F)) & 0xFF


def ulaw_decode(u: int) -> int:
    """Exact inverse expansion of one mu-law byte -> linear sample."""
    u = ~u & 0xFF
    e, mant = (u >> 4) & 7, u & 0x0F
    m = (((mant << 3) + _ULAW_BIAS) << e) - _ULAW_BIAS
    return -m if u & 0x80 else m


def render_wav(samples, sample_rate: int = 8000,
               channels: int = 1, encoding: str = "pcm16") -> bytes:
    """Encode 16-bit signed samples (channel-interleaved for stereo:
    L0 R0 L1 R1 ...) as a canonical RIFF/WAVE file. ``encoding`` is
    ``pcm16`` (format tag 1) or ``ulaw`` (format tag 7: each sample
    companded to one G.711 byte; the fmt chunk carries the spec's
    cbSize=0 extension for non-PCM tags)."""
    if sample_rate <= 0:
        raise ValueError("wav: non-positive sample rate")
    if channels not in (1, 2):
        raise ValueError("wav: subset is mono or stereo")
    if len(samples) % channels != 0:
        raise ValueError("wav: sample count not a multiple of channels")
    if any(not -32768 <= s <= 32767 for s in samples):
        raise ValueError("wav: sample outside int16 range")
    if encoding == "pcm16":
        data = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                          sample_rate * 2 * channels, 2 * channels, 16)
    elif encoding == "ulaw":
        data = bytes(ulaw_encode(s) for s in samples)
        fmt = struct.pack("<HHIIHHH", 7, channels, sample_rate,
                          sample_rate * channels, channels, 8, 0)
    else:
        raise ValueError(f"wav: unsupported encoding {encoding!r}")
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2 == 1:                 # chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple:
    """Decode a PCM16 mono/stereo RIFF/WAVE file -> (sample_rate,
    n_channels, channel-interleaved samples list). Validates the
    RIFF/WAVE container, the fmt subset, and chunk bounds; raises
    ValueError outside the subset (log-and-continue at the operator
    layer, F6 policy)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE container")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("wav: truncated RIFF payload")
    i = 12
    sample_rate = None
    n_channels = None
    fmt_tag = None
    data_body = None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        (ln,) = struct.unpack("<I", data[i + 4:i + 8])
        body = data[i + 8:i + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"wav: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("wav: short fmt chunk")
            tag, n_ch, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if n_ch not in (1, 2) or (tag, bits) not in ((1, 16), (7, 8)):
                raise ValueError(
                    f"wav: unsupported format tag={tag} channels={n_ch} "
                    f"bits={bits} (subset is PCM16 or mu-law mono/stereo)")
            sample_rate = rate
            n_channels = n_ch
            fmt_tag = tag
        elif cid == b"data":
            data_body = body
        i += 8 + ln + (ln % 2)             # skip word-alignment pad
    if sample_rate is None or data_body is None:
        raise ValueError("wav: missing fmt or data chunk")
    if fmt_tag == 1:
        if len(data_body) % 2 != 0:
            raise ValueError("wav: odd data length for 16-bit PCM")
        samples = list(struct.unpack(f"<{len(data_body) // 2}h", data_body))
    else:                                  # mu-law: one byte per sample
        samples = [ulaw_decode(b) for b in data_body]
    if len(samples) % n_channels != 0:
        raise ValueError("wav: data length not a whole number of frames")
    return sample_rate, n_channels, samples
