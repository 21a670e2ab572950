"""MP3 frame-header PROBE (pure stdlib) — the ffprobe-style metadata
pass an audio-curation pipeline runs before deciding what to
transcode. This is deliberately NOT a decoder: MPEG-1 Layer III audio
reconstruction (huffman + IMDCT + polyphase synthesis) stays outside
the subset, and the module says so — the probe walks the frame
headers, which is what duration/bitrate bookkeeping actually needs.

Subset (honest ValueError outside it): MPEG-1 Layer III frames,
optional leading ID3v2 tag (skipped via its syncsafe size), constant
or variable bitrate, padding bit honored. MPEG-2/2.5 and Layers I/II
raise. Emits per-file (n_frames, sample_rate, bitrate mode, total
duration) — every field integer-exact from the header tables.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table (kbps); index 0 = "free" (raise),
# 15 = invalid
BITRATES = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
            224, 256, 320, None)
SAMPLE_RATES = (44100, 48000, 32000, None)
SAMPLES_PER_FRAME = 1152


def build_mp3(frames: list, sample_rate: int = 44100,
              id3_size: int = 0) -> bytes:
    """Build a headers-valid MP3 stream: ``frames`` is a list of
    bitrate-kbps values (one frame each, zero-filled payloads);
    ``id3_size`` prepends an ID3v2 tag of that payload size."""
    sr_idx = SAMPLE_RATES.index(sample_rate)
    out = bytearray()
    if id3_size:
        out += b"ID3\x04\x00\x00"
        out += bytes(((id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
                      (id3_size >> 7) & 0x7F, id3_size & 0x7F))
        out += bytes(id3_size)
    for i, kbps in enumerate(frames):
        br_idx = BITRATES.index(kbps)
        padding = i % 2                      # exercise the pad bit
        size = (144 * kbps * 1000) // sample_rate + padding
        hdr = bytes((
            0xFF,
            0xFB,                            # MPEG-1, Layer III, no CRC
            (br_idx << 4) | (sr_idx << 2) | (padding << 1),
            0x00))
        out += hdr + bytes(size - 4)
    return bytes(out)


def probe_mp3(data: bytes) -> tuple:
    """-> (n_frames, sample_rate, min_kbps, max_kbps, duration_ms)."""
    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("mp3: truncated ID3 header")
        size = ((data[6] << 21) | (data[7] << 14) | (data[8] << 7)
                | data[9])
        pos = 10 + size
    n = 0
    rate = None
    kmin = kmax = None
    while pos + 4 <= len(data):
        h = data[pos:pos + 4]
        if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
            raise ValueError(f"mp3: lost frame sync at {pos}")
        version = (h[1] >> 3) & 0x03
        layer = (h[1] >> 1) & 0x03
        if version != 0b11 or layer != 0b01:
            raise ValueError("mp3: subset is MPEG-1 Layer III")
        br_idx = h[2] >> 4
        sr_idx = (h[2] >> 2) & 0x03
        padding = (h[2] >> 1) & 0x01
        kbps = BITRATES[br_idx]
        sr = SAMPLE_RATES[sr_idx]
        if kbps is None or sr is None:
            raise ValueError("mp3: free/invalid bitrate or rate")
        if rate is None:
            rate = sr
        elif sr != rate:
            raise ValueError("mp3: sample rate changes mid-stream")
        size = (144 * kbps * 1000) // sr + padding
        if pos + size > len(data):
            raise ValueError("mp3: truncated final frame")
        kmin = kbps if kmin is None else min(kmin, kbps)
        kmax = kbps if kmax is None else max(kmax, kbps)
        n += 1
        pos += size
    if n == 0:
        raise ValueError("mp3: no frames")
    duration_ms = n * SAMPLES_PER_FRAME * 1000 // rate
    return n, rate, kmin, kmax, duration_ms
