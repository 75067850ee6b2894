# -*- coding: utf-8 -*-
"""Deterministic fuzz: malformed subtitle bytes must fail *cleanly*.

The reference leans on third-party parsers (srt, pysubs2) for robustness;
the in-tree parsers carry that burden themselves, so garbage input is pinned
to either parse (possibly to zero cues) or raise one of the clean,
user-facing exception types — never an internal IndexError/KeyError/etc.
"""
import io
import logging
import zlib

import numpy as np
import pytest

from ffsubsync_tpu.subs.parser import make_subtitle_parser

# exception surface a caller (sync.py's per-srtin isolation) may see;
# NotImplementedError is reference-parity for unsupported .sub content
CLEAN = (ValueError, UnicodeDecodeError, NotImplementedError)

FRAGMENTS = [
    b"1\n",
    b"00:00:0",
    b"5,000 --> ",
    b"00:0x:07,500\n",
    b"Hello\n\n",
    b"NOTE x\n",
    b"WEBVTT\n\n",
    b"[Script Info]\n",
    b"Dialogue: 0,0:00:aa.00,",
    b"{1}{50}",
    b"-->",
    b"\xff\xfe",
    b"99:99:99,999 --> 00:00:00,000\n",
    b"\n\n\n",
    b"2\n00:00:12,250 --> 00:00:15,000\nOK\n\n",
]


@pytest.mark.parametrize("fmt", ["srt", "ass", "ssa", "vtt", "sub"])
def test_random_bytes_fail_cleanly(fmt, caplog):
    rng = np.random.RandomState(zlib.crc32(fmt.encode()) % (2**31))
    with caplog.at_level(logging.ERROR):
        for _ in range(40):
            blob = bytes(rng.randint(0, 256, size=rng.randint(1, 1500),
                                     dtype=np.uint8))
            try:
                make_subtitle_parser(fmt, encoding="infer").fit(io.BytesIO(blob))
            except CLEAN:
                pass


@pytest.mark.parametrize("fmt", ["srt", "ass", "ssa", "vtt", "sub"])
def test_malformed_fragments_fail_cleanly(fmt):
    rng = np.random.RandomState(0)
    for _ in range(60):
        k = rng.randint(1, 12)
        blob = b"".join(
            FRAGMENTS[i] for i in rng.randint(0, len(FRAGMENTS), size=k)
        )
        try:
            make_subtitle_parser(fmt, encoding="infer").fit(io.BytesIO(blob))
        except CLEAN:
            pass


def test_wav_header_fuzz_fails_cleanly(tmp_path):
    """Corrupted RIFF headers must raise WavFormatError/ValueError/OSError —
    never an internal IndexError/struct.error — through the whole read."""
    import struct

    from ffsubsync_tpu.media.wav import WavFormatError, WavReader, is_wav_file

    rng = np.random.RandomState(1)
    data = (rng.randn(8000) * 3000).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    blob0 = hdr + data
    path = str(tmp_path / "f.wav")
    for _ in range(120):
        blob = bytearray(blob0)
        for _ in range(rng.randint(1, 8)):
            blob[rng.randint(0, 64)] = rng.randint(0, 256)
        with open(path, "wb") as f:
            f.write(bytes(blob))
        if not is_wav_file(path):
            continue
        try:
            list(WavReader(path).iter_chunks(target_rate=8000))
        except (WavFormatError, ValueError, OSError):
            pass
