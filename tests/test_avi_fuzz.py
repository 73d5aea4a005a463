"""Decoder poison-pill hardening (no Spark session needed — the parsers are
pure Python and run inside executor tasks, where an uncaught exception or a
blown recursion limit kills the task; at ingest scale every malformed
payload class WILL occur).

* fuzz: arbitrary bytes — raw, RIFF/AVI-prefixed, and mutations of a valid
  clip — must decode to None-or-valid, never raise;
* crafted: thousands of nested LIST headers (the recursion bomb) must be
  treated as undecodable, not blow sys.getrecursionlimit();
* the stub contract holds for every payload: _video_frames_stub returns a
  well-formed frame list for anything except the b'REAL' marker.
"""

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from amharic_ecommerce_data_extractor_spark.operators.multimodal import (
    _parse_avi_rgb,
    _video_frames_stub,
    make_avi,
)


def _assert_parse_contract(payload: bytes):
    out = _parse_avi_rgb(payload)
    if out is not None:
        w, h, n, frames = out
        assert 0 < w <= 16384 and 0 < h <= 16384 and n == len(frames) > 0
        for fr in frames:
            assert fr.shape == (h, w, 3) and fr.dtype == np.uint8


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_fuzz_raw_bytes_never_raise(payload):
    _assert_parse_contract(payload)
    if not payload.startswith(b"REAL"):
        frames = _video_frames_stub(payload, every_n=30)
        assert frames and all(len(t) == 5 for t in frames)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_fuzz_riff_avi_prefixed_never_raise(body):
    _assert_parse_contract(b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 10_000), st.binary(min_size=1, max_size=4))
def test_fuzz_mutated_valid_clip_never_raises(offset, junk):
    frames = [np.full((4, 6, 3), 7 * i, dtype=np.uint8) for i in range(3)]
    clip = bytearray(make_avi(frames, 6, 4))
    off = offset % len(clip)
    clip[off:off + len(junk)] = junk
    _assert_parse_contract(bytes(clip))


def test_recursion_bomb_is_undecodable_not_fatal():
    # 5000 nested LISTs: each header is LIST + size + 4-byte type tag
    depth = 5000
    inner = b""
    for _ in range(depth):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"nest" + inner
    bomb = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    assert _parse_avi_rgb(bomb) is None  # depth-capped, no RecursionError
    # and the stub falls back deterministically
    frames = _video_frames_stub(bomb, every_n=30)
    assert frames and frames == _video_frames_stub(bomb, every_n=30)


def test_valid_clip_still_decodes_after_hardening():
    frames = [np.full((4, 6, 3), 50, dtype=np.uint8)]
    w, h, n, decoded = _parse_avi_rgb(make_avi(frames, 6, 4))
    assert (w, h, n) == (6, 4, 1)
    assert np.array_equal(decoded[0], frames[0])
