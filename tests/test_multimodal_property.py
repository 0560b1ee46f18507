"""Property tests for the pure multimodal kernels: box-mean resize and
the AVI container round-trip (no Spark session needed)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_arrow_spark.operators.multimodal import (
    _resize_rgb,
    decode_avi,
    decode_bmp,
    encode_avi,
    encode_bmp,
)

DIM = st.integers(1, 24)


@settings(max_examples=120, deadline=None)
@given(DIM, DIM, DIM, DIM, st.integers(0, 255))
def test_resize_constant_stays_constant(w, h, ow, oh, val):
    rgb = bytes([val] * (w * h * 3))
    out = _resize_rgb(w, h, rgb, ow, oh)
    assert len(out) == ow * oh * 3
    assert set(out) == {val}


@settings(max_examples=120, deadline=None)
@given(DIM, DIM, st.randoms(use_true_random=False))
def test_resize_to_1x1_is_global_mean(w, h, rng):
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    out = _resize_rgb(w, h, rgb, 1, 1)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    expect = np.floor(a.mean(axis=0) + 0.5).astype(int)
    assert list(out) == list(expect)


@settings(max_examples=120, deadline=None)
@given(DIM, DIM, st.randoms(use_true_random=False))
def test_resize_identity_when_same_dims(w, h, rng):
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert _resize_rgb(w, h, rgb, w, h) == rgb


@settings(max_examples=60, deadline=None)
@given(DIM, DIM, st.integers(1, 5), st.randoms(use_true_random=False))
def test_avi_round_trip(w, h, n_frames, rng):
    frames = [
        bytes(rng.randrange(256) for _ in range(w * h * 3))
        for _ in range(n_frames)
    ]
    got_w, got_h, _fps, out = decode_avi(encode_avi(frames, w, h))
    assert (got_w, got_h) == (w, h) and out == frames


@settings(max_examples=60, deadline=None)
@given(DIM, DIM, st.randoms(use_true_random=False))
def test_bmp_round_trip(w, h, rng):
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    got_w, got_h, out = decode_bmp(encode_bmp(w, h, rgb))
    assert (got_w, got_h) == (w, h) and out == rgb
