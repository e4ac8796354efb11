"""Property-based tests (hypothesis) for the pure-Python codec seams —
the parts whose correctness the SQL oracles can only spot-check."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from amazonbigdata_for_students_spark.functions.multimodal import (
    PpmDecoder,
    WavDecoder,
    synth_ppm,
    synth_wav,
)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=80),
    h=st.integers(min_value=1, max_value=60),
    seed=st.binary(min_size=1, max_size=64),
)
def test_ppm_roundtrip_any_size(w, h, seed):
    stats = PpmDecoder().decode_ppm_stats(synth_ppm(w, h, seed))
    need = w * h * 3
    assert stats == (w, h, sum((seed * (need // len(seed) + 1))[:need]))


@settings(max_examples=30, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    ch=st.integers(min_value=1, max_value=2),
    frames=st.integers(min_value=1, max_value=500),
    seed=st.binary(min_size=1, max_size=32),
)
def test_wav_roundtrip_any_shape(rate, ch, frames, seed):
    got = WavDecoder().decode_wav_stats(synth_wav(rate, ch, frames, seed))
    assert got == (rate, ch, (frames * 1000) // rate)
