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


@given(n=st.integers(min_value=1, max_value=5000), k=st.integers(min_value=1, max_value=16))
@settings(max_examples=200, deadline=None)
def test_closed_form_ntile_formula(n, k):
    """curriculum_stage_assign's distributed decomposition relies on the
    closed-form rank->bucket formula reproducing SQL ntile(k) exactly:
    first n%k buckets get one extra row. Checked against the definition
    for arbitrary (n, k) — including n < k, where ntile gives each of the
    first n buckets exactly one row."""
    base, rem = divmod(n, k)
    # reference assignment per the SQL-standard ntile definition
    expect = []
    for b in range(1, k + 1):
        size = base + (1 if b <= rem else 0)
        expect.extend([b] * size)
    # the closed-form used in the Spark plan
    cut = rem * (base + 1)
    got = []
    for r in range(1, n + 1):
        if base == 0:
            got.append(r)
        elif r <= cut:
            got.append((r - 1) // (base + 1) + 1)
        else:
            got.append(rem + (r - 1 - cut) // base + 1)
    assert got == expect
