"""Property-based tests (hypothesis) for the pure kernels.

These cover the math the Spark plans delegate to: PSI/KS properties,
Savitzky-Golay polynomial reproduction, and content-addressing stability
— fast, driverless, no SparkSession needed.
"""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from anomaly_detector_spark.checks.base import check_id
from anomaly_detector_spark.checks.drift import psi_ks
from anomaly_detector_spark.operators.windows import savgol_coeffs

counts = st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=40)


@given(counts)
@settings(max_examples=200, deadline=None)
def test_psi_ks_identical_distributions_score_zero(obs):
    psi, ks = psi_ks(obs, obs)
    assert abs(psi) < 1e-12
    assert abs(ks) < 1e-12


@given(counts, counts)
@settings(max_examples=200, deadline=None)
def test_psi_nonnegative_ks_bounded(a, b):
    if len(a) != len(b):
        n = min(len(a), len(b))
        a, b = a[:n], b[:n]
    psi, ks = psi_ks(a, b)
    assert psi >= -1e-12  # PSI is a KL-symmetrization: nonnegative
    assert -1e-12 <= ks <= 1.0 + 1e-12


@given(counts, st.integers(min_value=1, max_value=7))
@settings(max_examples=100, deadline=None)
def test_psi_scale_invariant(obs, k):
    # multiplying all counts by a constant leaves the distribution, and
    # (up to Laplace smoothing, negligible at large totals) the score,
    # nearly unchanged
    obs = [(c + 1) * 100 for c in obs]  # avoid all-zero / tiny totals
    psi1, ks1 = psi_ks(obs, [c * k for c in obs])
    assert psi1 < 0.01 and ks1 < 0.01


@given(
    st.integers(min_value=1, max_value=4),
    st.lists(st.floats(min_value=-5, max_value=5), min_size=5, max_size=5),
)
@settings(max_examples=100, deadline=None)
def test_savgol_reproduces_polynomials(half, coefs):
    # a Savitzky-Golay filter of polyorder p reproduces any degree<=p
    # polynomial exactly at the window center
    win = 2 * half + 1
    poly = min(win - 1, 4)
    c = np.asarray(savgol_coeffs(win, poly))
    x = np.arange(-half, half + 1, dtype=float)
    y = sum(coefs[d] * x**d for d in range(poly + 1))
    assert np.isclose(np.dot(c, y), float(coefs[0]), atol=1e-6 * (1 + abs(coefs[0])))


@given(st.dictionaries(st.text(max_size=10), st.integers() | st.text(max_size=10), max_size=5))
@settings(max_examples=200, deadline=None)
def test_check_id_stable_and_order_insensitive(cfg):
    a = check_id("stats", cfg)
    b = check_id("stats", dict(reversed(list(cfg.items()))))
    assert a == b and len(a) == 64
    assert check_id("other", cfg) != a


@given(
    st.lists(
        st.floats(min_value=0.0, max_value=20.0, allow_nan=False), min_size=0, max_size=120
    ),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=5),
)
@settings(max_examples=300, deadline=None)
def test_extract_loads_series_matches_reference_replay(values, end_count, lookback):
    # the vectorized per-load scan must equal the reference's per-row
    # state machine (/root/reference/algo/load_device.py:8-34) on any
    # series and any (end_count, lookback) parameterization; trim is
    # tied to end_count exactly as in the reference (new_load[:-10] with
    # len(end_check) > 10)
    from anomaly_detector_spark.operators.loads import extract_loads_series

    start_thresh, end_thresh, trim = 10.0, 1.5, end_count

    def reference(ts):
        out, new_load, end_check = [], [], []
        active = False
        for i in range(len(ts)):
            if active:
                new_load.append(i)
                if ts[i] < end_thresh:
                    end_check.append(i)
                if len(end_check) > end_count:
                    active = False
                    out.append(new_load[:-trim] if trim else new_load)
                    new_load, end_check = [], []
            else:
                if ts[i] > start_thresh:
                    active = True
                    new_load.append(max(0, i - lookback))
        return out

    got = [m for (_s, _t, _e, m) in extract_loads_series(
        values, start_thresh, end_thresh, end_count, lookback, trim
    )]
    assert got == reference(values)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=12), max_size=60),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_topk_stream_intervals_always_bracket_truth(batches, k):
    # The SpaceSaving soundness argument, adversarially: for ANY
    # micro-batch split and ANY k, every item the replayed stream
    # reports satisfies est <= true <= upper, est ordering is
    # non-increasing, and with no truncation anywhere the intervals
    # collapse to the exact counts.
    from collections import Counter

    from anomaly_detector_spark.streaming.topk import replay_topk_stream

    items = [[f"i{v}" for v in b] for b in batches]
    true = Counter(v for b in items for v in b)
    rep = replay_topk_stream(items, k=k)
    ests = [e for _, _, e, _ in rep]
    assert ests == sorted(ests, reverse=True)
    for _rank, it, est, upper in rep:
        assert est <= true[it] <= upper
    if len(true) <= k:  # never truncated: exact mode
        assert {it: est for _, it, est, _ in rep} == {
            it: c for it, c in true.items() if it in {i for _, i, _, _ in rep}
        }
        assert all(est == upper for _, _, est, upper in rep)


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            min_size=1,
            max_size=80,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=100, deadline=None)
def test_quantile_stream_replay_estimates_within_range(batches):
    # Any split, any values: the replayed stream's p0/p50/p100 estimates
    # stay within [min, max] of everything delivered, and p0/p100 hit
    # the exact extremes (t-digest keeps boundary centroids singleton-
    # weighted at the ends via interpolation clamping).
    from anomaly_detector_spark.streaming.quantiles import replay_quantile_stream

    _, _, est = replay_quantile_stream(batches, qs=[0.0, 0.5, 1.0])
    all_vals = [v for b in batches for v in b]
    # estimates are rounded to 6dp, so allow that much slack at the edges
    lo, hi = min(all_vals) - 1e-6, max(all_vals) + 1e-6
    assert lo <= est[0.5] <= hi
    assert lo <= est[0.0] and est[1.0] <= hi


@given(
    st.binary(min_size=1, max_size=200),
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=300, deadline=None)
def test_dhash_one_byte_edit_bounded_hamming(payload, pos_seed, new_byte):
    # The property that makes dHash a NEAR-dup hash: a one-byte edit
    # flips at most the two comparisons adjacent to the edited byte —
    # hamming <= 2 for n >= 64, relaxing to 2*ceil(64/n) under
    # wraparound for shorter payloads. Also pins signed-64 range and
    # determinism.
    import math

    from anomaly_detector_spark.operators.multimodal import _sniff_modality, dhash64

    n = len(payload)
    pos = pos_seed % n
    edited = payload[:pos] + bytes([new_byte]) + payload[pos + 1 :]
    # the property is about the BYTE path: payloads carrying a container
    # magic dispatch to a decoder (and return NULL when undecodable)
    assume(_sniff_modality(payload) is None and _sniff_modality(edited) is None)
    a, b = dhash64(payload), dhash64(edited)
    assert a == dhash64(payload)  # deterministic
    assert -(1 << 63) <= a < (1 << 63)
    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham <= 2 * math.ceil(64 / n)
    if payload == edited:
        assert ham == 0


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=10_000),
    codec=st.sampled_from(["bmp", "ppm", "png"]),
)
def test_codec_round_trip_property(w, h, seed, codec):
    # any dims, any pixels, all three containers: decode(encode(px)) == px
    import random as _random

    from anomaly_detector_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_png,
        encode_ppm,
    )

    enc = {"bmp": encode_bmp, "ppm": encode_ppm, "png": encode_png}[codec]
    rng = _random.Random(seed)
    px = [rng.randrange(256) for _ in range(w * h)]
    assert decode_image(enc(w, h, px)) == (w, h, px)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    pos=st.integers(min_value=0, max_value=71),
    delta=st.integers(min_value=1, max_value=255),
)
def test_pixel_dhash_single_edit_bound_property(seed, pos, delta):
    # one edited pixel on a 9x8 image flips at most the two adjacent
    # row comparisons -> hamming <= 2, for ANY edit anywhere
    import random as _random

    from anomaly_detector_spark.operators.multimodal import dhash64_pixels

    rng = _random.Random(seed)
    px = [rng.randrange(256) for _ in range(72)]
    edited = list(px)
    edited[pos] = (edited[pos] + delta) % 256
    ham = bin(
        (dhash64_pixels(9, 8, px) ^ dhash64_pixels(9, 8, edited)) & ((1 << 64) - 1)
    ).count("1")
    assert ham <= 2


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=200),
    seed=st.integers(min_value=0, max_value=10_000),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_round_trip_property(n, seed, rate):
    import random as _random

    from anomaly_detector_spark.operators.multimodal import decode_audio, encode_wav

    rng = _random.Random(seed)
    s = [rng.randrange(-32768, 32768) for _ in range(n)]
    assert decode_audio(encode_wav(rate, s)) == (rate, s)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=12),
    n_frames=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_gif_round_trip_property(w, h, n_frames, seed):
    import random as _random

    from anomaly_detector_spark.operators.multimodal import decode_video, encode_gif

    rng = _random.Random(seed)
    frames = [[rng.randrange(256) for _ in range(w * h)] for _ in range(n_frames)]
    assert decode_video(encode_gif(w, h, frames)) == (w, h, frames)
