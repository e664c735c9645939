"""Property tests: batched window resampler vs scipy.interp1d reference
semantics (processdata.py:56-83)."""

import numpy as np
from scipy.interpolate import interp1d

from mrgan_tpu.ops import resample


def _ragged_stream(rng, n, jitter=0.3):
    t = np.cumsum(rng.uniform(1 - jitter, 1 + jitter, n)) * 0.01
    v = np.cumsum(rng.randn(n)) * 0.1
    return t, v


def _reference_window(t, v, impact, pre, post, num_out):
    """Literal transcription of processdata.py:56-60."""
    pre_idx = np.argmax(t > impact - pre)
    post_idx = len(t) if t[-1] <= impact + post else np.argmax(t > impact + post)
    grid = np.linspace(t[pre_idx], t[post_idx - 1], num=num_out, endpoint=True)
    return interp1d(t[pre_idx:post_idx], v[pre_idx:post_idx])(grid), grid


def test_window_resample_matches_scipy():
    rng = np.random.RandomState(42)
    num_out = 400
    lengths = [900, 1000, 950, 1000]
    ts, vs = [], []
    for n in lengths:
        t, v = _ragged_stream(rng, n)
        ts.append(t)
        vs.append(v)
    t_pad, v_pad, mask = resample.make_padded(vs, ts)
    impact = np.array([t[len(t) // 3] for t in ts])

    got, got_grid = resample.window_resample(
        t_pad, v_pad.astype(np.float64), mask, impact, 0.1, 4.0, num_out
    )
    got = np.asarray(got)
    for i in range(len(lengths)):
        want, want_grid = _reference_window(ts[i], vs[i], impact[i], 0.1, 4.0, num_out)
        np.testing.assert_allclose(np.asarray(got_grid)[i], want_grid, rtol=1e-5)
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-4)


def test_window_resample_stream_ends_before_post():
    # When the stream ends before impact+post, reference takes the whole tail
    rng = np.random.RandomState(7)
    t, v = _ragged_stream(rng, 500)
    impact = t[400]  # only ~1s of tail left, post=4s
    t_pad, v_pad, mask = resample.make_padded([v], [t])
    got, _ = resample.window_resample(
        t_pad, v_pad.astype(np.float64), mask, np.array([impact]), 0.1, 4.0, 100
    )
    want, _ = _reference_window(t, v, impact, 0.1, 4.0, 100)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-3, atol=1e-4)


def test_window_resample_padded_row_window_reaches_stream_end():
    # Regression: a PADDED row (>=2 pad entries) whose window reaches the
    # stream end used to return 0 for the final grid point — jnp.interp's
    # dx==0 branch landed on the zero pad VALUE at the duplicated pad
    # times. The true value is the last real sample (scipy endpoint).
    t = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    v = np.array([3.0, 4.0, 5.0, 6.0, 7.0])
    t_long = np.linspace(0.0, 7.0, 8)  # forces >=2 pad entries on row 0
    v_long = np.zeros(8)
    t_pad, v_pad, mask = resample.make_padded(
        [v, v_long], [t, t_long], dtype=np.float64
    )
    impact = np.array([1.0, 1.0])
    got, _ = resample.window_resample(t_pad, v_pad, mask, impact, 0.1, 10.0, 5)
    want, _ = _reference_window(t, v, impact[0], 0.1, 10.0, 5)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-6)
    assert want[-1] == 7.0

    # Centered variant on a padded row (in the reference's domain the
    # centered window always ends strictly before the stream end, so the
    # pad clamp is defensive there — but the padded row must still match
    # the reference transcription exactly).
    got_c, _ = resample.window_resample_centered(
        t_pad, v_pad, mask, impact, 1.5, 5
    )
    pre_i = np.argmax(t > impact[0] - 1.5)
    post_i = np.argmax(t > impact[0] + 1.5)
    grid_c = np.linspace(t[pre_i + 1], t[post_i - 1], 5)
    want_c = interp1d(t[pre_i:post_i], v[pre_i:post_i])(grid_c)
    np.testing.assert_allclose(np.asarray(got_c)[0], want_c, rtol=1e-6)


def test_window_resample_centered_matches_scipy():
    rng = np.random.RandomState(3)
    n = 20000
    t = np.cumsum(rng.uniform(0.8, 1.2, n)) / 44000.0
    v = rng.randn(n)
    impact = t[n // 2]
    half = 0.1  # contactAccelLength/2 for the 0.2s config
    num_out = 9600

    pre_idx = np.argmax(t > impact - half)
    post_idx = np.argmax(t > impact + half)
    grid = np.linspace(t[pre_idx + 1], t[post_idx - 1], num=num_out, endpoint=True)
    want = interp1d(t[pre_idx:post_idx], v[pre_idx:post_idx])(grid)

    t_pad, v_pad, mask = resample.make_padded([v], [t], dtype=np.float64)
    got, _ = resample.window_resample_centered(
        t_pad, v_pad.astype(np.float64), mask, np.array([impact]), half, num_out
    )
    # f32 lerp of 44kHz streams: window-relative times keep error ~1e-3,
    # far below the ADC noise floor; exact parity is checked under x64 below.
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=0, atol=1e-2)

    import jax

    with jax.enable_x64():
        got64, _ = resample.window_resample_centered(
            t_pad, v_pad.astype(np.float64), mask, np.array([impact]), half, num_out
        )
        np.testing.assert_allclose(np.asarray(got64)[0], want, rtol=1e-9, atol=1e-9)


def test_first_deriv_matches_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(400)
    t = np.cumsum(rng.uniform(0.5, 1.5, 400))

    # mr_svm.py:15-20
    dx = np.zeros(np.shape(x), float)
    dx[0:-1] = np.diff(x, axis=0) / np.diff(t, axis=0)
    dx[-1] = (x[-1] - x[-2]) / (t[-1] - t[-2])

    got = np.asarray(resample.first_deriv(x, t))
    np.testing.assert_allclose(got, dx, rtol=1e-3, atol=1e-4)
