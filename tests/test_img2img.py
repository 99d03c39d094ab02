"""DDIM encode / stochastic_encode / decode (ddim.py:245-326 parity).

Numpy replicas of the reference loops (including the encode loop-index
timestep quirk) + the exact encode->decode inversion property.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one2345_tpu.diffusion.img2img import ddim_decode, ddim_encode, stochastic_encode
from one2345_tpu.diffusion.schedule import make_ddim_schedule

SCHED = make_ddim_schedule(10, eta=0.0)
SCHED_ETA = make_ddim_schedule(10, eta=1.0)
RNG = np.random.default_rng(0)
X0 = jnp.asarray(RNG.normal(size=(2, 4, 4, 3)).astype(np.float32))


def toy_eps(x, t):
    # depends on x AND t so ordering/timestep bugs can't cancel
    return 0.1 * x + 0.01 * jnp.asarray(t, jnp.float32)


def reference_encode_numpy(eps_fn, x0, sched, t_enc):
    """Literal numpy transcription of ddim.py:245-290."""
    asc_alphas = np.asarray(sched.alphas[::-1], np.float64)
    asc_alphas_prev = np.asarray(sched.alphas_prev[::-1], np.float64)
    alphas_next = asc_alphas[:t_enc]
    alphas = asc_alphas_prev[:t_enc]
    x = np.asarray(x0, np.float64)
    for i in range(t_enc):
        e = np.asarray(eps_fn(jnp.asarray(x, jnp.float32), i), np.float64)
        xw = np.sqrt(alphas_next[i] / alphas[i]) * x
        we = np.sqrt(alphas_next[i]) * (
            np.sqrt(1.0 / alphas_next[i] - 1.0) - np.sqrt(1.0 / alphas[i] - 1.0)
        ) * e
        x = xw + we
    return x


def reference_decode_numpy(eps_fn, x, sched, t_start):
    """Literal numpy transcription of ddim.py:308-326 + p_sample_ddim
    (eta=0, no noise)."""
    asc_ts = np.asarray(sched.timesteps[::-1])
    asc_a = np.asarray(sched.alphas[::-1], np.float64)
    asc_ap = np.asarray(sched.alphas_prev[::-1], np.float64)
    asc_s1m = np.asarray(sched.sqrt_one_minus_alphas[::-1], np.float64)
    timesteps = asc_ts[:t_start]
    x = np.asarray(x, np.float64)
    total = len(timesteps)
    for i, step in enumerate(timesteps[::-1]):
        idx = total - i - 1
        e = np.asarray(eps_fn(jnp.asarray(x, jnp.float32), int(step)), np.float64)
        pred_x0 = (x - asc_s1m[idx] * e) / np.sqrt(asc_a[idx])
        dir_xt = np.sqrt(1.0 - asc_ap[idx]) * e
        x = np.sqrt(asc_ap[idx]) * pred_x0 + dir_xt
    return x


@pytest.mark.parametrize("t_enc", [1, 4, 10])
def test_encode_matches_reference_loop(t_enc):
    got = ddim_encode(toy_eps, X0, SCHED, t_enc)
    want = reference_encode_numpy(toy_eps, X0, SCHED, t_enc)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("t_start", [1, 4, 10])
def test_decode_matches_reference_loop(t_start):
    got = ddim_decode(toy_eps, X0, SCHED, t_start)
    want = reference_decode_numpy(toy_eps, X0, SCHED, t_start)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_stochastic_encode_formula():
    noise = jnp.asarray(RNG.normal(size=X0.shape).astype(np.float32))
    asc_a = np.asarray(SCHED.alphas[::-1], np.float64)
    for t in [0, 3, 9]:
        got = stochastic_encode(X0, t, SCHED, noise)
        want = np.sqrt(asc_a[t]) * np.asarray(X0) + np.sqrt(1 - asc_a[t]) * np.asarray(
            noise
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    # batched t: per-sample levels
    tb = jnp.asarray([2, 7])
    got = stochastic_encode(X0, tb, SCHED, noise)
    for b, t in enumerate([2, 7]):
        want = np.sqrt(asc_a[t]) * np.asarray(X0[b]) + np.sqrt(
            1 - asc_a[t]
        ) * np.asarray(noise[b])
        np.testing.assert_allclose(np.asarray(got[b]), want, rtol=1e-4, atol=1e-5)


def test_encode_decode_roundtrip_constant_eps():
    # with eps independent of (x, t) the DDIM update is exactly invertible;
    # the encode timestep quirk is invisible -> decode(encode(x)) == x
    const = jnp.asarray(RNG.normal(size=X0.shape).astype(np.float32))

    def eps_fn(x, t):
        return const

    for t in [1, 5, 10]:
        enc = ddim_encode(eps_fn, X0, SCHED, t)
        dec = ddim_decode(eps_fn, enc, SCHED, t)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(X0), rtol=1e-3, atol=1e-4)
    # and the noising is real: the encoded latent differs from x0
    enc = ddim_encode(eps_fn, X0, SCHED, 10)
    assert float(jnp.abs(enc - X0).max()) > 0.1


def test_decode_eta_noise_keyed_and_bounded():
    key = jax.random.key(0)
    a = ddim_decode(toy_eps, X0, SCHED_ETA, 10, key=key)
    b = ddim_decode(toy_eps, X0, SCHED_ETA, 10, key=key)
    c = ddim_decode(toy_eps, X0, SCHED_ETA, 10, key=jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).max()) > 1e-4
    assert np.isfinite(np.asarray(a)).all()


def test_jittable():
    f = jax.jit(lambda x: ddim_decode(toy_eps, ddim_encode(toy_eps, x, SCHED, 5), SCHED, 5))
    out = f(X0)
    assert out.shape == X0.shape and np.isfinite(np.asarray(out)).all()


def test_trim_for_sample_and_truncate():
    """DDIMSampler.sample's drop-last slice (ddim.py:136,151): S entries run
    S-1 steps; truncate keeps the LAST t_start sampling steps."""
    from one2345_tpu.diffusion.ddim import trim_for_sample, truncate_schedule

    sched = make_ddim_schedule(75)
    trimmed = trim_for_sample(sched)
    assert sched.num_steps == 77 and trimmed.num_steps == 76
    assert trimmed.timesteps[0] == 976  # 989 dropped
    np.testing.assert_array_equal(trimmed.timesteps, sched.timesteps[1:])
    np.testing.assert_array_equal(trimmed.alphas, sched.alphas[1:])

    tr = truncate_schedule(sched, 10)
    np.testing.assert_array_equal(tr.timesteps, sched.timesteps[-10:])
    for bad in (0, 78):
        with pytest.raises(ValueError):
            truncate_schedule(sched, bad)


def test_img2img_refuses_trimmed_schedules():
    """encode/decode assume the UNTRIMMED construction-order schedule
    (reference ddim.py:245-326 lacks the sample() drop-last quirk); feeding
    them a trim_for_sample'd one (e.g. Zero123Stage._schedule) must be a
    loud error, not a silent one-step divergence."""
    from one2345_tpu.diffusion.ddim import trim_for_sample, truncate_schedule

    trimmed = trim_for_sample(SCHED)
    with pytest.raises(ValueError, match="UNTRIMMED"):
        ddim_encode(toy_eps, X0, trimmed, 5)
    with pytest.raises(ValueError, match="UNTRIMMED"):
        ddim_decode(toy_eps, X0, trimmed, 5)
    # the flag survives truncation, so a truncated-trimmed schedule is
    # refused too
    assert truncate_schedule(trimmed, 5).trimmed is True
