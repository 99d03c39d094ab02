"""DPM-Solver++(2M) sampler tests.

The solver discretizes the same probability-flow ODE as DDIM(eta=0), one
order higher — so it must (a) reduce exactly to DDIM when every step is
first-order, (b) converge to the same ODE solution with smaller error at
matched step counts, and (c) run through the full Zero123 sampling path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.diffusion.dpm_solver import dpmpp_sample
from one2345_tpu.diffusion.schedule import make_ddim_schedule


def ddim_eta0_sample(eps_fn, x, sched):
    """Reference first-order loop (the eta=0 branch of zero123.py's
    _sample_views_jit, ddim.py:186-243 semantics)."""
    for i in range(len(sched.timesteps)):
        t = sched.timesteps[i]
        a_t, a_prev = sched.alphas[i], sched.alphas_prev[i]
        e_t = eps_fn(x, t)
        pred_x0 = (x - sched.sqrt_one_minus_alphas[i] * e_t) / np.sqrt(a_t)
        x = np.sqrt(a_prev) * pred_x0 + np.sqrt(1.0 - a_prev) * e_t
    return x


def test_dpmpp_zero_eps_telescopes():
    """With eps == 0 the x0 estimate is constant, so every step (first- and
    second-order alike) telescopes to x * sqrt(a_last_prev / a_first)."""
    sched = make_ddim_schedule(10, eta=0.0)
    x = jnp.ones((2, 4, 4, 3))
    out = dpmpp_sample(lambda x, t: jnp.zeros_like(x), x, sched)
    expected = np.sqrt(sched.alphas_prev[-1] / sched.alphas[0])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_dpmpp_two_steps_equals_ddim_exactly():
    """At S=2 both steps are forced first-order, and the first-order
    DPM++ update is algebraically identical to a DDIM eta=0 step:
    (sigma_n/sigma_t) x - alpha_n expm1(-h) x0 == alpha_n x0 + sigma_n e."""
    sched = make_ddim_schedule(2, eta=0.0)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(4, 4, 3)) * 0.2, jnp.float32)

    def eps_fn(x, t):
        return 0.3 * x + c

    ours = np.asarray(dpmpp_sample(eps_fn, x0, sched))
    ref = np.asarray(ddim_eta0_sample(eps_fn, np.asarray(x0), sched))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dpmpp_higher_order_than_ddim():
    """Against a near-exact ODE solution (DDIM at 640 steps), DPM++(2M)
    must beat DDIM at every matched step count.  The denoiser is the
    ANALYTIC optimal eps for Gaussian data N(mu, 0.25 I) — affine and
    well-conditioned, so discretization error is the only error."""
    from one2345_tpu.diffusion.schedule import make_beta_schedule

    ac = jnp.asarray(
        np.cumprod(1.0 - make_beta_schedule(1000, 0.00085, 0.0120)), jnp.float32
    )
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.normal(size=(4, 4, 2)), jnp.float32)
    s2 = 0.25

    def eps_fn(x, t):
        a = ac[jnp.asarray(t)]
        return jnp.sqrt(1.0 - a) * (x - jnp.sqrt(a) * mu) / (a * s2 + (1.0 - a))

    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)), jnp.float32)
    truth = np.asarray(
        ddim_eta0_sample(eps_fn, x0, make_ddim_schedule(640, eta=0.0))
    )
    for steps in (8, 16, 32):
        sched = make_ddim_schedule(steps, eta=0.0)
        err_dpm = np.abs(
            np.asarray(dpmpp_sample(eps_fn, x0, sched)) - truth
        ).max()
        err_ddim = np.abs(
            np.asarray(ddim_eta0_sample(eps_fn, x0, sched)) - truth
        ).max()
        assert err_dpm < err_ddim, (steps, err_dpm, err_ddim)
    assert err_dpm < 0.06, err_dpm  # the 32-step run


def test_dpmpp_duplicate_terminal_node_finite():
    """Schedules with S > 500 clip the +1 timestep offset
    (make_ddim_schedule), duplicating the terminal node: h_prev == 0 there
    and the second-order term must drop to first order, not produce
    inf - inf = NaN."""
    sched = make_ddim_schedule(600, eta=0.0)
    assert sched.timesteps[0] == sched.timesteps[1]  # the degenerate pair
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)), jnp.float32)
    out = np.asarray(dpmpp_sample(lambda x, t: 0.1 * x, x0, sched))
    assert np.isfinite(out).all()
    # and it still matches the ODE solution the non-degenerate ladder finds
    ref = np.asarray(
        dpmpp_sample(lambda x, t: 0.1 * x, x0, make_ddim_schedule(500, eta=0.0))
    )
    np.testing.assert_allclose(out, ref, rtol=5e-3, atol=1e-4)


def test_cli_fast_mode_flags():
    """--sampler/--steps land on DiffusionConfig; defaults stay reference."""
    from one2345_tpu.pipeline.cli import build_config, build_parser

    args = build_parser().parse_args(
        ["--img_path", "x.png", "--sampler", "dpmpp", "--steps", "30", "25"]
    )
    cfg = build_config(args)
    assert cfg.diffusion.sampler == "dpmpp"
    assert cfg.diffusion.ddim_steps_stage1 == 30
    assert cfg.diffusion.ddim_steps_stage2 == 25

    default = build_config(build_parser().parse_args(["--img_path", "x.png"]))
    assert default.diffusion.sampler == "ddim"
    assert default.diffusion.ddim_steps_stage1 == 75

    # dpmpp without --steps defaults to the fast-mode 30/25 (NOT 75/50)
    dpmpp = build_config(
        build_parser().parse_args(["--img_path", "x.png", "--sampler", "dpmpp"])
    )
    assert dpmpp.diffusion.ddim_steps_stage1 == 30
    assert dpmpp.diffusion.ddim_steps_stage2 == 25

    # --quant lands on the UNet config; default stays 'none'
    q = build_config(
        build_parser().parse_args(["--img_path", "x.png", "--quant", "int8"])
    )
    assert q.diffusion.unet.quant == "int8"
    assert q.diffusion.ddim_steps_stage1 == 75  # quant alone keeps ref steps
    assert default.diffusion.unet.quant == "none"


def test_unknown_sampler_raises():
    """A sampler typo must raise, not silently run eta-config DDIM (same
    contract as the UNetConfig.quant guard)."""
    import pytest

    from one2345_tpu.pipeline.cli import apply_fast_modes
    from one2345_tpu.core.config import PipelineConfig

    with pytest.raises(ValueError, match="unknown sampler"):
        apply_fast_modes(PipelineConfig(), sampler="dpm++")

    from test_diffusion import tiny_config
    from one2345_tpu.diffusion.zero123 import Zero123Stage

    stage = Zero123Stage(tiny_config(), seed=0)
    img = np.zeros((2, 32, 32, 3), np.float32)
    with pytest.raises(ValueError, match="unknown sampler"):
        stage.sample_views(
            jnp.asarray(img), [0.0, 30.0], [0.0, 90.0], jax.random.key(0),
            steps=2, sampler="DPMPP",
        )


def test_zero123_tiny_sampler_dpmpp():
    """sampler='dpmpp' runs the full conditioning/CFG/decode path, and the
    config-level default (DiffusionConfig(sampler=...)) selects it too."""
    from test_diffusion import tiny_config
    from one2345_tpu.diffusion.zero123 import Zero123Stage

    stage = Zero123Stage(tiny_config(), seed=0)
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    out = stage.sample_views(
        jnp.tile(jnp.asarray(img)[None] * 2.0 - 1.0, (2, 1, 1, 1)),
        [0.0, 30.0], [0.0, 90.0], jax.random.key(1), steps=4,
        sampler="dpmpp",
    )
    o = np.asarray(out)
    assert o.shape == (2, 32, 32, 3)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0

    cfg = tiny_config().replace(sampler="dpmpp")
    stage2 = Zero123Stage(cfg, params=stage.params)
    out2 = stage2.sample_views(
        jnp.tile(jnp.asarray(img)[None] * 2.0 - 1.0, (2, 1, 1, 1)),
        [0.0, 30.0], [0.0, 90.0], jax.random.key(1), steps=4,
    )
    np.testing.assert_array_equal(np.asarray(out2), o)
