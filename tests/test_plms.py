"""PLMS sampler tests."""

import jax.numpy as jnp
import numpy as np

from one2345_tpu.diffusion.plms import plms_sample
from one2345_tpu.diffusion.schedule import make_ddim_schedule


def test_plms_zero_eps_telescopes():
    """With eps == 0 every update is x *= sqrt(a_prev/a_t): the loop
    telescopes to x * sqrt(a_last_prev / a_first)."""
    sched = make_ddim_schedule(10, eta=0.0)
    x = jnp.ones((2, 4, 4, 3))
    out = plms_sample(lambda x, t: jnp.zeros_like(x), x, sched)
    expected = np.sqrt(sched.alphas_prev[-1] / sched.alphas[0])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_plms_linear_model_finite():
    sched = make_ddim_schedule(20, eta=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 4)), jnp.float32)
    out = plms_sample(lambda x, t: 0.3 * x, x, sched)
    o = np.asarray(out)
    assert o.shape == x.shape and np.isfinite(o).all()
