"""PLMS (pseudo linear multistep) sampler — alternative to DDIM.

Parity target: ldm/models/diffusion/plms.py (PLMSSampler): eps-history
linear-multistep update with a Heun-style first step; eta must be 0.
Unused by the reference pipeline (run.py uses DDIM) but part of the sampler
surface.  Implemented as a `lax.scan` with a fixed 4-slot eps-history carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from one2345_tpu.diffusion.schedule import DDIMSchedule


def plms_sample(
    eps_fn,
    x: jnp.ndarray,
    sched: DDIMSchedule,
) -> jnp.ndarray:
    """Run the PLMS loop.

    :param eps_fn: (x, t_scalar) -> predicted noise (CFG already folded in)
    :param x: [B, H, W, C] initial noise
    :param sched: DDIM schedule with eta=0 (sigmas all zero)
    """
    consts = jax.tree_util.tree_map(
        jnp.asarray,
        (sched.timesteps, sched.alphas, sched.alphas_prev, sched.sqrt_one_minus_alphas),
    )
    ts_next = jnp.concatenate([consts[0][1:], jnp.zeros((1,), jnp.int32)])

    def x_prev_from(x, e_t, a_t, a_prev, sqrt_1m_a):
        pred_x0 = (x - sqrt_1m_a * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * e_t
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt

    def step(carry, per_step):
        x, hist, n = carry
        (t, a_t, a_prev, sqrt_1m_a), t_next = per_step
        e_t = eps_fn(x, t)

        def first_order():
            # Heun: evaluate eps at the provisional next state
            x_prev0 = x_prev_from(x, e_t, a_t, a_prev, sqrt_1m_a)
            e_t_next = eps_fn(x_prev0, t_next)
            return (e_t + e_t_next) / 2.0

        def multistep():
            e1 = jax.lax.cond(
                n == 1,
                lambda: (3.0 * e_t - hist[0]) / 2.0,
                lambda: jax.lax.cond(
                    n == 2,
                    lambda: (23.0 * e_t - 16.0 * hist[0] + 5.0 * hist[1]) / 12.0,
                    lambda: (
                        55.0 * e_t - 59.0 * hist[0] + 37.0 * hist[1] - 9.0 * hist[2]
                    )
                    / 24.0,
                ),
            )
            return e1

        e_prime = jax.lax.cond(n == 0, first_order, multistep)
        x_new = x_prev_from(x, e_prime, a_t, a_prev, sqrt_1m_a)
        new_hist = jnp.stack([e_t, hist[0], hist[1]])
        return (x_new, new_hist, jnp.minimum(n + 1, 3)), None

    hist0 = jnp.zeros((3,) + x.shape, x.dtype)
    per_step = (tuple(consts), ts_next)
    (x, _, _), _ = jax.lax.scan(step, (x, hist0, jnp.asarray(0)), per_step)
    return x
