"""The DDIM sampling loop as a single shared `lax.scan`.

Parity target: ldm/models/diffusion/ddim.py:129-243 (ddim_sampling +
p_sample_ddim): per-step  pred_x0 = (x - sqrt(1-a_t) e) / sqrt(a_t),
dir_xt = sqrt(1 - a_prev - sigma^2) e,  x_prev = sqrt(a_prev) pred_x0 +
dir_xt + sigma * noise.  CFG folding lives in the caller's ``eps_fn``
(uncond-first double batch, ddim.py:196-214 — see zero123.py).

This one function IS the production loop: `Zero123Stage._sample_views_jit`
and `img2img.ddim_decode` both delegate here, so the chain-parity test vs
the reference `DDIMSampler.sample` (tests/test_chain_parity.py) covers the
exact code the pipeline runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from one2345_tpu.diffusion.schedule import DDIMSchedule


def ddim_sample(eps_fn, x: jnp.ndarray, sched: DDIMSchedule, noise_fn=None) -> jnp.ndarray:
    """Run the full DDIM loop over ``sched`` (already in sampling order).

    :param eps_fn: (x, t scalar int32) -> eps, CFG already folded in
    :param x: [B, ...] initial noise x_T
    :param noise_fn: (draw_idx scalar, shape) -> noise for the sigma term;
        None -> no noise (exact for eta=0, where sigmas are identically 0)
    :return: x_0 estimate after the last step
    """
    consts = jax.tree_util.tree_map(
        jnp.asarray,
        (
            jnp.arange(1, sched.num_steps + 1),  # noise draw id (0 = x_T draw)
            sched.timesteps,
            sched.alphas,
            sched.alphas_prev,
            sched.sigmas,
            sched.sqrt_one_minus_alphas,
        ),
    )

    def step(x, per_step):
        draw, t, a_t, a_prev, sigma_t, sqrt_1m_a = per_step
        e_t = eps_fn(x, t)
        pred_x0 = (x - sqrt_1m_a * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
        if noise_fn is not None:
            noise = sigma_t * noise_fn(draw, x.shape)
        else:
            noise = 0.0
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise, None

    x, _ = jax.lax.scan(step, x, consts)
    return x


def trim_for_sample(sched: DDIMSchedule) -> DDIMSchedule:
    """Drop the highest-noise step, replicating `DDIMSampler.sample`.

    Reference quirk (found by the loop-parity test, kept on purpose):
    `ddim_sampling` defaults to ``t_start=-1`` and slices
    ``timesteps = timesteps[:t_start]`` (ddim.py:136,151) — so `sample()`
    ALWAYS drops the last ascending timestep and S schedule entries run
    S-1 UNet steps, starting one level below pure noise (S=75 -> 77
    entries -> 76 steps from t=977, never t=990).  PLMS does not have the
    quirk (plms_sampling takes no t_start); neither do encode/decode.
    """
    import numpy as np

    return DDIMSchedule(*(np.asarray(a)[1:] for a in sched.arrays), trimmed=True)


def truncate_schedule(sched: DDIMSchedule, t_start: int) -> DDIMSchedule:
    """The last ``t_start`` sampling steps of ``sched`` (== the first
    t_start ascending steps, flipped — decode's timesteps[:t_start])."""
    import numpy as np

    if not (1 <= t_start <= sched.num_steps):
        raise ValueError(f"t_start must be in [1, {sched.num_steps}], got {t_start}")
    sl = slice(sched.num_steps - t_start, None)
    return DDIMSchedule(*(np.asarray(a)[sl] for a in sched.arrays), trimmed=sched.trimmed)
