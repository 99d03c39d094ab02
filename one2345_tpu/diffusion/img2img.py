"""DDIM img2img utilities: encode / stochastic_encode / decode.

Parity target: ldm/models/diffusion/ddim.py:245-326 — the three sampler
methods run.py never calls but the reference API exposes (img2img-style
editing: deterministically or stochastically push a clean latent to an
intermediate noise level, then decode it back with the conditional model).

All three are jittable pure functions over the same ``DDIMSchedule`` the
samplers use and the same ``eps_fn(x, t) -> eps`` protocol as
diffusion/plms.py / dpm_solver.py (CFG folding happens inside the caller's
eps_fn, matching the reference's in-method CFG at ddim.py:265-273 /
p_sample_ddim).

Reference quirk kept on purpose: ``encode`` feeds the *loop index* i to the
model as the timestep (ddim.py:264 ``t = torch.full(..., i, ...)``), NOT the
DDPM timestep ``ddim_timesteps[i]`` — with 77 DDIM steps the model is asked
about t in [0, 77) while the alphas walked are the full-range cumprods.
We replicate it because parity means reproducing behavior, not intent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.diffusion.schedule import DDIMSchedule


def _ascending(sched: DDIMSchedule):
    """The schedule arrays in t-ascending order (the construction order of
    the reference's ddim_alphas / ddim_alphas_prev, before the sampling
    flip)."""
    if sched.trimmed:
        raise ValueError(
            "img2img encode/decode take an UNTRIMMED make_ddim_schedule() "
            "output; this schedule went through trim_for_sample (the "
            "DDIMSampler.sample drop-last quirk, e.g. Zero123Stage._schedule) "
            "and would diverge from the reference encode/decode by one step."
        )
    rev = slice(None, None, -1)
    return (
        np.asarray(sched.timesteps[rev]),
        np.asarray(sched.alphas[rev]),
        np.asarray(sched.alphas_prev[rev]),
        np.asarray(sched.sqrt_one_minus_alphas[rev]),
    )


def ddim_encode(eps_fn, x0: jnp.ndarray, sched: DDIMSchedule, t_enc: int) -> jnp.ndarray:
    """Deterministic DDIM inversion: walk x0 *up* the noise schedule for
    ``t_enc`` of the schedule's steps (ddim.py:245-290 ``encode`` with
    use_original_steps=False, return_intermediates=None).

    :param eps_fn: (x [B,...], t scalar int) -> eps [B,...]; CFG-folded
    :param t_enc: static int, 1..sched.num_steps
    :return: x at DDIM noise level t_enc
    """
    if not (1 <= t_enc <= sched.num_steps):
        raise ValueError(f"t_enc must be in [1, {sched.num_steps}], got {t_enc}")
    _, asc_alphas, asc_alphas_prev, _ = _ascending(sched)
    # reference naming (ddim.py:255-258): alphas_next = ddim_alphas,
    # alphas = ddim_alphas_prev — each step moves alphas[i] -> alphas_next[i]
    alphas_next = jnp.asarray(asc_alphas[:t_enc])
    alphas = jnp.asarray(asc_alphas_prev[:t_enc])

    def step(x, per):
        i, a_next, a = per
        e = eps_fn(x, i)  # quirk: loop index as timestep (ddim.py:264)
        x_weighted = jnp.sqrt(a_next / a) * x
        weighted_eps = jnp.sqrt(a_next) * (
            jnp.sqrt(1.0 / a_next - 1.0) - jnp.sqrt(1.0 / a - 1.0)
        ) * e
        return x_weighted + weighted_eps, None

    xs = (jnp.arange(t_enc, dtype=jnp.int32), alphas_next, alphas)
    x_next, _ = jax.lax.scan(step, x0, xs)
    return x_next


def stochastic_encode(
    x0: jnp.ndarray, t, sched: DDIMSchedule, noise: jnp.ndarray
) -> jnp.ndarray:
    """q_sample at a DDIM step index: fast, non-invertible noising
    (ddim.py:292-306, use_original_steps=False).

    :param t: int or [B] int — index into the t-ascending DDIM schedule
    :param noise: same shape as x0 (the reference draws randn when None;
        here the caller supplies it — explicit keys, jit-friendly)
    """
    _, asc_alphas, _, asc_sqrt_1m = _ascending(sched)
    sqrt_a = jnp.sqrt(jnp.asarray(asc_alphas))
    sqrt_1m = jnp.asarray(asc_sqrt_1m)
    t = jnp.asarray(t, jnp.int32)
    # extract_into_tensor: gather then broadcast over trailing dims
    shape = (-1,) + (1,) * (x0.ndim - 1) if t.ndim else ()
    sa = sqrt_a[t].reshape(shape) if t.ndim else sqrt_a[t]
    s1m = sqrt_1m[t].reshape(shape) if t.ndim else sqrt_1m[t]
    return sa * x0 + s1m * noise


def ddim_decode(
    eps_fn, x_latent: jnp.ndarray, sched: DDIMSchedule, t_start: int, key=None
) -> jnp.ndarray:
    """Run the DDIM sampling loop from noise level ``t_start`` down to 0
    (ddim.py:308-326 ``decode``: p_sample_ddim over the truncated,
    flipped schedule).

    :param t_start: static int, 1..sched.num_steps — how many of the
        schedule's (ascending) steps the latent currently sits above
    :param key: PRNG key for the sigma noise term; None -> zeros (exact
        for eta=0 schedules, where sigmas are identically 0)
    """
    from one2345_tpu.diffusion.ddim import ddim_sample, truncate_schedule

    if sched.trimmed:
        raise ValueError(
            "ddim_decode takes an UNTRIMMED make_ddim_schedule() output "
            "(t_start indexes the full ascending schedule); got a "
            "trim_for_sample'd one."
        )
    noise_fn = None
    if key is not None:
        def noise_fn(draw, shape):
            return jax.random.normal(jax.random.fold_in(key, draw), shape)

    # the truncated loop IS the production DDIM loop (diffusion/ddim.py —
    # shared with Zero123Stage._sample_views_jit) over the last t_start steps
    return ddim_sample(eps_fn, x_latent, truncate_schedule(sched, t_start), noise_fn)
