"""DPM-Solver++(2M) — a fast deterministic sampler (opt-in speed mode).

Not in the reference (its sampler surface is DDIM + PLMS, ldm/models/
diffusion/{ddim,plms}.py); added because the measured UNet profile
(docs/diffusion_profile.md) shows diffusion is compute-bound at
component-level speed-of-light, so the only remaining wall-clock lever is
the NUMBER of denoiser evaluations.  DPM-Solver++(2M) (arXiv 2211.01095)
is a second-order multistep solver of the same probability-flow ODE that
DDIM(eta=0) discretizes to first order — at matched step counts the two
converge to each other (tests/test_dpm_solver.py), and in practice 2M
reaches DDIM-50 quality near ~20-25 steps.

Quality at low step counts is unvalidated in this environment (no real
checkpoint — see README's real-weights runbook), so the pipeline default
stays the reference's DDIM; opt in via `DiffusionConfig(sampler="dpmpp")`
or `sample_views(..., sampler="dpmpp")`.

Implementation notes (data-prediction "++" variant, Algorithm 2 of the
paper, with the final step dropped to first order as stabilized in common
practice): with a_i = alpha_cumprod at node i, alpha=sqrt(a),
sigma=sqrt(1-a), lambda=log(alpha/sigma):

  h_i   = lambda_i - lambda_{i-1}
  r_i   = h_{i-1} / h_i
  D_i   = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}
  x_i   = (sigma_i / sigma_{i-1}) x_{i-1} - alpha_i expm1(-h_i) D_i

The node ladder reuses the DDIM discretization (schedule.py
make_ddim_schedule, eta=0): nodes = [alphas[0]] ++ alphas_prev, so the
solver lands on exactly the same terminal signal level as DDIM and the
UNet sees the same discrete timesteps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from one2345_tpu.diffusion.schedule import DDIMSchedule


def dpmpp_sample(
    eps_fn,
    x: jnp.ndarray,
    sched: DDIMSchedule,
) -> jnp.ndarray:
    """Run the DPM-Solver++(2M) loop.

    :param eps_fn: (x, t_scalar) -> predicted noise (CFG already folded in)
    :param x: [B, H, W, C] initial noise at sched.timesteps[0]
    :param sched: DDIM schedule (eta must be 0 — deterministic ODE solve)
    """
    S = len(sched.timesteps)
    consts = jax.tree_util.tree_map(
        jnp.asarray,
        (
            sched.timesteps,
            sched.alphas,
            sched.alphas_prev,
            sched.sqrt_one_minus_alphas,
            # lower-order steps: no predecessor x0 on the first step, and a
            # first-order final step (lower_order_final) for stability
            jnp.asarray([i == 0 or i == S - 1 for i in range(S)]),
        ),
    )

    def lam(a):
        # log(alpha/sigma) = 0.5 log(a / (1 - a))
        return 0.5 * jnp.log(a / (1.0 - a))

    def step(carry, per_step):
        x, prev_x0, prev_lam = carry
        t, a_t, a_next, sqrt_1m_a, lower = per_step
        e_t = eps_fn(x, t)
        x0 = (x - sqrt_1m_a * e_t) / jnp.sqrt(a_t)

        lam_t, lam_next = lam(a_t), lam(a_next)
        h = lam_next - lam_t
        h_prev = lam_t - prev_lam
        # on lower-order steps force r=1, prev_x0=x0 -> D reduces to x0.
        # Degenerate node spacing also drops to first order: schedules with
        # S > 500 clip the +1 timestep offset (make_ddim_schedule), which
        # duplicates the terminal node -> h_prev or h is exactly 0 and the
        # second-order 1/(2r) term would be inf - inf = NaN.
        lower = lower | (h_prev == 0.0) | (h == 0.0)
        r = jnp.where(lower, 1.0, h_prev / jnp.where(h == 0.0, 1.0, h))
        x0_prev = jnp.where(lower, x0, prev_x0)
        D = (1.0 + 1.0 / (2.0 * r)) * x0 - 1.0 / (2.0 * r) * x0_prev

        sigma_t = jnp.sqrt(1.0 - a_t)
        sigma_next = jnp.sqrt(1.0 - a_next)
        x_new = (sigma_next / sigma_t) * x - jnp.sqrt(a_next) * jnp.expm1(-h) * D
        return (x_new, x0, lam_t), None

    lam0 = lam(jnp.asarray(sched.alphas)[0])
    (x, _, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x), lam0), consts)
    return x
