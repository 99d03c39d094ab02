"""Feasibility probe: does int8 (s8xs8->s32) conv/matmul lower on this TPU
toolchain, and how does it time vs bf16 at UNet production shapes?

v5e peak: 197 TFLOP/s bf16, 394 TOPS int8 — if XLA routes s8 contractions
onto the MXU's 8-bit path, the compute-bound conv side of the UNet
(~0.74 MFU, docs/diffusion_profile.md) could nearly halve.

Run on a QUIET host for trustworthy ratios (CPU load inflates TPU wall
15-30%); ratios >1.5x survive that noise.  One JSON line per case.
"""

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_scan(fn, args, iters=20, label=""):
    """Amortize dispatch inside a lax.scan (docs/diffusion_profile.md
    methodology); warm-up + drain fetch before timing (CLAUDE.md).
    Operands are jit ARGUMENTS, not closure constants (CLAUDE.md: captured
    arrays ship inside the HLO and stall the remote compile)."""

    @jax.jit
    def run(x, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            # chain the output into the next iteration's input so the op is
            # NOT loop-invariant (XLA would hoist an invariant body out of
            # the scan and we'd time one eval instead of `iters`).  The
            # chain must consume EVERY output element: an earlier version
            # took the first x.size elements, which for the (M,N>K) matmul
            # cases let XLA sink the slice into the dot and compute only
            # M*K/N rows — a last-axis reduction keeps the full op live.
            red = out.astype(jnp.float32).sum(axis=-1, keepdims=True)
            nxt = (carry.astype(jnp.float32) + red).astype(x.dtype)
            return nxt, None

        c, _ = lax.scan(body, x, None, length=iters)
        return c

    out = run(*args)
    _ = np.asarray(out.ravel()[:1])  # drain (axon block_until_ready lies)
    t0 = time.perf_counter()
    out = run(*args)
    _ = np.asarray(out.ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    return dt


def probe_conv(B, H, W, Cin, Cout):
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, Cin), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (3, 3, Cin, Cout), dtype=np.int8))
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x8.shape, w8.shape, ("NHWC", "HWIO", "NHWC"))

    def conv8(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    def convb(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    try:
        t8 = timed_scan(conv8, (x8, w8))
    except Exception as e:  # noqa: BLE001
        return {"case": f"conv {B}x{H}x{W}x{Cin}->{Cout}", "error": f"{type(e).__name__}: {e}"[:200]}
    tb = timed_scan(convb, (xb, wb))
    flops = 2 * B * H * W * Cin * Cout * 9
    return {
        "case": f"conv {B}x{H}x{W}x{Cin}->{Cout}",
        "bf16_ms": round(tb * 1e3, 3), "int8_ms": round(t8 * 1e3, 3),
        "speedup": round(tb / t8, 3),
        "bf16_tflops": round(flops / tb / 1e12, 1),
        "int8_tops": round(flops / t8 / 1e12, 1),
    }


def probe_matmul(M, K, N):
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    def mm8(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    def mmb(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    try:
        t8 = timed_scan(mm8, (a8, b8))
    except Exception as e:  # noqa: BLE001
        return {"case": f"mm {M}x{K}x{N}", "error": f"{type(e).__name__}: {e}"[:200]}
    tb = timed_scan(mmb, (ab, bb))
    flops = 2 * M * K * N
    return {
        "case": f"mm {M}x{K}x{N}",
        "bf16_ms": round(tb * 1e3, 3), "int8_ms": round(t8 * 1e3, 3),
        "speedup": round(tb / t8, 3),
        "bf16_tflops": round(flops / tb / 1e12, 1),
        "int8_tops": round(flops / t8 / 1e12, 1),
    }


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    cases = [
        # UNet conv shapes (B=56 stage-2 CFG batch), NHWC
        probe_conv(56, 32, 32, 320, 320),
        probe_conv(56, 16, 16, 640, 640),
        probe_conv(56, 8, 8, 1280, 1280),
        # transformer FF / projection shapes (seq 1024 at the 320 level)
        probe_matmul(56 * 1024, 320, 2560),
        probe_matmul(56 * 256, 640, 5120),
        probe_matmul(56 * 64, 1280, 10240),
    ]
    for c in cases:
        print(json.dumps(c), flush=True)


if __name__ == "__main__":
    main()
