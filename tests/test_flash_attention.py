"""Pallas flash attention vs reference attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one2345_tpu.ops import flash_attention as fa


def _reference(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v)


@pytest.mark.parametrize("T,S,D", [(256, 256, 40), (512, 256, 64)])
def test_flash_matches_reference(T, S, D, monkeypatch):
    # interpret mode so the kernel runs on CPU
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, T, 3, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, S, 3, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, S, 3, D)).astype(np.float32))

    out = fa.flash_attention(q, k, v, block_q=128, block_kv=128)
    ref = _reference(q, k, v)
    # pallas dots run at MXU precision (bf16 inputs) even in interpret
    # mode — measured ~3e-3 max abs deviation on TPU and CPU alike
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=8e-3)


def test_dispatch_fallback_short_seq():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 16, 2, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 1, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 1, 2, 8)).astype(np.float32))
    out = fa.attention(q, k, v)  # S=1 -> XLA path
    ref = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
