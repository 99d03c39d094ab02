"""int8 W8A8 UNet fast mode (diffusion/quantize.py).

Covers: exact dequantization math on representable values, the f32->int8
tree transform structure, closeness of the quantized UNet to its f32
source on random weights, and the Zero123Stage opt-in path (including
idempotent re-quantization of an already-quantized tree).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from one2345_tpu.core.config import (
    CLIPVisionConfig,
    DiffusionConfig,
    UNetConfig,
    VAEConfig,
)
from one2345_tpu.diffusion.quantize import (
    SKIP_QUANT,
    QDense,
    quantize_activation,
    quantize_kernel,
    quantize_unet_params,
)
from one2345_tpu.diffusion.unet import UNetModel


def tiny_config() -> DiffusionConfig:
    from tests.test_diffusion import tiny_config as tc

    return tc()


def _unet(cfg: DiffusionConfig, quant: bool) -> UNetModel:
    u = cfg.unet
    return UNetModel(
        in_channels=u.in_channels,
        out_channels=u.out_channels,
        model_channels=u.model_channels,
        num_res_blocks=u.num_res_blocks,
        attention_resolutions=tuple(u.attention_resolutions),
        channel_mult=tuple(u.channel_mult),
        num_heads=u.num_heads,
        transformer_depth=u.transformer_depth,
        context_dim=u.context_dim,
        dtype=jnp.float32,
        quant=quant,
    )


def test_qdense_exact_on_representable_values():
    """Weights/activations constructed to quantize without rounding error:
    the int8 path must reproduce the f32 matmul exactly."""
    rng = np.random.default_rng(0)
    # weights: per-output-channel scale s_w = c_j/127, entries = k * s_w
    cols = np.asarray([1.0, 0.5, 2.0, 0.25])
    wq_true = rng.integers(-127, 128, (8, 4))
    wq_true[np.argmax(np.abs(wq_true), axis=0), np.arange(4)] = 127  # absmax rep
    w = wq_true * (cols / 127.0)
    # activations: entries = m * s_x with s_x from absmax 127*s_x
    s_x = 0.03
    xq_true = rng.integers(-127, 128, (5, 8))
    xq_true[0, 0] = 127
    x = (xq_true * s_x).astype(np.float32)

    wq, ws = quantize_kernel(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(wq), wq_true)
    np.testing.assert_allclose(np.asarray(ws), cols / 127.0, rtol=1e-6)
    xq, xs = quantize_activation(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(xq), xq_true)

    qd = QDense(features=4, use_bias=False, dtype=jnp.float32)
    out = qd.apply(
        {"params": {"kernel_q": wq, "kernel_scale": ws}}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-5, atol=1e-6)


def test_quantize_unet_params_structure():
    cfg = tiny_config()
    f32 = _unet(cfg, quant=False)
    qmod = _unet(cfg, quant=True)
    key = jax.random.key(0)
    args = (
        jnp.zeros((1, cfg.latent_size, cfg.latent_size, cfg.unet.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1, cfg.unet.context_dim)),
    )
    f32_vars = jax.jit(f32.init)(key, *args)
    qvars = quantize_unet_params(f32_vars)

    from flax import traverse_util

    flat_f32 = traverse_util.flatten_dict(f32_vars["params"])
    flat_q = traverse_util.flatten_dict(qvars["params"])
    # every non-skipped kernel became kernel_q + kernel_scale; biases kept
    for path, leaf in flat_f32.items():
        if path[-1] == "kernel" and path[-2] not in SKIP_QUANT:
            assert flat_q[path[:-1] + ("kernel_q",)].dtype == jnp.int8
            scale = flat_q[path[:-1] + ("kernel_scale",)]
            assert scale.shape == (leaf.shape[-1],)
            assert path not in flat_q
        else:
            np.testing.assert_array_equal(np.asarray(flat_q[path]), np.asarray(leaf))
    # the transform's structure must match the quant module's expectations
    expected = jax.eval_shape(qmod.init, key, *args)
    assert jax.tree_util.tree_structure(expected) == jax.tree_util.tree_structure(
        qvars
    )


def test_quantized_unet_close_to_f32():
    cfg = tiny_config()
    f32 = _unet(cfg, quant=False)
    qmod = _unet(cfg, quant=True)
    key = jax.random.key(1)
    L = cfg.latent_size
    x = jax.random.normal(jax.random.key(2), (2, L, L, cfg.unet.in_channels))
    ts = jnp.asarray([5, 900], jnp.int32)
    ctx = jax.random.normal(jax.random.key(3), (2, 1, cfg.unet.context_dim))

    f32_vars = jax.jit(f32.init)(key, x, ts, ctx)
    # zero-init output convs would make both outputs trivially 0 — perturb
    # every f32 leaf so the comparison exercises real weights
    f32_vars = jax.tree_util.tree_map(
        lambda w: w + 0.05 * jax.random.normal(jax.random.key(4), w.shape, w.dtype),
        f32_vars,
    )
    ref = f32.apply(f32_vars, x, ts, ctx)
    out = qmod.apply(quantize_unet_params(f32_vars), x, ts, ctx)

    assert out.shape == ref.shape
    rel = float(
        jnp.linalg.norm(out - ref) / jnp.maximum(jnp.linalg.norm(ref), 1e-9)
    )
    # int8 W8A8 on a ~20-layer net: a few percent — loose bound, but tight
    # enough to catch wrong scales (order-1 error) or a silent f32 fallback
    assert 1e-6 < rel < 0.20, rel


def test_zero123_stage_quant_sampling():
    cfg = tiny_config()
    cfg = cfg.replace(unet=cfg.unet.replace(quant="int8"))
    from one2345_tpu.diffusion.zero123 import Zero123Stage

    stage = Zero123Stage(cfg, seed=0)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(stage.params["unet"]["params"])
    assert any(p[-1] == "kernel_q" for p in flat)

    img = np.full((cfg.image_size, cfg.image_size, 3), 0.5, np.float32)
    out = stage.stage1(img, jax.random.key(0), indices=[0, 1], steps=2)
    assert out.shape == (2, cfg.image_size, cfg.image_size, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0

    # idempotent: constructing a stage from already-quantized params works
    stage2 = Zero123Stage(cfg, params=stage.params)
    out2 = stage2.stage1(img, jax.random.key(0), indices=[0, 1], steps=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_sharded_sampler_quant_matches_single_device():
    """int8 param trees (int8 leaves + f32 scales) replicate over the view
    mesh; the uneven batch exercises the pad/shard path too."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU backend")

    from one2345_tpu.core.meshes import create_mesh
    from one2345_tpu.diffusion.zero123 import Zero123Stage

    cfg = tiny_config()
    cfg = cfg.replace(unet=cfg.unet.replace(quant="int8"))
    stage = Zero123Stage(cfg, seed=0)
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    idx = [0, 1, 2, 3]
    ref = np.asarray(stage.stage1(img, jax.random.key(1), indices=idx, steps=2))

    mesh = create_mesh(("data",))
    stage_sh = Zero123Stage(cfg, params=stage.params, mesh=mesh)
    out = np.asarray(stage_sh.stage1(img, jax.random.key(1), indices=idx, steps=2))
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_zero123_trainer_rejects_quant_stage():
    cfg = tiny_config()
    cfg = cfg.replace(unet=cfg.unet.replace(quant="int8"))
    from one2345_tpu.diffusion.zero123 import Zero123Stage
    from one2345_tpu.training.zero123_trainer import Zero123Trainer

    stage = Zero123Stage(cfg, seed=0)
    with pytest.raises(ValueError, match="f32 param tree"):
        Zero123Trainer(stage)
