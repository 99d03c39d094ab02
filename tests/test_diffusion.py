"""Tests for the diffusion stage: schedule parity, tiny-model shapes, sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: compiles tiny full pipelines

from one2345_tpu.core.config import (
    CLIPVisionConfig,
    DiffusionConfig,
    UNetConfig,
    VAEConfig,
)
from one2345_tpu.diffusion.schedule import (
    make_beta_schedule,
    make_ddim_schedule,
    timestep_embedding,
)
from one2345_tpu.diffusion.unet import UNetModel
from one2345_tpu.diffusion.vae import Decoder, Encoder, moments_mode
from one2345_tpu.diffusion.zero123 import (
    STAGE1_DELTA_X,
    STAGE1_DELTA_Y,
    CCProjection,
    Zero123Stage,
    pose_tokens,
)


def tiny_config():
    return DiffusionConfig(
        ddim_steps_stage1=3,
        ddim_steps_stage2=2,
        image_size=32,
        latent_size=4,
        unet=UNetConfig(
            model_channels=32,
            channel_mult=(1, 2),
            attention_resolutions=(1,),
            num_heads=4,
            dtype="float32",
        ),
        vae=VAEConfig(base_channels=16, channel_mult=(1, 2, 2, 2), dtype="float32"),
        clip=CLIPVisionConfig(
            image_size=28, patch_size=14, width=32, layers=2, heads=2, dtype="float32"
        ),
    )


def test_beta_schedule_matches_reference_formula():
    betas = make_beta_schedule(1000, 0.00085, 0.0120)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.0120, rtol=1e-12)
    # sqrt-space linearity
    s = np.sqrt(betas)
    np.testing.assert_allclose(np.diff(s), np.diff(s)[0], rtol=1e-6)


def test_ddim_schedule_quirks():
    # the reference's uniform discretization yields 77 steps for S=75
    sched = make_ddim_schedule(75)
    assert sched.num_steps == 77
    assert sched.timesteps[0] == 989 and sched.timesteps[-1] == 1  # descending, +1 offset
    sched50 = make_ddim_schedule(50)
    assert sched50.num_steps == 50
    # eta=1 sigmas: sigma^2 = (1-a_prev)/(1-a) * (1 - a/a_prev)
    a, ap = sched50.alphas, sched50.alphas_prev
    np.testing.assert_allclose(
        sched50.sigmas**2, (1 - ap) / (1 - a) * (1 - a / ap), rtol=1e-5
    )
    # deterministic DDIM
    assert np.all(make_ddim_schedule(50, eta=0.0).sigmas == 0)


def test_timestep_embedding():
    emb = timestep_embedding(jnp.array([0, 10, 999]), 64)
    assert emb.shape == (3, 64)
    np.testing.assert_allclose(np.asarray(emb[0, :32]), 1.0, atol=1e-6)  # cos(0)


def test_unet_tiny_forward():
    net = UNetModel(
        in_channels=8, out_channels=4, model_channels=32, channel_mult=(1, 2),
        attention_resolutions=(1,), num_heads=4, dtype=jnp.float32,
    )
    x = jnp.zeros((2, 8, 8, 8))
    t = jnp.array([5, 100])
    ctx = jnp.zeros((2, 1, 768))
    vars_ = jax.jit(net.init)(jax.random.key(0), x, t, ctx)
    out = jax.jit(net.apply)(vars_, x, t, ctx)
    assert out.shape == (2, 8, 8, 4)
    # zero-init output conv: initial prediction is exactly zero
    assert np.abs(np.asarray(out)).max() == 0.0


def test_vae_roundtrip_shapes():
    enc = Encoder(base_channels=16, channel_mult=(1, 2, 2, 2), dtype=jnp.float32)
    dec = Decoder(base_channels=16, channel_mult=(1, 2, 2, 2), dtype=jnp.float32)
    img = jnp.zeros((2, 32, 32, 3))
    ev = jax.jit(enc.init)(jax.random.key(0), img)
    moments = jax.jit(enc.apply)(ev, img)
    assert moments.shape == (2, 4, 4, 8)
    z = moments_mode(moments)
    assert z.shape == (2, 4, 4, 4)
    dv = jax.jit(dec.init)(jax.random.key(1), z)
    out = jax.jit(dec.apply)(dv, z)
    assert out.shape == (2, 32, 32, 3)


def test_cc_projection_identity_init():
    mod = CCProjection()
    x = jnp.concatenate([jnp.arange(768.0)[None, None, :], jnp.ones((1, 1, 4))], -1)
    vars_ = mod.init(jax.random.key(0), x)
    out = mod.apply(vars_, x)
    # identity on the first 768 dims, zeros on the pose dims
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.arange(768.0), atol=1e-6)


def test_pose_tokens():
    T = pose_tokens([30.0, -10.0], [90.0, 0.0])
    assert T.shape == (2, 1, 4)
    np.testing.assert_allclose(T[0, 0], [np.radians(30), 1.0, 0.0, 0.0], atol=1e-6)
    assert len(STAGE1_DELTA_X) == 12 and len(STAGE1_DELTA_Y) == 12
    assert STAGE1_DELTA_Y[:4] == [0.0, 90.0, 180.0, 270.0]
    assert STAGE1_DELTA_Y[4:8] == [30.0, 120.0, 210.0, 300.0]
    assert STAGE1_DELTA_X[8:] == [-30.0] * 4


def test_zero123_tiny_sampler():
    stage = Zero123Stage(tiny_config(), seed=0)
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    out = stage.stage1(img, jax.random.key(1), indices=[0, 4], steps=2)
    assert out.shape == (2, 32, 32, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0

    s2 = stage.stage2(np.asarray(out), jax.random.key(2), steps=2)
    assert s2.shape == (2, 4, 32, 32, 3)


def test_noise_keyed_by_view_id_not_batch_position():
    """A view's image must not depend on which index subset it was sampled
    in: the runner's 8-view both-rings plan (8-chip mesh) and the
    single-chip 4-view ring plan must agree bit-for-bit under one seed."""
    stage = Zero123Stage(tiny_config(), seed=0)
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    key = jax.random.key(7)
    ring = np.asarray(stage.stage1(img, key, indices=[4, 5, 6, 7], steps=2))
    both = np.asarray(stage.stage1(img, key, indices=list(range(4, 12)), steps=2))
    np.testing.assert_array_equal(ring, both[:4])

    # stage-2: parent-view ids key the noise the same way
    s1 = np.asarray(stage.stage1(img, key, indices=[0, 1], steps=2))
    a = np.asarray(stage.stage2(s1[1:], jax.random.key(2), steps=2, view_ids=[1]))
    b = np.asarray(stage.stage2(s1, jax.random.key(2), steps=2, view_ids=[0, 1]))
    np.testing.assert_array_equal(a[0], b[1])
