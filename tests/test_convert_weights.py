"""Structural tests: converter output trees match the Flax parameter trees.

Real checkpoints are not downloadable in this environment, so these tests
validate the half that can break silently: that the converters emit exactly
the parameter-tree structure the Flax modules expect (every param present,
nothing extra).  Shape/orientation correctness is asserted for the
deterministic layout rules (conv transpose orders).
"""

import jax
import jax.numpy as jnp
import numpy as np

from one2345_tpu.diffusion.unet import UNetModel
from one2345_tpu.diffusion.vae import Decoder, Encoder
from one2345_tpu.utils import convert_weights as cw


class FakeSD(dict):
    """Returns a permissive dummy tensor for every requested key and
    records the set of keys read."""

    def __init__(self):
        super().__init__()
        self.read = set()

    def __getitem__(self, key):
        self.read.add(key)
        return np.zeros((6, 4, 4, 4), np.float32)

    def __contains__(self, key):
        # optional keys (biases, skip connections) are "present"
        self.read.add(key)
        return True


def _paths(tree):
    return {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_unet_converter_structure():
    net = UNetModel(
        in_channels=8, out_channels=4, model_channels=32, channel_mult=(1, 2),
        attention_resolutions=(1,), num_heads=4, dtype=jnp.float32,
    )
    params = jax.jit(net.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 8)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1, 768)),
    )
    fake = FakeSD()
    out = cw.convert_unet(
        fake, channel_mult=(1, 2), num_res_blocks=2, attention_resolutions=(1,)
    )
    missing = _paths(params) - _paths(out)
    # FakeSD claims every optional key exists, so conditional skip convs
    # appear even where the flax module has none — not a converter defect
    extra = {p for p in _paths(out) - _paths(params) if "skip" not in p}
    assert not missing, f"converter missing params: {sorted(missing)[:10]}"
    assert not extra, f"converter extra params: {sorted(extra)[:10]}"


def test_vae_converter_structure():
    enc = Encoder(base_channels=16, channel_mult=(1, 2), num_res_blocks=1, dtype=jnp.float32)
    dec = Decoder(base_channels=16, channel_mult=(1, 2), num_res_blocks=1, dtype=jnp.float32)
    ev = jax.jit(enc.init)(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    dv = jax.jit(dec.init)(jax.random.key(0), jnp.zeros((1, 8, 8, 4)))
    fe = FakeSD()
    oe = cw.convert_vae_encoder(fe, channel_mult=(1, 2), num_res_blocks=1)
    # nin_shortcut only exists where channels change; drop the difference
    missing = {p for p in _paths(ev) - _paths(oe)}
    extra = {p for p in _paths(oe) - _paths(ev) if "nin_shortcut" not in p}
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]

    fd = FakeSD()
    od = cw.convert_vae_decoder(fd, channel_mult=(1, 2), num_res_blocks=1)
    missing = _paths(dv) - _paths(od)
    extra = {p for p in _paths(od) - _paths(dv) if "nin_shortcut" not in p}
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]


def test_clip_converter_structure():
    from one2345_tpu.diffusion.clip import CLIPVisionTower

    net = CLIPVisionTower(
        image_size=28, patch_size=14, width=32, layers=2, heads=2, embed_dim=16,
        dtype=jnp.float32,
    )
    params = jax.jit(net.init)(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))
    fake = FakeSD()
    out = cw.convert_clip_vision(fake, layers=2)
    missing = _paths(params) - _paths(out)
    extra = _paths(out) - _paths(params)
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]


def test_conv_weight_orientation():
    sd = {"x.weight": np.arange(24.0).reshape(2, 3, 2, 2), "x.bias": np.zeros(2)}
    out = cw._conv(sd, "x")
    assert out["kernel"].shape == (2, 2, 3, 2)  # [kh, kw, I, O]
    # torch [O, I, kh, kw] -> element (o,i,h,w) must land at [h,w,i,o]
    t = sd["x.weight"]
    np.testing.assert_allclose(out["kernel"][1, 0, 2, 1], t[1, 2, 1, 0])


def test_linear_weight_orientation():
    sd = {"l.weight": np.arange(6.0).reshape(2, 3), "l.bias": np.zeros(2)}
    out = cw._lin(sd, "l")
    assert out["kernel"].shape == (3, 2)
    np.testing.assert_allclose(out["kernel"], sd["l.weight"].T)


def test_loftr_converter_structure():
    from one2345_tpu.elevation.loftr import LoFTRMatcher

    matcher = LoFTRMatcher(image_size=64, max_matches=32)
    fake = FakeSD()
    out = cw.convert_loftr(fake)
    missing = _paths(matcher.params) - _paths(out)
    extra = {p for p in _paths(out) - _paths(matcher.params) if "down_" not in p}
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]


def test_recon_converter_structure():
    from one2345_tpu.core.config import ReconConfig
    from one2345_tpu.recon.pipeline import ReconStage

    cfg = ReconConfig(vol_dims=(16, 16, 16), voxel_size=2.0 / 15.0, image_hw=(32, 32))
    stage = ReconStage(cfg, seed=0)
    class FakeReconSD(FakeSD):
        def __getitem__(self, key):
            self.read.add(key)
            if "sparse_costreg_net" in key and ".net.0" in key:
                return np.zeros((27, 4, 4), np.float32)  # torchsparse [K,I,O]
            if key in ("variance", "s"):
                return np.zeros((), np.float32)
            if key.endswith("weight_g"):
                return np.zeros((4, 1), np.float32)
            return np.zeros((6, 4, 4, 4), np.float32)

    ckpt = {
        "pyramid_feature_network_lod0": FakeReconSD(),
        "sdf_network_lod0": FakeReconSD(),
        "rendering_network_lod0": FakeReconSD(),
        "variance_network_lod0": FakeReconSD(),
    }
    out = cw.convert_recon(ckpt)
    ours = {k: stage.params[k] for k in ("fusion", "sdf", "render", "variance")}
    missing = _paths(ours) - _paths(out)
    extra = _paths(out) - _paths(ours)
    assert not missing, sorted(missing)[:10]
    assert not extra, sorted(extra)[:10]


def test_recon_converter_lod1_structure():
    """num_lods=2 checkpoints: the *_lod1 network groups land on the
    separate lod1 parameter trees (ReconStage.init_params)."""
    from one2345_tpu.core.config import ReconConfig
    from one2345_tpu.recon.pipeline import ReconStage

    cfg = ReconConfig(
        vol_dims=(8, 8, 8), voxel_size=2.0 / 7.0, image_hw=(32, 32),
        num_lods=2, lod1_vol_dims=(16, 16, 16), lod1_voxel_size=2.0 / 15.0,
        lod1_d_compress=8,
    )
    stage = ReconStage(cfg, seed=0)

    class FakeReconSD(FakeSD):
        def __getitem__(self, key):
            self.read.add(key)
            if "sparse_costreg_net" in key and ".net.0" in key:
                return np.zeros((27, 4, 4), np.float32)
            if key in ("variance", "s"):
                return np.zeros((), np.float32)
            if key.endswith("weight_g"):
                return np.zeros((4, 1), np.float32)
            return np.zeros((6, 4, 4, 4), np.float32)

    ckpt = {
        f"{g}_{lod}": FakeReconSD()
        for g in ("pyramid_feature_network", "sdf_network",
                  "rendering_network", "variance_network")
        for lod in ("lod0", "lod1")
    }
    out = cw.convert_recon(ckpt)
    keys = ("fusion", "sdf", "render", "variance",
            "fusion_lod1", "sdf_lod1", "render_lod1", "variance_lod1")
    ours = {k: stage.params[k] for k in keys}
    missing = _paths(ours) - _paths(out)
    extra = _paths(out) - _paths(ours)
    assert not missing, sorted(missing)[:10]
    assert not extra, sorted(extra)[:10]
