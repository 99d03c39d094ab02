"""Numeric weight-conversion parity vs the mounted torch reference.

Each test instantiates a randomly-initialized REFERENCE torch module
(/root/reference, imported via tests/torch_ref.py stubs), runs its
state_dict through one2345_tpu.utils.convert_weights, and asserts the JAX
module output matches the torch output.  This converts the converters from
"structurally plausible" to numerically proven without any downloaded
checkpoint (SURVEY hard parts #5/#6).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests import torch_ref
from one2345_tpu.utils import convert_weights as cw

torch_ref.setup()

TOL = 2e-4


@pytest.fixture(autouse=True)
def _full_matmul_precision():
    """XLA's DEFAULT matmul/conv precision is reduced (bf16-grade passes —
    measured 2e-3 conv error on the CPU backend vs 8e-8 at HIGHEST).
    Parity tests compare ALGORITHMS against torch's true-f32 kernels, so
    pin full precision for every trace made inside a test."""
    with jax.default_matmul_precision("highest"):
        yield


def _max_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(1.0, float(np.abs(b).max()))
    return float(np.abs(a - b).max()) / scale


def _seed(n=0):
    torch.manual_seed(n)
    return np.random.default_rng(n)


def _randomize_bn_stats(module, rng):
    """Give every BN-like submodule nontrivial running stats + weights so
    eval-mode parity actually exercises the statistics path."""
    for m in module.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            n = m.running_mean.numel()
            m.running_mean.copy_(torch.tensor(rng.normal(0, 0.3, n), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(rng.uniform(0.5, 1.5, n), dtype=torch.float32))
            if getattr(m, "weight", None) is not None:
                # include a negative gamma to exercise the InPlaceABN |.|+eps rule
                w = rng.uniform(0.5, 1.5, n)
                w[0] = -w[0]
                m.weight.data.copy_(torch.tensor(w, dtype=torch.float32))
                m.bias.data.copy_(torch.tensor(rng.normal(0, 0.2, n), dtype=torch.float32))


# --------------------------------------------------------------------------
# ConvTranspose (SAM mask-decoder upscaling)
# --------------------------------------------------------------------------


def test_convtranspose_numeric():
    import flax.linen as nn

    _seed(0)
    tconv = torch.nn.ConvTranspose2d(6, 4, 2, stride=2)
    x = torch.randn(2, 6, 5, 5)
    with torch.no_grad():
        ref = tconv(x).numpy()

    conv = cw._convtranspose({"up.weight": tconv.weight, "up.bias": tconv.bias}, "up")
    fl = nn.ConvTranspose(4, (2, 2), (2, 2))
    out = fl.apply(
        {"params": {"kernel": jnp.asarray(conv["kernel"]), "bias": jnp.asarray(conv["bias"])}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    assert _max_err(np.asarray(out).transpose(0, 3, 1, 2), ref) < 1e-5


# --------------------------------------------------------------------------
# Zero123 UNet
# --------------------------------------------------------------------------


def test_unet_parity():
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet
    from one2345_tpu.diffusion.unet import UNetModel

    _seed(1)
    kw = dict(
        in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=1, context_dim=16,
    )
    tnet = TorchUNet(
        image_size=8, in_channels=8, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=16, legacy=False, dropout=0.0,
    ).eval()

    x = torch.randn(2, 8, 8, 8)
    t = torch.tensor([3, 977])
    ctx = torch.randn(2, 2, 16)
    with torch.no_grad():
        ref = tnet(x, timesteps=t, context=ctx).numpy()

    sd = {f"model.diffusion_model.{k}": v for k, v in tnet.state_dict().items()}
    params = cw.convert_unet(sd, channel_mult=(1, 2), num_res_blocks=1,
                             attention_resolutions=(1,))
    jnet = UNetModel(dtype=jnp.float32, **kw)
    out = jax.jit(jnet.apply)(
        params,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()),
    )
    assert _max_err(np.asarray(out).transpose(0, 3, 1, 2), ref) < TOL


# --------------------------------------------------------------------------
# VAE (AutoencoderKL Encoder/Decoder + quant convs)
# --------------------------------------------------------------------------


def _vae_kwargs():
    return dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                attn_resolutions=(), dropout=0.0, in_channels=3,
                resolution=16, z_channels=4, double_z=True)


def test_vae_encoder_parity():
    from ldm.modules.diffusionmodules.model import Encoder as TorchEncoder
    from one2345_tpu.diffusion.vae import Encoder

    _seed(2)
    tenc = TorchEncoder(**_vae_kwargs()).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref = quant(tenc(x)).numpy()

    sd = {f"first_stage_model.encoder.{k}": v for k, v in tenc.state_dict().items()}
    sd.update({f"first_stage_model.quant_conv.{k}": v for k, v in quant.state_dict().items()})
    params = cw.convert_vae_encoder(sd, channel_mult=(1, 2), num_res_blocks=1)
    jenc = Encoder(base_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                   z_channels=4, dtype=jnp.float32)
    out = jax.jit(jenc.apply)(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert _max_err(np.asarray(out).transpose(0, 3, 1, 2), ref) < TOL


def test_vae_decoder_parity():
    from ldm.modules.diffusionmodules.model import Decoder as TorchDecoder
    from one2345_tpu.diffusion.vae import Decoder

    _seed(3)
    tdec = TorchDecoder(**_vae_kwargs()).eval()
    post = torch.nn.Conv2d(4, 4, 1)
    z = torch.randn(2, 4, 8, 8)
    with torch.no_grad():
        ref = tdec(post(z)).numpy()

    sd = {f"first_stage_model.decoder.{k}": v for k, v in tdec.state_dict().items()}
    sd.update({f"first_stage_model.post_quant_conv.{k}": v for k, v in post.state_dict().items()})
    params = cw.convert_vae_decoder(sd, channel_mult=(1, 2), num_res_blocks=1)
    jdec = Decoder(base_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                   out_channels=3, z_channels=4, dtype=jnp.float32)
    out = jax.jit(jdec.apply)(params, jnp.asarray(z.numpy().transpose(0, 2, 3, 1)))
    assert _max_err(np.asarray(out).transpose(0, 3, 1, 2), ref) < TOL


# --------------------------------------------------------------------------
# CLIP vision tower (openai/CLIP VisualTransformer replica: packed qkv
# nn.MultiheadAttention + QuickGELU, the exact checkpoint layout that
# convert_clip_vision targets)
# --------------------------------------------------------------------------


class _TorchQuickGELU(torch.nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _TorchResidualAttentionBlock(torch.nn.Module):
    def __init__(self, d_model, n_head):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(d_model, n_head)
        self.ln_1 = torch.nn.LayerNorm(d_model)
        self.mlp = torch.nn.Sequential()
        self.mlp.add_module("c_fc", torch.nn.Linear(d_model, d_model * 4))
        self.mlp.add_module("gelu", _TorchQuickGELU())
        self.mlp.add_module("c_proj", torch.nn.Linear(d_model * 4, d_model))
        self.ln_2 = torch.nn.LayerNorm(d_model)

    def forward(self, x):
        x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False)[0]
        x = x + self.mlp(self.ln_2(x))
        return x


class _TorchVisualTransformer(torch.nn.Module):
    """openai/CLIP model.py VisionTransformer (same param names)."""

    def __init__(self, input_resolution, patch_size, width, layers, heads, output_dim):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        scale = width ** -0.5
        self.class_embedding = torch.nn.Parameter(scale * torch.randn(width))
        n = (input_resolution // patch_size) ** 2 + 1
        self.positional_embedding = torch.nn.Parameter(scale * torch.randn(n, width))
        self.ln_pre = torch.nn.LayerNorm(width)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.Sequential(
            *[_TorchResidualAttentionBlock(width, heads) for _ in range(layers)]
        )
        self.ln_post = torch.nn.LayerNorm(width)
        self.proj = torch.nn.Parameter(scale * torch.randn(width, output_dim))

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype) + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype
        )
        x = torch.cat([cls, x], dim=1) + self.positional_embedding.to(x.dtype)
        x = self.ln_pre(x).permute(1, 0, 2)
        x = self.transformer.resblocks(x).permute(1, 0, 2)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj


def test_clip_vision_parity():
    from one2345_tpu.diffusion.clip import CLIPVisionTower

    _seed(4)
    tnet = _TorchVisualTransformer(16, 8, 32, 2, 4, 12).eval()
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref = tnet(x).numpy()

    sd = {f"cond_stage_model.model.visual.{k}": v for k, v in tnet.state_dict().items()}
    params = cw.convert_clip_vision(sd, layers=2)
    jnet = CLIPVisionTower(image_size=16, patch_size=8, width=32, layers=2,
                           heads=4, embed_dim=12, dtype=jnp.float32)
    out = jax.jit(jnet.apply)(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert _max_err(out, ref) < TOL


# --------------------------------------------------------------------------
# LoFTR (tiny full model -> backbone + encoder-layer parity)
# --------------------------------------------------------------------------


def _tiny_loftr_cfg():
    return {
        "backbone_type": "ResNetFPN",
        "resolution": (8, 2),
        "fine_window_size": 5,
        "fine_concat_coarse_feat": True,
        "resnetfpn": {"initial_dim": 8, "block_dims": [8, 12, 16]},
        "coarse": {
            "d_model": 16, "d_ffn": 16, "nhead": 4,
            "layer_names": ["self", "cross"] * 4, "attention": "linear",
            "temp_bug_fix": False,
        },
        "match_coarse": {
            "thr": 0.2, "border_rm": 2, "match_type": "dual_softmax",
            "dsmax_temperature": 0.1, "skh_iters": 3,
            "skh_init_bin_score": 1.0, "skh_prefilter": True,
            "train_coarse_percent": 0.4, "train_pad_num_gt_min": 200,
        },
        "fine": {
            "d_model": 8, "d_ffn": 8, "nhead": 4,
            "layer_names": ["self", "cross"], "attention": "linear",
        },
    }


@pytest.fixture(scope="module")
def tiny_loftr():
    from loftr.loftr import LoFTR

    _seed(5)
    rng = np.random.default_rng(5)
    model = LoFTR(config=_tiny_loftr_cfg()).eval()
    _randomize_bn_stats(model, rng)
    variables = cw.convert_loftr(model.state_dict())
    return model, variables


def test_loftr_backbone_parity(tiny_loftr):
    from one2345_tpu.elevation.loftr import ResNetFPN_8_2

    model, variables = tiny_loftr
    x = torch.randn(2, 1, 32, 32)
    with torch.no_grad():
        c_ref, f_ref = model.backbone(x)

    jnet = ResNetFPN_8_2(initial_dim=8, block_dims=(8, 12, 16))
    vs = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    c, f = jax.jit(jnet.apply)(vs, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert _max_err(np.asarray(c).transpose(0, 3, 1, 2), c_ref.numpy()) < TOL
    assert _max_err(np.asarray(f).transpose(0, 3, 1, 2), f_ref.numpy()) < TOL


def test_loftr_encoder_layer_parity(tiny_loftr):
    from one2345_tpu.elevation.loftr import LoFTREncoderLayer

    model, variables = tiny_loftr
    x = torch.randn(2, 9, 16)
    src = torch.randn(2, 9, 16)
    with torch.no_grad():
        ref_self = model.loftr_coarse.layers[0](x, x).numpy()
        ref_cross = model.loftr_coarse.layers[1](x, src).numpy()

    layer = LoFTREncoderLayer(16, 4)
    p_self = {"params": variables["params"]["coarse_tf"]["self_0"]}
    p_cross = {"params": variables["params"]["coarse_tf"]["cross_0"]}
    out_self = jax.jit(layer.apply)(p_self, jnp.asarray(x.numpy()), jnp.asarray(x.numpy()))
    out_cross = jax.jit(layer.apply)(p_cross, jnp.asarray(x.numpy()), jnp.asarray(src.numpy()))
    assert _max_err(out_self, ref_self) < TOL
    assert _max_err(out_cross, ref_cross) < TOL


def test_loftr_fine_fuse_parity(tiny_loftr):
    from one2345_tpu.elevation.loftr import LoFTRModules

    model, variables = tiny_loftr
    fine_win = torch.randn(3, 25, 8)
    coarse_feat = torch.randn(3, 16)
    with torch.no_grad():
        c = model.fine_preprocess.down_proj(coarse_feat)
        ref = model.fine_preprocess.merge_feat(
            torch.cat([fine_win, c[:, None, :].repeat(1, 25, 1)], dim=-1)
        ).numpy()

    mods = LoFTRModules(d_coarse=16, d_fine=8, nhead=4)
    out = mods.apply(
        {"params": variables["params"]},
        jnp.asarray(fine_win.numpy()),
        jnp.asarray(coarse_feat.numpy()),
        method=LoFTRModules.fuse_fine,
    )
    assert _max_err(out, ref) < TOL


# --------------------------------------------------------------------------
# Reconstruction networks (FeatureNet FPN / LatentSDFLayer / compress /
# rendering network / SparseCostRegNet semantics)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def recon_ckpt():
    """Synthetic ckpt_215000-shaped checkpoint from reference torch modules
    + torchsparse-layout cost-reg kernels."""
    from models.featurenet import FeatureNet as TorchFPN, ConvBnReLU
    from models.sparse_sdf_network import LatentSDFLayer as TorchSDF
    from models.rendering_network import GeneralRenderingNetwork as TorchRender

    _seed(6)
    rng = np.random.default_rng(6)

    fpn = TorchFPN().eval()
    _randomize_bn_stats(fpn, rng)

    sdf_container = torch.nn.Module()
    sdf_container.compress_layer = ConvBnReLU(56, 16, 3, 1, 1)
    sdf_container.sdf_layer = TorchSDF(
        d_in=3, d_out=17, d_hidden=16, n_layers=4, skip_in=(4,), multires=6,
        bias=0.5, geometric_init=True, weight_norm=True,
        d_conditional_feature=8,
    )
    sdf_container = sdf_container.eval()
    _randomize_bn_stats(sdf_container, rng)
    sdf_sd = {k: v for k, v in sdf_container.state_dict().items()}

    # torchsparse-layout SparseCostRegNet weights ([K, Cin, Cout]) for the
    # full channel plan (d_in=32, d_out=16)
    chans = {
        "conv0": (32, 16), "conv1": (16, 16), "conv2": (16, 16),
        "conv3": (16, 32), "conv4": (32, 32), "conv5": (32, 64),
        "conv6": (64, 64), "conv7": (64, 32), "conv9": (32, 16),
        "conv11": (16, 16),
    }
    for name, (ci, co) in chans.items():
        sdf_sd[f"sparse_costreg_net.{name}.net.0.kernel"] = torch.tensor(
            rng.normal(0, 0.3, (27, ci, co)).astype(np.float32)
        )
        sdf_sd[f"sparse_costreg_net.{name}.net.1.weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, co).astype(np.float32)
        )
        sdf_sd[f"sparse_costreg_net.{name}.net.1.bias"] = torch.tensor(
            rng.normal(0, 0.2, co).astype(np.float32)
        )
        sdf_sd[f"sparse_costreg_net.{name}.net.1.running_mean"] = torch.tensor(
            rng.normal(0, 0.3, co).astype(np.float32)
        )
        sdf_sd[f"sparse_costreg_net.{name}.net.1.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, co).astype(np.float32)
        )

    render = TorchRender(in_geometry_feat_ch=16, in_rendering_feat_ch=12).eval()

    ckpt = {
        "pyramid_feature_network_lod0": fpn.state_dict(),
        "sdf_network_lod0": sdf_sd,
        "rendering_network_lod0": render.state_dict(),
        "variance_network_lod0": {"variance": torch.tensor([[0.37]])},
    }
    converted = cw.convert_recon(ckpt, num_sdf_layers=4)
    return {"fpn": fpn, "sdf_container": sdf_container, "render": render,
            "ckpt": ckpt, "converted": converted}


def test_featurenet_parity(recon_ckpt):
    from one2345_tpu.recon.featurenet import FeatureNet

    fpn = recon_ckpt["fpn"]
    conv = recon_ckpt["converted"]["fusion"]
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = fpn(x)

    jnet = FeatureNet()
    vs = {"params": conv["params"]["fpn"], "batch_stats": conv["batch_stats"]["fpn"]}
    outs = jax.jit(jnet.apply)(vs, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for o, r in zip(outs, ref):
        assert _max_err(np.asarray(o).transpose(0, 3, 1, 2), r.numpy()) < TOL


def test_compress_layer_parity(recon_ckpt):
    from one2345_tpu.nn.layers import ConvBnAct

    cont = recon_ckpt["sdf_container"]
    conv = recon_ckpt["converted"]["sdf"]
    x = torch.randn(2, 56, 8, 8)
    with torch.no_grad():
        ref = cont.compress_layer(x).numpy()

    layer = ConvBnAct(16, (3, 3))
    vs = {
        "params": conv["params"]["compress"],
        "batch_stats": conv["batch_stats"]["compress"],
    }
    out = jax.jit(layer.apply)(vs, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert _max_err(np.asarray(out).transpose(0, 3, 1, 2), ref) < TOL


def test_latent_sdf_layer_parity(recon_ckpt):
    from one2345_tpu.recon.sdf_network import LatentSDFLayer

    cont = recon_ckpt["sdf_container"]
    conv = recon_ckpt["converted"]["sdf"]
    pts = torch.rand(50, 3) * 2 - 1
    latent = torch.randn(50, 8)
    with torch.no_grad():
        ref = cont.sdf_layer(pts, latent).numpy()

    jnet = LatentSDFLayer(d_hidden=16, n_layers=4, multires=6, d_latent=8)
    out = jax.jit(jnet.apply)(
        {"params": conv["params"]["sdf_layer"]},
        jnp.asarray(pts.numpy()),
        jnp.asarray(latent.numpy()),
    )
    assert _max_err(out, ref) < TOL


def test_rendering_network_parity(recon_ckpt):
    from one2345_tpu.recon.rendering_network import GeneralRenderingNetwork

    render = recon_ckpt["render"]
    conv = recon_ckpt["converted"]["render"]
    rng = np.random.default_rng(7)
    V, R, S = 3, 4, 12
    geo = torch.tensor(rng.normal(0, 1, (R, S, 16)).astype(np.float32))
    rgb_feat = torch.tensor(rng.normal(0, 1, (V, R, S, 15)).astype(np.float32))
    dirs = rng.normal(0, 1, (V, R, S, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dots = rng.uniform(-1, 1, (V, R, S, 1))
    ray_diff = torch.tensor(np.concatenate([dirs, dots], -1).astype(np.float32))
    mask = torch.tensor((rng.uniform(0, 1, (V, R, S)) > 0.2).astype(np.float32))
    with torch.no_grad():
        rgb_ref, valid_ref = render(geo, rgb_feat, ray_diff, mask)

    jnet = GeneralRenderingNetwork(in_geometry_feat_ch=16, in_rendering_feat_ch=12)
    rgb, valid = jax.jit(jnet.apply)(
        {"params": conv["params"]},
        jnp.asarray(geo.numpy()), jnp.asarray(rgb_feat.numpy()),
        jnp.asarray(ray_diff.numpy()), jnp.asarray(mask.numpy()),
    )
    assert _max_err(rgb, rgb_ref.numpy()) < TOL
    assert np.array_equal(
        np.asarray(valid).reshape(-1), valid_ref.numpy().reshape(-1)
    )


def test_costreg_unet_parity(recon_ckpt):
    """Full CostRegNet vs a numpy dense-equivalent of torchsparse semantics
    (vendored offset enumeration), all-active mask.  This pins down the
    offset order ('zyx' default) AND the deconv kernel flip."""
    from one2345_tpu.recon.costreg import CostRegNet

    sd = recon_ckpt["ckpt"]["sdf_network_lod0"]
    conv = recon_ckpt["converted"]["sdf"]
    rng = np.random.default_rng(8)
    vol = rng.normal(0, 1, (8, 8, 8, 32)).astype(np.float32)

    def np_bn_relu(x, key):
        g = np.asarray(sd[f"sparse_costreg_net.{key}.net.1.weight"])
        b = np.asarray(sd[f"sparse_costreg_net.{key}.net.1.bias"])
        m = np.asarray(sd[f"sparse_costreg_net.{key}.net.1.running_mean"])
        v = np.asarray(sd[f"sparse_costreg_net.{key}.net.1.running_var"])
        y = (x - m) / np.sqrt(v + 1e-5) * g + b
        return np.maximum(y, 0.0)

    def block(x, key, stride=1, transposed=False):
        w = np.asarray(sd[f"sparse_costreg_net.{key}.net.0.kernel"], np.float64)
        y = torch_ref.dense_sparseconv3d(x, w, stride=stride, transposed=transposed)
        return np_bn_relu(y, key)

    c0 = block(vol, "conv0")
    c2 = block(block(c0, "conv1", 2), "conv2")
    c4 = block(block(c2, "conv3", 2), "conv4")
    x = block(block(c4, "conv5", 2), "conv6")
    x = c4 + block(x, "conv7", 2, transposed=True)
    x = c2 + block(x, "conv9", 2, transposed=True)
    ref = c0 + block(x, "conv11", 2, transposed=True)

    jnet = CostRegNet(d_out=16)
    vs = {"params": conv["params"]["costreg"], "batch_stats": conv["batch_stats"]["costreg"]}
    mask = jnp.ones((8, 8, 8, 1))
    out = jax.jit(jnet.apply)(vs, jnp.asarray(vol), mask)
    assert _max_err(out, ref) < TOL


def test_variance_parity(recon_ckpt):
    from one2345_tpu.recon.sdf_network import SingleVarianceNetwork

    conv = recon_ckpt["converted"]["variance"]
    net = SingleVarianceNetwork()
    inv = net.apply({"params": conv["params"]})
    assert np.isclose(float(inv), np.exp(10.0 * 0.37), rtol=1e-5)
