"""PyTorch checkpoint -> JAX parameter converters.

The reference distributes four pretrained checkpoints (download_ckpt.py:
21-29): zero123-xl.ckpt (LatentDiffusion), sam_vit_h_4b8939.pth,
LoFTR indoor_ds_new.ckpt, and the reconstruction ckpt_215000.pth.  These
converters map their state dicts onto the parameter trees of the Flax
modules in this package (the spine of cross-implementation parity testing).

Layout conventions:
- torch Conv2d [O, I, kh, kw]  -> flax [kh, kw, I, O]
- torch Linear [O, I]          -> flax [I, O]
- torch GroupNorm/LayerNorm weight/bias -> flax scale/bias

Loading a .ckpt requires torch (CPU build is fine):
    sd = torch.load(path, map_location='cpu')['state_dict']
    params = convert_zero123(sd, stage.params)
"""

from __future__ import annotations

import numpy as np


def _np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().float().numpy()
    return np.asarray(t)


def _conv(sd, key, bias=True):
    out = {"kernel": np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 1, 0))}
    if bias and f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _lin(sd, key, bias=True):
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if bias and f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _norm(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _gn32(sd, key):
    # our GroupNorm32/_Norm wraps an auto-named nn.GroupNorm
    return {"GroupNorm_0": _norm(sd, key)}


def _ln(sd, key):
    return _norm(sd, key)


# --------------------------------------------------------------------------
# Zero123-XL (LatentDiffusion ckpt)
# --------------------------------------------------------------------------


def convert_unet(sd, prefix="model.diffusion_model.", channel_mult=(1, 2, 4, 4),
                 num_res_blocks=2, attention_resolutions=(4, 2, 1)) -> dict:
    """UNetModel params from the diffusion_model state dict
    (openaimodel.py block numbering)."""
    p = prefix
    out = {
        "time_embed_0": _lin(sd, f"{p}time_embed.0"),
        "time_embed_2": _lin(sd, f"{p}time_embed.2"),
        "conv_in": _conv(sd, f"{p}input_blocks.0.0"),
        "out_norm": _gn32(sd, f"{p}out.0"),
        "conv_out": _conv(sd, f"{p}out.2"),
    }

    def res_block(key):
        r = {
            "in_norm": _gn32(sd, f"{key}.in_layers.0"),
            "in_conv": _conv(sd, f"{key}.in_layers.2"),
            "emb_proj": _lin(sd, f"{key}.emb_layers.1"),
            "out_norm": _gn32(sd, f"{key}.out_layers.0"),
            "out_conv": _conv(sd, f"{key}.out_layers.3"),
        }
        if f"{key}.skip_connection.weight" in sd:
            r["skip"] = _conv(sd, f"{key}.skip_connection")
        return r

    def attn_block(key, depth=1):
        a = {
            "norm": _gn32(sd, f"{key}.norm"),
            "proj_in": _conv(sd, f"{key}.proj_in"),
            "proj_out": _conv(sd, f"{key}.proj_out"),
        }
        for d in range(depth):
            tb = f"{key}.transformer_blocks.{d}"
            a[f"block{d}"] = {
                "norm1": _ln(sd, f"{tb}.norm1"),
                "norm2": _ln(sd, f"{tb}.norm2"),
                "norm3": _ln(sd, f"{tb}.norm3"),
                "attn1": {
                    "to_q": _lin(sd, f"{tb}.attn1.to_q", bias=False),
                    "to_k": _lin(sd, f"{tb}.attn1.to_k", bias=False),
                    "to_v": _lin(sd, f"{tb}.attn1.to_v", bias=False),
                    "to_out": _lin(sd, f"{tb}.attn1.to_out.0"),
                },
                "attn2": {
                    "to_q": _lin(sd, f"{tb}.attn2.to_q", bias=False),
                    "to_k": _lin(sd, f"{tb}.attn2.to_k", bias=False),
                    "to_v": _lin(sd, f"{tb}.attn2.to_v", bias=False),
                    "to_out": _lin(sd, f"{tb}.attn2.to_out.0"),
                },
                "ff_geglu": {"proj": _lin(sd, f"{tb}.ff.net.0.proj")},
                "ff_out": _lin(sd, f"{tb}.ff.net.2"),
            }
        return a

    n_levels = len(channel_mult)
    idx = 1
    ds = 1
    for level in range(n_levels):
        for i in range(num_res_blocks):
            out[f"in_{level}_{i}_res"] = res_block(f"{p}input_blocks.{idx}.0")
            if ds in attention_resolutions:
                out[f"in_{level}_{i}_attn"] = attn_block(f"{p}input_blocks.{idx}.1")
            idx += 1
        if level != n_levels - 1:
            out[f"down_{level}"] = {"op": _conv(sd, f"{p}input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    out["mid_res1"] = res_block(f"{p}middle_block.0")
    out["mid_attn"] = attn_block(f"{p}middle_block.1")
    out["mid_res2"] = res_block(f"{p}middle_block.2")

    idx = 0
    for level in reversed(range(n_levels)):
        for i in range(num_res_blocks + 1):
            out[f"out_{level}_{i}_res"] = res_block(f"{p}output_blocks.{idx}.0")
            sub = 1
            if ds in attention_resolutions:
                out[f"out_{level}_{i}_attn"] = attn_block(f"{p}output_blocks.{idx}.1")
                sub = 2
            if i == num_res_blocks and level != 0:
                out[f"up_{level}"] = {
                    "conv": _conv(sd, f"{p}output_blocks.{idx}.{sub}.conv")
                }
                ds //= 2
            idx += 1

    return {"params": out}


def _vae_res(sd, key):
    r = {
        "norm1": _gn32(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _gn32(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.nin_shortcut.weight" in sd:
        r["nin_shortcut"] = _conv(sd, f"{key}.nin_shortcut")
    return r


def _vae_attn(sd, key):
    return {
        "norm": _gn32(sd, f"{key}.norm"),
        "q": _conv(sd, f"{key}.q"),
        "k": _conv(sd, f"{key}.k"),
        "v": _conv(sd, f"{key}.v"),
        "proj_out": _conv(sd, f"{key}.proj_out"),
    }


def convert_vae_encoder(sd, prefix="first_stage_model.", channel_mult=(1, 2, 4, 4),
                        num_res_blocks=2) -> dict:
    p = f"{prefix}encoder."
    out = {
        "conv_in": _conv(sd, f"{p}conv_in"),
        "mid_block_1": _vae_res(sd, f"{p}mid.block_1"),
        "mid_attn": _vae_attn(sd, f"{p}mid.attn_1"),
        "mid_block_2": _vae_res(sd, f"{p}mid.block_2"),
        "norm_out": _gn32(sd, f"{p}norm_out"),
        "conv_out": _conv(sd, f"{p}conv_out"),
        "quant_conv": _conv(sd, f"{prefix}quant_conv"),
    }
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            out[f"down_{level}_block_{i}"] = _vae_res(sd, f"{p}down.{level}.block.{i}")
        if level != len(channel_mult) - 1:
            out[f"down_{level}_downsample"] = _conv(
                sd, f"{p}down.{level}.downsample.conv"
            )
    return {"params": out}


def convert_vae_decoder(sd, prefix="first_stage_model.", channel_mult=(1, 2, 4, 4),
                        num_res_blocks=2) -> dict:
    p = f"{prefix}decoder."
    out = {
        "post_quant_conv": _conv(sd, f"{prefix}post_quant_conv"),
        "conv_in": _conv(sd, f"{p}conv_in"),
        "mid_block_1": _vae_res(sd, f"{p}mid.block_1"),
        "mid_attn": _vae_attn(sd, f"{p}mid.attn_1"),
        "mid_block_2": _vae_res(sd, f"{p}mid.block_2"),
        "norm_out": _gn32(sd, f"{p}norm_out"),
        "conv_out": _conv(sd, f"{p}conv_out"),
    }
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks + 1):
            out[f"up_{level}_block_{i}"] = _vae_res(sd, f"{p}up.{level}.block.{i}")
        if level != 0:
            out[f"up_{level}_conv"] = _conv(sd, f"{p}up.{level}.upsample.conv")
    return {"params": out}


def convert_clip_vision(sd, prefix="cond_stage_model.model.visual.", layers=24) -> dict:
    """OpenAI CLIP visual tower.  In-proj is a single packed qkv matrix in
    the openai checkpoint (in_proj_weight) -> split to q/k/v."""
    p = prefix
    out = {
        "patch_embed": {"kernel": np.transpose(_np(sd[f"{p}conv1.weight"]), (2, 3, 1, 0))},
        "class_embedding": _np(sd[f"{p}class_embedding"]),
        "positional_embedding": _np(sd[f"{p}positional_embedding"]),
        "ln_pre": _ln(sd, f"{p}ln_pre"),
        "ln_post": _ln(sd, f"{p}ln_post"),
        "proj": _np(sd[f"{p}proj"]),
    }
    for i in range(layers):
        b = f"{p}transformer.resblocks.{i}"
        w = _np(sd[f"{b}.attn.in_proj_weight"])
        bi = _np(sd[f"{b}.attn.in_proj_bias"])
        C = w.shape[0] // 3
        qw, kw, vw = w[:C], w[C : 2 * C], w[2 * C :]
        qb, kb, vb = bi[:C], bi[C : 2 * C], bi[2 * C :]
        out[f"resblock_{i}"] = {
            "ln_1": _ln(sd, f"{b}.ln_1"),
            "ln_2": _ln(sd, f"{b}.ln_2"),
            "attn": {
                "q_proj": {"kernel": qw.T, "bias": qb},
                "k_proj": {"kernel": kw.T, "bias": kb},
                "v_proj": {"kernel": vw.T, "bias": vb},
                "out_proj": _lin(sd, f"{b}.attn.out_proj"),
            },
            "fc": _lin(sd, f"{b}.mlp.c_fc"),
            "proj": _lin(sd, f"{b}.mlp.c_proj"),
        }
    return {"params": out}


def convert_zero123(sd, template=None) -> dict:
    """Full Zero123 stage params from a LatentDiffusion checkpoint.

    Selects the EMA weights for the UNet when present (model_ema.* keys,
    the weights used at sampling via ema_scope, zero123_utils.py:63)."""
    ema = {k: v for k, v in sd.items() if k.startswith("model_ema.")}
    if ema:
        # LitEma flattens names by dropping dots: modelema keys match
        # 'model_ema.diffusion_modelXyz' - remap onto the raw names
        raw_unet = {
            k: v for k, v in sd.items() if k.startswith("model.diffusion_model.")
        }
        remapped = {}
        for k in raw_unet:
            ek = "model_ema." + k[len("model.") :].replace(".", "")
            remapped[k] = ema.get(ek, sd[k])
        sd = {**sd, **remapped}

    cc = {
        "params": {
            "kernel": _np(sd["cc_projection.weight"]).T,
            "bias": _np(sd["cc_projection.bias"]),
        }
    }
    return {
        "unet": convert_unet(sd),
        "encoder": convert_vae_encoder(sd),
        "decoder": convert_vae_decoder(sd),
        "clip": convert_clip_vision(sd),
        "cc_projection": cc,
    }


# --------------------------------------------------------------------------
# SAM ViT-H
# --------------------------------------------------------------------------


def convert_sam(sd, depth=32) -> dict:
    """sam_vit_h_4b8939.pth -> SamStage params (encoder + decoder + prompt)."""
    p = "image_encoder."
    enc = {
        "patch_embed": _conv(sd, f"{p}patch_embed.proj"),
        "pos_embed": _np(sd[f"{p}pos_embed"]),
        "neck_conv1": _conv(sd, f"{p}neck.0", bias=False),
        "neck_ln1": {"weight": _np(sd[f"{p}neck.1.weight"]), "bias": _np(sd[f"{p}neck.1.bias"])},
        "neck_conv2": _conv(sd, f"{p}neck.2", bias=False),
        "neck_ln2": {"weight": _np(sd[f"{p}neck.3.weight"]), "bias": _np(sd[f"{p}neck.3.bias"])},
    }
    for i in range(depth):
        b = f"{p}blocks.{i}"
        enc[f"block_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "attn": {
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
                "rel_pos_h": _np(sd[f"{b}.attn.rel_pos_h"]),
                "rel_pos_w": _np(sd[f"{b}.attn.rel_pos_w"]),
            },
            "mlp_lin1": _lin(sd, f"{b}.mlp.lin1"),
            "mlp_lin2": _lin(sd, f"{b}.mlp.lin2"),
        }

    d = "mask_decoder."
    t = f"{d}transformer."

    def twoway_attn(key):
        return {
            "q_proj": _lin(sd, f"{key}.q_proj"),
            "k_proj": _lin(sd, f"{key}.k_proj"),
            "v_proj": _lin(sd, f"{key}.v_proj"),
            "out_proj": _lin(sd, f"{key}.out_proj"),
        }

    def twoway_block(key):
        return {
            "self_attn": twoway_attn(f"{key}.self_attn"),
            "cross_attn_t2i": twoway_attn(f"{key}.cross_attn_token_to_image"),
            "cross_attn_i2t": twoway_attn(f"{key}.cross_attn_image_to_token"),
            "norm1": _ln(sd, f"{key}.norm1"),
            "norm2": _ln(sd, f"{key}.norm2"),
            "norm3": _ln(sd, f"{key}.norm3"),
            "norm4": _ln(sd, f"{key}.norm4"),
            "mlp_lin1": _lin(sd, f"{key}.mlp.lin1"),
            "mlp_lin2": _lin(sd, f"{key}.mlp.lin2"),
        }

    def mlp(key, n=3):
        return {f"lin{i}": _lin(sd, f"{key}.layers.{i}") for i in range(n)}

    dec = {
        "iou_token": _np(sd[f"{d}iou_token.weight"]),
        "mask_tokens": _np(sd[f"{d}mask_tokens.weight"]),
        "layer0": twoway_block(f"{t}layers.0"),
        "layer1": twoway_block(f"{t}layers.1"),
        "final_attn": twoway_attn(f"{t}final_attn_token_to_image"),
        "norm_final": _ln(sd, f"{t}norm_final_attn"),
        "upscale_conv1": _convtranspose(sd, f"{d}output_upscaling.0"),
        "upscale_ln": {
            "weight": _np(sd[f"{d}output_upscaling.1.weight"]),
            "bias": _np(sd[f"{d}output_upscaling.1.bias"]),
        },
        "upscale_conv2": _convtranspose(sd, f"{d}output_upscaling.3"),
        "iou_head": mlp(f"{d}iou_prediction_head"),
    }
    for i in range(4):
        dec[f"hyper_{i}"] = mlp(f"{d}output_hypernetworks_mlps.{i}")

    extra = {
        "pe_gaussian": _np(
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
        ),
        # box corners use point_embeddings 2 and 3 (SAM _embed_boxes)
        "box_embed": np.stack(
            [
                _np(sd["prompt_encoder.point_embeddings.2.weight"])[0],
                _np(sd["prompt_encoder.point_embeddings.3.weight"])[0],
            ]
        ),
    }
    return {
        "encoder": {"params": enc},
        "decoder": {"params": dec},
        "extra": extra,
    }


def _convtranspose(sd, key):
    """torch ConvTranspose2d weight [I, O, kh, kw] -> flax ConvTranspose
    kernel [kh, kw, I, O].

    flax ConvTranspose (transpose_kernel=False) is a fractionally-strided
    *forward* conv, not torch's gradient-of-conv, so the spatial taps must
    additionally be flipped (verified numerically: without the flip a 2x2
    stride-2 deconv produces mirrored output blocks;
    tests/test_torch_parity.py::test_convtranspose_numeric)."""
    w = _np(sd[f"{key}.weight"])
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"]
    return obj


# --------------------------------------------------------------------------
# LoFTR (indoor_ds_new.ckpt)
# --------------------------------------------------------------------------


def _bn(sd, key):
    """BatchNorm -> (params, batch_stats)."""
    p = {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}
    s = {"mean": _np(sd[f"{key}.running_mean"]), "var": _np(sd[f"{key}.running_var"])}
    return p, s


def convert_loftr(sd) -> dict:
    """indoor_ds_new.ckpt state dict -> LoFTRModules variables.

    Keys may carry the Lightning 'matcher.' prefix (stripped here, matching
    the reference's load_state_dict shim, loftr.py:78-82).
    """
    class _Stripped:
        """Transparent 'matcher.'-prefix adapter (keeps lazy dicts lazy)."""

        def __init__(self, inner):
            self.inner = inner

        def __getitem__(self, k):
            pk = "matcher." + k
            return self.inner[pk] if pk in self.inner else self.inner[k]

        def __contains__(self, k):
            return ("matcher." + k) in self.inner or k in self.inner

    sd = _Stripped(sd)
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv(flax_path, key, bias=False):
        put(params, flax_path + ("kernel",), np.transpose(_np(sd[f"{key}.weight"]), (2, 3, 1, 0)))
        if bias and f"{key}.bias" in sd:
            put(params, flax_path + ("bias",), _np(sd[f"{key}.bias"]))

    def bn(flax_path, key):
        p, s = _bn(sd, key)
        for k, v in p.items():
            put(params, flax_path + (k,), v)
        for k, v in s.items():
            put(stats, flax_path + (k,), v)

    b = ("backbone",)
    conv(b + ("conv1",), "backbone.conv1")
    bn(b + ("bn1",), "backbone.bn1")
    for layer in (1, 2, 3):
        for blk in (0, 1):
            fp = b + (f"layer{layer}_{blk}",)
            tp = f"backbone.layer{layer}.{blk}"
            conv(fp + ("conv1",), f"{tp}.conv1")
            conv(fp + ("conv2",), f"{tp}.conv2")
            bn(fp + ("bn1",), f"{tp}.bn1")
            bn(fp + ("bn2",), f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in sd:
                conv(fp + ("down_conv",), f"{tp}.downsample.0")
                bn(fp + ("down_bn",), f"{tp}.downsample.1")
    conv(b + ("layer3_outconv",), "backbone.layer3_outconv")
    conv(b + ("layer2_outconv",), "backbone.layer2_outconv")
    conv(b + ("layer2_outconv2_0",), "backbone.layer2_outconv2.0")
    bn(b + ("layer2_outconv2_bn",), "backbone.layer2_outconv2.1")
    conv(b + ("layer2_outconv2_1",), "backbone.layer2_outconv2.3")
    conv(b + ("layer1_outconv",), "backbone.layer1_outconv")
    conv(b + ("layer1_outconv2_0",), "backbone.layer1_outconv2.0")
    bn(b + ("layer1_outconv2_bn",), "backbone.layer1_outconv2.1")
    conv(b + ("layer1_outconv2_1",), "backbone.layer1_outconv2.3")

    def encoder_layer(flax_path, key):
        for name in ("q_proj", "k_proj", "v_proj", "merge"):
            put(params, flax_path + (name, "kernel"), _np(sd[f"{key}.{name}.weight"]).T)
        put(params, flax_path + ("mlp0", "kernel"), _np(sd[f"{key}.mlp.0.weight"]).T)
        put(params, flax_path + ("mlp2", "kernel"), _np(sd[f"{key}.mlp.2.weight"]).T)
        for n in ("norm1", "norm2"):
            put(params, flax_path + (n, "scale"), _np(sd[f"{key}.{n}.weight"]))
            put(params, flax_path + (n, "bias"), _np(sd[f"{key}.{n}.bias"]))

    # layer_names = ['self','cross']*4: layers[2i]=self_i, layers[2i+1]=cross_i
    for i in range(4):
        encoder_layer(("coarse_tf", f"self_{i}"), f"loftr_coarse.layers.{2 * i}")
        encoder_layer(("coarse_tf", f"cross_{i}"), f"loftr_coarse.layers.{2 * i + 1}")
    encoder_layer(("fine_tf", "self_0"), "loftr_fine.layers.0")
    encoder_layer(("fine_tf", "cross_0"), "loftr_fine.layers.1")

    for name, key in (("down_proj", "fine_preprocess.down_proj"),
                      ("merge_feat", "fine_preprocess.merge_feat")):
        put(params, (name, "kernel"), _np(sd[f"{key}.weight"]).T)
        put(params, (name, "bias"), _np(sd[f"{key}.bias"]))

    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# Reconstruction (ckpt_215000.pth: dict of per-network state dicts,
# exp_runner_generic_blender_val.py:485-512 save format)
# --------------------------------------------------------------------------


def _convbn(sd, key_conv, key_bn, eps=1e-5):
    """ConvBnAct (Conv_0 + BatchNorm_0) from conv + InPlaceABN keys.

    InPlaceABN's effective scale is ``|gamma| + eps`` (the official
    mapillary implementation clamps gamma away from zero so the in-place
    op stays invertible) — fold that into the converted BN scale."""
    p, s = _bn(sd, key_bn)
    p = {**p, "scale": np.abs(p["scale"]) + eps}
    return (
        {"Conv_0": _conv(sd, key_conv, bias=False), "BatchNorm_0": p},
        {"BatchNorm_0": s},
    )


def _sparse_conv3d(sd, key, transposed=False, order="zyx"):
    """torchsparse spnn.Conv3d kernel [K, I, O] -> flax [kx, ky, kz, I, O].

    K = 27 offsets.  torchsparse v1.4 ``get_kernel_offsets`` enumerates odd
    kernels as ``[[x, y, z] for z in r for y in r for x in r]`` — x varies
    FASTEST, z slowest — so ``w.reshape(k, k, k)`` yields axes (z, y, x) and
    the default ``order='zyx'`` applies the (2, 1, 0) transpose to reach our
    (kx, ky, kz) layout (validated against a vendored dense-equivalent of
    the torchsparse enumeration in tests/test_torch_parity.py).
    Transposed convs additionally need a full spatial flip: torchsparse
    deconv scatters ``out[p + offset_k] += in[p] @ W[k]`` while our decoder
    is zero-upsample + forward cross-correlation (recon/costreg.py).
    """
    w = _np(sd[f"{key}.kernel"] if f"{key}.kernel" in sd else sd[f"{key}.weight"])
    if w.ndim == 2:  # 1x1x1 kernel stored as [I, O]
        return {"kernel": w[None, None, None]}
    K, ci, co = w.shape
    k = round(K ** (1 / 3))
    w = w.reshape(k, k, k, ci, co)
    if order == "zyx":
        w = np.transpose(w, (2, 1, 0, 3, 4))
    if transposed:
        w = w[::-1, ::-1, ::-1]
    return {"kernel": np.ascontiguousarray(w)}


def _wn_dense(sd, key):
    """torch weight_norm Linear -> WNDense {v [in,out], g [out], bias}."""
    return {
        "v": _np(sd[f"{key}.weight_v"]).T,
        "g": _np(sd[f"{key}.weight_g"])[:, 0],
        "bias": _np(sd[f"{key}.bias"]),
    }


def convert_recon(ckpt: dict, num_sdf_layers: int = 4, offset_order: str = "zyx") -> dict:
    """ckpt_215000.pth -> ReconStage params.

    ``ckpt`` is the torch checkpoint dict with keys sdf_network_lod0,
    rendering_network_lod0, variance_network_lod0,
    pyramid_feature_network_lod0 (state dicts each).  Checkpoints trained
    with num_lods=2 (exp_runner load/save at val.py:435-512) additionally
    carry the *_lod1 groups; those land under the matching ``*_lod1``
    parameter trees (ReconStage.init_params).
    """
    out = _convert_recon_lod(ckpt, "lod0", num_sdf_layers, offset_order)
    if "sdf_network_lod1" in ckpt:
        lod1 = _convert_recon_lod(ckpt, "lod1", num_sdf_layers, offset_order)
        out.update({f"{k}_lod1": v for k, v in lod1.items()})
    return out


def _convert_recon_lod(
    ckpt: dict, lod: str, num_sdf_layers: int, offset_order: str
) -> dict:
    """One lod's four network groups -> {fusion, sdf, render, variance}."""
    out: dict = {}

    # ---- FeatureNet FPN (pyramid_feature_network_<lod>)
    fp = ckpt[f"pyramid_feature_network_{lod}"]
    fpn_p: dict = {}
    fpn_s: dict = {}
    cba = 0
    for conv_key, n in (("conv0", 2), ("conv1", 3), ("conv2", 3)):
        for i in range(n):
            p, s = _convbn(fp, f"{conv_key}.{i}.conv", f"{conv_key}.{i}.bn")
            fpn_p[f"ConvBnAct_{cba}"] = p
            fpn_s[f"ConvBnAct_{cba}"] = s
            cba += 1
    for name in ("toplayer", "lat1", "lat0", "smooth1", "smooth0"):
        fpn_p[name] = _conv(fp, name)
    out["fusion"] = {
        "params": {"fpn": fpn_p},
        "batch_stats": {"fpn": fpn_s},
    }

    # ---- SdfVolumeNetwork (sdf_network_<lod>)
    sd = ckpt[f"sdf_network_{lod}"]
    sdf_p: dict = {}
    sdf_s: dict = {}
    p, s = _convbn(sd, "compress_layer.conv", "compress_layer.bn")
    sdf_p["compress"] = p
    sdf_s["compress"] = s

    # SparseCostRegNet: conv0, conv1..conv6 (stride pattern), deconv 7/9/11
    reg_p: dict = {}
    reg_s: dict = {}
    enc = [("conv0", 0), ("conv1", 1), ("conv2", 2), ("conv3", 3), ("conv4", 4),
           ("conv5", 5), ("conv6", 6)]
    for name, idx in enc:
        bnp, bns = _bn(sd, f"sparse_costreg_net.{name}.net.1")
        reg_p[f"_MConvBnRelu_{idx}"] = {
            "Conv_0": _sparse_conv3d(sd, f"sparse_costreg_net.{name}.net.0", order=offset_order),
            "MaskedBatchNorm_0": bnp,
        }
        reg_s[f"_MConvBnRelu_{idx}"] = {"MaskedBatchNorm_0": bns}
    for name, idx in (("conv7", 0), ("conv9", 1), ("conv11", 2)):
        bnp, bns = _bn(sd, f"sparse_costreg_net.{name}.net.1")
        reg_p[f"_MDeconvBnRelu_{idx}"] = {
            "Conv_0": _sparse_conv3d(
                sd, f"sparse_costreg_net.{name}.net.0", transposed=True, order=offset_order
            ),
            "MaskedBatchNorm_0": bnp,
        }
        reg_s[f"_MDeconvBnRelu_{idx}"] = {"MaskedBatchNorm_0": bns}
    sdf_p["costreg"] = reg_p
    sdf_s["costreg"] = reg_s

    sdf_p["sdf_layer"] = {
        f"lin{l}": _wn_dense(sd, f"sdf_layer.lin{l}") for l in range(num_sdf_layers - 1)
    }
    out["sdf"] = {"params": sdf_p, "batch_stats": sdf_s}

    # ---- GeneralRenderingNetwork (rendering_network_<lod>)
    rn = ckpt[f"rendering_network_{lod}"]
    render_p = {
        "s": _np(rn["s"]).reshape(()),
        "ray_dir_fc0": _lin(rn, "ray_dir_fc.0"),
        "ray_dir_fc1": _lin(rn, "ray_dir_fc.2"),
        "base_fc0": _lin(rn, "base_fc.0"),
        "base_fc1": _lin(rn, "base_fc.2"),
        "vis_fc0": _lin(rn, "vis_fc.0"),
        "vis_fc1": _lin(rn, "vis_fc.2"),
        "vis_fc2_0": _lin(rn, "vis_fc2.0"),
        "vis_fc2_1": _lin(rn, "vis_fc2.2"),
        "rgb_fc0": _lin(rn, "rgb_fc.0"),
        "rgb_fc1": _lin(rn, "rgb_fc.2"),
        "rgb_fc2": _lin(rn, "rgb_fc.4"),
    }
    out["render"] = {"params": render_p}

    # ---- SingleVarianceNetwork
    vn = ckpt[f"variance_network_{lod}"]
    out["variance"] = {"params": {"variance": _np(vn["variance"]).reshape(())}}
    return out
