"""Convert reference PPST torch checkpoints to ppst_tpu param trees.

The reference saves one state_dict over the whole PPSTModel
(models/base_model.py:33-41) with prefixes E1./E2./G./D. (plus RSCL
queues and counters). This module maps those keys onto the flax param
trees of ppst_tpu.models — enabling (a) loading the published pretrained
checkpoint and (b) cross-implementation numerical parity tests.

Layout notes: torch convs are (O, I, kh, kw) -> flax (kh, kw, I, O);
torch linears (O, I) -> (I, O). Dead reference members (mlp_01,
ToGlobalCode, blur-kernel buffers) are ignored.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _cw(w):  # conv weight
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _lw(w):  # linear weight
    return np.transpose(np.asarray(w), (1, 0))


def _a(w):
    return np.asarray(w)


class _SD:
    """Prefix-scoped view over a flat state dict."""

    def __init__(self, sd: Dict, prefix: str = ""):
        self.sd = sd
        self.prefix = prefix

    def __call__(self, key: str):
        full = self.prefix + key
        t = self.sd[full]
        return t.numpy() if hasattr(t, "numpy") else np.asarray(t)

    def sub(self, prefix: str) -> "_SD":
        return _SD(self.sd, self.prefix + prefix)

    def has(self, key: str) -> bool:
        return (self.prefix + key) in self.sd


def _conv_layer(sd: _SD, activate=True, conv_bias=False):
    """ConvLayer: Conv (+bias when not activated) + Act bias."""
    out = {"conv": {"weight": _cw(sd("Conv.weight"))}}
    if sd.has("Conv.bias"):
        out["conv"]["bias"] = _a(sd("Conv.bias"))
    if sd.has("Act.bias"):
        out["act_bias"] = _a(sd("Act.bias"))
    return out


def _res_block(sd: _SD):
    return {
        "conv1": _conv_layer(sd.sub("conv1.")),
        "conv2": _conv_layer(sd.sub("conv2.")),
        "skip": _conv_layer(sd.sub("skip.")),
    }


def _equal_linear(sd: _SD):
    return {"weight": _lw(sd("weight")), "bias": _a(sd("bias"))}


def _styled_conv(sd: _SD):
    return {
        "conv": {
            "weight": _cw(sd("conv.weight")),
            "bias": _a(sd("conv.bias")),
        },
        "noise": {"weight": _a(sd("noise.weight"))},
        "bias": _a(sd("bias")).reshape(-1),
        "act_bias": _a(sd("activate.bias")),
        "epi1": {
            "style_mod": {
                "lin": {
                    "weight": _lw(sd("epi1.style_mod.lin.weight")),
                    "bias": _a(sd("epi1.style_mod.lin.bias")),
                }
            }
        },
    }


def _torch_conv(sd: _SD, idx):
    return {
        "weight": _cw(sd(f"{idx}.weight")),
        "bias": _a(sd(f"{idx}.bias")),
    }


def convert_e1(sd: _SD, n_down: int = 3):
    params = {"from_rgb": _conv_layer(sd.sub("FromRGB."))}
    for i in range(n_down):
        params[f"down{2 ** i}"] = _res_block(
            sd.sub(f"DownToSpatialCode.ResBlockDownBy{2 ** i}.")
        )
    params["to_sp0"] = _conv_layer(sd.sub("ToSpatialCode.0."))
    params["to_sp1"] = _conv_layer(sd.sub("ToSpatialCode.1."))
    return params


def _projection_head(sd: _SD, scale_key: str):
    """conv1x1_<k> + projector<k> (Sequential ReLU/Linear indices 1,3,5)."""
    conv = sd.sub(f"conv1x1_{scale_key}.")
    proj = sd.sub(f"projector{scale_key}.")
    return {
        "reduce": {
            "weight": _lw(conv("weight")[:, :, 0, 0]),
            "bias": _a(conv("bias")),
        },
        "fc0": {"weight": _lw(proj("1.weight")), "bias": _a(proj("1.bias"))},
        "fc1": {"weight": _lw(proj("3.weight")), "bias": _a(proj("3.bias"))},
        "fc2": {"weight": _lw(proj("5.weight")), "bias": _a(proj("5.bias"))},
    }


def convert_e2(sd: _SD, n_down: int = 3):
    params = {"from_rgb": _conv_layer(sd.sub("FromRGB."))}
    params["head_in"] = _projection_head(sd, "9")
    for i in range(n_down):
        params[f"down{2 ** i}"] = _res_block(
            sd.sub(f"DownToGlobalCode1.ResBlockDownBy{2 ** i}.")
        )
        params[f"head{i}"] = _projection_head(sd, str(i))
    return params


def _residual_block(sd: _SD):
    return {
        "conv1": {"weight": _cw(sd("conv1.weight")), "bias": _a(sd("conv1.bias"))},
        "conv2": {"weight": _cw(sd("conv2.weight")), "bias": _a(sd("conv2.bias"))},
        "prelu": {"alpha": _a(sd("prelu.weight"))},
    }


def _feature_tap(sd: _SD):
    """Sequential: 2=conv, 4=PReLU, 6=conv, 8=PReLU."""
    return {
        "conv1": _torch_conv(sd, 2),
        "prelu1": {"alpha": _a(sd("4.weight"))},
        "conv2": _torch_conv(sd, 6),
        "prelu2": {"alpha": _a(sd("8.weight"))},
    }


def convert_g(sd: _SD, n_base: int = 4, n_up: int = 3):
    params = {
        "sp_mod": {
            "scale": _equal_linear(sd.sub("SpatialCodeModulation.scale.")),
            "bias": _equal_linear(sd.sub("SpatialCodeModulation.bias.")),
        }
    }
    for i in range(n_base):
        blk = sd.sub(f"HeadResnetBlock{i}.")
        p = {
            "conv1": _styled_conv(blk.sub("conv1.")),
            "conv2": _styled_conv(blk.sub("conv2.")),
        }
        if blk.has("skip.Conv.weight"):
            p["skip"] = _conv_layer(blk.sub("skip."))
        params[f"head{i}"] = p
    for j in range(n_up):
        key = 2 ** (4 + j)
        blk = sd.sub(f"UpsamplingResBlock{key}.")
        p = {
            "conv1": _styled_conv(blk.sub("conv1.")),
            "conv2": _styled_conv(blk.sub("conv2.")),
        }
        if blk.has("skip.Conv.weight"):
            p["skip"] = _conv_layer(blk.sub("skip."))
        params[f"up{key}"] = p
    params["to_rgb"] = {
        "conv": {
            "weight": _cw(sd("ToRGB.conv.weight")),
            "bias": _a(sd("ToRGB.conv.bias")),
        },
        "bias": _a(sd("ToRGB.bias")).reshape(-1),
        "epi1": {
            "style_mod": {
                "lin": {
                    "weight": _lw(sd("ToRGB.epi1.style_mod.lin.weight")),
                    "bias": _a(sd("ToRGB.epi1.style_mod.lin.bias")),
                }
            }
        },
    }
    for j, key in enumerate([32, 64, 128, 256][: n_up + 1]):
        params[f"tap{key}"] = _feature_tap(sd.sub(f"layer{key}."))
    for i in range(3):
        params[f"fuse{i}"] = _residual_block(sd.sub(f"layert.{i}."))
    params["fuse1_res"] = _residual_block(sd.sub("layert1.0."))
    params["fuse1_conv"] = _torch_conv(sd.sub("layert1."), 1)
    return params


def convert_d(sd: _SD, crop_size: int = 512):
    import math

    core = sd.sub("stylegan2_D.")
    size = 2 ** int(round(math.log2(crop_size)))
    log_size = int(math.log2(size))
    params = {"from_rgb": _conv_layer(core.sub("convs.0."))}
    for i in range(log_size, 2, -1):
        # reference layer naming: str(9-i) for i<=8 else "<s>x<s>"
        name = str(9 - i) if i <= 8 else f"{2 ** i}x{2 ** i}"
        params[f"res{2 ** i}"] = _res_block(core.sub(f"convs.{name}."))
    params["final_conv"] = _conv_layer(core.sub("final_conv."))
    params["fc0"] = _equal_linear(core.sub("final_linear.0."))
    params["fc1"] = _equal_linear(core.sub("final_linear.1."))
    return {"core": params}


def convert_reference_state_dict(sd: Dict, crop_size: int = 512):
    """Full reference checkpoint -> {"E1","E2","G","D"} param trees (plus
    RSCL queue state if present)."""
    root = _SD(sd)
    out = {
        "E1": convert_e1(root.sub("E1.")),
        "E2": convert_e2(root.sub("E2.")),
        "G": convert_g(root.sub("G.")),
    }
    if any(k.startswith("D.") for k in sd):
        out["D"] = convert_d(root.sub("D."), crop_size)
    return out


def load_reference_checkpoint(path: str, crop_size: int = 512):
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_reference_state_dict(sd, crop_size)
