"""G: StyleGAN2-resnet generator with multi-scale style routing and the
correspondence feature branch.

Architecture parity with reference models/networks/generator.py:104-281
(StyleGAN2ResnetGenerator):

* SpatialCodeModulation -> ``netG_num_base_resnet_layers`` resolution-
  preserving styled resblocks at structure-code resolution -> one
  upsampling styled resblock per encoder downsampling -> ToRGB.
* Style routing (:246-271): head blocks use global_codes[-1], upsampling
  block j uses global_codes[-2-j], ToRGB uses global_codes[0]; all codes
  are L2-normalized on entry.
* ``extract_features``: stop-gradient taps at each resolution through
  small conv stacks, fused by ``layert`` (3 residual blocks, 256ch at
  structure resolution -> ``feat``) and ``layert1`` (-> 64ch at 256x256
  -> ``feat1``), feeding corrm/Rselfcorr (:174-238, :252-280).
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.nn.layers import (
    ConvLayer,
    EqualLinear,
    PReLU,
    StyledConv,
    ToRGB,
    TorchConv2d,
    instance_norm,
)
from ppst_tpu.ops.corr import adaptive_avg_pool, resize_bilinear


def _pad_replicate(x, p: int):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")


def _style_normalize(v):
    """The generator's style normalization is v * rsqrt(sum(v^2) + 1e-8)
    (reference util/util.py:18-22), slightly different from E2's
    F.normalize-style clamp. f32 internally for bf16-mode stability."""
    v32 = v.astype(jnp.float32)
    out = v32 * jax.lax.rsqrt(jnp.sum(v32**2, axis=-1, keepdims=True) + 1e-8)
    return out.astype(v.dtype)


class GeneratorModulation(nn.Module):
    """x * scale(style) + bias(style) (reference generator.py:80-91;
    only the vector-style branch is live)."""

    features: int

    @nn.compact
    def __call__(self, x, style):
        scale = EqualLinear(self.features, name="scale")(style)
        bias = EqualLinear(self.features, name="bias")(style)
        return x * scale[:, None, None, :] + bias[:, None, None, :]


class ResolutionPreservingResnetBlock(nn.Module):
    """(skip + styledconv x2) / sqrt(2) (reference generator.py:47-60)."""

    features: int
    fused: bool = False

    @nn.compact
    def __call__(self, x, style, noises=(None, None)):
        in_ch = x.shape[-1]
        res = StyledConv(self.features, 3, fused=self.fused,
                         name="conv1")(x, style, noises[0])
        res = StyledConv(self.features, 3, fused=self.fused,
                         name="conv2")(res, style, noises[1])
        skip = x
        if in_ch != self.features:
            skip = ConvLayer(
                self.features, 1, activate=False, use_bias=False, name="skip"
            )(x)
        return (skip + res) / math.sqrt(2.0)


class UpsamplingResnetBlock(nn.Module):
    """Upsampling styled resblock with bilinear skip
    (reference generator.py:63-77)."""

    features: int
    use_noise: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x, style, noises=(None, None)):
        in_ch = x.shape[-1]
        res = StyledConv(
            self.features, 3, upsample=True, use_noise=self.use_noise, name="conv1"
        )(x, style, noises[0])
        res = StyledConv(
            self.features, 3, use_noise=self.use_noise, fused=self.fused,
            name="conv2"
        )(res, style, noises[1])
        skip = x
        if in_ch != self.features:
            skip = ConvLayer(self.features, 1, activate=True, use_bias=True, name="skip")(x)
        b, h, w, c = skip.shape
        skip = resize_bilinear(skip, (h * 2, w * 2))
        return (skip + res) / math.sqrt(2.0)


class _ResidualBlock(nn.Module):
    """Plain residual block with shared PReLU (reference generator.py:10-32;
    the same PReLU parameter is used after both convs there, kept)."""

    features: int

    @nn.compact
    def __call__(self, x):
        prelu = PReLU(name="prelu")
        y = _pad_replicate(x, 1)
        y = TorchConv2d(self.features, 3, name="conv1")(y)
        y = instance_norm(y)
        y = prelu(y)
        y = _pad_replicate(y, 1)
        y = TorchConv2d(self.features, 3, name="conv2")(y)
        y = instance_norm(y)
        return prelu(y + x)


class _Conv1x1Params(nn.Module):
    """Parameter-only twin of a 1x1 ``TorchConv2d`` (same names, shapes,
    and initializers, so the param tree and init values are identical to
    the composite path) for kernels that consume the raw weights."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        from ppst_tpu.nn.layers import torch_bias_uniform_init, torch_kaiming_uniform_init

        w = self.param(
            "weight", torch_kaiming_uniform_init,
            (1, 1, in_ch, self.features), jnp.float32,
        )
        b = self.param(
            "bias", torch_bias_uniform_init(in_ch), (self.features,), jnp.float32
        )
        return w[0, 0], b


class _PReLUParam(nn.Module):
    """Parameter-only twin of ``PReLU``."""

    @nn.compact
    def __call__(self):
        return self.param(
            "alpha", nn.initializers.constant(0.25), (1,), jnp.float32
        )[0]


class _FeatureTap(nn.Module):
    """Per-resolution feature tap (reference generator.py:174-224:
    layer32/64/128 = padded 3x3 stack, layer256 = 1x1 stack). The leading
    instance norm runs on the *padded* input, matching the reference's
    Sequential ordering. Channel widths derive from ``feature_ch``
    (reference ``feature_channel=256`` -> 128/64, identical at the
    default; slimmed configs scale the whole branch).

    ``fused``: route the 1x1 tap through the fused Pallas IN-chain kernel
    (ops.tap_pallas) in bfloat16 compute mode — the XLA composite is
    bandwidth-bound on the generator's largest activation. Same
    parameters, same math modulo bf16 rounding; differentiable (Pallas
    backward kernels, round 5), gated by PPSTConfig.fused_tap."""

    conv1x1: bool = False
    feature_ch: int = 256
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        mid, out = self.feature_ch // 2, self.feature_ch // 4
        if self.conv1x1:
            if self.fused and x.dtype == jnp.bfloat16:
                from ppst_tpu.ops.tap_pallas import fused_tap_1x1

                w1, b1 = _Conv1x1Params(out, name="conv1")(x.shape[-1])
                a1 = _PReLUParam(name="prelu1")()
                w2, b2 = _Conv1x1Params(out, name="conv2")(out)
                a2 = _PReLUParam(name="prelu2")()
                return fused_tap_1x1(x, w1, b1, a1, w2, b2, a2)
            y = instance_norm(x)
            y = TorchConv2d(out, 1, name="conv1")(y)
            y = instance_norm(y)
            y = PReLU(name="prelu1")(y)
            y = TorchConv2d(out, 1, name="conv2")(y)
            y = instance_norm(y)
            return PReLU(name="prelu2")(y)
        y = instance_norm(_pad_replicate(x, 1))
        y = TorchConv2d(mid, 3, name="conv1")(y)
        y = instance_norm(y)
        y = PReLU(name="prelu1")(y)
        y = _pad_replicate(y, 1)
        y = TorchConv2d(out, 3, name="conv2")(y)
        y = instance_norm(y)
        return PReLU(name="prelu2")(y)


class Generator(nn.Module):
    cfg: PPSTConfig

    @nn.compact
    def __call__(
        self,
        spatial_code,
        global_codes,
        extract_features: bool = False,
        noises=None,
    ):
        """``noises``: optional flat list of fixed per-StyledConv noise
        arrays in call order (2 per head block, then 2 per upsampling
        block) — the fix_noise capability (reference ppst_model.py:250-262,
        base_network.py:41-49). ``make_fixed_noise`` builds a matching list.
        """
        cfg = self.cfg
        n_up = cfg.netE_num_downsampling_sp
        codes = [_style_normalize(c) for c in global_codes]
        noise_it = iter(noises) if noises is not None else None

        def take2():
            if noise_it is None:
                return (None, None)
            return (next(noise_it), next(noise_it))

        # cfg.remat_blocks: checkpoint each resblock separately (see
        # config.py) — param names/values unchanged (lifted transform).
        # prevent_cse stays True: False lets XLA CSE the recompute against
        # the saved forward, undoing the remat (measured OOM at the outer
        # jax.checkpoint level, round 4 — same hazard here).
        Head = (nn.remat(ResolutionPreservingResnetBlock)
                if cfg.remat_blocks else ResolutionPreservingResnetBlock)
        Up = (nn.remat(UpsamplingResnetBlock)
              if cfg.remat_blocks else UpsamplingResnetBlock)

        fuse_sc = getattr(cfg, "fused_styled_conv", False)
        x = GeneratorModulation(cfg.spatial_code_ch, name="sp_mod")(
            spatial_code, codes[-1]
        )
        for i in range(cfg.netG_num_base_resnet_layers):
            out_ch = (i + 1) / cfg.netG_num_base_resnet_layers * cfg.nf_g(0)
            out_ch = max(cfg.spatial_code_ch, round(out_ch))
            x = Head(out_ch, fused=fuse_sc, name=f"head{i}")(
                x, codes[-1], take2()
            )

        fc = cfg.netG_resnet_ch  # reference feature_channel (generator.py:226)
        # cfg.remat_taps: checkpoint each tap/fuse block separately so the
        # extraction backward recomputes them one at a time instead of
        # keeping every 512^2/256^2 intermediate live (HBM-headroom knob
        # for beyond-512px training — see the BASELINE.md batch-sweep
        # table). Same params/names (nn.remat is a lifted transform);
        # pure compute/memory trade.
        Tap = nn.remat(_FeatureTap) if cfg.remat_taps else _FeatureTap
        Fuse = nn.remat(_ResidualBlock) if cfg.remat_taps else _ResidualBlock
        feas = []
        if extract_features:
            feas.append(
                Tap(feature_ch=fc, name="tap32")(jax.lax.stop_gradient(x))
            )
        h0, w0 = x.shape[1], x.shape[2]

        for j in range(n_up):
            x = Up(
                cfg.nf_g(j + 1), use_noise=cfg.netG_use_noise,
                fused=fuse_sc, name=f"up{2 ** (4 + j)}"
            )(x, codes[-2 - j], take2())
            if extract_features:
                feas.append(
                    Tap(
                        conv1x1=(j == n_up - 1),
                        feature_ch=fc,
                        fused=cfg.fused_tap,
                        name=f"tap{2 ** (6 + j)}",
                    )(jax.lax.stop_gradient(x))
                )

        rgb = ToRGB(name="to_rgb")(x, codes[0])
        if not extract_features:
            return rgb

        feat = jnp.concatenate(
            [feas[0]] + [adaptive_avg_pool(f, (h0, w0)) for f in feas[1:]], axis=-1
        )
        # The reference fixes this at 256x256 (generator.py:274-277), which
        # only lines up with Rselfcorr's 4x4 patching for 512px inputs;
        # 4*grid generalizes it (== 256 at 512px, exact parity there).
        feat1 = jnp.concatenate(
            [resize_bilinear(f, (4 * h0, 4 * w0)) for f in feas], axis=-1
        )
        # fuse width = concat of the (n_up+1) taps; == fc (=256) at the
        # reference's 3-downsample default
        fuse_ch = cfg.g_fuse_ch
        for i in range(3):
            feat = Fuse(fuse_ch, name=f"fuse{i}")(feat)
        feat1 = Fuse(fuse_ch, name="fuse1_res")(feat1)
        feat1 = TorchConv2d(fc // 4, 1, name="fuse1_conv")(feat1)
        return rgb, feat, feat1


def make_fixed_noise(cfg: PPSTConfig, rng, batch: int, crop: int):
    """Sample a fixed noise list for flicker-free inference (the
    fix_noise capability): one (B, H, W, 1) array per StyledConv in call
    order. Pass to Generator.__call__/PPSTModel.decode via ``noises``."""
    grid = crop // (2 ** cfg.netE_num_downsampling_sp)
    shapes = []
    for _ in range(cfg.netG_num_base_resnet_layers):
        shapes += [grid, grid]
    h = grid
    for _ in range(cfg.netE_num_downsampling_sp):
        h *= 2
        shapes += [h, h]
    keys = jax.random.split(rng, len(shapes))
    return [
        jax.random.normal(k, (batch, s, s, 1), jnp.float32)
        for k, s in zip(keys, shapes)
    ]
