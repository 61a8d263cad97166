"""StyleGAN2 building blocks as flax.linen modules, NHWC.

Architectural semantics follow the reference's layer zoo
(reference models/networks/stylegan2_layers.py — itself a rosinality
StyleGAN2 port) but the implementation is TPU-first: NHWC layout, XLA
convs with fused epilogues, and the upfirdn2d resampler from
``ppst_tpu.ops`` instead of the CUDA kernels.

Initialization matches the reference's *distributions* (equalized-LR
modules draw N(0,1) weights and apply 1/sqrt(fan_in) at runtime;
"equalized" TF-style modules bake the He std into the init; plain torch
convs use the kaiming-uniform default) so that training dynamics are
comparable; exact RNG streams are not reproducible across frameworks.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jax.ad_checkpoint import checkpoint_name

from ppst_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from ppst_tpu.ops.upfirdn2d import blur as blur_op


def saveable_kernel(w):
    """Tag a *prepared* conv/linear kernel (equalized-lr scale applied,
    antialias blur folded, upscale-kernel built) as a remat-saveable
    value. Under ``jax.checkpoint(..., policy=save_only_these_names(
    "ppst_kernel"))`` (models/ppst.py::_r) the backward pass reuses the
    prepared kernels instead of re-deriving them in every rematerialized
    recompute — kernel preparation is pure data formatting (scales,
    small fold convs, pads, flips, layout copies) that the round-4
    g_step profile measured at ~50+ ms/step of copy/reverse/pad HLOs.
    Saved-kernel memory is ~one bf16 copy of the conv params per
    rematted call site. Outside a checkpoint context this is a no-op."""
    return checkpoint_name(w, "ppst_kernel")

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

unit_normal_init = nn.initializers.normal(stddev=1.0)


def scaled_normal_init(stddev: float):
    return nn.initializers.normal(stddev=stddev)


def torch_kaiming_uniform_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d / nn.Linear default weight init: kaiming_uniform
    with a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    ``shape`` is (kh, kw, in, out) for convs or (in, out) for linears.
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_uniform_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Functional pieces
# ---------------------------------------------------------------------------


def instance_norm(x, eps: float = 1e-5):
    """Per-sample per-channel spatial normalization (torch InstanceNorm2d
    defaults: no affine, biased variance, eps=1e-5). x is NHWC. Statistics
    are computed in float32 so the bf16 compute mode stays stable.

    bfloat16 inputs use the one-pass E[x^2]-E[x]^2 form: both f32 stats
    then read the bf16 tensor directly (no materialized f32 copy), which
    measures 0.22 vs 0.31 ms/img @512^2x128 on v5e. The f32 path keeps
    the two-pass variance (bit-stable for the torch-oracle parity tests);
    one-pass cancellation error is far below bf16 resolution anyway."""
    x32 = x.astype(jnp.float32)
    if x.dtype == jnp.bfloat16:
        mean = x32.mean(axis=(1, 2), keepdims=True)
        msq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
    else:
        mean = x32.mean(axis=(1, 2), keepdims=True)
        var = x32.var(axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def pixel_norm(x, eps: float = 1e-8):
    """PixelNorm (reference stylegan2_layers.py:20-25): normalize the
    channel vector at each position by its RMS."""
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def _conv2d(x, w, stride: int = 1, padding=0, lhs_dilation=None):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def nearest_upsample2x(x):
    """Upscale2d (reference stylegan2_layers.py:90-109): nearest x2."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


# ---------------------------------------------------------------------------
# Equalized-learning-rate layers (runtime weight scaling)
# ---------------------------------------------------------------------------


class EqualConv2d(nn.Module):
    """Conv with N(0,1) weights scaled at runtime by 1/sqrt(fan_in)*lr_mul
    (reference stylegan2_layers.py:167-202).

    ``pre_blur``: static FIR taps of an antialiasing blur to fold INTO the
    conv kernel (exact composition: blur-then-correlate == correlate with
    the blur/weight cross-correlation). Removes the bandwidth-bound
    depthwise blur pass that precedes every downsampling conv. ``padding``
    may be an (p0, p1) pair when pre_blur is set.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: Any = 0
    use_bias: bool = True
    lr_mul: float = 1.0
    pre_blur: Optional[Sequence[float]] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "weight", unit_normal_init, (k, k, in_ch, self.features), jnp.float32
        )
        scale = self.lr_mul / math.sqrt(in_ch * k * k)
        w = w.astype(x.dtype) * scale
        if self.pre_blur is not None:
            taps = np.asarray(self.pre_blur, np.float32)
            b2d = np.outer(taps, taps)
            b2d = b2d / b2d.sum()
            t = b2d.shape[0]
            # C[v] = sum_t B[t] W[v - (t_len-1) + t]  (cross-correlation,
            # flipped placement) so that corr(conv(x, B), W) == corr(x, C).
            # Expressed as ONE full-padding conv over the kernel's spatial
            # dims with (in, out) as the batch axis — a t*t-term unrolled
            # .at[].add loop here costs ~30 HLO ops per conv (x2-3 with
            # autodiff), which dominated the train-step module size.
            in_ch_w, out_ch = w.shape[2], w.shape[3]
            wb = w.transpose(2, 3, 0, 1).reshape(in_ch_w * out_ch, k, k, 1)
            # derivation: comp[a] = sum_j b2d[t-1-j] w[a-j]; a full-pad
            # correlate gives out[a] = sum_j kern[t-1-j] w[a-j] -> kern=b2d
            bk = jnp.asarray(b2d, w.dtype).reshape(t, t, 1, 1)
            comp = jax.lax.conv_general_dilated(
                wb, bk, (1, 1), ((t - 1, t - 1), (t - 1, t - 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            kk = k + t - 1
            w = comp.reshape(in_ch_w, out_ch, kk, kk).transpose(2, 3, 0, 1)
        w = saveable_kernel(w)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif len(pad) == 2 and not isinstance(pad[0], (tuple, list)):
            pad = (tuple(pad), tuple(pad))
        y = _conv2d(x, w, self.stride, pad)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class EqualLinear(nn.Module):
    """Linear with runtime 1/sqrt(fan_in) scaling and optional fused-lrelu
    activation (reference stylegan2_layers.py:205-247)."""

    features: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None  # None | "fused_lrelu"

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param(
            "weight",
            scaled_normal_init(1.0 / self.lr_mul),
            (in_dim, self.features),
            jnp.float32,
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        y = x @ saveable_kernel(w.astype(x.dtype) * scale)
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                nn.initializers.constant(self.bias_init),
                (self.features,),
                jnp.float32,
            ).astype(y.dtype) * self.lr_mul
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(y, b)
        if b is not None:
            y = y + b
        return y


# ---------------------------------------------------------------------------
# TF-StyleGAN-style equalized layers (He std baked into init)
# ---------------------------------------------------------------------------


class EqualizedLinear(nn.Module):
    """TF-StyleGAN linear (reference stylegan2_layers.py:249-273).

    use_wscale=True (the StyleMod configuration, via LayerEpilogue's
    default): N(0,1) init with a runtime gain/sqrt(fan_in) multiplier.
    use_wscale=False: He-std baked into the init, no runtime scale."""

    features: int
    gain: float = 1.0
    use_wscale: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        he_std = self.gain / math.sqrt(in_dim)
        init_std, w_mul = (1.0, he_std) if self.use_wscale else (he_std, 1.0)
        w = self.param(
            "weight", scaled_normal_init(init_std), (in_dim, self.features), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return x @ saveable_kernel(w.astype(x.dtype) * w_mul) + b.astype(x.dtype)


class EqualizedConv2d(nn.Module):
    """Conv with He-std init and optional fused 2x upscaling
    (reference stylegan2_layers.py:275-348, use_wscale=False branch).

    With ``upscale`` the reference picks between a fused
    transposed-convolution (output size >= 128) and nearest-upsample+conv;
    spatial sizes are static under jit, so the pick is a Python branch.
    """

    features: int
    kernel_size: int
    gain: float = math.sqrt(2.0)
    upscale: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        std = self.gain / math.sqrt(in_ch * k * k)
        w = self.param(
            "weight", scaled_normal_init(std), (k, k, in_ch, self.features), jnp.float32
        )
        w = w.astype(x.dtype)
        if self.upscale and min(x.shape[1], x.shape[2]) * 2 >= 128:
            # Fused upscale+conv: pad the kernel by one, sum the four
            # shifted copies, and run a stride-2 transposed conv
            # (equivalently: input dilation 2, padding K-1-p).
            wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
            w4 = wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1]
            kk = k + 1
            p = (kk - 1) // 2
            y = _conv2d(
                x,
                saveable_kernel(jnp.flip(w4, (0, 1))),
                stride=1,
                padding=kk - 1 - p,
                lhs_dilation=(2, 2),
            )
        elif self.upscale:
            y = _conv2d(nearest_upsample2x(x), saveable_kernel(w), padding=k // 2)
        else:
            y = _conv2d(x, saveable_kernel(w), padding=k // 2)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# Style modulation / noise
# ---------------------------------------------------------------------------


class StyleMod(nn.Module):
    """Activation-space style modulation: x * (scale+1) + shift, with the
    (scale, shift) pair produced by an EqualizedLinear from the style
    vector (reference stylegan2_layers.py:361-374)."""

    channels: int

    @nn.compact
    def __call__(self, x, latent):
        # LayerEpilogue constructs StyleMod with use_wscale=True
        # (reference stylegan2_layers.py:417,427)
        style = EqualizedLinear(
            self.channels * 2, gain=1.0, use_wscale=True, name="lin"
        )(latent)
        scale = style[:, : self.channels][:, None, None, :]
        shift = style[:, self.channels :][:, None, None, :]
        return x * (scale + 1.0) + shift


class LayerEpilogue(nn.Module):
    """InstanceNorm then StyleMod (reference stylegan2_layers.py:414-437)."""

    channels: int

    @nn.compact
    def __call__(self, x, latent):
        return StyleMod(self.channels, name="style_mod")(instance_norm(x), latent)


class NoiseInjection(nn.Module):
    """Additive single-channel noise with a learned scalar gain
    (reference stylegan2_layers.py:376-399). Pass ``noise`` explicitly to
    pin it (the reference's fix_noise capability); otherwise it is drawn
    from the module's 'noise' RNG stream."""

    @nn.compact
    def __call__(self, x, noise=None):
        gain = self.param("weight", nn.initializers.zeros, (1,), jnp.float32)
        if noise is None:
            b, h, w, _ = x.shape
            noise = jax.random.normal(self.make_rng("noise"), (b, h, w, 1), x.dtype)
        return x + gain.astype(x.dtype) * noise


class _EqualizedConvParams(nn.Module):
    """Parameter-only twin of ``EqualizedConv2d`` (same names, shapes,
    initializers) for the fused Pallas StyledConv path."""

    features: int
    kernel_size: int
    gain: float = math.sqrt(2.0)

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.kernel_size
        std = self.gain / math.sqrt(in_ch * k * k)
        w = self.param(
            "weight", scaled_normal_init(std), (k, k, in_ch, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return w, b


class _NoiseGainParam(nn.Module):
    """Parameter-only twin of ``NoiseInjection``."""

    @nn.compact
    def __call__(self):
        return self.param("weight", nn.initializers.zeros, (1,),
                          jnp.float32)[0]


class _StyleModLin(nn.Module):
    """StyleMod's linear, computed in XLA (tiny); same param path."""

    channels: int

    @nn.compact
    def __call__(self, latent):
        s = EqualizedLinear(
            self.channels * 2, gain=1.0, use_wscale=True, name="lin"
        )(latent)
        return s[:, : self.channels], s[:, self.channels :]


class _EpilogueStyle(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, latent):
        return _StyleModLin(self.channels, name="style_mod")(latent)


class StyledConv(nn.Module):
    """EqualizedConv2d -> noise -> bias -> fused lrelu -> epilogue
    (reference stylegan2_layers.py:439-475). Note: activation-space
    modulation, NOT weight demodulation — and there are two learned biases
    (StyledConv's own and FusedLeakyReLU's), kept for parity.

    ``fused``: route the whole chain through the Pallas
    ops.styled_conv_pallas kernel (3x3, non-upsampled, bf16 compute
    only; other configurations fall back to the composite). Identical
    parameter tree; the only semantic difference is that when ``noise``
    is not pinned it is drawn from this module's 'noise' RNG stream
    instead of the child NoiseInjection's (different stream, same
    distribution)."""

    features: int
    kernel_size: int
    upsample: bool = False
    use_noise: bool = True
    fused: bool = False

    @nn.compact
    def __call__(self, x, style, noise=None):
        if (self.fused and not self.upsample and self.kernel_size == 3
                and x.dtype == jnp.bfloat16):
            return self._fused(x, style, noise)
        y = EqualizedConv2d(
            self.features, self.kernel_size, upscale=self.upsample, name="conv"
        )(x)
        if self.use_noise:
            y = NoiseInjection(name="noise")(y, noise)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        act_bias = self.param(
            "act_bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        y = fused_leaky_relu(y + bias.astype(y.dtype), act_bias)
        return LayerEpilogue(self.features, name="epi1")(y, style)

    def _fused(self, x, style, noise):
        from ppst_tpu.ops.styled_conv_pallas import styled_conv3x3

        b, h, w, _ = x.shape
        cw, cb = _EqualizedConvParams(self.features, 3, name="conv")(
            x.shape[-1]
        )
        if self.use_noise:
            gain = _NoiseGainParam(name="noise")()
            if noise is None:
                noise = jax.random.normal(
                    self.make_rng("noise"), (b, h, w, 1), jnp.float32
                )
        else:
            gain = jnp.float32(0.0)
            noise = jnp.zeros((b, h, w, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        act_bias = self.param("act_bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
        scale, shift = _EpilogueStyle(self.features, name="epi1")(style)
        return styled_conv3x3(
            x, cw, noise, gain, cb + bias + act_bias, scale, shift
        )


class ToRGB(nn.Module):
    """1x1 conv to RGB + bias + epilogue (reference
    stylegan2_layers.py:477-495; the upsample/skip path is unused)."""

    @nn.compact
    def __call__(self, x, style):
        y = EqualConv2d(3, 1, name="conv")(x)
        bias = self.param("bias", nn.initializers.zeros, (3,), jnp.float32)
        y = y + bias.astype(y.dtype)
        return LayerEpilogue(3, name="epi1")(y, style)


# ---------------------------------------------------------------------------
# Conv layer / residual blocks
# ---------------------------------------------------------------------------


class ConvLayer(nn.Module):
    """[Blur if downsample] -> EqualConv2d -> [InstanceNorm] -> activation
    (reference stylegan2_layers.py:497-555)."""

    features: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True
    pad: Optional[int] = None
    norm: str = "none"
    reflection_pad: bool = False
    # fold the antialias blur into the conv kernel (numerically equal,
    # removes a depthwise pass); set False to run the literal two-op form
    fuse_blur: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pre_blur = None
        if self.downsample:
            p = self.pad
            if p is None:
                p = (len(self.blur_kernel) - 2) + (k - 1)
            pad0, pad1 = (p + 1) // 2, p // 2
            if self.fuse_blur and len(self.blur_kernel) > 1:
                pre_blur = tuple(self.blur_kernel)
                if self.reflection_pad:
                    x = jnp.pad(
                        x,
                        ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)),
                        mode="reflect",
                    )
                    stride, conv_pad = 2, ((0, 0), (0, 0))
                else:
                    stride, conv_pad = 2, ((pad0, pad1), (pad0, pad1))
            else:
                x = blur_op(
                    x,
                    np.asarray(self.blur_kernel, np.float32),
                    (pad0, pad1),
                    reflection_pad=self.reflection_pad,
                )
                stride, conv_pad = 2, 0
        else:
            stride = 1
            conv_pad = k // 2 if self.pad is None else self.pad
            if self.reflection_pad and conv_pad > 0:
                x = jnp.pad(
                    x,
                    ((0, 0), (conv_pad, conv_pad), (conv_pad, conv_pad), (0, 0)),
                    mode="reflect",
                )
                conv_pad = 0
        y = EqualConv2d(
            self.features,
            k,
            stride=stride,
            padding=conv_pad,
            use_bias=self.use_bias and not self.activate,
            pre_blur=pre_blur,
            name="conv",
        )(x)
        if self.norm == "in":
            y = instance_norm(y)
        if self.activate:
            if self.use_bias:
                b = self.param(
                    "act_bias", nn.initializers.zeros, (self.features,), jnp.float32
                )
                y = fused_leaky_relu(y, b)
            else:
                y = scaled_leaky_relu(y)
        return y


class ResBlock(nn.Module):
    """(conv3 + conv3-down + 1x1-skip-down) / sqrt(2)
    (reference stylegan2_layers.py:559-579)."""

    features: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    reflection_pad: bool = False
    pad: Optional[int] = None
    downsample: bool = True
    norm: str = "none"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = ConvLayer(
            in_ch,
            3,
            reflection_pad=self.reflection_pad,
            pad=self.pad,
            norm=self.norm,
            name="conv1",
        )(x)
        out = ConvLayer(
            self.features,
            3,
            downsample=self.downsample,
            blur_kernel=self.blur_kernel,
            reflection_pad=self.reflection_pad,
            pad=self.pad,
            norm=self.norm,
            name="conv2",
        )(out)
        skip = ConvLayer(
            self.features,
            1,
            downsample=self.downsample,
            blur_kernel=self.blur_kernel,
            activate=False,
            pad=self.pad,
            use_bias=False,
            norm=self.norm,
            name="skip",
        )(x)
        return (out + skip) / math.sqrt(2.0)


# ---------------------------------------------------------------------------
# Plain torch-style layers (feature branch / projection heads)
# ---------------------------------------------------------------------------


class PReLU(nn.Module):
    """Single-parameter PReLU, init 0.25 (torch default)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
        return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


class TorchConv2d(nn.Module):
    """Conv2d with torch's default kaiming-uniform init and explicit
    padding mode (used by the generator feature branch and E2's 1x1
    reducers, which the reference leaves at torch defaults)."""

    features: int
    kernel_size: int
    padding: int = 0
    pad_mode: str = "zeros"  # zeros | replicate | reflect
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "weight",
            torch_kaiming_uniform_init,
            (k, k, in_ch, self.features),
            jnp.float32,
        )
        p = self.padding
        if p > 0 and self.pad_mode != "zeros":
            mode = {"replicate": "edge", "reflect": "reflect"}[self.pad_mode]
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=mode)
            p = 0
        y = _conv2d(x, w.astype(x.dtype), padding=p)
        if self.use_bias:
            b = self.param(
                "bias", torch_bias_uniform_init(in_ch * k * k), (self.features,), jnp.float32
            )
            y = y + b.astype(y.dtype)
        return y


class TorchLinear(nn.Module):
    """nn.Linear with torch default init (or normal(0, std) when
    ``normal_std`` is set, for init_net'd projector MLPs)."""

    features: int
    normal_std: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        if self.normal_std is not None:
            w_init = scaled_normal_init(self.normal_std)
            b_init = nn.initializers.zeros
        else:
            w_init = torch_kaiming_uniform_init
            b_init = torch_bias_uniform_init(in_dim)
        w = self.param("weight", w_init, (in_dim, self.features), jnp.float32)
        b = self.param("bias", b_init, (self.features,), jnp.float32)
        return x @ w.astype(x.dtype) + b.astype(x.dtype)
