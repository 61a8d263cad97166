"""Layer numerics vs torch-CPU oracles (identical weights injected)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as TF

from ppst_tpu.nn.layers import (
    ConvLayer,
    EqualConv2d,
    EqualLinear,
    EqualizedConv2d,
    StyleMod,
    StyledConv,
    instance_norm,
    PReLU,
    TorchConv2d,
)

torch.manual_seed(0)


def nchw(x):  # NHWC numpy -> torch NCHW
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def nhwc(t):  # torch NCHW -> NHWC numpy
    return np.moveaxis(t.detach().numpy(), 1, -1)


def test_equal_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    got = EqualConv2d(6, 3, padding=1).apply(
        {"params": {"weight": w, "bias": b}}, jnp.asarray(x)
    )
    scale = 1.0 / math.sqrt(4 * 9)
    want = TF.conv2d(
        nchw(x),
        torch.from_numpy(w).permute(3, 2, 0, 1) * scale,
        torch.from_numpy(b),
        padding=1,
    )
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-5)


def test_equal_linear_fused_lrelu(rng):
    x = rng.standard_normal((5, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    got = EqualLinear(8, activation="fused_lrelu").apply(
        {"params": {"weight": w, "bias": b}}, jnp.asarray(x)
    )
    scale = 1.0 / math.sqrt(16)
    pre = torch.from_numpy(x) @ (torch.from_numpy(w) * scale)
    want = TF.leaky_relu(pre + torch.from_numpy(b), 0.2) * math.sqrt(2)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("hw", [64, 32])
def test_equalized_conv_upscale_matches_torch(rng, hw):
    """Both upscale branches: fused transpose-conv (input >= 64) and
    nearest+conv (below); oracle follows reference stylegan2_layers.py:306-341."""
    x = rng.standard_normal((1, hw, hw, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    got = EqualizedConv2d(5, 3, upscale=True).apply(
        {"params": {"weight": w, "bias": b}}, jnp.asarray(x)
    )
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # (out,in,k,k)
    xt = nchw(x)
    if hw * 2 >= 128:
        wp = TF.pad(wt.permute(1, 0, 2, 3), [1, 1, 1, 1])
        w4 = wp[:, :, 1:, 1:] + wp[:, :, :-1, 1:] + wp[:, :, 1:, :-1] + wp[:, :, :-1, :-1]
        y = TF.conv_transpose2d(xt, w4, stride=2, padding=(w4.size(-1) - 1) // 2)
    else:
        up = xt.repeat_interleave(2, dim=2).repeat_interleave(2, dim=3)
        y = TF.conv2d(up, wt, padding=1)
    want = y + torch.from_numpy(b).view(1, -1, 1, 1)
    assert got.shape == (1, hw * 2, hw * 2, 5)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-4)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 5)).astype(np.float32)
    got = instance_norm(jnp.asarray(x))
    want = torch.nn.InstanceNorm2d(5)(nchw(x))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-5)


def test_style_mod(rng):
    x = rng.standard_normal((2, 4, 4, 6)).astype(np.float32)
    lat = rng.standard_normal((2, 10)).astype(np.float32)
    w = rng.standard_normal((10, 12)).astype(np.float32) * 0.1
    b = rng.standard_normal((12,)).astype(np.float32)
    got = StyleMod(6).apply(
        {"params": {"lin": {"weight": w, "bias": b}}},
        jnp.asarray(x),
        jnp.asarray(lat),
    )
    # StyleMod's linear is use_wscale=True: runtime 1/sqrt(fan_in) scale
    style = torch.from_numpy(lat) @ (torch.from_numpy(w) / math.sqrt(10)) + torch.from_numpy(b)
    s = style.view(2, 2, 6)
    want = nchw(x) * (s[:, 0, :, None, None] + 1.0) + s[:, 1, :, None, None]
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-5)


def test_conv_layer_downsample_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    layer = ConvLayer(8, 3, downsample=True, blur_kernel=(1, 3, 3, 1))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (2, 8, 8, 8)


def test_conv_layer_reflection_in(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    layer = ConvLayer(8, 3, reflection_pad=True, norm="in")
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (2, 16, 16, 8)


def test_styled_conv_runs_and_upsamples(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    style = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    layer = StyledConv(6, 3, upsample=True, use_noise=True)
    params = layer.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x, style
    )
    y = layer.apply(params, x, style, rngs={"noise": jax.random.PRNGKey(2)})
    assert y.shape == (2, 16, 16, 6)
    # noise disabled path is deterministic
    y1 = layer.apply(params, x, style, noise=jnp.zeros((2, 16, 16, 1)))
    y2 = layer.apply(params, x, style, noise=jnp.zeros((2, 16, 16, 1)))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_prelu_matches_torch(rng):
    x = rng.standard_normal((3, 4, 4, 2)).astype(np.float32)
    got = PReLU().apply({"params": {"alpha": np.asarray([0.25], np.float32)}}, jnp.asarray(x))
    want = TF.prelu(nchw(x), torch.tensor([0.25]))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-5, atol=1e-6)


def test_torch_conv2d_replicate_pad(rng):
    x = rng.standard_normal((1, 6, 6, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 4)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    got = TorchConv2d(4, 3, padding=1, pad_mode="replicate").apply(
        {"params": {"weight": w, "bias": b}}, jnp.asarray(x)
    )
    xp = TF.pad(nchw(x), [1, 1, 1, 1], mode="replicate")
    want = TF.conv2d(xp, torch.from_numpy(w).permute(3, 2, 0, 1), torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), rtol=1e-4, atol=1e-5)


def test_fused_blur_matches_two_op_form(rng):
    """fuse_blur folds the antialias blur into the conv kernel; must be
    numerically identical to the literal blur-then-conv form."""
    import jax

    for taps, refl in [((1, 3, 3, 1), False), ((1, 2, 1), True)]:
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
        fused = ConvLayer(8, 3, downsample=True, blur_kernel=taps,
                          reflection_pad=refl, fuse_blur=True)
        plain = ConvLayer(8, 3, downsample=True, blur_kernel=taps,
                          reflection_pad=refl, fuse_blur=False)
        params = plain.init(jax.random.PRNGKey(0), x)
        a = fused.apply(params, x)
        b = plain.apply(params, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
