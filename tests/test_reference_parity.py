"""Cross-implementation numerical parity: run the REFERENCE torch code
(/root/reference, CPU fallback kernels) and ppst_tpu side by side with
identical weights (via the checkpoint converter) and compare outputs.

This is the strongest correctness evidence available without the
(unobtainable) pretrained checkpoint: if randomly-initialized reference
networks and converted ppst_tpu networks agree on random inputs, the
architectures and the converter are both right.
"""

import argparse
import importlib
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

# full train-step/network compiles: minutes on a 1-core CPU host.
# Tier: run via `pytest -m slow` (or the targeted nohup recipe in PARITY.md).
pytestmark = pytest.mark.slow

REF = "/root/reference"
CROP = 128

torch.manual_seed(0)


@pytest.fixture(scope="module")
def ref():
    """Import reference network modules with a stub ``util`` package (the
    real one needs visdom/func_timeout and crashes probing CUDA)."""
    fake = types.ModuleType("util")
    fake.is_custom_kernel_supported = lambda: False
    fake.str2bool = lambda v: v if isinstance(v, bool) else v.lower() in ("true", "1")

    def _normalize(v):
        if isinstance(v, list):
            return [_normalize(x) for x in v]
        return v * torch.rsqrt(torch.sum(v**2, dim=1, keepdim=True) + 1e-8)

    fake.normalize = _normalize
    sys.modules["util"] = fake
    # reference code calls .cuda() during module construction
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        mods = {
            "e1": importlib.import_module("models.networks.encoder_con"),
            "e2": importlib.import_module("models.networks.encoder_col"),
            "g": importlib.import_module("models.networks.generator"),
            "d": importlib.import_module("models.networks.discriminator"),
        }
    finally:
        pass
    return mods


def ref_opt():
    return argparse.Namespace(
        use_antialias=True,
        spatial_code_ch=256,
        global_code_ch=2048,
        num_classes=0,
        crop_size=CROP,
        netE_scale_capacity=1.0,
        netE_num_downsampling_sp=3,
        netE_nc_steepness=2.0,
        netE2_scale_capacity=1.0,
        netE2_num_downsampling_gl1=3,
        netE2_nc_steepness=2.0,
        netG_scale_capacity=1.0,
        netG_num_base_resnet_layers=4,
        netG_use_noise=True,
        netG_resnet_ch=256,
        netD_scale_capacity=1.0,
    )


def my_cfg():
    from ppst_tpu.models.config import PPSTConfig

    return PPSTConfig(crop_size=CROP)


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def rel_err(a, b):
    return np.max(np.abs(a - b)) / (np.std(b) + 1e-8)


def test_e1_parity(ref, rng):
    from ppst_tpu.models.encoder_con import ContentEncoder
    from ppst_tpu.util.convert_torch import convert_e1, _SD

    net = ref["e1"].StyleGAN2ResnetEncodercon(ref_opt()).eval()
    params = convert_e1(_SD(net.state_dict()))
    x = rng.standard_normal((2, CROP, CROP, 3)).astype(np.float32)
    with torch.no_grad():
        want = nhwc(net(nchw(x)))
    got = np.asarray(ContentEncoder(my_cfg()).apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape
    assert rel_err(got, want) < 5e-3, rel_err(got, want)


def test_e2_parity(ref, rng):
    from ppst_tpu.models.encoder_col import ColorEncoder
    from ppst_tpu.util.convert_torch import convert_e2, _SD

    net = ref["e2"].StyleGAN2ResnetEncodercol(ref_opt()).eval()
    params = convert_e2(_SD(net.state_dict()))
    x = rng.standard_normal((2, CROP, CROP, 3)).astype(np.float32)
    with torch.no_grad():
        want_vectors, _ = net(nchw(x))
    out = ColorEncoder(my_cfg()).apply({"params": params}, jnp.asarray(x))
    assert len(out.vectors) == len(want_vectors) == 4
    for mine, theirs in zip(out.vectors, want_vectors):
        assert rel_err(np.asarray(mine), theirs.numpy()) < 5e-3


def test_g_parity(ref, rng):
    from ppst_tpu.models.generator import Generator
    from ppst_tpu.util.convert_torch import convert_g, _SD

    net = ref["g"].StyleGAN2ResnetGenerator(ref_opt()).eval()
    params = convert_g(_SD(net.state_dict()))
    sp = rng.standard_normal((2, CROP // 8, CROP // 8, 256)).astype(np.float32)
    gl = [rng.standard_normal((2, 2048)).astype(np.float32) for _ in range(4)]
    with torch.no_grad():
        want = nhwc(net(nchw(sp), [torch.from_numpy(g) for g in gl]))
    got = np.asarray(
        Generator(my_cfg()).apply(
            {"params": params},
            jnp.asarray(sp),
            [jnp.asarray(g) for g in gl],
            rngs={"noise": jax.random.PRNGKey(0)},
        )
    )
    # noise gains init to zero, so the stochastic path contributes nothing
    assert got.shape == want.shape
    assert rel_err(got, want) < 5e-3, rel_err(got, want)


def test_d_parity(ref, rng):
    from ppst_tpu.models.discriminator import Discriminator
    from ppst_tpu.util.convert_torch import convert_d, _SD

    net = ref["d"].StyleGAN2Discriminator(ref_opt()).eval()
    params = convert_d(_SD(net.state_dict()), CROP)
    x = rng.standard_normal((2, CROP, CROP, 3)).astype(np.float32)
    with torch.no_grad():
        want = net(nchw(x)).numpy()
    got = np.asarray(Discriminator(my_cfg()).apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape
    assert rel_err(got, want) < 5e-3, rel_err(got, want)
