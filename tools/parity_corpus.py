"""End-to-end quality-parity corpus (BASELINE.md measurement plan #2).

Runs the REFERENCE torch pipeline (/root/reference, CPU fallback
kernels) and ppst_tpu side by side with IDENTICAL weights (reference
random init, converted via ppst_tpu.util.convert_torch) over a fixed
synthetic content x style corpus, through the full simple-swapping
call stack (reference evaluation/simple_swapping_evaluator.py:38-76:
encode -> extract_feat_from_image x2 -> Rselfcorr -> corrm -> encode2 ->
decode, guided filter off on both sides — the reference needs
cv2.ximgproc which this machine lacks), then reports per-pair SSIM/PSNR
between the two frameworks' outputs and stores PNGs.

Usage: python tools/parity_corpus.py [--crop 512] [--pairs 4]
                                     [--out results/parity]
"""

from __future__ import annotations

import argparse
import importlib
import importlib.util
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"


# ---------------------------------------------------------------------------
# reference import with stubs (no torchvision/lpips/visdom/cv2 on this box)
# ---------------------------------------------------------------------------


def import_reference_model(crop: int):
    import torch

    fake_util = types.ModuleType("util")
    fake_util.is_custom_kernel_supported = lambda: False
    fake_util.str2bool = lambda v: v if isinstance(v, bool) else str(v).lower() in ("true", "1")

    def _find_class_in_module(target_cls_name, module):
        # reference util/util.py:61-71 (case-insensitive, underscores
        # stripped); the reference network registry calls this
        target = target_cls_name.replace("_", "").lower()
        clslib = importlib.import_module(module)
        cls = None
        for name, clsobj in clslib.__dict__.items():
            if name.lower() == target:
                cls = clsobj
        assert cls is not None, f"no class {target} in {module}"
        return cls

    fake_util.find_class_in_module = _find_class_in_module

    def _normalize(v):
        if isinstance(v, list):
            return [_normalize(x) for x in v]
        return v * torch.rsqrt(torch.sum(v**2, dim=1, keepdim=True) + 1e-8)

    fake_util.normalize = _normalize

    def _lerp(a, b, r):
        if isinstance(a, list):
            return [_lerp(x, y, r) for x, y in zip(a, b)]
        return a * (1 - r) + b * r

    fake_util.lerp = _lerp
    sys.modules["util"] = fake_util

    fake_lpips = types.ModuleType("lpips")

    class _LPIPS(torch.nn.Module):  # training-only; inference never calls it
        def __init__(self, net="alex"):
            super().__init__()

        def forward(self, a, b):
            return torch.zeros(a.shape[0])

    fake_lpips.LPIPS = _LPIPS
    sys.modules["lpips"] = fake_lpips

    fake_tv = types.ModuleType("torchvision")
    fake_models = types.ModuleType("torchvision.models")
    fake_transforms = types.ModuleType("torchvision.transforms")

    class _Compose:
        def __init__(self, fs):
            self.fs = fs

        def __call__(self, x):
            for f in self.fs:
                x = f(x)
            return x

    def _to_tensor(img):
        arr = np.asarray(img, np.float32) / 255.0
        return torch.from_numpy(np.moveaxis(arr, -1, 0))

    fake_transforms.Compose = _Compose
    fake_transforms.ToTensor = lambda: _to_tensor
    fake_tv.models = fake_models
    fake_tv.transforms = fake_transforms
    sys.modules["torchvision"] = fake_tv
    sys.modules["torchvision.models"] = fake_models
    sys.modules["torchvision.transforms"] = fake_transforms

    torch.nn.Module.cuda = lambda self, *a, **k: self

    sys.path.insert(0, REF)
    # packaging bug: models/ppst_model.py imports models.networks.rscl,
    # which only exists as top-level networks/rscl.py (SURVEY.md 0.1-2)
    spec = importlib.util.spec_from_file_location(
        "models.networks.rscl", os.path.join(REF, "networks", "rscl.py")
    )
    rscl_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rscl_mod)
    sys.modules["models.networks.rscl"] = rscl_mod

    ppst_model = importlib.import_module("models.ppst_model")

    opt = argparse.Namespace(
        isTrain=True,  # skips checkpoint load
        local_rank=0,
        continue_train=False,
        num_gpus=0,
        use_antialias=True,
        crop_size=crop,
        spatial_code_ch=256,
        global_code_ch=2048,
        num_classes=0,
        netE1="StyleGAN2Resnet",
        netE2="StyleGAN2Resnet",
        netG="StyleGAN2Resnet",
        netD="StyleGAN2",
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
        lambda_GAN=1.0,
        lambda_R1=10.0,
        training_stage=2,
        nce_T=0.07,
        lambda_PatchGAN=0.0,
        lambda_L1=3.0,
        lambda_StyleCon=1.0,
        lambda_Maskwarp=10.0,
        lambda_Cycwarp=5.0,
        match_kernel=1,
    )
    torch.manual_seed(0)
    model = ppst_model.PPSTModel(opt)
    model.initialize()
    model.eval()
    return model


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------


def make_corpus(n_pairs: int, crop: int, seed: int = 7):
    """Deterministic smooth pseudo-images in [-1, 1]: low-frequency noise
    upsampled bilinearly + a luminance gradient (image-like statistics
    without needing any dataset on disk)."""
    rng = np.random.default_rng(seed)
    imgs = []
    for _ in range(2 * n_pairs):
        base = rng.normal(size=(8, 8, 3)).astype(np.float32)
        up = np.asarray(
            _resize_bilinear_np(base, (crop, crop)), np.float32
        )
        gy = np.linspace(-0.4, 0.4, crop, dtype=np.float32)[:, None, None]
        img = np.tanh(up * 0.8 + gy)
        imgs.append(img)
    return imgs[:n_pairs], imgs[n_pairs:]


def _resize_bilinear_np(x, out_hw):
    h, w, c = x.shape
    oh, ow = out_hw
    yi = (np.arange(oh) + 0.5) * h / oh - 0.5
    xi = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(yi).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xi).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(yi - y0, 0, 1)[:, None, None]
    wx = np.clip(xi - x0, 0, 1)[None, :, None]
    a = x[y0][:, x0] * (1 - wy) * (1 - wx) + x[y1][:, x0] * wy * (1 - wx)
    b = x[y0][:, x1] * (1 - wy) * wx + x[y1][:, x1] * wy * wx
    return a + b


# ---------------------------------------------------------------------------
# pipelines
# ---------------------------------------------------------------------------


def run_reference_pair(model, content, style):
    import torch

    def t(x):
        return torch.from_numpy(np.moveaxis(x, -1, 0)[None]).float()

    with torch.no_grad():
        structure = t(content)
        texture = t(style)
        sp, gl_src = model.encode(structure)
        fea_c, fea_c1 = model.extract_feat_from_image(structure)
        fea_s, fea_s1 = model.extract_feat_from_image(texture)
        rs_c = model.Rselfcorr(fea_c1)
        rs_s = model.Rselfcorr(fea_s1)
        desc_c = torch.cat([fea_c, rs_c], 1)
        desc_s = torch.cat([fea_s, rs_s], 1)
        corr = model.corrm(desc_s, desc_c)
        # the reference evaluator wraps corr in a list only so DDP's
        # input scatter unwraps it (simple_swapping_evaluator.py:53);
        # calling the method directly takes the bare tensor
        _, gl_w = model.encode2(texture, corr)
        out = model.decode(sp, gl_w, target=None)
    return np.moveaxis(out[0].numpy(), 0, -1)


def run_ours_pair(model, params, content, style):
    import jax
    import jax.numpy as jnp

    out = model.stylize(
        params,
        jnp.asarray(content)[None],
        jnp.asarray(style)[None],
        jax.random.PRNGKey(0),
    )
    return np.asarray(out[0], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--out", default="results/parity")
    args = ap.parse_args()

    # default to CPU for the jax side: the machine env pins
    # JAX_PLATFORMS=axon (so setdefault would keep the TPU), but the TPU
    # is single-client and this tool must be able to run alongside
    # on-chip jobs; override with PPST_PARITY_PLATFORM=axon to use it
    platform = os.environ.get("PPST_PARITY_PLATFORM", "cpu")
    import jax

    jax.config.update("jax_platforms", platform)

    print("building reference model (torch CPU)...", flush=True)
    ref_model = import_reference_model(args.crop)

    print("converting weights...", flush=True)
    from ppst_tpu.models.config import PPSTConfig
    from ppst_tpu.models.ppst import PPSTModel as MyModel
    from ppst_tpu.util.convert_torch import (
        _SD,
        convert_d,
        convert_e1,
        convert_e2,
        convert_g,
    )

    sd = {k: v for k, v in ref_model.state_dict().items()}
    params = {
        "E1": convert_e1(_SD(sd, "E1.")),
        "E2": convert_e2(_SD(sd, "E2.")),
        "G": convert_g(_SD(sd, "G.")),
        "D": convert_d(_SD(sd, "D."), args.crop),
    }
    mine = MyModel(PPSTConfig(crop_size=args.crop))

    contents, styles = make_corpus(args.pairs, args.crop)
    os.makedirs(args.out, exist_ok=True)

    from ppst_tpu.evaluation.metrics import psnr, ssim
    from ppst_tpu.util.util import save_image, tensor2im

    rows = []
    for i, (c, s) in enumerate(zip(contents, styles)):
        print(f"pair {i}: reference...", flush=True)
        ref_out = run_reference_pair(ref_model, c, s)
        print(f"pair {i}: ppst_tpu...", flush=True)
        my_out = run_ours_pair(mine, params, c, s)
        a = np.clip(ref_out, -1, 1)
        b = np.clip(my_out, -1, 1)
        m_ssim = float(np.asarray(ssim(a[None], b[None], value_range=2.0)).mean())
        m_psnr = float(np.asarray(psnr(a[None], b[None], value_range=2.0)).mean())
        rows.append({"pair": i, "ssim": round(m_ssim, 5), "psnr_db": round(m_psnr, 2)})
        save_image(tensor2im(ref_out[None])[0], f"{args.out}/pair{i}_reference.png")
        save_image(tensor2im(my_out[None])[0], f"{args.out}/pair{i}_ppst_tpu.png")
        save_image(tensor2im(c[None])[0], f"{args.out}/pair{i}_content.png")
        save_image(tensor2im(s[None])[0], f"{args.out}/pair{i}_style.png")
        print(f"pair {i}: ssim={m_ssim:.5f} psnr={m_psnr:.2f} dB", flush=True)

    summary = {
        "crop": args.crop,
        "pairs": rows,
        "mean_ssim": round(float(np.mean([r["ssim"] for r in rows])), 5),
        "mean_psnr_db": round(float(np.mean([r["psnr_db"] for r in rows])), 2),
    }
    with open(f"{args.out}/summary_{args.crop}.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
