"""E2: color/style encoder.

Architecture parity with reference models/networks/encoder_col.py:13-251
(StyleGAN2ResnetEncodercol): FromRGB -> N downsampling ResBlocks; at the
input scale and after each block, GAP+GMP pooled statistics go through a
1x1 reducer and a 3-layer MLP projector into an L2-normalized 2048-d style
vector (4 scales total). Optional paths:

* ``corrmatrix``: features are warped through the correspondence before
  pooling (reference :166-172, :202-216) -> a parallel list of *warped*
  style vectors. The warp at the input scale keeps gradients; deeper
  scales use a stopped-gradient corr (reference detaches at :207).
* ``mask``: 3-region masked pooling producing per-region projections for
  the RSCL contrastive loss (reference :173-190, :217-245); the mask is
  max-pooled 2x per scale, and warped-feature projections use the
  batch-swapped mask.

Generalization over the reference: warp scale factors adapt to the actual
correspondence grid (sqrt(L)) instead of hard-coded 64/8-4-2 factors, so
resolutions other than 512 work (the reference crashes there, SURVEY.md
section 2.4 notes).

The reference's ``ToGlobalCode`` EqualLinear is constructed but never
called in its forward; it is not rebuilt.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.nn.layers import ConvLayer, ResBlock, TorchLinear
from ppst_tpu.ops.corr import warp, warp_resize


class E2Output(NamedTuple):
    vectors: Tuple  # 4 x (B, 2048) style vectors, coarse last
    vectors_w: Tuple  # warped variants (empty without corrmatrix)
    projections_m: Tuple  # 12 x (B, 2048): 3 regions per scale, scale-major
    projections_mw: Tuple


def l2_normalize(x, eps: float = 1e-12):
    """torch F.normalize(dim=-1): divide by max(||x||, eps). The norm is
    computed in f32 so the bf16 compute mode stays stable."""
    x32 = x.astype(jnp.float32)
    n = jnp.linalg.norm(x32, axis=-1, keepdims=True)
    return (x32 / jnp.maximum(n, eps)).astype(x.dtype)


def batch_swap(x):
    """Flip each consecutive pair in the batch (reference swap(),
    ppst_model.py:59-66)."""
    shape = x.shape
    assert shape[0] % 2 == 0, "batch size must be a multiple of 2"
    y = x.reshape((shape[0] // 2, 2) + shape[1:])
    return jnp.flip(y, axis=1).reshape(shape)


class _ProjectionHead(nn.Module):
    """cat(GAP, GMP) -> 1x1 reducer -> ReLU/MLP(1024, 2048, 2048) ->
    L2 normalize (reference encoder_col.py:47-93). The MLP widths scale
    with ``style_dim`` (reference hard-codes 1024/2048/2048 for its fixed
    global_code_ch=2048; identical at the default, and lets slimmed
    configs — e.g. the multichip dryrun — shrink the dominant MLPs)."""

    reduce_to: int
    style_dim: int = 2048

    @nn.compact
    def __call__(self, feat):
        gap = feat.mean(axis=(1, 2))
        gmp = feat.max(axis=(1, 2))
        y = jnp.concatenate([gap, gmp], axis=-1)
        y = TorchLinear(self.reduce_to, name="reduce")(y)
        y = nn.relu(y)
        y = TorchLinear(max(self.style_dim // 2, 1), normal_std=0.02, name="fc0")(y)
        y = nn.relu(y)
        y = TorchLinear(self.style_dim, normal_std=0.02, name="fc1")(y)
        y = nn.relu(y)
        y = TorchLinear(self.style_dim, normal_std=0.02, name="fc2")(y)
        return l2_normalize(y)


def _warp_features(x, corr, out_hw=None, fast_pool=False):
    """Warp current-scale features through the correspondence: pool to the
    corr source grid, warp, and resize back when above grid resolution.
    ``fast_pool`` skips the resize-back (valid when the result is only
    globally pooled; see PPSTConfig.e2_fast_warp_pool)."""
    from ppst_tpu.ops.corr import adaptive_avg_pool, resize_bilinear

    lk = corr.shape[2]
    h, w = x.shape[1], x.shape[2]
    if h * w < lk:
        # scale below the correspondence grid (only reachable in slimmed
        # geometries the reference does not support): upsample to the
        # grid, warp there, and pool back to the scale's own resolution
        g = int(round(lk**0.5))
        warped = warp(resize_bilinear(x, (g, g)), corr, out_hw=out_hw)
        if out_hw is None:
            from ppst_tpu.ops.corr import adaptive_avg_pool as _pool

            warped = _pool(warped, (h, w))
        return warped
    if h * w > lk:
        if fast_pool:
            s = int(round((h * w / lk) ** 0.5))
            pooled = adaptive_avg_pool(x, (h // s, w // s))
            return warp(pooled, corr, out_hw=out_hw)
        return warp_resize(x, corr, out_hw=out_hw)
    return warp(x, corr, out_hw=out_hw)


def _warp_features_qk(x, q_desc, k_desc, src_hw, out_hw=None,
                      fast_pool=False, warp_fn=None):
    """Like _warp_features, but from pre-normalized q/k descriptors —
    never materializes the (Lq, Lk) matrix. ``warp_fn`` selects the
    implementation: the blockwise fused Pallas kernel (ops.corr_pallas,
    default — inference/1024px path) or the differentiable checkpointed
    scan (ops.corr_blockwise.corr_warp_scan — training path, when
    cfg.corr_blockwise is set)."""
    from ppst_tpu.ops.corr import adaptive_avg_pool, resize_bilinear

    if warp_fn is None:
        from ppst_tpu.ops.corr_pallas import corr_warp_blockwise

        warp_fn = corr_warp_blockwise
    b, h, w, c = x.shape
    lk = k_desc.shape[1]
    lq = q_desc.shape[1]
    if out_hw is None:
        g = int(round(lq**0.5))
        out_hw = (g, g)
    s = int(round((h * w / lk) ** 0.5))
    pooled = adaptive_avg_pool(x, (h // s, w // s)) if s > 1 else x
    warped = warp_fn(
        q_desc, k_desc, pooled.reshape(b, lk, c)
    ).reshape(b, out_hw[0], out_hw[1], c)
    if s > 1 and not fast_pool:
        warped = resize_bilinear(warped, (out_hw[0] * s, out_hw[1] * s))
    return warped


class ColorEncoder(nn.Module):
    cfg: PPSTConfig

    @nn.compact
    def __call__(self, x, corrmatrix=None, mask=None, corr_out_hw=None,
                 corr_qk=None, trunk=None, return_trunk=False,
                 warped_only=False):
        """``corrmatrix``: dense (B, Lq, Lk) correspondence. ``corr_qk``:
        alternative ((B, Lq, C), (B, Lk, C)) pre-normalized descriptor pair
        routed through the blockwise fused kernel (high-resolution path;
        mutually exclusive with corrmatrix).

        ``trunk``/``return_trunk``: the conv trunk (FromRGB + downsampling
        ResBlocks) is the expensive part of this encoder; a staged
        inference pipeline that already ran E2 on the style image (the
        extraction stage of ``PPSTModel.stylize``) can pass
        ``return_trunk=True`` there and feed the per-scale features back
        via ``trunk`` in the warp stage instead of recomputing them —
        identical values, conv cost paid once (the reference recomputes
        the full trunk inside ``encode2``, ppst_model.py:275-281).
        ``warped_only`` skips the unwarped/masked projection heads (the
        warp stage of ``stylize`` consumes only ``vectors_w``)."""
        cfg = self.cfg
        n_down = cfg.netE2_num_downsampling_gl1
        assert corrmatrix is None or corr_qk is None
        src_hw = None
        qk_warp_fn = None
        if cfg.corr_blockwise:
            import functools

            from ppst_tpu.ops.corr_blockwise import corr_warp_scan

            qk_warp_fn = functools.partial(
                corr_warp_scan, block=cfg.corr_block
            )

        vectors, vectors_w, proj_m, proj_mw = [], [], [], []
        swapped_mask = batch_swap(mask) if mask is not None else None

        def collect(head, feat, feat_w, cur_mask, cur_swapped):
            if not warped_only:
                vectors.append(head(feat))
            if feat_w is not None:
                vectors_w.append(head(feat_w))
            if cur_mask is not None:
                for i in range(3):
                    proj_m.append(head(feat * cur_mask[..., i : i + 1]))
                    if feat_w is not None:
                        proj_mw.append(head(feat_w * cur_swapped[..., i : i + 1]))

        # fast_pool only applies when the warped features are purely pooled
        fast_pool = cfg.e2_fast_warp_pool and mask is None

        y = trunk[0] if trunk is not None else ConvLayer(
            cfg.nc_e2(0), 1, name="from_rgb"
        )(x)
        trunk_out = [y]
        head = _ProjectionHead(cfg.nc_e2(0), cfg.style_dim, name="head_in")
        yw = None
        if corrmatrix is not None:
            yw = _warp_features(y, corrmatrix, corr_out_hw, fast_pool)
        elif corr_qk is not None:
            yw = _warp_features_qk(
                y, corr_qk[0], corr_qk[1], src_hw, corr_out_hw, fast_pool,
                warp_fn=qk_warp_fn,
            )
        collect(head, y, yw, mask, swapped_mask)

        for layer_id in range(n_down):
            y = trunk[layer_id + 1] if trunk is not None else ResBlock(
                cfg.nc_e2(layer_id + 1),
                blur_kernel=cfg.e_blur_kernel,
                reflection_pad=True,
                name=f"down{2 ** layer_id}",
            )(y)
            trunk_out.append(y)
            head = _ProjectionHead(
                cfg.nc_e2(layer_id + 1), cfg.style_dim, name=f"head{layer_id}"
            )
            yw = None
            if corrmatrix is not None:
                yw = _warp_features(
                    y, jax.lax.stop_gradient(corrmatrix), corr_out_hw, fast_pool
                )
            elif corr_qk is not None:
                yw = _warp_features_qk(
                    y,
                    jax.lax.stop_gradient(corr_qk[0]),
                    jax.lax.stop_gradient(corr_qk[1]),
                    src_hw,
                    corr_out_hw,
                    fast_pool,
                    warp_fn=qk_warp_fn,
                )
            if mask is not None:
                mask = nn.max_pool(mask, (2, 2), strides=(2, 2))
                swapped_mask = nn.max_pool(swapped_mask, (2, 2), strides=(2, 2))
            collect(head, y, yw, mask, swapped_mask)

        out = E2Output(
            tuple(vectors), tuple(vectors_w), tuple(proj_m), tuple(proj_mw)
        )
        return (out, tuple(trunk_out)) if return_trunk else out
