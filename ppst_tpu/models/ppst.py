"""The PPST model: algorithm-level pure functions over parameter pytrees.

Mirrors reference models/ppst_model.py (PPSTModel) but in functional form:
the reference's ``command=`` string dispatch through a DDP wrapper becomes
plain jitted functions over (params, state, batch) pytrees.

``params``: {"E1", "E2", "G", "D"} flax param trees.
``state``:  {"rscl": {queues, ptrs}, "num_d_iters": int32} — the mutable
            buffers the reference registers on the module
            (rscl.py:33-40, ppst_model.py:44-46); threaded explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.models.encoder_col import batch_swap
from ppst_tpu.models.losses import (
    gan_loss,
    init_rscl_state,
    l1_loss,
    rscl_enqueue,
    rscl_loss_sharded,
)
from ppst_tpu.ops import lpips as lpips_mod
from ppst_tpu.ops.corr import corrm, rselfcorr, warp
from ppst_tpu.ops.guided_filter import guided_filter


class PPSTModel:
    def __init__(self, cfg: PPSTConfig, lpips_variables=None):
        from ppst_tpu.models import create_network

        self.cfg = cfg
        self.e1 = create_network(cfg, cfg.netE1, "encoder_con")
        self.e2 = create_network(cfg, cfg.netE2, "encoder_col")
        self.g = create_network(cfg, cfg.netG, "generator")
        self.d = create_network(cfg, cfg.netD, "discriminator")
        self.lpips = lpips_mod.LPIPS()
        self.lpips_variables = (
            lpips_variables if lpips_variables is not None else lpips_mod.init_params()
        )

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def init(self, rng, image_hw: Optional[int] = None):
        size = image_hw or self.cfg.crop_size
        k_e1, k_e2, k_g, k_d, k_noise, k_q = jax.random.split(rng, 6)
        x = jnp.zeros((2, size, size, 3), jnp.float32)
        sp = jnp.zeros(
            (2, size // 8, size // 8, self.cfg.spatial_code_ch), jnp.float32
        )
        gl = [jnp.zeros((2, self.cfg.style_dim), jnp.float32)] * 4
        params = {
            "E1": self.e1.init(k_e1, x)["params"],
            "E2": self.e2.init(k_e2, x)["params"],
            "G": self.g.init(
                {"params": k_g, "noise": k_noise}, sp, gl, extract_features=True
            )["params"],
            "D": self.d.init(k_d, x)["params"],
        }
        state = {
            "rscl": init_rscl_state(k_q, code_dim=self.cfg.style_dim),
            "num_d_iters": jnp.zeros((), jnp.int32),
        }
        return params, state

    # ------------------------------------------------------------------
    # network applications
    # ------------------------------------------------------------------

    def apply_e1(self, params, x):
        return self.e1.apply({"params": params["E1"]}, x)

    def apply_e2(self, params, x, corrmatrix=None, mask=None):
        return self.e2.apply(
            {"params": params["E2"]}, x, corrmatrix=corrmatrix, mask=mask
        )

    def apply_g(self, params, sp, gl, rng, extract_features: bool = False,
                noises=None):
        return self.g.apply(
            {"params": params["G"]},
            sp,
            list(gl),
            extract_features=extract_features,
            noises=noises,
            rngs={"noise": rng},
        )

    def apply_d(self, params, x):
        return self.d.apply({"params": params["D"]}, x)

    def _r(self, fn, kind: str = ""):
        """Rematerialize a network application inside training losses
        (cfg.remat): recompute its activations in the backward pass
        instead of keeping them live — required to fit the G step's many
        passes in HBM at 512px. ``kind`` names the network (and
        optionally the call site, e.g. "g_ext") for selective remat via
        cfg.remat_nets: "all", or a comma list matched by prefix — "g"
        remats every g_* site, "g_mix" only the rec+mix pass."""
        if not self.cfg.remat:
            return fn
        nets = self.cfg.remat_nets
        if (
            nets != "all"
            and kind
            and not any(kind == n or kind.startswith(n + "_")
                        for n in nets.split(","))
        ):
            return fn
        # prevent_cse must stay True (the default): with False, XLA CSEs
        # the backward-pass recompute against the saved forward values,
        # which silently UNDOES the rematerialization — measured as a
        # g_step RESOURCE_EXHAUSTED at 512px b4 bf16 (round 4; the
        # round-3 advisory suggesting False is rejected on that evidence;
        # False is only safe inside lax.scan per the jax docs).
        if self.cfg.remat_save_kernels:
            # Save the *prepared* conv/linear kernels (equalized-lr
            # scale + blur fold + upscale-kernel build — tagged by
            # nn.layers.saveable_kernel) across the checkpoint instead
            # of re-deriving them in the backward recompute: kernel prep
            # is pure data formatting the round-4 g_step profile showed
            # as ~50+ ms/step of copy/reverse/pad HLOs. Activations are
            # still rematerialized (the actual memory hot spot); the
            # extra residency is ~one bf16 param copy per call site.
            return jax.checkpoint(
                fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "ppst_kernel"
                ),
            )
        return jax.checkpoint(fn)

    # ------------------------------------------------------------------
    # correspondence pipeline (reference ppst_model.py:113-123, 166-171)
    # ------------------------------------------------------------------

    def swap(self, x):
        return batch_swap(x)

    def corrm(self, fea, fea0):
        """Dense correspondence with the mean-centered head sized to the
        generator feature branch (cfg.g_fuse_ch; 256 at the reference
        default — ppst_model.py:341-364 splits at 256)."""
        return corrm(fea, fea0, split=self.cfg.g_fuse_ch)

    # -- blockwise-correspondence plumbing (cfg.corr_blockwise) ---------
    # A "correspondence handle" is either the dense (B, L, L) matrix or a
    # (q, k) descriptor pair; the helpers below dispatch so the loss code
    # reads identically in both modes. The qk mode never materializes
    # L x L — required for 1024px training (see ops.corr_blockwise).

    def _training_corrs(self, sps):
        """(corr_sw, corr_self) handles from the descriptor grid.
        Dense: corrm(sps, swap(sps)) / corrm(sps, sps). Blockwise: with
        n = normalized descriptors, corrm(sps, swap(sps)) has rows
        q=swap(n) and columns k=n, so the handles are (swap(n), n) and
        (n, n)."""
        if not self.cfg.corr_blockwise:
            return self.corrm(sps, self.swap(sps)), self.corrm(sps, sps)
        from ppst_tpu.ops.corr_blockwise import normalize_desc

        n = normalize_desc(sps, split=self.cfg.g_fuse_ch)
        return (self.swap(n), n), (n, n)

    def _swap_corr(self, corr):
        """Batch-pair swap of a correspondence handle: swap(corr)[b] =
        corr[pair(b)] = softmax(q[pair(b)] k[pair(b)]^T), i.e. both
        descriptors batch-swapped in qk form."""
        if isinstance(corr, tuple):
            return (self.swap(corr[0]), self.swap(corr[1]))
        return self.swap(corr)

    def _warp_any(self, x, corr):
        if isinstance(corr, tuple):
            from ppst_tpu.ops.corr_blockwise import warp_qk

            return warp_qk(x, corr[0], corr[1], block=self.cfg.corr_block)
        return warp(x, corr)

    def apply_e2_corr(self, params, x, corr, mask=None):
        kw = (
            {"corr_qk": corr} if isinstance(corr, tuple)
            else {"corrmatrix": corr}
        )
        return self.e2.apply({"params": params["E2"]}, x, mask=mask, **kw)

    @staticmethod
    def shard_concat(parts, n_dev: int = 1):
        """Concatenate along batch WITHIN each device's local shard.

        A plain global concat of 'data'-sharded operands would reorder
        rows across shard boundaries (GSPMD inserts resharding
        collectives); reshaping to (n_dev, per, ...) and concatenating on
        the local axis keeps every row on its device. With n_dev=1 this
        is jnp.concatenate. Used to batch the multiple same-shape G/D
        forwards of a training step into single conv passes (v5e conv
        MFU is strongly batch-sensitive — BASELINE.md round-3 table).
        """
        if n_dev <= 1:
            return jnp.concatenate(parts, axis=0)
        locs = []
        for p in parts:
            b = p.shape[0]
            locs.append(p.reshape((n_dev, b // n_dev) + p.shape[1:]))
        cat = jnp.concatenate(locs, axis=1)
        return cat.reshape((cat.shape[0] * cat.shape[1],) + cat.shape[2:])

    @staticmethod
    def shard_split(x, sizes, n_dev: int = 1):
        """Inverse of shard_concat: split the batched result back into
        parts of global batch ``sizes``."""
        if n_dev <= 1:
            outs, off = [], 0
            for s in sizes:
                outs.append(x[off : off + s])
                off += s
            return outs
        total = sum(sizes) // n_dev
        y = x.reshape((n_dev, total) + x.shape[1:])
        outs, off = [], 0
        for s in sizes:
            per = s // n_dev
            part = y[:, off : off + per]
            outs.append(part.reshape((s,) + x.shape[1:]))
            off += per
        return outs

    @staticmethod
    def half_batch(x, n_dev: int = 1):
        """First half of each device's LOCAL batch (reference
        ppst_model.py:129-132 ``[:B//2]``, which runs per-GPU under DDP).
        Under a 'data'-sharded batch the per-shard reshape keeps the
        slice local to each device — a global ``x[:b//2]`` would instead
        gather shards from half the mesh (collective-permute storm) and
        select different samples than the reference's per-rank halves."""
        b = x.shape[0]
        if n_dev <= 1:
            return x[: b // 2]
        per = b // n_dev
        y = x.reshape((n_dev, per) + x.shape[1:])[:, : per // 2]
        return y.reshape((n_dev * (per // 2),) + x.shape[1:])

    # ------------------------------------------------------------------
    # losses
    # ------------------------------------------------------------------

    def discriminator_losses(self, params, state, real, mask, rng, n_dev: int = 1):
        """Reference ppst_model.py:105-138. Returns (losses, new_state)."""
        cfg = self.cfg
        del mask  # unused by the D step (parity: reference ignores it too)
        state = dict(state, num_d_iters=state["num_d_iters"] + 1)
        r_ext, r_mix, r_rec = jax.random.split(rng, 3)

        # No remat on the generator side: the D update only differentiates
        # through D itself (those forwards carry no gradient), so
        # checkpointing them costs compile time for zero memory benefit.
        e1 = lambda p, x: self.apply_e1(p, x)
        e2_plain = lambda p, x: tuple(self.apply_e2(p, x).vectors)
        e2_w = lambda p, x, c: tuple(self.apply_e2_corr(p, x, c).vectors_w)
        g_fwd = lambda p, s, g, r: self.apply_g(p, s, list(g), r)
        g_ext = lambda p, s, g, r: self.apply_g(
            p, s, list(g), r, extract_features=True
        )
        d_fwd = lambda p, x: self.apply_d(p, x)
        if cfg.unbatch_passes:
            # big-image mode: D IS differentiated here — remat its
            # forward so the backward recomputes instead of keeping the
            # full-res activation pyramid live
            d_fwd = self._r(d_fwd, "d")

        sp = e1(params, real)
        gl = e2_plain(params, real)
        gl_w = None
        if cfg.training_stage == 2:
            _, feas, feas1 = g_ext(params, sp, gl, r_ext)
            sps = jnp.concatenate([feas, rselfcorr(feas1)], axis=-1)
            corr_sw, corr_self = self._training_corrs(sps)
            if cfg.lambda_StyleCon > 0.0:
                gl_w = e2_w(params, real, corr_sw)
            # reconstruction styles are the *self-corr-warped* vectors
            gl = e2_w(params, real, corr_self)

        b = real.shape[0]
        # swap() pairs and half_batch() slice within each device's LOCAL
        # batch, so the PER-SHARD batch must be even (reference: "Batch
        # size must be even on each GPU", options/__init__.py:146)
        assert b % (2 * n_dev) == 0, (
            f"global batch {b} must be a multiple of 2*n_dev={2 * n_dev} "
            "(even per-shard batch)"
        )
        gl_half = [self.half_batch(g, n_dev) for g in gl]
        # one shard-local-batched G pass for mix (B) + rec (B/2): same
        # math as separate calls (all per-sample ops), better conv MFU.
        # cfg.unbatch_passes splits them (and the D scoring) back into
        # per-role passes: at 1024px the batched interiors set the HBM
        # peak (measured: batched d_step 15.5 GiB temp vs a 16 GB chip).
        mix = None
        if gl_w is not None:
            if cfg.unbatch_passes:
                mix = g_fwd(params, self.swap(sp), gl_w, r_mix)
                rec = g_fwd(
                    params, self.half_batch(sp, n_dev), gl_half, r_rec
                )
            else:
                g_out = g_fwd(
                    params,
                    self.shard_concat(
                        [self.swap(sp), self.half_batch(sp, n_dev)], n_dev
                    ),
                    [self.shard_concat([w, h], n_dev)
                     for w, h in zip(gl_w, gl_half)],
                    r_mix,
                )
                mix, rec = self.shard_split(g_out, [b, b // 2], n_dev)
        else:
            rec = g_fwd(params, self.half_batch(sp, n_dev), gl_half, r_rec)

        losses = {}
        if cfg.lambda_GAN > 0.0:
            # generator-side outputs are constants for the D update;
            # score real/rec/mix in ONE batched D pass (or one pass per
            # image set under unbatch_passes)
            parts = [real, jax.lax.stop_gradient(rec)]
            if cfg.training_stage == 2 and mix is not None:
                parts.append(jax.lax.stop_gradient(mix))
            if cfg.unbatch_passes:
                scores = [d_fwd(params, p) for p in parts]
            else:
                scores = self.shard_split(
                    d_fwd(params, self.shard_concat(parts, n_dev)),
                    [p.shape[0] for p in parts],
                    n_dev,
                )
            losses["D_real"] = gan_loss(scores[0], True) * cfg.lambda_GAN
            losses["D_rec"] = gan_loss(scores[1], False) * 0.5 * cfg.lambda_GAN
            if len(scores) > 2:
                losses["D_mix"] = (
                    gan_loss(scores[2], False) * 0.5 * cfg.lambda_GAN
                )
        return losses, state

    def r1_loss(self, params, real):
        """Lazy R1 gradient penalty (reference ppst_model.py:140-159)."""
        if self.cfg.lambda_R1 <= 0.0:
            return {"D_R1": jnp.zeros(())}

        def score(x):
            return jnp.sum(self.apply_d(params, x))

        grad_real = jax.grad(score)(real).astype(jnp.float32)
        penalty = jnp.sum(grad_real**2, axis=(1, 2, 3)) * (self.cfg.lambda_R1 * 0.5)
        return {"D_R1": jnp.mean(penalty)}

    def generator_losses(self, params, state, real, mask, rng, n_dev: int = 1):
        """Reference ppst_model.py:161-235.

        Returns (losses, metrics, new_state). The reference's
        ``crop_size >= 1024`` half-batch path references an undefined
        variable there (SURVEY.md 5.7) and is not reproduced.
        """
        cfg = self.cfg
        r_ext, r_rec, r_mix, r_cyc = jax.random.split(rng, 4)
        losses, metrics = {}, {}
        b = real.shape[0]
        assert b % (2 * n_dev) == 0, (
            f"global batch {b} must be a multiple of 2*n_dev={2 * n_dev} "
            "(even per-shard batch)"
        )

        e1 = self._r(lambda p, x: self.apply_e1(p, x), "e1")
        e2_plain = self._r(
            lambda p, x: tuple(self.apply_e2(p, x).vectors), "e2"
        )
        e2_w = self._r(
            lambda p, x, c: tuple(self.apply_e2_corr(p, x, c).vectors_w),
            "e2",
        )
        e2_full = self._r(
            lambda p, x, c, m: self.apply_e2_corr(p, x, c, mask=m), "e2"
        )
        e2_mask = self._r(
            lambda p, x, m: tuple(self.apply_e2(p, x, mask=m).projections_m),
            "e2",
        )
        g_mix = self._r(
            lambda p, s, g, r: self.apply_g(p, s, list(g), r), "g_mix"
        )
        g_cyc = self._r(
            lambda p, s, g, r: self.apply_g(p, s, list(g), r), "g_cyc"
        )
        g_ext = self._r(
            lambda p, s, g, r: self.apply_g(
                p, s, list(g), r, extract_features=True
            ),
            "g_ext",
        )
        d_fwd = self._r(lambda p, x: self.apply_d(p, x), "d")
        lpips_fn = self._r(lambda v, a, b_: self.lpips.apply(v, a, b_), "lpips")

        sp = e1(params, real)
        gl = e2_plain(params, real)
        gl_w = pro_ms = pro_mw = None
        corr_sw = None
        if cfg.training_stage == 2:
            _, feas, feas1 = g_ext(params, sp, gl, r_ext)
            sps = jnp.concatenate([feas, rselfcorr(feas1)], axis=-1)
            corr_sw, corr_self = self._training_corrs(sps)
            gl = e2_w(params, real, corr_self)
            if cfg.lambda_StyleCon > 0.0:
                out = e2_full(params, real, corr_sw, mask)
                pro_ms, gl_w, pro_mw = out.projections_m, out.vectors_w, out.projections_mw
            if cfg.lambda_Cycwarp > 0.0:
                image_warp = self._warp_any(real, corr_sw)
                image_rec = self._warp_any(image_warp, self._swap_corr(corr_sw))
                reg = lpips_fn(self.lpips_variables, image_rec, real)
                losses["image_warp_reg"] = jnp.mean(reg) * cfg.lambda_Cycwarp
            if cfg.lambda_Maskwarp > 0.0:
                mask_warp = self._warp_any(mask, corr_sw)
                losses["Mask_warp"] = (
                    l1_loss(mask_warp, self.swap(mask)) * cfg.lambda_Maskwarp
                )

        mix = None
        if cfg.training_stage == 2 and cfg.lambda_StyleCon > 0.0:
            # one shard-local-batched G pass for rec (B) + mix (B), and
            # one batched E2 mask-projection pass over both outputs —
            # identical per-sample math, one conv pass each. (Unbatching
            # these like the D loss was measured WORSE at 1024px: 21.2
            # vs 13.1 GiB temp — the split passes pad/fragment more than
            # the batched interiors cost, and remat already bounds the
            # G-step peak. unbatch_passes therefore only affects the
            # D loss, whose generator-side forwards have no remat.)
            g_out = g_mix(
                params,
                self.shard_concat([sp, self.swap(sp)], n_dev),
                [self.shard_concat([a, w], n_dev)
                 for a, w in zip(gl, gl_w)],
                r_rec,
            )
            rec, mix = self.shard_split(g_out, [b, b], n_dev)
        else:
            rec = g_mix(params, sp, gl, r_rec)
        if cfg.lambda_L1 > 0.0:
            losses["G_L1"] = l1_loss(rec, real) * cfg.lambda_L1

        if cfg.training_stage == 2 and cfg.lambda_StyleCon > 0.0:
            pro_batched = e2_mask(
                params,
                self.shard_concat([mix, rec], n_dev),
                self.shard_concat([self.swap(mask), mask], n_dev),
            )
            pro_3m, pro_2m = [], []
            for p in pro_batched:
                m_part, r_part = self.shard_split(p, [b, b], n_dev)
                pro_3m.append(m_part)
                pro_2m.append(r_part)
            sp_3 = e1(params, mix)
            gl_half = [self.half_batch(g, n_dev) for g in gl]
            cyc = g_cyc(
                params, self.half_batch(self.swap(sp_3), n_dev), gl_half, r_cyc
            )
            metrics["L1_dist"] = l1_loss(cyc, self.half_batch(real, n_dev))
            losses["G_L1_cyc"] = metrics["L1_dist"] * 3.0

            styleloss = 0.0
            styleloss2 = 0.0
            sg = jax.lax.stop_gradient
            new_rscl = state["rscl"]
            for scale in range(4):
                sl = slice(3 * scale, 3 * scale + 3)
                # region-major (3, B, 2048) stacks: stacking on a NEW
                # axis keeps the sharded batch axis intact (concatenating
                # along it forces cross-device resharding in the sharded
                # step — measured as ~100 collective-permutes)
                key0 = jnp.stack(pro_ms[sl])
                keyw = jnp.stack(pro_mw[sl])
                query = jnp.stack(pro_3m[sl])
                query_r = jnp.stack(pro_2m[sl])
                queue = sg(state["rscl"]["queues"][scale])
                styleloss += rscl_loss_sharded(
                    query, sg(keyw), sg(key0), queue, cfg.nce_T, n_dev
                )
                styleloss2 += rscl_loss_sharded(
                    query_r, sg(key0), sg(keyw), queue, cfg.nce_T, n_dev
                )
                new_rscl = rscl_enqueue(
                    new_rscl, scale, sg(key0), sg(keyw), n_dev
                )
            state = dict(state, rscl=new_rscl)
            losses["G_styleContmix"] = styleloss * cfg.lambda_StyleCon
            losses["G_styleContrec"] = styleloss2 * cfg.lambda_StyleCon

        if cfg.lambda_GAN > 0.0:
            if cfg.training_stage == 2 and mix is not None:
                s_rec, s_mix = self.shard_split(
                    d_fwd(params, self.shard_concat([rec, mix], n_dev)),
                    [b, b],
                    n_dev,
                )
                losses["G_GAN_rec"] = gan_loss(s_rec, True) * cfg.lambda_GAN * 0.5
                losses["G_GAN_mix"] = gan_loss(s_mix, True) * cfg.lambda_GAN
            else:
                losses["G_GAN_rec"] = (
                    gan_loss(d_fwd(params, rec), True) * cfg.lambda_GAN * 0.5
                )
        return losses, metrics, state

    # ------------------------------------------------------------------
    # inference API (reference ppst_model.py:264-315)
    # ------------------------------------------------------------------

    def encode(self, params, image):
        return self.apply_e1(params, image), self.apply_e2(params, image).vectors

    def encode2(self, params, image, corrmatrix):
        out = self.apply_e2(params, image, corrmatrix=corrmatrix)
        return out.vectors, out.vectors_w

    def extract_feat_from_image(self, params, image, rng):
        sp = self.apply_e1(params, image)
        gl = self.apply_e2(params, image).vectors
        _, fea, fea1 = self.apply_g(params, sp, gl, rng, extract_features=True)
        return fea, fea1

    def decode(self, params, sp, gl, rng, target=None, noises=None):
        """G forward; with ``target`` the guided-filter post-processing runs
        in the same XLA program (the reference round-trips through
        CPU/OpenCV per image here, ppst_model.py:288-306). ``noises`` pins
        the noise injection (fix_noise capability)."""
        out = self.apply_g(params, sp, gl, rng, noises=noises)
        if target is None:
            return out
        out255 = (jnp.clip(out, -1.0, 1.0) + 1.0) * 127.5
        guide255 = (jnp.clip(target, -1.0, 1.0) + 1.0) * 127.5
        smoothed = guided_filter(guide255, out255, radius=30, eps=(0.02 * 255.0) ** 2)
        return smoothed / 127.5 - 1.0

    def snapshot_core(self, params, real, rng):
        """Jittable core of the training snapshot: structure code,
        reconstruction, and batch-swapped style mix."""
        r1, r2 = jax.random.split(rng)
        sp = self.apply_e1(params, real)
        gl = self.apply_e2(params, real).vectors
        rec = self.apply_g(params, sp, gl, r1)
        mix = self.apply_g(params, sp, [self.swap(g) for g in gl], r2)
        return sp, rec, mix

    def get_visuals_for_snapshot(self, params, real, rng):
        """Training snapshot visuals {real, layout, rec, mix}: a working
        version of reference ppst_model.py:237-248 (which references an
        undefined ``self.E`` there). ``layout`` is a host-side PCA
        rendering of the structure code, upsampled to image size."""
        from ppst_tpu.ops.corr import resize_bilinear
        from ppst_tpu.util.util import visualize_spatial_code

        sp, rec, mix = self.snapshot_core(params, real, rng)
        layout = resize_bilinear(
            jnp.asarray(visualize_spatial_code(sp)), real.shape[1:3]
        )
        return {"real": real, "layout": layout, "rec": rec, "mix": mix}

    def stylize(self, params, content, style, rng, alpha: float = 1.0,
                smooth_target: bool = False):
        """Fused end-to-end stylization (the simple_swapping pipeline,
        reference simple_swapping_evaluator.py:38-76) computing each
        encoder pass exactly once — the reference re-runs E1/E2 on the
        content image inside both ``encode`` and
        ``extract_feat_from_image``; this shares them.

        With ``smooth_target`` the guided-filter post-processing runs on
        the content image in the same XLA program."""
        r_c, r_s, r_dec = jax.random.split(rng, 3)

        def image_desc(img, r):
            sp = self.apply_e1(params, img)
            vec, trunk = self.e2.apply(
                {"params": params["E2"]}, img, return_trunk=True
            )
            _, fea, fea1 = self.apply_g(
                params, sp, vec.vectors, r, extract_features=True
            )
            desc = jnp.concatenate([fea, rselfcorr(fea1)], axis=-1)
            return sp, vec.vectors, desc, trunk

        if content.shape == style.shape:
            # one batched extraction pass over [content; style] — identical
            # math, but v5e conv MFU is strongly batch-sensitive at 512px
            # (BASELINE.md round-3 table), so sharing the conv pass nearly
            # halves extraction time at small batches
            b = content.shape[0]
            sp_b, vec_b, desc_b, trunk_b = image_desc(
                jnp.concatenate([content, style], axis=0), r_c
            )
            sp_c, vec_c = sp_b[:b], [v[:b] for v in vec_b]
            desc_c, desc_s = desc_b[:b], desc_b[b:]
            trunk_s = tuple(t[b:] for t in trunk_b)
        else:
            sp_c, vec_c, desc_c, _ = image_desc(content, r_c)
            _, _, desc_s, trunk_s = image_desc(style, r_s)
        corr = self.corrm(desc_s, desc_c)
        # the warp stage reuses the extraction pass's E2 trunk features
        # (identical values; the reference recomputes the trunk inside
        # encode2) and computes only the warped projections it needs
        gl_w = self.e2.apply(
            {"params": params["E2"]},
            None,
            corrmatrix=corr,
            corr_out_hw=(desc_c.shape[1], desc_c.shape[2]),
            trunk=trunk_s,
            warped_only=True,
        ).vectors_w
        if alpha != 1.0:
            gl_w = [a * (1 - alpha) + b * alpha for a, b in zip(vec_c, gl_w)]
        return self.decode(
            params, sp_c, gl_w, r_dec, target=content if smooth_target else None
        )

    def stylize_fused(self, params, content, style, rng,
                      smooth_target: bool = False):
        """High-resolution stylization via the blockwise fused Pallas
        correspondence (never materializes the L x L matrix): the 1024px+
        path where the dense matrix stops fitting (SURVEY.md 5.7)."""
        from ppst_tpu.ops.corr_pallas import _normalize_desc

        r_c, r_s, r_dec = jax.random.split(rng, 3)

        def image_desc(img, r):
            sp = self.apply_e1(params, img)
            vec, trunk = self.e2.apply(
                {"params": params["E2"]}, img, return_trunk=True
            )
            _, fea, fea1 = self.apply_g(
                params, sp, vec.vectors, r, extract_features=True
            )
            desc = jnp.concatenate([fea, rselfcorr(fea1)], axis=-1)
            return sp, desc, trunk

        if content.shape == style.shape:
            b = content.shape[0]
            sp_b, desc_b, trunk_b = image_desc(
                jnp.concatenate([content, style], axis=0), r_c
            )
            sp_c, desc_c, desc_s = sp_b[:b], desc_b[:b], desc_b[b:]
            trunk_s = tuple(t[b:] for t in trunk_b)
        else:
            sp_c, desc_c, _ = image_desc(content, r_c)
            _, desc_s, trunk_s = image_desc(style, r_s)
        b, gh, gw, c = desc_c.shape
        q = _normalize_desc(desc_c.reshape(b, gh * gw, c))
        k = _normalize_desc(desc_s.reshape(b, -1, c))
        gl_w = self.e2.apply(
            {"params": params["E2"]},
            None,
            corr_qk=(q, k),
            corr_out_hw=(gh, gw),
            trunk=trunk_s,
            warped_only=True,
        ).vectors_w
        return self.decode(
            params, sp_c, gl_w, r_dec, target=content if smooth_target else None
        )

    # ------------------------------------------------------------------
    # amortized grid serving (reference
    # evaluation/content_style_grid_generation_evaluator.py:53-99: the
    # folder x folder grid precomputes per-style descriptors once and
    # reuses them for every content — here additionally BATCHED so the
    # marginal per-pair work (corrm + style warp + decode) runs as full
    # conv/matmul dispatches instead of one pair at a time)
    # ------------------------------------------------------------------

    def grid_extract(self, params, images, rng, noises=None):
        """Extraction stage of grid serving: one batched pass computing,
        per image, everything any pair involving it will need — structure
        code ``sp``, correspondence descriptor ``desc`` (feature branch +
        Rselfcorr), and the E2 conv trunk (consumed by the style-side
        warp; the reference recomputes it per pair inside ``encode2``).
        Identical math to ``extract_feat_from_image`` + ``encode``."""
        sp = self.apply_e1(params, images)
        vec, trunk = self.e2.apply(
            {"params": params["E2"]}, images, return_trunk=True
        )
        _, fea, fea1 = self.apply_g(
            params, sp, vec.vectors, rng, extract_features=True, noises=noises
        )
        desc = jnp.concatenate([fea, rselfcorr(fea1)], axis=-1)
        return {"sp": sp, "desc": desc, "trunk": trunk, "vectors": vec.vectors}

    def grid_pairs(self, params, content_bank, style_bank, ci, si, rng,
                   alpha: float = 1.0, smooth_target=None, noises=None,
                   blockwise: bool = False):
        """Pair stage of grid serving: stylize the batch of
        (content ci[k], style si[k]) pairs, gathering inputs from the
        precomputed banks (``grid_extract`` outputs). Per pair this runs
        only corrm + E2 style warp + decode — the amortized marginal
        pipeline (~0.9 TFLOP/pair vs ~3.6 for the full per-pair path).
        ``smooth_target``: content images (N_c, H, W, 3) to enable the
        in-graph guided filter, gathered per pair. ``blockwise``: route
        the correspondence through the fused Pallas blockwise kernel
        (never materializes the L x L matrix) — the 1024px+ grid path,
        where the dense matrix is ~1 GiB/pair (SURVEY.md 5.7)."""
        take = lambda bank, idx: jax.tree.map(
            lambda a: jnp.take(a, idx, axis=0), bank
        )
        desc_c = jnp.take(content_bank["desc"], ci, axis=0)
        sp_c = jnp.take(content_bank["sp"], ci, axis=0)
        desc_s = jnp.take(style_bank["desc"], si, axis=0)
        trunk_s = take(style_bank["trunk"], si)
        if blockwise:
            from ppst_tpu.ops.corr_pallas import _normalize_desc

            b, gh, gw, c = desc_c.shape
            q = _normalize_desc(desc_c.reshape(b, gh * gw, c))
            k = _normalize_desc(desc_s.reshape(b, -1, c))
            gl_w = self.e2.apply(
                {"params": params["E2"]},
                None,
                corr_qk=(q, k),
                corr_out_hw=(gh, gw),
                trunk=trunk_s,
                warped_only=True,
            ).vectors_w
        else:
            corr = self.corrm(desc_s, desc_c)
            gl_w = self.e2.apply(
                {"params": params["E2"]},
                None,
                corrmatrix=corr,
                corr_out_hw=(desc_c.shape[1], desc_c.shape[2]),
                trunk=trunk_s,
                warped_only=True,
            ).vectors_w
        if alpha != 1.0:
            vec_c = [jnp.take(v, ci, axis=0) for v in content_bank["vectors"]]
            gl_w = [a * (1 - alpha) + b * alpha for a, b in zip(vec_c, gl_w)]
        target = (
            jnp.take(smooth_target, ci, axis=0)
            if smooth_target is not None else None
        )
        return self.decode(
            params, sp_c, list(gl_w), rng, target=target, noises=noises
        )

    def correspondence_from_images(self, params, img_c, img_s, rng):
        """content+style images -> corr matrix (reference
        simple_swapping_evaluator.py:47-53)."""
        r1, r2 = jax.random.split(rng)
        fea_c, fea_c1 = self.extract_feat_from_image(params, img_c, r1)
        fea_s, fea_s1 = self.extract_feat_from_image(params, img_s, r2)
        desc_c = jnp.concatenate([fea_c, rselfcorr(fea_c1)], axis=-1)
        desc_s = jnp.concatenate([fea_s, rselfcorr(fea_s1)], axis=-1)
        return self.corrm(desc_s, desc_c)
