"""Architecture/training configuration shared by all PPST networks.

Field names mirror the reference CLI flags (options/__init__.py and each
network's modify_commandline_options) so the options layer can build this
dataclass mechanically from a parsed namespace.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PPSTConfig:
    # core dims (reference models/ppst_model.py:19-20)
    spatial_code_ch: int = 256
    global_code_ch: int = 2048
    num_classes: int = 0
    crop_size: int = 512
    use_antialias: bool = True

    # E1 (reference encoder_con.py:14-19)
    netE_scale_capacity: float = 1.0
    netE_num_downsampling_sp: int = 3
    netE_nc_steepness: float = 2.0

    # E2 (reference encoder_col.py:15-20)
    netE2_scale_capacity: float = 1.0
    netE2_num_downsampling_gl1: int = 3
    netE2_nc_steepness: float = 2.0

    # G (reference generator.py:127-138)
    netG_scale_capacity: float = 1.0
    netG_num_base_resnet_layers: int = 4
    netG_use_noise: bool = True
    netG_resnet_ch: int = 256

    # D (reference discriminator.py:7-9)
    netD_scale_capacity: float = 1.0

    # network selection (reference options/__init__.py:46-49)
    netG: str = "StyleGAN2Resnet"
    netD: str = "StyleGAN2"
    netE1: str = "StyleGAN2Resnet"
    netE2: str = "StyleGAN2Resnet"

    # losses (reference ppst_model.py:21-34)
    lambda_R1: float = 10.0
    lambda_L1: float = 3.0
    lambda_GAN: float = 1.0
    training_stage: int = 2
    lambda_StyleCon: float = 1.0
    lambda_Maskwarp: float = 10.0
    lambda_Cycwarp: float = 5.0
    match_kernel: int = 1
    nce_T: float = 0.07

    # optimizer (reference ppst_optimizer.py:13-22)
    lr: float = 0.001
    beta1: float = 0.0
    beta2: float = 0.99
    R1_once_every: int = 16

    # compute dtype for the conv stack ("float32" | "bfloat16"); params
    # always stay float32.
    dtype: str = "float32"

    # rematerialize network applications inside the training losses
    # (jax.checkpoint): the G step's 4 generator + 4 E2 passes cannot all
    # keep their activations live in 16 GB HBM at 512px (SURVEY 5.7's
    # memory hot spot); remat trades ~30% recompute for fitting.
    # remat=False measured RESOURCE_EXHAUSTED at 512px b2 even in bf16.
    remat: bool = True
    # selective remat: which network applications inside the G-step loss
    # get jax.checkpoint when remat=True. "all", or a comma list among
    # {e1,e2,g,d,lpips} (e.g. "g,e2" remats only the generator and E2
    # passes, keeping the cheap-to-store ones live). The big-activation
    # G forwards dominate the memory hot spot; the others trade a small
    # memory cost for skipping a full recompute in the backward pass.
    # Default "g" is the measured winner at 512px b2 on a 16 GB v5e
    # (bf16 g_step 561 ms vs 654 ms for "all" -> 5.34 vs 4.76 img/s;
    # f32 fits at 798 ms); "all" is the safe fallback for bigger
    # batches, remat=False OOMs even in bf16 (see BASELINE.md).
    remat_nets: str = "g"
    # nested remat INSIDE the generator's feature branch: checkpoint each
    # feature tap and fuse block individually so the extraction pass's
    # backward never holds the whole branch's 512^2/256^2 intermediates
    # at once (the OOM frontier at 512px batch>=6 is
    # `tap256`/`fuse1_res` HLO temps inside the one big rematted g_ext
    # block — remating the outer block alone cannot reduce that peak).
    # Measured @512px: no win — remat_nets="all" alone already fits
    # batch 6 (5.73 img/s; 5.43 with nesting on top; batch 4 with
    # selective remat wins at 7.0) — kept as an HBM-headroom knob for
    # beyond-512px training (BASELINE.md batch-sweep table).
    # save the prepared conv/linear kernels (tagged by
    # nn.layers.saveable_kernel) across the loss-level jax.checkpoint
    # calls via the save_only_these_names policy, instead of re-deriving
    # them (equalized-lr scale, blur fold, upscale build) in the
    # backward recompute. Bit-exact either way (verified: identical
    # losses and post-step params). MEASURED NO-OP at 512px b4 bf16
    # (g_step 846.1 vs 846.7 ms): the round-4 profile's weight-shaped
    # formatting HLOs turned out to be gradient-side layout copies, not
    # forward kernel prep — XLA already hoists/CSEs the cheap prep.
    # Kept as a knob (it bounds kernel-prep recompute structurally,
    # which may matter under heavier remat nesting), default off.
    remat_save_kernels: bool = False
    remat_taps: bool = False
    # nested remat of the generator's head/upsampling resblocks: the
    # backward recomputes one resolution block at a time, holding only
    # the inter-block boundary activations plus one block's interior
    # (the 512px batch>=6 OOM after remat_taps sits in the rec+mix G
    # forward's `up64` interiors). Pure memory/compute trade.
    remat_blocks: bool = False

    # big-image memory mode for the D STEP: split its shard-local-batched
    # G/D forwards into separate per-role passes and rematerialize the D
    # application (the batching is a conv-MFU optimization at 512px; at
    # 1024px the batched interiors set the D step's HBM peak — measured
    # 15.5 -> 10.4 GiB temp at 1024px b2 bf16). Identical per-sample
    # math — only scheduling/peak-memory changes. The G step is NOT
    # unbatched: remat already bounds its peak (13.1 GiB) and splitting
    # was measured WORSE (21.2 GiB from padding/fragmentation).
    unbatch_passes: bool = False
    # blockwise TRAINING correspondence (ops.corr_blockwise): the losses
    # never materialize the (L, L) matrices — descriptors are kept as
    # (q, k) pairs and every warp streams row blocks under
    # jax.checkpoint, recomputing softmax blocks in the backward pass.
    # Same math as the dense path (tests/test_corr_blockwise.py asserts
    # loss AND gradient equality); required beyond 512px where L^2
    # matrices stop fitting (SURVEY 5.7: at 1024px L=16384 -> 0.5 GiB
    # per matrix per sample). Off at 512px where the dense matrix is
    # computed once and reused across ~6 warps.
    corr_blockwise: bool = False
    # row-block size for the blockwise correspondence scan
    corr_block: int = 512

    # serving optimization: E2's warped features are only globally pooled
    # when no mask is given; True pools the warp grid directly instead of
    # bilinear-upsampling it first (approximation: boundary pixels of the
    # GAP carry slightly different weights, GMP of the interpolant is
    # bounded by the grid max). Off by default for reference parity.
    e2_fast_warp_pool: bool = False
    # Route the generator's 1x1 feature tap through the fused Pallas
    # IN-chain kernel (ops.tap_pallas) in bfloat16 compute mode. Exactly
    # the same parameters and math modulo bf16 rounding, ~2x faster on
    # the tap (it is HBM-bound under XLA's reduction barriers). Legal in
    # training since round 5: the kernel carries a custom VJP whose
    # backward is four more Pallas kernels (gradient-exactness:
    # tests/test_pallas_kernels.py::test_tap_pallas_grad).
    fused_tap: bool = False
    # Route the generator's non-upsampled StyledConvs through the fused
    # Pallas conv+epilogue kernel (ops.styled_conv_pallas; forward AND
    # backward — legal in bf16 training). Identical parameter tree.
    # Default off: the round-5 standalone head-to-head measured XLA's
    # own lowering FASTER on these shapes (e.g. 154 vs 119 TF/s fwd at
    # 128^2x512 — see BASELINE.md round-5); kept as the in-context
    # measurement knob and as the base for future fusions.
    fused_styled_conv: bool = False

    @property
    def style_dim(self) -> int:
        return self.global_code_ch + self.num_classes

    def nc_e1(self, idx: int) -> int:
        nc = self.netE_nc_steepness ** (5 + idx) * self.netE_scale_capacity
        return round(min(self.global_code_ch, int(round(nc))))

    def nc_e2(self, idx: int) -> int:
        nc = self.netE2_nc_steepness ** (5 + idx) * self.netE2_scale_capacity
        return round(min(self.global_code_ch, int(round(nc))))

    def nf_g(self, num_up: int) -> int:
        ch = 128 * (2 ** (self.netE_num_downsampling_sp - num_up))
        return int(min(512, ch) * self.netG_scale_capacity)

    @property
    def g_fuse_ch(self) -> int:
        """Channel width of the generator feature branch's fused output
        (concat of the n_up+1 taps; 256 at the reference default) — also
        the mean-centered head size of the correspondence descriptor."""
        return (self.netE_num_downsampling_sp + 1) * (self.netG_resnet_ch // 4)

    @property
    def e_blur_kernel(self):
        return (1, 2, 1) if self.use_antialias else (1,)

    @property
    def gd_blur_kernel(self):
        return (1, 3, 3, 1) if self.use_antialias else (1,)

    @classmethod
    def from_options(cls, opt) -> "PPSTConfig":
        """Build from an argparse namespace produced by ppst_tpu.options."""
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in vars(opt).items() if k in names}
        return cls(**kwargs)
