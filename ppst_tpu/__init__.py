"""PPST-TPU: a TPU-native (JAX/XLA/Pallas) framework for photorealistic
portrait style transfer with the capabilities of the PPST reference
(reference: /root/reference, "Towards Photorealistic Portrait Style Transfer
in Unconstrained Conditions").

Layout convention: all image tensors are NHWC (TPU-native), float32 or
bfloat16, range [-1, 1] for RGB. The reference uses NCHW; conversion happens
only at test/IO boundaries.

Subpackages
-----------
ops         low-level TPU ops: upfirdn2d, fused bias+act, correspondence
            (corrm/Rselfcorr/warp), guided filter, LPIPS.
nn          StyleGAN2 building blocks as flax.linen modules.
models      E1 (content encoder), E2 (color encoder), G, D, and the PPST
            model: pure loss functions over parameter pytrees.
optimizers  optax-based optimizers with the reference's lazy-R1 schedule.
parallel    device-mesh / sharding utilities (data parallel via jax.sharding).
data        dataset registry, transforms, loader.
evaluation  evaluator registry (simple_swapping, swap_visualization, ...).
options     argparse plugin config system mirroring the reference CLI.
experiments launcher (``python -m ppst_tpu.experiments <name> train <tag>``).
"""

__version__ = "0.1.0"
