"""neuralstyletransferv1_tpu — a TPU-native (JAX/XLA/Pallas/pjit) neural style
transfer media framework.

A ground-up rebuild of the capabilities of TrentMahaffey/NeuralStyleTransferV1
(video/image stylization with an 8-slot model bank, region-mask compositing,
temporal coherence post-processing, and DeepLabV3+ semantic masking), designed
TPU-first:

- All compute runs as jitted XLA programs in NHWC layout; the hot stylizer path
  is one fused graph per frame batch.
- Weights load once into device memory (a "model bank"); frames stream through
  HBM in fixed-shape batches.
- Multi-chip scaling is data-parallel over the frame-batch axis on a
  ``jax.sharding.Mesh`` (ICI collectives inserted by XLA), with the temporal
  EMA recurrences run as in-graph scans.

Package layout:
  ops/       low-level kernels (pad, conv, norm, resize, blur, warp, color, flow)
  models/    network definitions + functional apply (TransformerNet, ReCoNet,
             DeepLabV3+, VGG, magenta arbitrary stylization)
  io/        checkpoint importers (.pth / .t7 / tf), frame & video IO
  region/    region mask generators, animation, blend-spec DSL, compositing
  temporal/  flow EMA, LAB EMA, motion-adaptive blending (scan-based)
  engine/    the pipeline engine + CLI surface (pipeline / sky_swap parity)
  parallel/  mesh construction and sharded batch execution
  apps/      orchestration layer (run_videos, drive_videos, creative apps)
"""

__version__ = "0.1.0"
