"""rick-tpu: TPU-native few-shot StyleGAN2 adaptation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of yunqing-me/RICK
(CVPR 2023): few-shot adaptation of a pretrained StyleGAN2 generator with
Fisher-information-driven dynamic filter freezing / fine-tuning / pruning,
ADA non-leaking augmentation, and in-training FID evaluation.

Layering (bottom to top):
  ops      -- resampling (upfirdn2d) + fused bias/activation primitives
  nn       -- functional StyleGAN2 generator / discriminator
  augment  -- jit-compatible ADA (non-leaking) augmentation
  data     -- record-store image pipeline (host decode -> device prefetch)
  metrics  -- InceptionV3 features on TPU, FID / KID / precision-recall
  train    -- jitted train step, Fisher rounds, mask pytrees, EMA, ADA state
  ckpt     -- torch-free .pt interop + native checkpoints
  dist     -- device mesh construction and sharding helpers
"""

__version__ = "0.1.0"
