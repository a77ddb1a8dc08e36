"""L4 metrics: on-device feature extraction + FID / KID / precision-recall.

Feature extractors (InceptionV3 pool3, VGG16-fc2, LeNet5) are functional JAX
ports with parameter dicts keyed by the torch state-dict names, so published
weight files load directly through `rick_tpu.ckpt.load_torch_file`.  In this
zero-egress environment no pretrained weights ship; extractors fall back to a
deterministic seeded init (set RICK_INCEPTION_WEIGHTS / RICK_VGG16_WEIGHTS to
real torchvision .pth files for literature-comparable numbers; all FID/KID/P&R
*math* is weight-independent and validated by identity tests).
"""

from rick_tpu.metrics.inception import (
    inception_init,
    inception_pool3,
    load_inception_params,
)
from rick_tpu.metrics.fid import (
    calculate_fid_given_images,
    calculate_frechet_distance,
    get_activations,
)
from rick_tpu.metrics.kid import calculate_kid_given_images, polynomial_mmd_averages
from rick_tpu.metrics.precision_recall import IPR
from rick_tpu.metrics.evaluator import Evaluator

__all__ = [
    "inception_init",
    "inception_pool3",
    "load_inception_params",
    "calculate_fid_given_images",
    "calculate_frechet_distance",
    "get_activations",
    "calculate_kid_given_images",
    "polynomial_mmd_averages",
    "IPR",
    "Evaluator",
]
