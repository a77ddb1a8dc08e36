"""L3: ADA non-leaking augmentation (jit-compatible)."""

from rick_tpu.augment.ada import (
    SYM6,
    augment,
    apply_affine,
    apply_color,
    sample_affine,
    sample_color,
)

__all__ = [
    "SYM6",
    "augment",
    "apply_affine",
    "apply_color",
    "sample_affine",
    "sample_color",
]
