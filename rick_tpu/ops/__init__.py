"""L0 ops: StyleGAN2 resampling + fused bias/activation primitives.

TPU-native equivalents of the reference CUDA extensions
(`/root/reference/op/upfirdn2d_kernel.cu`, `/root/reference/op/fused_bias_act_kernel.cu`).

Unlike the reference, which needs hand-written double-backward autograd
Functions (`op/upfirdn2d.py:19-142`, `op/fused_act.py:19-70`), the XLA
formulation here is differentiable to arbitrary order by construction:
`upfirdn2d` is a single `lax.conv_general_dilated` (whose transpose rule is
itself a conv), and `fused_leaky_relu` is a fused elementwise expression.
R1 and path-length regularization (grad-of-grad) therefore work out of the box.
"""

from rick_tpu.ops.resample import (
    upfirdn2d,
    upfirdn2d_general,
    make_kernel,
    upsample2d,
    downsample2d,
    blur,
)
from rick_tpu.ops.fused_act import fused_leaky_relu, fused_leaky_relu_kml, scaled_leaky_relu

__all__ = [
    "upfirdn2d",
    "upfirdn2d_general",
    "make_kernel",
    "upsample2d",
    "downsample2d",
    "blur",
    "fused_leaky_relu",
    "fused_leaky_relu_kml",
    "scaled_leaky_relu",
]
