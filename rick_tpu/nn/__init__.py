"""L2 models: functional StyleGAN2 generator / discriminator.

Pure-functional rebuild of `gan_training/models/model_probe_tune.py` (reference):
parameters are plain pytrees (nested dicts/lists of jnp arrays), configs are
frozen dataclasses, and all randomness flows through explicit JAX PRNG keys.

The modulated convolution uses the scale-input / demodulate-output identity
instead of the reference's per-sample grouped conv (`model_probe_tune.py:253-282`):
one batch-shared conv on the MXU, with the style folded into the activations and
the demodulation folded into the outputs -- mathematically identical because the
convolution is linear in both.
"""

from rick_tpu.nn.blocks import (
    equal_linear_init,
    equal_linear_apply,
    equal_conv2d_init,
    equal_conv2d_apply,
    modulated_conv2d_init,
    modulated_conv2d_apply,
    pixel_norm,
)
from rick_tpu.nn.generator import (
    GeneratorConfig,
    generator_init,
    generator_apply,
    generator_mean_latent,
    style_forward,
    make_latent,
)
from rick_tpu.nn.discriminator import (
    DiscriminatorConfig,
    discriminator_init,
    discriminator_apply,
)

__all__ = [
    "GeneratorConfig",
    "generator_init",
    "generator_apply",
    "generator_mean_latent",
    "style_forward",
    "make_latent",
    "DiscriminatorConfig",
    "discriminator_init",
    "discriminator_apply",
    "equal_linear_init",
    "equal_linear_apply",
    "equal_conv2d_init",
    "equal_conv2d_apply",
    "modulated_conv2d_init",
    "modulated_conv2d_apply",
    "pixel_norm",
]
