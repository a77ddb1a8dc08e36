"""Functional equivalents of the reference's legacy GAN_stability/GANmemory
infrastructure (`gan_training/{checkpoints,logger,inputs,ops,distributions,
utils_model_load}.py` -- SURVEY.md par. 2.2 C16/C17).  These modules are not on
the reference's live training path but are part of its API surface."""

from rick_tpu.legacy.distributions import get_zdist, get_ydist, interpolate_sphere
from rick_tpu.legacy.checkpoints import CheckpointIO
from rick_tpu.legacy.logger import Logger
from rick_tpu.legacy.ops import spectral_norm_apply, cbatch_norm_apply, cinstance_norm_apply
from rick_tpu.legacy.model_utils import get_parameter_number, save_feature_map

__all__ = [
    "get_zdist",
    "get_ydist",
    "interpolate_sphere",
    "CheckpointIO",
    "Logger",
    "spectral_norm_apply",
    "cbatch_norm_apply",
    "cinstance_norm_apply",
    "get_parameter_number",
    "save_feature_map",
]
