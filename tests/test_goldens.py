"""Golden regression fixtures: fixed-seed G/D outputs checked against stored
arrays.  Guards the determinism contract (SURVEY.md par. 4 item 2: fixed-latent
outputs reproduce within tolerance) against silent numerical regressions in
the model/op code."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from rick_tpu.nn import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_apply,
    discriminator_init,
    generator_apply,
    generator_init,
)

_GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def test_generator_golden():
    gcfg = GeneratorConfig(size=32)
    gp = generator_init(jax.random.key(0), gcfg)
    z = jax.random.normal(jax.random.key(1), (2, 512))
    img, _ = generator_apply(gcfg, gp, [z])
    want = np.load(os.path.join(_GOLDENS, "g32_fixed.npy"))
    np.testing.assert_allclose(np.asarray(img), want, rtol=1e-4, atol=1e-4)


def test_discriminator_golden():
    gcfg = GeneratorConfig(size=32)
    gp = generator_init(jax.random.key(0), gcfg)
    z = jax.random.normal(jax.random.key(1), (2, 512))
    img, _ = generator_apply(gcfg, gp, [z])
    dcfg = DiscriminatorConfig(size=32)
    dp = discriminator_init(jax.random.key(2), dcfg)
    s, _ = discriminator_apply(dcfg, dp, img)
    want = np.load(os.path.join(_GOLDENS, "d32_scores.npy"))
    np.testing.assert_allclose(np.asarray(s), want, rtol=1e-3, atol=1e-4)


def test_high_resolution_configs():
    """512/1024px channel tables and parameter structure (reference supports
    both via the channel dict, `model_probe_tune.py:400-410`)."""
    from tests.test_models import _expected_g_params, _expected_d_params, _param_count

    for size in (512, 1024):
        gcfg = GeneratorConfig(size=size)
        assert gcfg.n_latent == {512: 16, 1024: 18}[size]
        params = generator_init(jax.random.key(0), gcfg)
        assert _param_count(params) == _expected_g_params(gcfg)
        assert len(params["convs"]) == 2 * (gcfg.log_size - 2)

        dcfg = DiscriminatorConfig(size=size)
        dparams = discriminator_init(jax.random.key(1), dcfg)
        assert _param_count(dparams) == _expected_d_params(dcfg)
