"""Checkpoint interop tests: torch .pt read/write without torch, state-dict
<-> pytree converters, and cross-validation against real torch.save/load."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rick_tpu.ckpt import (
    discriminator_params_from_state_dict,
    discriminator_state_dict_from_params,
    generator_params_from_state_dict,
    generator_state_dict_from_params,
    load_torch_file,
    save_torch_file,
)
from rick_tpu.nn import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_apply,
    discriminator_init,
    generator_apply,
    generator_init,
)


def test_roundtrip_via_our_writer_and_torch_reader(tmp_path):
    rng = np.random.default_rng(0)
    obj = {
        "w": rng.standard_normal((3, 4, 5)).astype(np.float32),
        "i64": np.arange(7),
        "u8": np.arange(5, dtype=np.uint8),
        "scalar": np.float32(2.5),
        "nested": {"x": rng.standard_normal(2).astype(np.float32)},
        "meta": {"iter": 1750, "name": "babies", "flag": True, "none": None},
    }
    p = str(tmp_path / "x.pt")
    save_torch_file(obj, p)
    back = torch.load(p)
    assert torch.allclose(back["w"], torch.from_numpy(obj["w"]))
    assert back["i64"].dtype == torch.int64
    assert back["u8"].dtype == torch.uint8
    assert back["meta"] == obj["meta"]

    ours = load_torch_file(p)
    np.testing.assert_array_equal(ours["w"], obj["w"])
    np.testing.assert_array_equal(ours["nested"]["x"], obj["nested"]["x"])


def test_read_torch_written_noncontiguous_and_scalar(tmp_path):
    p = str(tmp_path / "y.pt")
    t = torch.arange(12, dtype=torch.float32).reshape(3, 4).t()  # non-contiguous
    torch.save({"t": t, "s": torch.tensor(7.0), "half": torch.ones(3, dtype=torch.float16)}, p)
    got = load_torch_file(p)
    np.testing.assert_array_equal(got["t"], t.numpy())
    assert float(got["s"]) == 7.0
    assert got["half"].dtype == np.float16


def test_reference_fixture_shapes():
    nz = load_torch_file("/root/reference/noise.pt")
    assert nz.shape == (75, 512) and nz.dtype == np.float32
    n0 = load_torch_file("/root/reference/_noise/0000.pt")
    assert n0.shape == (1, 512)


def test_generator_state_dict_roundtrip():
    cfg = GeneratorConfig(size=32)
    params = generator_init(jax.random.key(0), cfg)
    sd = generator_state_dict_from_params(cfg, params)
    # key set sanity: 5-D conv weights, noise buffers present
    assert sd["conv1.conv.weight"].ndim == 5
    assert f"noises.noise_{cfg.num_layers-1}" in sd
    params2 = generator_params_from_state_dict(cfg, sd)

    z = jax.random.normal(jax.random.key(1), (2, 512))
    img1, _ = generator_apply(cfg, params, [z])
    img2, _ = generator_apply(cfg, params2, [z])
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), rtol=1e-6, atol=1e-6)


def test_discriminator_state_dict_roundtrip_through_pt_file(tmp_path):
    cfg = DiscriminatorConfig(size=32)
    params = discriminator_init(jax.random.key(0), cfg)
    sd = discriminator_state_dict_from_params(cfg, params)
    p = str(tmp_path / "d.pt")
    save_torch_file({"d": sd}, p)

    # read back through torch to prove the file is torch-canonical
    sd_torch = {k: v.numpy() for k, v in torch.load(p)["d"].items()}
    params2 = discriminator_params_from_state_dict(cfg, sd_torch)

    x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    s1, _ = discriminator_apply(cfg, params, x)
    s2, _ = discriminator_apply(cfg, params2, x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6, atol=1e-6)


def test_full_rick_checkpoint_roundtrip(tmp_path):
    """Emulate the reference checkpoint layout {g_ema, g, d, ...}
    (`train_dynamic_update_prune.py:644-659`)."""
    gcfg = GeneratorConfig(size=32)
    dcfg = DiscriminatorConfig(size=32)
    gp = generator_init(jax.random.key(0), gcfg)
    dp = discriminator_init(jax.random.key(1), dcfg)
    ckpt = {
        "g_ema": generator_state_dict_from_params(gcfg, gp),
        "g": generator_state_dict_from_params(gcfg, gp),
        "d": discriminator_state_dict_from_params(dcfg, dp),
    }
    p = str(tmp_path / "ckpt.pt")
    save_torch_file(ckpt, p)
    back = load_torch_file(p)
    assert set(back.keys()) == {"g_ema", "g", "d"}
    g2 = generator_params_from_state_dict(gcfg, back["g_ema"])
    z = jax.random.normal(jax.random.key(2), (1, 512))
    img1, _ = generator_apply(gcfg, gp, [z])
    img2, _ = generator_apply(gcfg, g2, [z])
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), rtol=1e-6, atol=1e-6)
