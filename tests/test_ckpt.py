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


# ---------------------------------------------------------------------------
# 5-key checkpoint parity: torch-side resumable optimizers (`:644-659`)
# ---------------------------------------------------------------------------


def _torch_adam_from_saved(sd_model, optim_sd, key_filter):
    """Rebuild the reference-side optimizer: params in named_parameters order
    (our state dicts emit keys in exactly that order), then load our exported
    Adam state dict into a REAL torch.optim.Adam."""
    keys = [k for k in sd_model.keys() if key_filter(k)]
    params = [torch.nn.Parameter(torch.as_tensor(np.asarray(sd_model[k]))) for k in keys]
    pg = optim_sd["param_groups"][0]
    opt = torch.optim.Adam(params, lr=pg["lr"], betas=tuple(pg["betas"]))
    opt.load_state_dict(optim_sd)
    return keys, params, opt


def test_five_key_checkpoint_torch_resumable(tmp_path):
    """Save {g_ema, g, d, g_optim, d_optim}; torch must read all 5 keys and a
    real torch.optim.Adam must accept and step from the optimizer states."""
    from rick_tpu.ckpt import d_optim_state_dict, g_optim_state_dict
    from rick_tpu.train.adam import adam_init

    gcfg = GeneratorConfig(size=16)
    dcfg = DiscriminatorConfig(size=16)
    gp = generator_init(jax.random.key(0), gcfg)
    dp = discriminator_init(jax.random.key(1), dcfg)
    # nonzero optimizer state so the round-trip is meaningful
    g_opt = adam_init(gp)
    d_opt = adam_init(dp)
    g_opt["v"] = jax.tree.map(lambda x: jnp.abs(x) * 0 + 0.25, g_opt["v"])
    g_opt["count"] = jax.tree.map(lambda c: c + 3.0, g_opt["count"])
    d_opt["v"] = jax.tree.map(lambda x: x * 0 + 0.5, d_opt["v"])
    d_opt["count"] = jax.tree.map(lambda c: c + 7.0, d_opt["count"])

    g_lr, g_b2 = 0.002 * 0.8, 0.99**0.8
    d_lr, d_b2 = 0.002 * (16 / 17), 0.99 ** (16 / 17)
    ckpt = {
        "g_ema": generator_state_dict_from_params(gcfg, gp),
        "g": generator_state_dict_from_params(gcfg, gp),
        "d": discriminator_state_dict_from_params(dcfg, dp),
        "g_optim": g_optim_state_dict(gcfg, jax.device_get(g_opt), lr=g_lr, betas=(0.0, g_b2)),
        "d_optim": d_optim_state_dict(dcfg, jax.device_get(d_opt), lr=d_lr, betas=(0.0, d_b2)),
    }
    p = str(tmp_path / "five.pt")
    save_torch_file(ckpt, p)
    back = torch.load(p)
    assert set(back.keys()) == {"g_ema", "g", "d", "g_optim", "d_optim"}

    # ---- G optimizer: params with 'convs' in name (`:908-917`)
    keys, params, opt = _torch_adam_from_saved(
        back["g"], back["g_optim"], lambda k: "convs" in k
    )
    assert len(keys) == 5 * 2 * (gcfg.log_size - 2)
    st = opt.state_dict()["state"]
    for i, prm in enumerate(params):
        assert tuple(st[i]["exp_avg_sq"].shape) == tuple(prm.shape), keys[i]
        assert int(st[i]["step"]) == 3
        assert torch.allclose(st[i]["exp_avg_sq"], torch.full_like(prm, 0.25))
    # the loaded optimizer must actually step
    loss = sum((q**2).sum() for q in params)
    loss.backward()
    opt.step()
    assert int(opt.state_dict()["state"][0]["step"]) == 4

    # ---- D optimizer: ('convs' and not 'convs.0') or 'final' (`:920-931`)
    keys_d, params_d, opt_d = _torch_adam_from_saved(
        back["d"], back["d_optim"],
        lambda k: ("convs" in k and "convs.0" not in k) or "final" in k,
    )
    n_blocks = dcfg.log_size - 2
    assert len(keys_d) == 5 * n_blocks + 2 + 4
    st_d = opt_d.state_dict()["state"]
    for i, prm in enumerate(params_d):
        assert tuple(st_d[i]["exp_avg_sq"].shape) == tuple(prm.shape), keys_d[i]
        assert int(st_d[i]["step"]) == 7
    loss = sum((q**2).sum() for q in params_d)
    loss.backward()
    opt_d.step()


def test_merge_state_dict_lenient_shape_guard():
    from rick_tpu.ckpt.convert import merge_state_dict_lenient

    full = {"a": np.zeros((2, 2), np.float32), "b": np.zeros((3,), np.float32)}
    loaded = {"a": np.ones((2, 2), np.float32), "b": np.ones((4,), np.float32), "c": 5}
    with pytest.warns(UserWarning, match="shape"):
        out = merge_state_dict_lenient(full, loaded)
    np.testing.assert_array_equal(out["a"], np.ones((2, 2)))
    np.testing.assert_array_equal(out["b"], np.zeros((3,)))  # mismatch skipped
    assert "c" not in out


def test_async_saver_snapshot_and_error_propagation(tmp_path):
    """AsyncSaver: background writes complete on wait(); worker errors
    re-raise on wait(); snapshot survives later mutation of the source."""
    import jax
    import jax.numpy as jnp

    from rick_tpu.ckpt.async_io import AsyncSaver, atomic_write, snapshot

    tree = {"a": jnp.arange(8.0), "b": {"c": jnp.ones((3, 3))}}
    snap = snapshot(tree)

    saver = AsyncSaver()
    out = tmp_path / "t.npz"

    def write(host_tree):
        with atomic_write(str(out)) as tmp:
            with open(tmp, "wb") as f:
                np.savez(f, a=host_tree["a"], c=host_tree["b"]["c"])

    saver.submit(write, snap)
    saver.wait()
    data = np.load(out)
    np.testing.assert_array_equal(data["a"], np.arange(8.0))
    assert not out.with_suffix(".npz.tmp").exists()

    def boom(host_tree):
        raise RuntimeError("disk full")

    saver.submit(boom, snap)
    with pytest.raises(RuntimeError, match="disk full"):
        saver.wait()
    saver.close()


def test_cli_save_torch_ckpt_five_keys(tmp_path):
    """The CLI checkpoint writer emits all 5 reference keys
    (`train_dynamic_update_prune.py:644-659`) readable by torch.load."""
    import jax

    from rick_tpu.ckpt import (
        discriminator_state_dict_from_params,
        generator_state_dict_from_params,
        save_torch_file,
    )
    from rick_tpu.cli.train import _save_torch_ckpt
    from rick_tpu.nn import DiscriminatorConfig, GeneratorConfig
    from rick_tpu.train import TrainConfig, init_train_state

    gcfg = GeneratorConfig(size=16)
    dcfg = DiscriminatorConfig(size=16)
    tcfg = TrainConfig(batch=2, augment=False)
    state = jax.device_get(init_train_state(jax.random.key(0), gcfg, dcfg, tcfg))

    path = str(tmp_path / "ck.pt")
    _save_torch_ckpt(
        path, gcfg, dcfg, tcfg, state, save_torch_file,
        generator_state_dict_from_params, discriminator_state_dict_from_params,
    )
    ck = torch.load(path, weights_only=False)
    assert set(ck.keys()) == {"g_ema", "g", "d", "g_optim", "d_optim"}
    assert "param_groups" in ck["g_optim"] and "state" in ck["g_optim"]
    assert ck["g_optim"]["param_groups"][0]["betas"][0] == 0.0


def test_snapshot_packed_roundtrip():
    """snapshot_packed -> device_get -> unpack_snapshot reproduces the tree
    exactly (mixed shapes/dtypes, scalar leaves)."""
    import jax
    import jax.numpy as jnp

    from rick_tpu.ckpt.async_io import snapshot_packed, unpack_snapshot

    tree = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "nested": [jnp.ones((2, 2, 2)), jnp.asarray(3.5)],
        "count": jnp.asarray([1, 2, 3], jnp.int32),
    }
    packed, spec = snapshot_packed(tree)
    host = unpack_snapshot(jax.device_get(packed), spec)
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.asarray(a).shape == np.asarray(b).shape


def test_async_saver_latest_coalesces(tmp_path):
    """submit_latest_packed: a newer job with the same key replaces a
    not-yet-started older one; FIFO jobs all run."""
    import threading
    import time as _time

    import jax.numpy as jnp

    from rick_tpu.ckpt.async_io import AsyncSaver, snapshot_packed

    ran = []
    gate = threading.Event()

    saver = AsyncSaver()

    def slow(host):
        gate.wait(10)
        ran.append(("fifo", float(host["x"][0])))

    def best(tag):
        def fn(host):
            ran.append((tag, float(host["x"][0])))
        return fn

    p0, s0 = snapshot_packed({"x": jnp.asarray([0.0])})
    saver.submit_packed(slow, p0, s0)  # occupies the worker until gate opens
    _time.sleep(0.3)
    for v in (1.0, 2.0, 3.0):  # queued while worker busy -> coalesce to 3.0
        p, s = snapshot_packed({"x": jnp.asarray([v])})
        saver.submit_latest_packed("best", best(f"best{v}"), p, s)
    gate.set()
    saver.close()
    assert ("fifo", 0.0) in ran
    bests = [r for r in ran if r[0].startswith("best")]
    assert bests == [("best3.0", 3.0)]


def test_native_state_manifest_embedded_in_npz(tmp_path):
    """save_state embeds the manifest IN the npz: a kill between the npz and
    sidecar-json renames must not make --auto_resume restart at step 0 with
    step-N weights (ADVICE r2)."""
    import os

    from rick_tpu.ckpt.native import load_state, save_state

    state = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(4)}
    p = str(tmp_path / "000500.state.npz")
    save_state(p, state, step=500, extra={"best_fid": 12.5})

    # simulate the kill window: sidecar json never landed
    os.remove(p + ".json")
    restored, manifest = load_state(p, state)
    assert manifest["step"] == 500
    assert manifest["best_fid"] == 12.5
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(6.0).reshape(2, 3))


def test_native_state_step_from_filename_fallback(tmp_path):
    """Pre-embedding checkpoints (no __manifest__ key, no sidecar): the step
    parses from the {step:06d}.state.npz filename."""
    from rick_tpu.ckpt.native import load_state

    state = {"w": jnp.ones(3)}
    p = str(tmp_path / "001250.state.npz")
    with open(p, "wb") as f:
        np.savez(f, w=np.ones(3, np.float32))
    _, manifest = load_state(p, state)
    assert manifest["step"] == 1250


def test_async_saver_keeps_first_error_and_closes_after_failure(tmp_path):
    """Worker keeps the FIRST error (root cause), and close() still joins the
    thread when wait() re-raises (ADVICE r2)."""
    from rick_tpu.ckpt.async_io import AsyncSaver, snapshot

    snap = snapshot({"a": jnp.zeros(2)})
    saver = AsyncSaver()

    def boom1(_):
        raise RuntimeError("first failure")

    def boom2(_):
        raise RuntimeError("second failure")

    saver.submit(boom1, snap)
    saver.submit(boom2, snap)
    with pytest.raises(RuntimeError, match="first failure"):
        saver.close()
    assert not saver._thread.is_alive()
