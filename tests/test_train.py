"""Training-layer tests: Adam parity vs torch, ADA adaptation semantics,
Fisher mask decisions vs a numpy oracle, mask merge monotonicity, and a short
integration run exercising warmup gating."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rick_tpu.nn import DiscriminatorConfig, GeneratorConfig
from rick_tpu.train import (
    TrainConfig,
    fisher_round,
    init_train_state,
    make_train_step,
    run_iteration,
)
from rick_tpu.train.adam import adam_init, adam_update
from rick_tpu.train.fisher import masks_from_fims
from rick_tpu.train.masks import merge_prune, init_g_masks
from rick_tpu.train.steps import ada_update


# ---------------------------------------------------------------------------
# Adam
# ---------------------------------------------------------------------------


def test_adam_matches_torch_with_warmup_offset():
    """Two params; param 'b' joins late (torch: grad None -> no step), like
    D's non-final params during warmup.  beta1=0, beta2=0.99**(16/17)."""
    beta2 = 0.99 ** (16 / 17)
    lr = 0.002 * (16 / 17)
    rng = np.random.default_rng(0)
    a0 = rng.standard_normal(5).astype(np.float32)
    b0 = rng.standard_normal(4).astype(np.float32)

    ta = torch.nn.Parameter(torch.from_numpy(a0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.Adam([ta, tb], lr=lr, betas=(0.0, beta2), eps=1e-8)

    params = {"a": jnp.asarray(a0), "b": jnp.asarray(b0)}
    state = adam_init(params)

    for t in range(6):
        ga = rng.standard_normal(5).astype(np.float32)
        gb = rng.standard_normal(4).astype(np.float32)
        warm = t < 3  # 'b' inactive for first 3 steps

        opt.zero_grad(set_to_none=True)
        ta.grad = torch.from_numpy(ga.copy())
        if not warm:
            tb.grad = torch.from_numpy(gb.copy())
        opt.step()

        active = {"a": jnp.asarray(1.0), "b": jnp.asarray(0.0 if warm else 1.0)}
        grads = {"a": jnp.asarray(ga), "b": jnp.asarray(gb if not warm else gb * 0)}
        params, state = adam_update(params, grads, state, active, lr=lr, beta2=beta2)

    np.testing.assert_allclose(np.asarray(params["a"]), ta.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adam_zero_grad_zero_update():
    """With beta1=0, a zeroed (masked) gradient must produce a zero update --
    the property the reference's freeze/prune masking relies on."""
    params = {"w": jnp.ones((3,))}
    state = adam_init(params)
    # one step with real grads to build up v
    params, state = adam_update(
        params, {"w": jnp.asarray([1.0, 2.0, 3.0])}, state, {"w": jnp.asarray(1.0)},
        lr=0.1, beta2=0.99,
    )
    before = np.asarray(params["w"]).copy()
    params, state = adam_update(
        params, {"w": jnp.zeros((3,))}, state, {"w": jnp.asarray(1.0)},
        lr=0.1, beta2=0.99,
    )
    np.testing.assert_array_equal(np.asarray(params["w"]), before)


# ---------------------------------------------------------------------------
# ADA adaptation
# ---------------------------------------------------------------------------


def test_ada_update_direction_and_trigger():
    tcfg = TrainConfig(ada_target=0.6, ada_length=1000)
    p = jnp.asarray(0.5)
    stats = jnp.zeros((2,))
    r_t = jnp.zeros(())

    # below threshold: stats accumulate, p unchanged
    pred = jnp.ones((100, 1))
    p1, stats1, _ = ada_update(p, stats, r_t, pred, tcfg)
    assert float(p1) == 0.5
    np.testing.assert_allclose(np.asarray(stats1), [100.0, 100.0])

    # push over 255 with all-positive predictions -> r_t=1 > 0.6 -> p increases
    pred = jnp.ones((200, 1))
    p2, stats2, rt2 = ada_update(p1, stats1, r_t, pred, tcfg)
    assert float(p2) > 0.5
    assert float(rt2) == 1.0
    np.testing.assert_allclose(np.asarray(stats2), [0.0, 0.0])  # reset

    # all-negative predictions -> p decreases
    p3, stats3, _ = ada_update(p2, stats2, r_t, -jnp.ones((300, 1)), tcfg)
    assert float(p3) < float(p2)


# ---------------------------------------------------------------------------
# Fisher masks vs numpy oracle
# ---------------------------------------------------------------------------


def _rand_fim_g(n_blocks=4, out=6, inc=5, seed=0):
    rng = np.random.default_rng(seed)
    blocks = []
    for _ in range(n_blocks):
        blocks.append(
            {
                "conv": {
                    "weight": jnp.asarray(rng.random((out, inc, 3, 3)).astype(np.float32)),
                    "modulation": {
                        "weight": jnp.asarray(rng.random((inc, 8)).astype(np.float32)),
                        "bias": jnp.asarray(rng.random((inc,)).astype(np.float32)),
                    },
                },
                "noise_weight": jnp.zeros(()),
                "act_bias": jnp.zeros((out,)),
            }
        )
    return {"convs": blocks}


def _rand_fim_d(n_blocks=3, out=6, inc=5, seed=1):
    rng = np.random.default_rng(seed)
    convs = [{"weight": jnp.zeros((out, 3, 1, 1)), "act_bias": jnp.zeros((out,))}]
    for _ in range(n_blocks):
        convs.append(
            {
                "conv1": {
                    "weight": jnp.asarray(rng.random((inc, inc, 3, 3)).astype(np.float32)),
                    "act_bias": jnp.asarray(rng.random((inc,)).astype(np.float32)),
                },
                "conv2": {
                    "weight": jnp.asarray(rng.random((out, inc, 3, 3)).astype(np.float32)),
                    "act_bias": jnp.asarray(rng.random((out,)).astype(np.float32)),
                },
                "skip": {"weight": jnp.asarray(rng.random((out, inc, 1, 1)).astype(np.float32))},
            }
        )
    return {"convs": convs}


def test_masks_from_fims_matches_numpy_oracle():
    fim_g = _rand_fim_g()
    fim_d = _rand_fim_d()
    fq, pq = 40.0, 10.0
    g_freeze, g_prune, d_freeze, d_prune = masks_from_fims(
        fim_g, fim_d, fisher_quantile=fq, prune_quantile=pq
    )

    # numpy oracle for the G conv group
    conv_scores = [np.asarray(b["conv"]["weight"]).mean(axis=(1, 2, 3)) for b in fim_g["convs"]]
    grouped = np.concatenate(conv_scores)
    cut = np.percentile(grouped, fq)
    prune = np.percentile(grouped, pq)
    for b, cs in enumerate(conv_scores):
        np.testing.assert_array_equal(
            np.asarray(g_freeze["convs"][b]["weight"]), (cs > cut).astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(g_prune["convs"][b]["weight"]), (cs <= prune).astype(np.float32)
        )

    # numpy oracle for the G fc group
    fc_scores = [
        (np.asarray(b["conv"]["modulation"]["weight"]).mean(axis=1) + np.asarray(b["conv"]["modulation"]["bias"])) / 2
        for b in fim_g["convs"]
    ]
    gfc = np.concatenate(fc_scores)
    cut_fc = np.percentile(gfc, fq)
    prune_fc = np.percentile(gfc, pq)
    for b, fs in enumerate(fc_scores):
        np.testing.assert_array_equal(
            np.asarray(g_freeze["convs"][b]["mod_w"]), (fs > cut_fc).astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(g_prune["convs"][b]["mod_b"]), (fs <= prune_fc).astype(np.float32)
        )

    # numpy oracle for the D group (conv1/conv2 paired with bias; skip alone,
    # skip uses strict < for prune)
    d_scores = []
    per_block = []
    for blk in fim_d["convs"][1:]:
        s1 = (np.asarray(blk["conv1"]["weight"]).mean(axis=(1, 2, 3)) + np.asarray(blk["conv1"]["act_bias"])) / 2
        s2 = (np.asarray(blk["conv2"]["weight"]).mean(axis=(1, 2, 3)) + np.asarray(blk["conv2"]["act_bias"])) / 2
        sk = np.asarray(blk["skip"]["weight"]).mean(axis=(1, 2, 3))
        per_block.append((s1, s2, sk))
        d_scores += [s1, s2, sk]
    gd = np.concatenate(d_scores)
    cut_d = np.percentile(gd, fq)
    prune_d = np.percentile(gd, pq)
    for b, (s1, s2, sk) in enumerate(per_block):
        np.testing.assert_array_equal(
            np.asarray(d_freeze["convs"][b]["conv1_w"]), (s1 > cut_d).astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(d_prune["convs"][b]["conv2_b"]), (s2 <= prune_d).astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(d_prune["convs"][b]["skip_w"]), (sk < prune_d).astype(np.float32)
        )


def test_merge_prune_is_monotonic_or():
    a = {"convs": [{"weight": jnp.asarray([1.0, 0.0, 1.0, 0.0])}]}
    b = {"convs": [{"weight": jnp.asarray([0.0, 1.0, 1.0, 0.0])}]}
    m = merge_prune(a, b)
    np.testing.assert_array_equal(np.asarray(m["convs"][0]["weight"]), [1.0, 1.0, 1.0, 0.0])


# ---------------------------------------------------------------------------
# Integration: short run with warmup + fisher round
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_short_training_run_with_fisher():
    gcfg = GeneratorConfig(size=16)
    dcfg = DiscriminatorConfig(size=16)
    tcfg = TrainConfig(batch=4, augment=False, warmup_iter=3, fisher_freq=2,
                       num_fisher_img=2, fisher_quantile=50.0, prune_quantile=10.0)
    state = init_train_state(jax.random.key(0), gcfg, dcfg, tcfg)
    phases = make_train_step(gcfg, dcfg, tcfg)
    rng = jax.random.key(1)

    fisher_noises = np.random.default_rng(3).standard_normal((2, 512)).astype(np.float32)
    for i in range(6):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        real = jax.random.normal(k1, (4, 3, 16, 16))
        if i >= tcfg.warmup_iter and (i - tcfg.warmup_iter) % tcfg.fisher_freq == 0:
            gf, gp, df, dp = fisher_round(
                gcfg, dcfg, state["g_ema"], state["d_ema"],
                jnp.asarray(fisher_noises), real[:2], k3,
                batch=tcfg.batch,
                fisher_quantile=tcfg.fisher_quantile,
                prune_quantile=tcfg.prune_quantile,
            )
            state["g_freeze"], state["d_freeze"] = gf, df
            state["g_prune"] = merge_prune(state["g_prune"], gp)
            state["d_prune"] = merge_prune(state["d_prune"], dp)
        state, m = run_iteration(phases, state, real, k2, i, tcfg)
        for k, v in m.items():
            assert np.isfinite(float(v)), (i, k)

    # warmup accounting: G conv leaves stepped 3 g-steps + 1 path (i=4)
    assert float(state["g_opt"]["count"]["convs"][0]["conv"]["weight"]) == 4.0
    assert float(state["d_opt"]["count"]["final_conv"]["weight"]) == 7.0
    assert float(state["d_opt"]["count"]["convs"][1]["conv1"]["weight"]) == 3.0

    # prune masks actually zero the pruned G filters
    pm = np.asarray(state["g_prune"]["convs"][0]["weight"])
    if pm.sum() > 0:
        w = np.asarray(state["g"]["convs"][0]["conv"]["weight"])
        assert np.abs(w[pm.astype(bool)]).max() == 0.0
    # EMA drifted from init
    assert not np.allclose(
        np.asarray(state["g_ema"]["convs"][0]["conv"]["weight"]),
        np.asarray(state["g"]["convs"][0]["conv"]["weight"]),
    )


def test_ema_fold_matches_standalone_lerp():
    """The EMA is folded into the last phase of each iteration (g or path,
    steps.py round-4 fold).  After every run_iteration the EMA state must be
    bit-identical to the reference's standalone `accumulate()`:
    e' = accum*e + (1-accum)*p with the POST-iteration params — including on
    path iterations, where the fold defers the lerp past the path update."""
    gcfg = GeneratorConfig(size=16)
    dcfg = DiscriminatorConfig(size=16)
    tcfg = TrainConfig(batch=2, augment=False, warmup_iter=0, g_reg_every=2)
    state = init_train_state(jax.random.key(0), gcfg, dcfg, tcfg)
    phases = make_train_step(gcfg, dcfg, tcfg)
    accum = tcfg.ema_accum
    rng = jax.random.key(1)

    for i in range(4):  # i=0,2 fire the path phase; i=1,3 do not
        before_g_ema = jax.tree.map(lambda x: np.asarray(x), state["g_ema"])
        before_d_ema = jax.tree.map(lambda x: np.asarray(x), state["d_ema"])
        rng, k1, k2 = jax.random.split(rng, 3)
        real = jax.random.normal(k1, (2, 3, 16, 16))
        state, _ = run_iteration(phases, state, real, k2, i, tcfg)
        expect_g = jax.tree.map(
            lambda e, p: np.float32(accum) * e + np.float32(1.0 - accum) * np.asarray(p),
            before_g_ema, state["g"],
        )
        expect_d = jax.tree.map(
            lambda e, p: np.float32(accum) * e + np.float32(1.0 - accum) * np.asarray(p),
            before_d_ema, state["d"],
        )
        for got, want in (
            (state["g_ema"], expect_g),
            (state["d_ema"], expect_d),
        ):
            flat_got = jax.tree.leaves(got)
            flat_want = jax.tree.leaves(want)
            for a, b in zip(flat_got, flat_want):
                # 1-2 ulp: XLA contracts the lerp into an FMA, numpy doesn't
                np.testing.assert_allclose(
                    np.asarray(a), b, rtol=5e-7, atol=1e-6, err_msg=f"iter {i}"
                )


def test_path_phase_skipped_during_warmup():
    """Reference gates the WHOLE path phase on `g_regularize and
    i >= args.warmup_iter` (train_dynamic_update_prune.py:546): during warmup
    the mean_path_length EMA must not advance."""
    gcfg = GeneratorConfig(size=16)
    dcfg = DiscriminatorConfig(size=16)
    tcfg = TrainConfig(batch=2, augment=False, warmup_iter=5, g_reg_every=2)
    state = init_train_state(jax.random.key(0), gcfg, dcfg, tcfg)
    phases = make_train_step(gcfg, dcfg, tcfg)
    rng = jax.random.key(1)

    for i in range(4):  # i=0,2 hit g_reg_every but are inside warmup
        rng, k1, k2 = jax.random.split(rng, 3)
        real = jax.random.normal(k1, (2, 3, 16, 16))
        state, m = run_iteration(phases, state, real, k2, i, tcfg)
        assert float(m["path"]) == 0.0, i
    assert float(state["mean_path_length"]) == 0.0

    # first post-warmup multiple of g_reg_every advances the EMA
    for i in range(4, 7):
        rng, k1, k2 = jax.random.split(rng, 3)
        real = jax.random.normal(k1, (2, 3, 16, 16))
        state, m = run_iteration(phases, state, real, k2, i, tcfg)
    assert float(state["mean_path_length"]) != 0.0


def test_load_fisher_noises_keeps_all_rows(tmp_path):
    """Multi-row `_noise/{j}.pt` files contribute one FIM sample PER ROW
    (train_dynamic_update_prune.py:230), not one flattened latent."""
    from rick_tpu.ckpt import save_torch_file
    from rick_tpu.cli.train import load_fisher_noises

    rng = np.random.default_rng(0)
    f0 = rng.standard_normal((3, 8)).astype(np.float32)  # 3 rows
    f1 = rng.standard_normal((1, 8)).astype(np.float32)
    save_torch_file(f0, str(tmp_path / "0000.pt"))
    save_torch_file(f1, str(tmp_path / "0001.pt"))

    # missing fixtures FAIL by default (protocol determinism, VERDICT r2 #9)
    with pytest.raises(FileNotFoundError, match="Fisher noise fixtures missing"):
        load_fisher_noises(str(tmp_path), 3, latent=8, batch=4)

    noises, rows = load_fisher_noises(str(tmp_path), 3, latent=8, batch=4, allow_random=True)
    assert rows == [3, 1, 1]  # third file missing -> 1 fallback row (opt-in)
    assert noises.shape == (5, 8)
    np.testing.assert_array_equal(noises[:3], f0)
    np.testing.assert_array_equal(noises[3:4], f1)

    # rows beyond the train batch cannot be paired with a real image
    save_torch_file(rng.standard_normal((5, 8)).astype(np.float32), str(tmp_path / "0002.pt"))
    with pytest.raises(ValueError):
        load_fisher_noises(str(tmp_path), 3, latent=8, batch=4)


def test_accumulate_fims_denom_override():
    """`denom` rescales the averaged FIM exactly (reference divides by
    num_fisher_img * args.batch regardless of total row count, `:266-269`)."""
    from rick_tpu.train.fisher import accumulate_fims

    gcfg = GeneratorConfig(size=16)
    dcfg = DiscriminatorConfig(size=16)
    state = init_train_state(jax.random.key(0), gcfg, dcfg, TrainConfig(batch=2))
    z = jax.random.normal(jax.random.key(1), (2, 512))
    real = jax.random.normal(jax.random.key(2), (2, 3, 16, 16))
    k = jax.random.key(3)

    fim_a, _ = accumulate_fims(gcfg, dcfg, state["g_ema"], state["d_ema"], z, real, k, batch=2)
    fim_b, _ = accumulate_fims(
        gcfg, dcfg, state["g_ema"], state["d_ema"], z, real, k, batch=2, denom=8.0
    )
    a = np.asarray(fim_a["convs"][0]["conv"]["weight"])
    b = np.asarray(fim_b["convs"][0]["conv"]["weight"])
    np.testing.assert_allclose(a, b * 2.0, rtol=1e-6)  # default denom = 2*2 = 4


def test_bf16_training_tracks_f32_trajectory():
    """bf16 adversarial phases (params f32, compute bf16) stay close to the
    f32 trajectory over a short run: same phase structure, losses finite, and
    the first-iteration losses agree to bf16 tolerance."""
    gcfg = GeneratorConfig(size=16)
    dcfg = DiscriminatorConfig(size=16)
    base = dict(batch=2, augment=False, warmup_iter=0, g_reg_every=2, d_reg_every=2)

    trajs = {}
    for bf16 in (False, True):
        tcfg = TrainConfig(bf16=bf16, **base)
        state = init_train_state(jax.random.key(0), gcfg, dcfg, tcfg)
        phases = make_train_step(gcfg, dcfg, tcfg)
        rng = jax.random.key(1)
        losses = []
        for i in range(6):
            rng, k1, k2 = jax.random.split(rng, 3)
            real = jax.random.normal(k1, (2, 3, 16, 16))
            state, m = run_iteration(phases, state, real, k2, i, tcfg)
            losses.append((float(m["d"]), float(m["g"])))
            for k, v in m.items():
                assert np.isfinite(float(v)), (bf16, i, k)
        trajs[bf16] = np.asarray(losses)

    # identical inputs + identical f32 params at i=0: only compute dtype
    # differs, so first-step losses agree to bf16 rounding (~1e-2 relative)
    np.testing.assert_allclose(trajs[True][0], trajs[False][0], rtol=0.05, atol=0.05)
    # trajectories stay in the same regime (no divergence/blowup)
    assert np.all(np.abs(trajs[True]) < 50.0)
