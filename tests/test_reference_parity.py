"""Assembled-network parity vs the REFERENCE'S OWN model code.

Oracle: `/root/reference/gan_training/models/model_probe_tune.py` imported
directly (spec_from_file_location bypasses the broken package `__init__`,
SURVEY par. 2.2) with its CUDA `op` module stubbed by CPU equivalents:

  * upfirdn2d  -> zero-stuff/pad/flipped-conv/stride (the operator's spec,
                  `op/upfirdn2d.py:150-200`), as in test_augment.py;
  * fused_leaky_relu / FusedLeakyReLU -> leaky_relu(x + bias)*sqrt(2)
                  (`op/fused_act.py:73-107`: slope 0.2, scale 2**0.5, bias
                  broadcast over dim 1).

Identical weights flow through `ckpt/convert.py` (the torch<->pytree state
dict converters used for real checkpoints), then the FULL assembled networks
are compared -- generator image/latents/feats, discriminator score/feats, the
`estimate_fisher` FIM dicts (`model_probe_tune.py:481-504,706-729` driven by
the training loop `train_dynamic_update_prune.py:222-269`), and the resulting
freeze/ft/prune index sets (`:279-384`).  This closes the gap the per-piece
oracles can't see: a wiring bug in the skip chain, noise indexing or fisher
grouping that a re-derived oracle would share.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rick_tpu.ckpt.convert import (
    discriminator_params_from_state_dict,
    generator_params_from_state_dict,
)
from rick_tpu.nn import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_apply,
    generator_apply,
)
from rick_tpu.train.fisher import accumulate_fims, masks_from_fims
from rick_tpu.train.losses import d_logistic_loss as j_d_loss
from rick_tpu.train.losses import g_nonsaturating_loss as j_g_loss

SIZE = 64


# ---------------------------------------------------------------------------
# CPU stubs for the reference's CUDA `op` module
# ---------------------------------------------------------------------------


def _upfirdn2d_cpu(input, kernel, up=1, down=1, pad=(0, 0)):
    x = input
    k = kernel
    n, c, h, w = x.shape
    u = torch.zeros(n, c, h * up, w * up, dtype=x.dtype)
    u[:, :, ::up, ::up] = x
    u = F.pad(u, (pad[0], pad[1], pad[0], pad[1]))
    kk = torch.flip(k, (0, 1)).reshape(1, 1, *k.shape).to(x.dtype)
    out = F.conv2d(u.reshape(n * c, 1, u.shape[2], u.shape[3]), kk)
    out = out.reshape(n, c, out.shape[2], out.shape[3])
    return out[:, :, ::down, ::down]


def _fused_leaky_relu_cpu(input, bias, negative_slope=0.2, scale=2**0.5):
    rest = [1] * (input.ndim - 2)
    return F.leaky_relu(
        input + bias.view(1, bias.shape[0], *rest), negative_slope
    ) * scale


class _FusedLeakyReLUCPU(torch.nn.Module):
    def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
        super().__init__()
        self.bias = torch.nn.Parameter(torch.zeros(channel))
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, input):
        return _fused_leaky_relu_cpu(input, self.bias, self.negative_slope, self.scale)


@pytest.fixture(scope="module")
def ref_models():
    op = types.ModuleType("op")
    op.upfirdn2d = _upfirdn2d_cpu
    op.fused_leaky_relu = _fused_leaky_relu_cpu
    op.FusedLeakyReLU = _FusedLeakyReLUCPU
    saved = sys.modules.get("op")
    sys.modules["op"] = op
    spec = importlib.util.spec_from_file_location(
        "ref_model_probe_tune",
        "/root/reference/gan_training/models/model_probe_tune.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    if saved is not None:
        sys.modules["op"] = saved
    else:
        sys.modules.pop("op", None)


@pytest.fixture(scope="module")
def g_pair(ref_models):
    torch.manual_seed(0)
    refg = ref_models.Generator(SIZE, 512, 8).eval()
    gcfg = GeneratorConfig(size=SIZE)
    sd = {k: v.detach().numpy() for k, v in refg.state_dict().items()}
    params = generator_params_from_state_dict(gcfg, sd)
    return refg, gcfg, params


@pytest.fixture(scope="module")
def d_pair(ref_models):
    torch.manual_seed(1)
    refd = ref_models.Discriminator(SIZE).eval()
    dcfg = DiscriminatorConfig(size=SIZE)
    sd = {k: v.detach().numpy() for k, v in refd.state_dict().items()}
    params = discriminator_params_from_state_dict(dcfg, sd)
    return refd, dcfg, params


def _close(ours, ref, tol=3e-4, what=""):
    ours = np.asarray(ours, np.float64)
    ref = ref.detach().numpy().astype(np.float64)
    assert ours.shape == ref.shape, f"{what}: shape {ours.shape} vs {ref.shape}"
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(ours, ref, rtol=tol, atol=tol * scale, err_msg=what)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def test_generator_single_style_image_and_latents(g_pair):
    refg, gcfg, params = g_pair
    z = torch.randn(2, 512, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        ref_img, ref_lat = refg([z], randomize_noise=False, return_latents=True)
    img, lat = generator_apply(
        gcfg, params, [jnp.asarray(z.numpy())], return_latents=True
    )
    _close(img, ref_img, what="G image (single style)")
    _close(lat, ref_lat, what="G latent tensor")


def test_generator_mixing_and_feats(g_pair):
    refg, gcfg, params = g_pair
    gen = torch.Generator().manual_seed(8)
    z1 = torch.randn(2, 512, generator=gen)
    z2 = torch.randn(2, 512, generator=gen)
    with torch.no_grad():
        ref_img, ref_feats = refg(
            [z1, z2], inject_index=3, randomize_noise=False, return_feats=True
        )
    img, feats = generator_apply(
        gcfg,
        params,
        [jnp.asarray(z1.numpy()), jnp.asarray(z2.numpy())],
        inject_index=3,
        return_feats=True,
    )
    _close(img, ref_img, what="G image (mixed styles)")
    assert len(feats) == len(ref_feats)
    for i, (f, rf) in enumerate(zip(feats, ref_feats)):
        _close(f, rf, what=f"G feat {i}")


def test_generator_truncation(g_pair):
    refg, gcfg, params = g_pair
    gen = torch.Generator().manual_seed(9)
    z = torch.randn(3, 512, generator=gen)
    trunc_latent = torch.randn(1, 512, generator=gen)
    with torch.no_grad():
        ref_img, _ = refg(
            [z],
            truncation=0.7,
            truncation_latent=trunc_latent,
            randomize_noise=False,
        )
    img, _ = generator_apply(
        gcfg,
        params,
        [jnp.asarray(z.numpy())],
        truncation=0.7,
        truncation_latent=jnp.asarray(trunc_latent.numpy()),
    )
    _close(img, ref_img, what="G image (truncation)")


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------


def test_discriminator_score_and_feats(d_pair):
    refd, dcfg, params = d_pair
    x = torch.randn(4, 3, SIZE, SIZE, generator=torch.Generator().manual_seed(11))
    with torch.no_grad():
        ref_score, ref_feats = refd(x)
    score, feats = discriminator_apply(dcfg, params, jnp.asarray(x.numpy()))
    _close(score, ref_score, what="D score")
    assert len(feats) == len(ref_feats)
    for i, (f, rf) in enumerate(zip(feats, ref_feats)):
        _close(f, rf, what=f"D feat {i}")


# ---------------------------------------------------------------------------
# Fisher protocol: FIM dicts + freeze/ft/prune index sets
# ---------------------------------------------------------------------------


def _torch_fisher(ref_models, refg, refd, zs, reals):
    """The reference fisher loop verbatim (`train_dynamic_update_prune.py:
    222-269`) at batch-1 per image, randomize_noise=False to pin the
    injection noise on both sides (the loop's default fresh-noise draws are
    torch-RNG-specific; the FIM *protocol* is unchanged)."""
    for p in refg.parameters():
        p.requires_grad_(True)
    for p in refd.parameters():
        p.requires_grad_(True)
    fim_g, fim_d = {}, {}
    for idx in range(zs.shape[0]):
        refg.zero_grad()
        refd.zero_grad()
        fake, _ = refg([zs[idx].view(1, -1)], randomize_noise=False)
        real1 = reals[idx].view(1, 3, SIZE, SIZE)
        fake_pred, _ = refd(fake)
        real_pred, _ = refd(real1)
        g_loss = F.softplus(-fake_pred).mean()
        d_loss = F.softplus(-real_pred).mean() + F.softplus(fake_pred).mean()
        _, est_g = refg.estimate_fisher(loglikelihood=g_loss)
        _, est_d = refd.estimate_fisher(loglikelihood=d_loss)
        for key in est_g:
            v = est_g[key].detach().cpu().numpy().astype(np.float64)
            fim_g[key] = v if idx == 0 else fim_g[key] + v
        for key in est_d:
            v = est_d[key].detach().cpu().numpy().astype(np.float64)
            fim_d[key] = v if idx == 0 else fim_d[key] + v
    return fim_g, fim_d


def _ref_g_masks(fim_g, n_styled, fisher_q, prune_q):
    """`train_dynamic_update_prune.py:279-331` with the 256px-hardcoded
    `range(12)` generalized to the styled-conv count (12 == 2*(log2(256)-2);
    the grouping math is resolution-independent).  Also returns the per-key
    scores and (cutline, pruneline) so the caller can exclude
    within-fp-noise-of-the-cutline boundary indices from set comparisons."""
    grouped_conv, grouped_fc = [], []
    for b in range(n_styled):
        grouped_conv = np.concatenate(
            (grouped_conv, fim_g[f"convs.{b}.conv.weight"].mean(axis=(0, 2, 3, 4))),
            axis=None,
        )
        fc = (
            fim_g[f"convs.{b}.conv.modulation.weight"].mean(axis=1)
            + fim_g[f"convs.{b}.conv.modulation.bias"]
        ) / 2
        grouped_fc = np.concatenate((grouped_fc, fc), axis=None)
    cut_c = np.percentile(grouped_conv, q=fisher_q)
    prune_c = np.percentile(grouped_conv, q=prune_q)
    cut_f = np.percentile(grouped_fc, q=fisher_q)
    prune_f = np.percentile(grouped_fc, q=prune_q)
    freeze, ft, prune, scores, lines = {}, {}, {}, {}, {}
    for b in range(n_styled):
        cw = fim_g[f"convs.{b}.conv.weight"].mean(axis=(0, 2, 3, 4))
        freeze[f"convs.{b}.conv.weight"] = np.where(cw > cut_c)[0]
        ft[f"convs.{b}.conv.weight"] = np.where((cw > prune_c) & (cw <= cut_c))[0]
        prune[f"convs.{b}.conv.weight"] = np.where(cw <= prune_c)[0]
        scores[f"convs.{b}.conv.weight"] = cw
        lines[f"convs.{b}.conv.weight"] = (cut_c, prune_c)
        fc = (
            fim_g[f"convs.{b}.conv.modulation.weight"].mean(axis=1)
            + fim_g[f"convs.{b}.conv.modulation.bias"]
        ) / 2
        for suffix in ("modulation.weight", "modulation.bias"):
            freeze[f"convs.{b}.conv.{suffix}"] = np.where(fc > cut_f)[0]
            ft[f"convs.{b}.conv.{suffix}"] = np.where((fc > prune_f) & (fc <= cut_f))[0]
            prune[f"convs.{b}.conv.{suffix}"] = np.where(fc <= prune_f)[0]
            scores[f"convs.{b}.conv.{suffix}"] = fc
            lines[f"convs.{b}.conv.{suffix}"] = (cut_f, prune_f)
    return freeze, ft, prune, scores, lines


def _ref_d_masks(fim_d, n_blocks, fisher_q, prune_q):
    """`train_dynamic_update_prune.py:333-384` with `range(1,7)` generalized
    to the ResBlock count (6 == log2(256)-2)."""
    grouped = []
    for b in range(1, n_blocks + 1):
        for li in range(2):
            cw = fim_d[f"convs.{b}.conv{li+1}.{li}.weight"].mean(axis=(1, 2, 3))
            cb = fim_d[f"convs.{b}.conv{li+1}.{li+1}.bias"]
            grouped = np.concatenate((grouped, (cw + cb) / 2), axis=None)
            if li == 1:
                sk = fim_d[f"convs.{b}.skip.{li}.weight"].mean(axis=(1, 2, 3))
                grouped = np.concatenate((grouped, sk), axis=None)
    cut = np.percentile(grouped, q=fisher_q)
    prune_line = np.percentile(grouped, q=prune_q)
    freeze, ft, prune, scores, lines = {}, {}, {}, {}, {}
    for b in range(1, n_blocks + 1):
        for li in range(2):
            wkey = f"convs.{b}.conv{li+1}.{li}.weight"
            bkey = f"convs.{b}.conv{li+1}.{li+1}.bias"
            fim = (
                fim_d[wkey].mean(axis=(1, 2, 3)) + fim_d[bkey]
            ) / 2
            for key in (wkey, bkey):
                freeze[key] = np.where(fim > cut)[0]
                ft[key] = np.where((fim > prune_line) & (fim <= cut))[0]
                prune[key] = np.where(fim <= prune_line)[0]
                scores[key] = fim
                lines[key] = (cut, prune_line)
        skey = f"convs.{b}.skip.1.weight"
        sk = fim_d[skey].mean(axis=(1, 2, 3))
        freeze[skey] = np.where(sk > cut)[0]
        ft[skey] = np.where((sk >= prune_line) & (sk <= cut))[0]
        prune[skey] = np.where(sk < prune_line)[0]  # skip quirk: strict <
        scores[skey] = sk
        lines[skey] = (cut, prune_line)
    return freeze, ft, prune, scores, lines


def _assert_idx(mask, idx, scores, line, what, rtol=2e-2):
    """Set equality excluding indices whose REFERENCE score sits within
    `rtol` of the cutline: our cutline comes from f32-on-device FIMs, the
    reference's from f64 numpy FIMs, so a filter landing within fp noise of
    the percentile may legitimately flip sides.  A structural/grouping bug
    moves scores by O(1) relative and fails regardless."""
    band = np.abs(scores - line) <= rtol * abs(line) + 1e-12
    got = {int(i) for i in np.where(np.asarray(mask) > 0.5)[0] if not band[i]}
    want = {int(i) for i in idx if not band[i]}
    assert got == want, (
        f"{what}: ours-only {sorted(got - want)} vs reference-only "
        f"{sorted(want - got)} (outside the {rtol:.0%} cutline band)"
    )


def test_fisher_fims_and_masks_match_reference(g_pair, d_pair):
    refg, gcfg, g_params = g_pair
    refd, dcfg, d_params = d_pair
    gen = torch.Generator().manual_seed(21)
    n_img = 2
    zs = torch.randn(n_img, 512, generator=gen)
    reals = torch.randn(n_img, 3, SIZE, SIZE, generator=gen)

    ref_fim_g, ref_fim_d = _torch_fisher(None, refg, refd, zs, reals)
    # reference averaging (`:264-269`): / (num_fisher_img * args.batch)
    denom = float(n_img * 2)
    for d_ in (ref_fim_g, ref_fim_d):
        for k in d_:
            d_[k] = d_[k] / denom

    fim_g, fim_d = accumulate_fims(
        gcfg,
        dcfg,
        g_params,
        d_params,
        jnp.asarray(zs.numpy()),
        jnp.asarray(reals.numpy()),
        jax.random.key(0),  # unused under const_noise
        batch=2,
        denom=denom,
        const_noise=True,
    )

    # ---- FIM dict parity (every torch parameter key) ----
    from rick_tpu.ckpt.convert import (
        discriminator_state_dict_from_params,
        generator_state_dict_from_params,
    )

    ours_g = generator_state_dict_from_params(gcfg, fim_g)
    ours_d = discriminator_state_dict_from_params(dcfg, fim_d)
    # FIMs are SQUARED f32 gradients: elementwise relative error doubles vs
    # the ~0.5% worst-case conv-grad error, so per-element tolerance is 3%
    # with a scale-relative floor.  A structural/wiring bug produces O(1)
    # relative differences on whole tensors, far outside this band.
    for key, ref_v in ref_fim_g.items():
        ours = np.asarray(ours_g[key], np.float64)
        scale = max(ref_v.max(), 1e-12)
        np.testing.assert_allclose(
            ours, ref_v, rtol=3e-2, atol=1e-3 * scale, err_msg=f"G FIM {key}"
        )
    for key, ref_v in ref_fim_d.items():
        ours = np.asarray(ours_d[key], np.float64)
        scale = max(ref_v.max(), 1e-12)
        np.testing.assert_allclose(
            ours, ref_v, rtol=3e-2, atol=1e-3 * scale, err_msg=f"D FIM {key}"
        )

    # ---- freeze/ft/prune index-set parity ----
    fisher_q, prune_q = 50.0, 10.0
    g_freeze, g_prune, d_freeze, d_prune = masks_from_fims(
        fim_g, fim_d, fisher_quantile=fisher_q, prune_quantile=prune_q
    )
    n_styled = 2 * (gcfg.log_size - 2)
    rf, rt, rp, rs, rl = _ref_g_masks(ref_fim_g, n_styled, fisher_q, prune_q)
    for b in range(n_styled):
        ours_b_f, ours_b_p = g_freeze["convs"][b], g_prune["convs"][b]
        for ours_key, ref_key in (
            ("weight", f"convs.{b}.conv.weight"),
            ("mod_w", f"convs.{b}.conv.modulation.weight"),
            ("mod_b", f"convs.{b}.conv.modulation.bias"),
        ):
            cut, prune_line = rl[ref_key]
            _assert_idx(
                ours_b_f[ours_key], rf[ref_key], rs[ref_key], cut,
                f"G freeze {ref_key}",
            )
            _assert_idx(
                ours_b_p[ours_key], rp[ref_key], rs[ref_key], prune_line,
                f"G prune {ref_key}",
            )
        # ft = complement of freeze|prune within the layer (the reference's
        # three-way partition is exhaustive for non-skip layers); boundary
        # indices near EITHER line are excluded like above
        key = f"convs.{b}.conv.weight"
        cut, prune_line = rl[key]
        n = np.asarray(ours_b_f["weight"]).shape[0]
        ours_ft_mask = np.ones(n)
        ours_ft_mask[np.asarray(ours_b_f["weight"]) > 0.5] = 0.0
        ours_ft_mask[np.asarray(ours_b_p["weight"]) > 0.5] = 0.0
        band2 = (np.abs(rs[key] - cut) <= 2e-2 * abs(cut) + 1e-12) | (
            np.abs(rs[key] - prune_line) <= 2e-2 * abs(prune_line) + 1e-12
        )
        got_ft = {int(i) for i in np.where(ours_ft_mask > 0.5)[0] if not band2[i]}
        want_ft = {int(i) for i in rt[key] if not band2[i]}
        assert got_ft == want_ft, f"G ft conv {b}"
    n_blocks = dcfg.log_size - 2
    rf, rt, rp, rs, rl = _ref_d_masks(ref_fim_d, n_blocks, fisher_q, prune_q)
    for b in range(1, n_blocks + 1):
        ours_b_f, ours_b_p = d_freeze["convs"][b - 1], d_prune["convs"][b - 1]
        for ours_key, ref_key in (
            ("conv1_w", f"convs.{b}.conv1.0.weight"),
            ("conv1_b", f"convs.{b}.conv1.1.bias"),
            ("conv2_w", f"convs.{b}.conv2.1.weight"),
            ("conv2_b", f"convs.{b}.conv2.2.bias"),
            ("skip_w", f"convs.{b}.skip.1.weight"),
        ):
            cut, prune_line = rl[ref_key]
            _assert_idx(
                ours_b_f[ours_key], rf[ref_key], rs[ref_key], cut,
                f"D freeze {ref_key}",
            )
            _assert_idx(
                ours_b_p[ours_key], rp[ref_key], rs[ref_key], prune_line,
                f"D prune {ref_key}",
            )
