"""Generator / Discriminator architecture tests: shapes, parameter counts
(derived independently from the channel-table formulas), grad flow."""

import jax
import jax.numpy as jnp
import numpy as np

from rick_tpu.nn import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_apply,
    discriminator_init,
    generator_apply,
    generator_init,
    generator_mean_latent,
)


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def _expected_g_params(cfg: GeneratorConfig):
    """Independent closed-form parameter count for the generator."""
    ch = cfg.channels
    n = 0
    n += cfg.n_mlp * (cfg.style_dim * cfg.style_dim + cfg.style_dim)  # style MLP
    n += ch[4] * 4 * 4  # const input

    def styled(in_c, out_c):
        # conv weight + modulation(style->in) w/b + noise scalar + act bias
        return out_c * in_c * 9 + (in_c * cfg.style_dim + in_c) + 1 + out_c

    def torgb(in_c):
        return 3 * in_c * 1 + (in_c * cfg.style_dim + in_c) + 3

    n += styled(ch[4], ch[4]) + torgb(ch[4])
    in_c = ch[4]
    for i in range(3, cfg.log_size + 1):
        out_c = ch[2**i]
        n += styled(in_c, out_c) + styled(out_c, out_c) + torgb(out_c)
        in_c = out_c
    # noise buffers
    for layer_idx in range(cfg.num_layers):
        res = (layer_idx + 5) // 2
        n += (2**res) ** 2
    return n


def _expected_d_params(cfg: DiscriminatorConfig):
    ch = cfg.channels
    n = 0
    n += ch[cfg.size] * 3 * 1 + ch[cfg.size]  # from_rgb conv + act bias
    in_c = ch[cfg.size]
    for i in range(cfg.log_size, 2, -1):
        out_c = ch[2 ** (i - 1)]
        n += in_c * in_c * 9 + in_c  # conv1 + bias
        n += out_c * in_c * 9 + out_c  # conv2 + bias
        n += out_c * in_c * 1  # skip (no bias)
        in_c = out_c
    n += ch[4] * (in_c + 1) * 9 + ch[4]  # final_conv
    n += ch[4] * 4 * 4 * ch[4] + ch[4]  # final_linear.0
    n += ch[4] + 1  # final_linear.1
    return n


def test_generator_64_shapes_and_count():
    cfg = GeneratorConfig(size=64)
    params = generator_init(jax.random.key(0), cfg)
    assert _param_count(params) == _expected_g_params(cfg)

    z = jax.random.normal(jax.random.key(1), (2, 512))
    img, aux = generator_apply(cfg, params, [z], rng=jax.random.key(2))
    assert img.shape == (2, 3, 64, 64)
    assert aux is None
    assert np.isfinite(np.asarray(img)).all()


def test_generator_256_structure():
    cfg = GeneratorConfig(size=256)
    assert cfg.log_size == 8
    assert cfg.num_layers == 13
    assert cfg.n_latent == 14
    params = generator_init(jax.random.key(0), cfg)
    assert len(params["convs"]) == 12
    assert len(params["to_rgbs"]) == 6
    assert _param_count(params) == _expected_g_params(cfg)


def test_generator_mixing_and_latents():
    cfg = GeneratorConfig(size=64)
    params = generator_init(jax.random.key(0), cfg)
    z1 = jax.random.normal(jax.random.key(1), (2, 512))
    z2 = jax.random.normal(jax.random.key(2), (2, 512))
    img, latent = generator_apply(
        cfg, params, [z1, z2], rng=jax.random.key(3), inject_index=3, return_latents=True
    )
    assert latent.shape == (2, cfg.n_latent, 512)
    # layers < 3 use w1, >= 3 use w2
    lat = np.asarray(latent)
    assert np.allclose(lat[:, 0], lat[:, 2])
    assert np.allclose(lat[:, 3], lat[:, -1])
    assert not np.allclose(lat[:, 2], lat[:, 3])


def test_generator_const_noise_deterministic():
    cfg = GeneratorConfig(size=64)
    params = generator_init(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, 512))
    img1, _ = generator_apply(cfg, params, [z])  # rng None -> const buffers
    img2, _ = generator_apply(cfg, params, [z])
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_mean_latent_and_truncation():
    cfg = GeneratorConfig(size=64)
    params = generator_init(jax.random.key(0), cfg)
    mean_w = generator_mean_latent(cfg, params, jax.random.key(5), 64)
    assert mean_w.shape == (1, 512)
    z = jax.random.normal(jax.random.key(1), (2, 512))
    img_t, _ = generator_apply(
        cfg, params, [z], truncation=0.5, truncation_latent=mean_w
    )
    img_full, _ = generator_apply(cfg, params, [z])
    assert not np.allclose(np.asarray(img_t), np.asarray(img_full))


def test_discriminator_shapes_and_count():
    cfg = DiscriminatorConfig(size=64)
    params = discriminator_init(jax.random.key(0), cfg)
    assert _param_count(params) == _expected_d_params(cfg)

    x = jax.random.normal(jax.random.key(1), (2, 3, 64, 64))
    score, feats = discriminator_apply(cfg, params, x)
    assert score.shape == (2, 1)
    # feats: from_rgb + 2 per resblock (log_size-2=4 blocks) + final_conv
    assert len(feats) == 1 + 2 * (cfg.log_size - 2) + 1
    assert np.isfinite(np.asarray(score)).all()


def test_discriminator_batched_halves_parity():
    """One D forward over concat([real, fake]) with stddev_splits=2 must match
    two separate forwards, scores AND parameter grads (the invariant behind
    the batched-D formulation measured-and-rejected in ROUND4.md)."""
    cfg = DiscriminatorConfig(size=32)
    params = discriminator_init(jax.random.key(0), cfg)
    a = jax.random.normal(jax.random.key(1), (3, 3, 32, 32))
    b = jax.random.normal(jax.random.key(2), (3, 3, 32, 32))

    s_a, _ = discriminator_apply(cfg, params, a)
    s_b, _ = discriminator_apply(cfg, params, b)
    s_both, _ = discriminator_apply(
        cfg, params, jnp.concatenate([a, b], axis=0), stddev_splits=2
    )
    want = np.concatenate([np.asarray(s_a), np.asarray(s_b)], axis=0)
    np.testing.assert_allclose(np.asarray(s_both), want, rtol=2e-5, atol=2e-5)

    # gradient parity: d/dparams of the summed logistic loss must also match
    def loss_batched(dp):
        s, _ = discriminator_apply(cfg, dp, jnp.concatenate([a, b], axis=0), stddev_splits=2)
        return jnp.mean(jax.nn.softplus(s[:3])) + jnp.mean(jax.nn.softplus(-s[3:]))

    def loss_separate(dp):
        sa, _ = discriminator_apply(cfg, dp, a)
        sb, _ = discriminator_apply(cfg, dp, b)
        return jnp.mean(jax.nn.softplus(sa)) + jnp.mean(jax.nn.softplus(-sb))

    g1 = jax.grad(loss_batched)(params)
    g2 = jax.grad(loss_separate)(params)
    for l1, l2 in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=5e-5, atol=5e-5)


def test_end_to_end_grad_flow():
    gcfg = GeneratorConfig(size=32)
    dcfg = DiscriminatorConfig(size=32)
    gp = generator_init(jax.random.key(0), gcfg)
    dp = discriminator_init(jax.random.key(1), dcfg)
    z = jax.random.normal(jax.random.key(2), (2, 512))

    def g_loss_fn(gp):
        img, _ = generator_apply(gcfg, gp, [z], rng=jax.random.key(3))
        score, _ = discriminator_apply(dcfg, dp, img)
        return jnp.mean(jax.nn.softplus(-score))

    grads = jax.grad(g_loss_fn)(gp)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least the conv weights receive nonzero gradient
    assert float(jnp.abs(grads["conv1"]["conv"]["weight"]).max()) > 0
