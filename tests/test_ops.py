"""Op-level parity / gradient tests for upfirdn2d and fused_leaky_relu.

Oracle: `upfirdn2d_numpy_oracle` -- a direct numpy implementation of the
upfirdn definition, independent of the lax formulation.  Gradients (including
second order, required by R1 / path-length regularization) are validated with
`jax.test_util.check_grads`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from rick_tpu.ops import (
    blur,
    downsample2d,
    fused_leaky_relu,
    make_kernel,
    upfirdn2d,
    upfirdn2d_general,
    upsample2d,
)
from rick_tpu.ops.resample import upfirdn2d_numpy_oracle


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


# The mode set the reference CUDA kernel specializes for (upfirdn2d_kernel.cu:250-290)
# plus asymmetric/negative-pad cases that exercise the generic path.
MODES = [
    dict(up=(1, 1), down=(1, 1), pad=(1, 1, 1, 1), k=(3, 3)),
    dict(up=(1, 1), down=(1, 1), pad=(2, 1, 2, 1), k=(4, 4)),
    dict(up=(2, 2), down=(1, 1), pad=(2, 1, 2, 1), k=(4, 4)),
    dict(up=(2, 2), down=(1, 1), pad=(1, 0, 1, 0), k=(2, 2)),
    dict(up=(1, 1), down=(2, 2), pad=(1, 1, 1, 1), k=(4, 4)),
    dict(up=(1, 1), down=(2, 2), pad=(0, 1, 0, 1), k=(2, 2)),
    dict(up=(2, 1), down=(1, 2), pad=(3, 2, 1, 0), k=(5, 3)),
    dict(up=(1, 1), down=(1, 1), pad=(-1, 2, 1, -2), k=(3, 3)),  # negative pad = crop
    dict(up=(2, 2), down=(1, 1), pad=(6, 6, 6, 6), k=(12, 12)),  # ADA sym6 case
]


@pytest.mark.parametrize("mode", MODES)
def test_upfirdn2d_matches_numpy_oracle(mode):
    x = _rand((2, 3, 11, 9))
    k = _rand(mode["k"], seed=1)
    (ux, uy), (dx, dy) = mode["up"], mode["down"]
    px0, px1, py0, py1 = mode["pad"]
    got = upfirdn2d_general(jnp.asarray(x), jnp.asarray(k), ux, uy, dx, dy, px0, px1, py0, py1)
    want = upfirdn2d_numpy_oracle(x, k, ux, uy, dx, dy, px0, px1, py0, py1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "mode",
    [
        dict(up=(2, 2), down=(1, 1), pad=(2, 1, 2, 1), k=(4, 4)),
        dict(up=(1, 1), down=(2, 2), pad=(1, 1, 1, 1), k=(4, 4)),
        dict(up=(1, 1), down=(1, 1), pad=(1, 1, 1, 1), k=(3, 3)),
    ],
)
def test_upfirdn2d_grads_to_second_order(mode):
    x = jnp.asarray(_rand((1, 2, 8, 8)))
    k = jnp.asarray(_rand(mode["k"], seed=3))
    (ux, uy), (dx, dy) = mode["up"], mode["down"]
    px0, px1, py0, py1 = mode["pad"]

    def f(inp):
        return upfirdn2d_general(inp, k, ux, uy, dx, dy, px0, px1, py0, py1)

    check_grads(f, (x,), order=2, modes=["fwd", "rev"], atol=1e-2, rtol=1e-2)


def test_upsample_downsample_shapes():
    x = jnp.asarray(_rand((2, 4, 16, 16)))
    up = upsample2d(x, [1, 3, 3, 1], factor=2)
    assert up.shape == (2, 4, 32, 32)
    down = downsample2d(x, [1, 3, 3, 1], factor=2)
    assert down.shape == (2, 4, 8, 8)
    b = blur(x, [1, 3, 3, 1], pad=(2, 1))
    assert b.shape == (2, 4, 16, 16)


def test_upsample_preserves_dc():
    # A constant image must stay (approximately) constant under antialiased 2x
    # resampling away from borders: kernel gain factor**2 with sum-1 kernel.
    x = jnp.ones((1, 1, 16, 16))
    up = upsample2d(x, [1, 3, 3, 1], factor=2)
    core = np.asarray(up)[0, 0, 4:-4, 4:-4]
    np.testing.assert_allclose(core, 1.0, rtol=1e-5)


def test_make_kernel_outer_product_normalized():
    k = make_kernel([1, 3, 3, 1])
    assert k.shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k).T)


def test_fused_leaky_relu_values_4d():
    x = jnp.asarray(_rand((2, 3, 4, 4)))
    b = jnp.asarray(np.array([0.5, -0.25, 0.0], np.float32))
    y = fused_leaky_relu(x, b)
    xb = np.asarray(x) + np.asarray(b).reshape(1, 3, 1, 1)
    want = np.where(xb >= 0, xb, 0.2 * xb) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6, atol=1e-6)


def test_fused_leaky_relu_values_2d():
    x = jnp.asarray(_rand((5, 7)))
    b = jnp.asarray(_rand((7,), seed=2))
    y = fused_leaky_relu(x, b)
    xb = np.asarray(x) + np.asarray(b)[None, :]
    want = np.where(xb >= 0, xb, 0.2 * xb) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6, atol=1e-6)


def test_fused_leaky_relu_second_order_wrt_input_is_zero():
    # The reference encodes d2y/dx2 == 0 as its grad=2 kernel case
    # (fused_bias_act_kernel.cu:44); autodiff must agree away from the kink.
    x = jnp.asarray(_rand((3, 4)) + 0.05)
    b = jnp.zeros((4,))

    def f(inp):
        return jnp.sum(fused_leaky_relu(inp, b) ** 1)

    hess = jax.hessian(f)(x)
    np.testing.assert_allclose(np.asarray(hess), 0.0, atol=1e-6)


def test_upfirdn2d_gradgrad_through_r1_style_loss():
    # Shape of the R1 pattern: loss = sum(grad_x(sum(f(x)))**2), then grad wrt x.
    x = jnp.asarray(_rand((1, 1, 8, 8)))
    k = jnp.asarray(make_kernel([1, 3, 3, 1]))

    def f(inp):
        return jnp.sum(upfirdn2d(inp, k, up=2, down=1, pad=(2, 1)))

    def r1(inp):
        g = jax.grad(f)(inp)
        return jnp.sum(g**2)

    out = jax.grad(r1)(x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("updown", [(1, 1), (2, 1), (1, 2)])
def test_upfirdn2d_separable_matches_2d(updown):
    from rick_tpu.ops.resample import upfirdn2d_separable

    up, down = updown
    x = jnp.asarray(_rand((2, 3, 13, 11)))
    k1 = jnp.asarray(_rand((4,), 5))
    k2 = jnp.outer(k1, k1)
    a = upfirdn2d_separable(x, k1, up=up, down=down, pad=(2, 1))
    b = upfirdn2d(x, k2, up=up, down=down, pad=(2, 1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_leaky_relu_kml_variant():
    """KML variant (`op/fused_act.py:85-103`): bias + b_vector when the
    additive vector is active, plain bias otherwise."""
    import jax.numpy as jnp
    from rick_tpu.ops import fused_leaky_relu, fused_leaky_relu_kml

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 8, 8)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(4), jnp.float32)
    bv = jnp.asarray(np.random.default_rng(2).standard_normal(4), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fused_leaky_relu_kml(x, b, bv)),
        np.asarray(fused_leaky_relu(x, b + bv)),
    )
    np.testing.assert_array_equal(
        np.asarray(fused_leaky_relu_kml(x, b, None)),
        np.asarray(fused_leaky_relu(x, b)),
    )
