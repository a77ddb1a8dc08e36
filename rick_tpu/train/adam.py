"""Adam with per-leaf step counts, exactly reproducing torch.optim.Adam under
the reference's masking/warmup regime.

The reference uses betas (0**r, 0.99**r) (`train_dynamic_update_prune.py:913-931`)
-- beta1 == 0, so the first moment IS the (masked) gradient and a zeroed grad
yields a zero update.  torch keeps a per-param `step` that only advances when
the param has a grad attached; during warmup only D's `final*` params step
(`:201-208`), so bias correction diverges per-param.  We mirror that with a
per-leaf count incremented by a (traced) `active` flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adam_init(params):
    """State: second-moment v (like params) + per-leaf float counts."""
    return {
        "v": jax.tree.map(jnp.zeros_like, params),
        "count": jax.tree.map(lambda p: jnp.zeros((), jnp.float32), params),
    }


def adam_update(params, grads, state, active, *, lr: float, beta2: float, eps: float = 1e-8):
    """One Adam step with beta1=0.

    `active`: pytree of traced 0/1 scalars (same structure as params); a leaf
    with active=0 neither updates nor advances its count (torch "grad is None"
    semantics).  Gradients are assumed already masked (freeze/prune/trainable).
    """

    def upd(p, g, v, c, a):
        c_new = c + a
        v_new = jnp.where(a > 0, beta2 * v + (1.0 - beta2) * (g * g), v)
        bias2 = 1.0 - beta2 ** jnp.maximum(c_new, 1.0)
        vhat = v_new / bias2
        step = lr * g / (jnp.sqrt(vhat) + eps)
        p_new = p - a * step
        return p_new, v_new, c_new

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_v = treedef.flatten_up_to(state["v"])
    flat_c = treedef.flatten_up_to(state["count"])
    flat_a = treedef.flatten_up_to(active)

    new_p, new_v, new_c = [], [], []
    for p, g, v, c, a in zip(flat_p, flat_g, flat_v, flat_c, flat_a):
        pn, vn, cn = upd(p, g, v, c, a)
        new_p.append(pn)
        new_v.append(vn)
        new_c.append(cn)

    return (
        treedef.unflatten(new_p),
        {"v": treedef.unflatten(new_v), "count": treedef.unflatten(new_c)},
    )
