"""Ablation: where does the fused kernel's time go at the L3 shape?

Variants monkeypatch _kernel stages out to isolate matmul / blend / epilogue
cost.  Value-fetch synced.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import rick_tpu.ops.fused_upsample as fu


def bench(fn, x, n=6, reps=3):
    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(x * (1.0 + 1e-12 * i.astype(x.dtype)))
            return acc + jnp.sum(y).astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(run(x))
        best = min(best, (time.time() - t0) / n)
    return best * 1000.0


def make_kernel(stage: str):
    """stage: 'dma' | 'matmul' | 'blend' | 'full'"""

    def _kernel(xf_hbm, w9_ref, demod_ref, noise_ref, bias_ref, out_ref,
                xf_vmem, pair_scr, sem, *, CB, COLS, W, TH, kb, slope, gain, use_act):
        n = pl.program_id(0)
        rt = pl.program_id(1)
        co = pl.program_id(2)
        ROWS = TH // 2 + 3
        PR = TH // 2 + 2
        FP = PR * COLS
        FR = (TH // 2) * COLS

        @pl.when(co == 0)
        def _():
            dma = pltpu.make_async_copy(
                xf_hbm.at[n, pl.ds(rt * (TH // 2) * COLS, ROWS * COLS), :],
                xf_vmem.at[pl.ds(0, ROWS * COLS), :], sem)
            dma.start()
            dma.wait()

        if stage == "dma":
            s = jnp.max(xf_vmem[0:8, :].astype(jnp.float32))
            out_ref[0] = jnp.zeros((CB, TH, 2 * W), jnp.float32) + s
            return

        X = xf_vmem[:, :]
        Wt = w9_ref[0]

        def wcol(u, v):
            t = u * 3 + v
            return Wt[:, t * CB:(t + 1) * CB]

        def view(dr, dc):
            off = dr * COLS + dc
            return X[off:off + FP, :]

        f32 = jnp.float32
        D00 = jnp.dot(view(0, 0), wcol(0, 0), preferred_element_type=f32)
        D01 = jnp.dot(view(0, 1), jnp.concatenate([wcol(0, 2), wcol(0, 1)], axis=1), preferred_element_type=f32)
        D10 = jnp.dot(view(1, 0), jnp.concatenate([wcol(2, 0), wcol(1, 0)], axis=1), preferred_element_type=f32)
        D11 = jnp.dot(view(1, 1), jnp.concatenate([wcol(2, 2), wcol(2, 1), wcol(1, 2), wcol(1, 1)], axis=1), preferred_element_type=f32)
        P00 = D00 + D01[:, :CB] + D10[:, :CB] + D11[:, :CB]
        P01 = D01[:, CB:] + D11[:, CB:2 * CB]
        P10 = D10[:, CB:] + D11[:, 2 * CB:3 * CB]
        P11 = D11[:, 3 * CB:]

        if stage == "matmul":
            s = P00[:CB, :CB] + P01[:CB, :CB] + P10[:CB, :CB] + P11[:CB, :CB]
            out_ref[0] = jnp.zeros((CB, TH, 2 * W), jnp.float32) + s[0, 0]
            return

        kb0, kb1, kb2, kb3 = kb

        def S(P, r):
            return P[r * COLS:r * COLS + FR, :]

        R00 = kb0 * S(P10, 0) + kb1 * S(P00, 1) + kb2 * S(P10, 1) + kb3 * S(P00, 2)
        R01 = kb0 * S(P11, 0) + kb1 * S(P01, 1) + kb2 * S(P11, 1) + kb3 * S(P01, 2)
        R10 = kb0 * S(P00, 1) + kb1 * S(P10, 1) + kb2 * S(P00, 2) + kb3 * S(P10, 2)
        R11 = kb0 * S(P01, 1) + kb1 * S(P11, 1) + kb2 * S(P01, 2) + kb3 * S(P11, 2)
        FO = FR - 2

        def C(R, d):
            return R[d:d + FO, :]

        O00 = kb0 * C(R01, 0) + kb1 * C(R00, 1) + kb2 * C(R01, 1) + kb3 * C(R00, 2)
        O01 = kb0 * C(R00, 1) + kb1 * C(R01, 1) + kb2 * C(R00, 2) + kb3 * C(R01, 2)
        O10 = kb0 * C(R11, 0) + kb1 * C(R10, 1) + kb2 * C(R11, 1) + kb3 * C(R10, 2)
        O11 = kb0 * C(R10, 1) + kb1 * C(R11, 1) + kb2 * C(R10, 2) + kb3 * C(R11, 2)

        if stage == "blend":
            s = O00[0, 0] + O01[0, 0] + O10[0, 0] + O11[0, 0]
            out_ref[0] = jnp.zeros((CB, TH, 2 * W), jnp.float32) + s
            return

        demod_v = demod_ref[0, 0, 0, :][None, :]
        bias_v = bias_ref[0, 0, :][None, :]
        for ip in range(TH // 2):
            base = ip * COLS
            for alpha, (Oa, Ob) in ((0, (O00, O01)), (1, (O10, O11))):
                pair_scr[0] = Oa[base:base + W, :]
                pair_scr[1] = Ob[base:base + W, :]
                y = jnp.stack([pair_scr[0], pair_scr[1]], axis=1).reshape(2 * W, CB)
                y = y * demod_v + bias_v
                yt = y.T
                row = 2 * ip + alpha
                yt = yt + noise_ref[0, 0, row, :][None, :]
                yt = jnp.where(yt >= 0.0, yt, yt * slope) * gain
                out_ref[0, :, row, :] = yt

    return _kernel


def run_variant(stage, xs, weight, demod, noise, bias):
    N, Cin, H, W = xs.shape
    Cout = weight.shape[0]
    TH = min(16, 2 * H)
    CB = min(128, Cout)
    RT = (2 * H) // TH
    CO = Cout // CB
    COLS = ((W + 3 + 7) // 8) * 8
    kbv = np.asarray((1, 3, 3, 1), np.float64)
    kbv = kbv / kbv.sum() * 2.0
    kb = tuple(float(v) for v in kbv[::-1])

    x_pp = jnp.pad(xs, ((0, 0), (0, 0), (2, 1), (2, 1 + COLS - (W + 3))))
    xf = x_pp.transpose(0, 2, 3, 1).reshape(N, (H + 3) * COLS, Cin).astype(jnp.bfloat16)
    wt = jnp.flip(weight, (2, 3))
    w9 = wt.transpose(2, 3, 0, 1).reshape(9, CO, CB, Cin)
    w9 = w9.transpose(1, 3, 0, 2).reshape(CO, Cin, 9 * CB).astype(jnp.bfloat16)
    kern = functools.partial(make_kernel(stage), CB=CB, COLS=COLS, W=W, TH=TH,
                             kb=kb, slope=0.2, gain=2.0 ** 0.5, use_act=True)
    return pl.pallas_call(
        kern,
        grid=(N, RT, CO),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Cin, 9 * CB), lambda n, rt, co: (co, 0, 0)),
            pl.BlockSpec((1, 1, 1, CB), lambda n, rt, co: (n, co, 0, 0)),
            pl.BlockSpec((1, 1, TH, 2 * W), lambda n, rt, co: (n, 0, rt, 0)),
            pl.BlockSpec((1, 1, CB), lambda n, rt, co: (co, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, CB, TH, 2 * W), lambda n, rt, co: (n, co, rt, 0)),
        out_shape=jax.ShapeDtypeStruct((N, Cout, 2 * H, 2 * W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(((TH // 2 + 3) * COLS + COLS + 1, Cin), jnp.bfloat16),
            pltpu.VMEM((2, W, CB), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(xf, w9, demod.astype(jnp.float32).reshape(N, CO, 1, CB),
      noise.astype(jnp.float32),
      jnp.asarray(bias, jnp.float32).reshape(CO, 1, CB))


def main():
    key = jax.random.key(0)
    for (Cin, Cout, H) in [(512, 512, 32), (512, 256, 64), (256, 128, 128)]:
        N = 100
        xs = jax.random.normal(key, (N, Cin, H, H))
        w = jax.random.normal(jax.random.key(1), (Cout, Cin, 3, 3)) * 0.05
        demod = jax.random.uniform(jax.random.key(2), (N, Cout), minval=0.5, maxval=1.5)
        noise = jax.random.normal(jax.random.key(3), (N, 1, 2 * H, 2 * H)) * 0.1
        bias = jax.random.normal(jax.random.key(4), (Cout,)) * 0.1
        times = {}
        for stage in ("dma", "matmul", "blend", "full"):
            times[stage] = bench(lambda v, s=stage: run_variant(s, v, w, demod, noise, bias), xs)
        print(f"{Cin}->{Cout} @{H}px: " + "  ".join(f"{s}={t:.2f}" for s, t in times.items()))
        del xs


if __name__ == "__main__":
    main()
