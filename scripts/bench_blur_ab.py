"""A/B: separable two-pass blur vs one-pass 2-D depthwise blur (RICK_BLUR).

Measures generator throughput (eval chunk, batch 100) and the train-iteration
phase mix at the recipe batch.  Value-fetch synced.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

cache = os.path.expanduser("~/.cache/rick_tpu_xla")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rick_tpu.nn import DiscriminatorConfig, GeneratorConfig, generator_apply
from rick_tpu.train import TrainConfig, init_train_state, make_train_step, run_iteration


def main():
    SIZE, BATCH = 256, 2
    gcfg = GeneratorConfig(size=SIZE)
    dcfg = DiscriminatorConfig(size=SIZE)
    tcfg = TrainConfig(batch=BATCH, augment=True, warmup_iter=2)
    state = init_train_state(jax.random.key(0), gcfg, dcfg, tcfg)
    real = jax.random.normal(jax.random.key(2), (BATCH, 3, SIZE, SIZE))
    zb = jax.random.normal(jax.random.key(4), (100, 512))

    for mode in ("auto", "2d", "sep"):
        if mode == "auto":
            os.environ.pop("RICK_BLUR", None)
        else:
            os.environ["RICK_BLUR"] = mode

        # fresh jit objects so the env-dependent trace is not reused
        gen = jax.jit(lambda gp, z, k: generator_apply(gcfg, gp, [z], rng=k)[0])
        img = gen(state["g_ema"], zb, jax.random.key(0))
        float(img.ravel()[0])
        t0 = time.time()
        for i in range(10):
            img = gen(state["g_ema"], zb, jax.random.key(i))
        float(img.ravel()[0])
        gen_ms = (time.time() - t0) / 10 * 1000

        phases = make_train_step(gcfg, dcfg, tcfg)
        st = jax.tree.map(lambda a: a.copy(), state)  # run_iteration donates
        rng = jax.random.key(1)
        m = None
        for i in (16, 17, 18):  # warm both lazy phases (see bench.py note)
            rng, k = jax.random.split(rng)
            st, m = run_iteration(phases, st, real, k, i, tcfg)
        float(m["d"])
        t0 = time.time()
        N = 32
        for i in range(N):
            rng, k = jax.random.split(rng)
            st, m = run_iteration(phases, st, real, k, i + 16, tcfg)
        float(m["d"])
        iter_ms = (time.time() - t0) / N * 1000

        print(f"blur={mode:>3}: gen chunk(100) {gen_ms:7.1f} ms "
              f"({100e3 / gen_ms:6.1f} imgs/s)   train iter {iter_ms:6.1f} ms")


if __name__ == "__main__":
    main()
