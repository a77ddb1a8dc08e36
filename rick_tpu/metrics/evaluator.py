"""In-training evaluator, mirror of `gan_training/eval.py:13-66`, TPU-first.

Protocol parity: `inception_nsamples` images from fresh N(0,1) latents through
the EMA generator; FID (always), KID (first 2000), precision/recall on demand
against the cached real set.

TPU-native design: the environment's host<->device link has high per-dispatch
latency, so the ENTIRE eval is one compiled program -- a `lax.scan` over
generation chunks computing InceptionV3 pool3 activations and accumulating
mean/covariance (and optionally the raw activations for KID / VGG features for
P&R) on device.  Exactly one small host transfer happens per eval; the 5000
generated images never leave the device.  Real-set statistics are computed
once at construction (the reference recomputes them every eval -- same
numbers, strictly less work).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rick_tpu.metrics.fid import (
    calculate_frechet_distance,
    calculate_frechet_distance_device,
    get_activations,
)
from rick_tpu.metrics.inception import default_inception_params, inception_pool3
from rick_tpu.metrics.precision_recall import (
    IPR,
    Manifold,
    compute_metric,
    distances2radii,
)
from rick_tpu.metrics.vgg import vgg16_fc2_features
from rick_tpu.nn.generator import generator_apply


def _stats_from_acts(acts):
    """(n, d) activations -> (mu, cov) with np.cov ddof=1 semantics.

    DEVIATION: accumulation is float32 (x64 is disabled on device); the
    reference accumulates FID statistics in float64.  For near-singular
    covariances this can drift the Frechet distance slightly -- set
    RICK_FID_HOST_SQRTM=1 to compute the real-side stats in f64 on host and
    the distance via scipy (the fake side stays f32 on device: fetching the
    5000x2048 activations per eval would pay the high-latency host link).
    """
    n = acts.shape[0]
    x = acts.astype(jnp.float32)
    mu = jnp.mean(x, axis=0)
    xc = x - mu
    cov = (xc.T @ xc) / (n - 1)
    return mu, cov


class Evaluator:
    def __init__(
        self,
        gcfg,
        *,
        fid_real_samples: np.ndarray,
        inception_nsamples: int = 5000,
        batch_size: int = 64,
        n_sample_store: int = 25,
        latent: int = 512,
        compute_pr: bool = False,
        inception_params=None,
        gen_batch: int = 100,
        inception_dtype=jnp.float32,
        gen_dtype=jnp.float32,
        inception_nhwc: bool = False,
        real_acts: Optional[np.ndarray] = None,
        seed: int = 0,
        mesh=None,
        fast_gen: Optional[bool] = None,
        inception_stop_at: Optional[str] = None,
        inception_resize_to: int = 299,
    ):
        # inception_stop_at / inception_resize_to shrink the InceptionV3
        # trunk's compile+execution budget for the multi-chip DRYRUN ONLY
        # (reduced depth / input size, same structure -- see
        # inception_pool3).  Metric-bearing evals always use the defaults.
        self.gcfg = gcfg
        # fused Pallas upsample kernel for generation (forward-only; see
        # ops/fused_upsample.py).  Auto: on for TPU, off elsewhere (interpret
        # mode would crawl on CPU).  Same precision class as XLA's default
        # f32 conv lowering (bf16 MXU passes).  RICK_FAST_GEN=0/1 overrides.
        import os as _os

        env_fast = _os.environ.get("RICK_FAST_GEN")
        if env_fast is not None:
            self._fast = env_fast == "1"
        else:
            self._fast = (
                fast_gen if fast_gen is not None else jax.default_backend() == "tpu"
            )
        # data-parallel eval (VERDICT r2 #2): on an N-device mesh the scan's
        # generation chunks are split across devices via shard_map and the
        # FID statistics reduced with psum -- the reference's analogue runs
        # its evaluator on the DataParallel'd g_ema
        # (`train_dynamic_update_prune.py:947-958`).  Single-host-transfer
        # property is kept: mu/cov come back replicated, one fetch.
        self.mesh = (
            mesh
            if mesh is not None
            and mesh.devices.size > 1
            and inception_nsamples % mesh.devices.size == 0
            else None
        )
        # uint8 reals are kept as raw pixels: get_activations dequantizes ON
        # DEVICE (4x less traffic over the slow host<->device link); f32 input
        # keeps the old path.  `real_acts` skips extraction entirely (callers
        # cache it: the real set -- hence its pool3 stats -- is run-invariant).
        real = np.asarray(fid_real_samples)
        self.real = real if real.dtype == np.uint8 else real.astype(np.float32)
        self.inception_nsamples = inception_nsamples
        self.batch_size = batch_size
        self.n_sample_store = n_sample_store
        self.latent = latent
        if self.mesh is not None:
            # per-device sample count; local chunk size = divisor of it
            # closest to the requested gen_batch (prefer larger on ties --
            # bigger generation batches are MXU-friendlier)
            nd = self.mesh.devices.size
            n_local = inception_nsamples // nd
            divisors = [d for d in range(1, n_local + 1) if n_local % d == 0]
            gen_batch = min(
                divisors, key=lambda d: (abs(d - gen_batch), -d)
            )
            self.gen_batch = gen_batch
            self.n_chunks = n_local // gen_batch  # per-device chunks
        else:
            # chunk size dividing n evenly
            gen_batch = min(gen_batch, inception_nsamples)
            while inception_nsamples % gen_batch != 0:
                gen_batch -= 1
            self.gen_batch = gen_batch
            self.n_chunks = inception_nsamples // gen_batch
        self.inception_params = (
            inception_params if inception_params is not None else default_inception_params()
        )
        # NHWC trunk: TPU-preferred conv layout; weights transposed ONCE here
        self._inc_nhwc = bool(inception_nhwc)
        if self._inc_nhwc:
            from rick_tpu.metrics.inception import params_to_nhwc

            self._inc_run_params = params_to_nhwc(self.inception_params)
        else:
            self._inc_run_params = self.inception_params
        self._key = jax.random.key(seed)
        self.ipr = IPR(batch_size, k=3, num_samples=inception_nsamples) if compute_pr else None
        self._compute_pr = compute_pr

        gb, nc, lat = self.gen_batch, self.n_chunks, self.latent

        inc_dtype = inception_dtype
        inc_nhwc = self._inc_nhwc
        inc_stop_at = inception_stop_at
        inc_resize_to = inception_resize_to

        def gen_chunk_acts(gp, incp, k):
            kz, kn = jax.random.split(k)
            z = jax.random.normal(kz, (gb, lat))
            # eval-only bf16 trunk: params stay f32, conv compute in gen_dtype
            imgs, _ = generator_apply(gcfg, gp, [z], rng=kn, dtype=gen_dtype, fast=self._fast)
            imgs = imgs.astype(inc_dtype)
            if inc_dtype != jnp.float32:
                incp = jax.tree.map(lambda a: a.astype(inc_dtype), incp)
            return inception_pool3(
                incp, imgs, nhwc=inc_nhwc, stop_at=inc_stop_at, resize_to=inc_resize_to
            ).astype(jnp.float32)

        def chunk_scan(gp, incp, keys):
            def body(_, k):
                acts = gen_chunk_acts(gp, incp, k)
                return None, acts

            _, acts = jax.lax.scan(body, None, keys)  # (nc, gb, 2048)
            return acts.reshape(keys.shape[0] * gb, -1)

        if self.mesh is None:
            # single-dispatch scan by default.  At 1024px the one execution
            # runs for minutes and reproducibly crashes the axon tunnel
            # worker (duration watchdog, not memory: chunk sizes 5/10/20 all
            # crash identically) -- segment the scan into a few dispatches;
            # activations stay device-resident (n x 2048 f32 = 41 MB), stats
            # and the single host fetch are unchanged.
            n_seg = 1
            if gcfg is not None and getattr(gcfg, "size", 0) >= 1024:
                n_seg = math.gcd(10, nc) if nc >= 10 else 1
            self._n_seg = n_seg

            if n_seg == 1:

                def eval_scan(gp, incp, key, want_acts: bool):
                    acts = chunk_scan(gp, incp, jax.random.split(key, nc))
                    mu, cov = _stats_from_acts(acts)
                    if want_acts:
                        return mu, cov, acts[:2000]
                    return mu, cov

                self._eval_stats = jax.jit(functools.partial(eval_scan, want_acts=False))
                self._eval_stats_acts = jax.jit(functools.partial(eval_scan, want_acts=True))
            else:
                seg_scan = jax.jit(lambda gp, incp, keys: chunk_scan(gp, incp, keys))
                stats_acts = jax.jit(
                    lambda acts: _stats_from_acts(acts) + (acts[:2000],)
                )
                stats_only = jax.jit(_stats_from_acts)
                nc_seg = nc // n_seg

                def eval_segmented(gp, incp, key, want_acts: bool):
                    keys = jax.random.split(key, nc).reshape(n_seg, nc_seg)
                    parts = [seg_scan(gp, incp, keys[s]) for s in range(n_seg)]
                    acts = jnp.concatenate(parts, axis=0)
                    if want_acts:
                        return stats_acts(acts)
                    return stats_only(acts)

                self._eval_stats = functools.partial(eval_segmented, want_acts=False)
                self._eval_stats_acts = functools.partial(eval_segmented, want_acts=True)
        else:
            from jax.sharding import PartitionSpec as P

            mesh_ = self.mesh
            nd = mesh_.devices.size
            n_total = nd * nc * gb

            def local_eval(gp, incp, keys_blk):
                # keys_blk: (1, nc) block of the (nd, nc) key grid
                acts = chunk_scan(gp, incp, keys_blk[0]).astype(jnp.float32)
                # same two-pass mean/centered-covariance as the single-device
                # path (raw second moments would lose f32 precision)
                mu = jax.lax.psum(jnp.sum(acts, axis=0), "data") / n_total
                xc = acts - mu
                cov = jax.lax.psum(xc.T @ xc, "data") / (n_total - 1)
                return mu, cov, acts[None]

            sharded = jax.shard_map(
                local_eval,
                mesh=mesh_,
                in_specs=(P(), P(), P("data")),
                out_specs=(P(), P(), P("data")),
            )

            def eval_scan_sharded(gp, incp, key, want_acts: bool):
                keys = jax.random.split(key, nd * nc).reshape(nd, nc)
                mu, cov, acts = sharded(gp, incp, keys)
                if want_acts:
                    return mu, cov, acts.reshape(n_total, -1)[:2000]
                return mu, cov

            self._eval_stats = jax.jit(functools.partial(eval_scan_sharded, want_acts=False))
            self._eval_stats_acts = jax.jit(functools.partial(eval_scan_sharded, want_acts=True))

        # device-side KID subsets (`gan_metrics/kid_score.py:255-263`:
        # polynomial kernel, unbiased estimator, subsets of size <=1000)
        def kid_device(real_acts, fake_acts, key, n_subsets, subset_size):
            d = real_acts.shape[1]

            def one(k):
                k1, k2 = jax.random.split(k)
                gi = jax.random.choice(k1, real_acts.shape[0], (subset_size,), replace=False)
                ri = jax.random.choice(k2, fake_acts.shape[0], (subset_size,), replace=False)
                g = real_acts[gi]
                r = fake_acts[ri]
                kxx = (g @ g.T / d + 1.0) ** 3
                kyy = (r @ r.T / d + 1.0) ** 3
                kxy = (g @ r.T / d + 1.0) ** 3
                m = subset_size
                diag_x = jnp.diagonal(kxx)
                diag_y = jnp.diagonal(kyy)
                mmd = (kxx.sum() - diag_x.sum() + kyy.sum() - diag_y.sum()) / (m * (m - 1)) \
                    - 2.0 * kxy.sum() / (m * m)
                return mmd

            keys = jax.random.split(key, n_subsets)
            return jax.vmap(one)(keys)

        self._kid_device = jax.jit(kid_device, static_argnums=(3, 4))

        # VGG features for precision/recall, same scan structure (and same
        # data-mesh sharding when a mesh is present)
        if compute_pr:
            def vgg_chunks(gp, vp, keys):
                def body(_, k):
                    kz, kn = jax.random.split(k)
                    z = jax.random.normal(kz, (gb, lat))
                    imgs, _ = generator_apply(gcfg, gp, [z], rng=kn, fast=self._fast)
                    return None, vgg16_fc2_features(vp, imgs)

                _, feats = jax.lax.scan(body, None, keys)
                return feats.reshape(keys.shape[0] * gb, -1)

            if self.mesh is None:
                self._vgg_scan = jax.jit(
                    lambda gp, vp, key: vgg_chunks(gp, vp, jax.random.split(key, nc))
                )
            else:
                from jax.sharding import PartitionSpec as P

                mesh_ = self.mesh
                nd = mesh_.devices.size
                sharded_vgg = jax.shard_map(
                    lambda gp, vp, kb: vgg_chunks(gp, vp, kb[0])[None],
                    mesh=mesh_,
                    in_specs=(P(), P(), P("data")),
                    out_specs=P("data"),
                )

                def vgg_scan_sharded(gp, vp, key):
                    keys = jax.random.split(key, nd * nc).reshape(nd, nc)
                    return sharded_vgg(gp, vp, keys).reshape(nd * nc * gb, -1)

                self._vgg_scan = jax.jit(vgg_scan_sharded)

        # real-set activations: one-time chunked pass, stats on device
        if real_acts is not None:
            self._real_acts = np.asarray(real_acts, np.float64)
        else:
            self._real_acts = get_activations(
                self.real, batch_size, self._inc_run_params, nhwc=self._inc_nhwc
            )
        self._real_mu_dev, self._real_cov_dev = jax.jit(_stats_from_acts)(
            jnp.asarray(self._real_acts, jnp.float32)
        )
        self._real_acts_dev = jnp.asarray(self._real_acts, jnp.float32)
        self._real_stats64 = None  # lazy f64 real-side stats (host-FID path)

        self._gen = jax.jit(
            lambda gp, z, k: generator_apply(gcfg, gp, [z], rng=k, fast=self._fast)[0]
        )

    # ------------------------------------------------------------------
    def generate(self, g_ema, n: Optional[int] = None) -> np.ndarray:
        """Generated images on host (grids / interop), chunked like the
        reference (`eval.py:34-41`)."""
        n = n or self.inception_nsamples
        outs = []
        got = 0
        while got < n:
            self._key, kz, kn = jax.random.split(self._key, 3)
            z = jax.random.normal(kz, (self.n_sample_store, self.latent))
            imgs = self._gen(g_ema, z, kn)
            outs.append(np.asarray(imgs, np.float32))
            got += imgs.shape[0]
        return np.concatenate(outs, axis=0)[:n]

    def compute_inception_score(
        self, g_ema, *, fid: bool = True, kid: bool = False, pr: bool = False
    ) -> Dict[str, float]:
        score: Dict[str, float] = {}
        self._key, k = jax.random.split(self._key)

        if kid:
            mu, cov, fake_acts = self._eval_stats_acts(g_ema, self._inc_run_params, k)
            self._key, kk = jax.random.split(self._key)
            subset = min(1000, min(2000, self._real_acts_dev.shape[0]))
            mmds = self._kid_device(
                self._real_acts_dev[:2000], fake_acts, kk, 100, subset
            )
            score["kid"] = float(np.asarray(mmds).mean())
        else:
            mu, cov = self._eval_stats(g_ema, self._inc_run_params, k)

        if fid:
            import os

            if os.environ.get("RICK_FID_HOST_SQRTM"):
                # real-side stats in true f64 (activations already on host)
                if self._real_stats64 is None:
                    acts64 = np.asarray(self._real_acts, np.float64)
                    mu64 = acts64.mean(axis=0)
                    xc = acts64 - mu64
                    self._real_stats64 = (mu64, xc.T @ xc / (acts64.shape[0] - 1))
                score["fid"] = calculate_frechet_distance(
                    self._real_stats64[0],
                    self._real_stats64[1],
                    np.asarray(mu, np.float64),
                    np.asarray(cov, np.float64),
                )
            else:
                score["fid"] = calculate_frechet_distance_device(
                    self._real_mu_dev, self._real_cov_dev, mu, cov
                )

        if pr:
            assert self.ipr is not None
            # the real manifold is eval-invariant: extract VGG features for
            # the 5000 reals ONCE and reuse across evals (the reference
            # recomputes it per call, `eval.py:59-65`)
            if getattr(self.ipr, "manifold_ref", None) is None:
                real_f32 = (
                    self.real.astype(np.float32) / 127.5 - 1.0
                    if self.real.dtype == np.uint8
                    else self.real
                )
                self.ipr.compute_manifold_ref(real_f32)
            self._key, kv = jax.random.split(self._key)
            feats = np.asarray(self._vgg_scan(g_ema, self.ipr.params, kv), np.float64)
            from rick_tpu.metrics.precision_recall import compute_pairwise_distances

            radii = distances2radii(compute_pairwise_distances(feats), k=self.ipr.k)
            manifold_subject = Manifold(feats, radii)
            score["precision"] = compute_metric(self.ipr.manifold_ref, feats)
            score["recall"] = compute_metric(manifold_subject, self.ipr.manifold_ref.features)
        return score

    def compute_intra_lpips(
        self,
        g_ema,
        cluster_center_path: str,
        *,
        n_samples: int = 1000,
        cluster_size: int = 50,
        k: int = 10,
        size: int = 256,
        seed: int = 0,
    ) -> float:
        """Intra-cluster LPIPS diversity, protocol mirror of
        `gan_training/eval.py:83-220`: generate `n_samples` images, assign each
        to the nearest of the `k` cluster centers by LPIPS (net='vgg'), then
        average the pairwise LPIPS within each cluster over at most
        `cluster_size` members.  `cluster_center_path` follows the reference's
        `../cluster_centers/{data}/{method}` layout (c{k}/center.png); prepare
        it with `metrics.intra_lpips.prepare_cluster_centers`.

        The reference round-trips samples through 8-bit PNGs and resizes to
        256 before LPIPS (`eval.py:96,113-118`); IntraLPIPS replicates that
        preprocessing on the in-memory tensors (no filesystem churn -- the
        reference's save/move/delete dance, `eval.py:144-220`, exists only to
        shuttle images between processes)."""
        from rick_tpu.metrics.intra_lpips import IntraLPIPS, load_cluster_centers

        centers = load_cluster_centers(cluster_center_path, k=k, size=size)
        il = IntraLPIPS(centers, cluster_size=cluster_size, size=size)
        imgs = self.generate(g_ema, n=n_samples)
        return il.compute(imgs, rng=np.random.default_rng(seed))
