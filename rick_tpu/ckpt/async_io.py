"""Asynchronous checkpointing: snapshot-on-device + background fetch/write.

Motivation (measured, ROUND2.md): on the high-latency host<->device link a
synchronous full-state save costs ~65 s — and the reference protocol writes
`best.pt` on every in-training FID improvement (`train_dynamic_update_prune.py
:670-685`), i.e. potentially every 50 iterations.  The training loop only
needs a CONSISTENT SNAPSHOT at submit time, not a completed file:

  1. `snapshot(tree)` enqueues a device-side copy (HBM bandwidth, ~ms).  The
     copy is ordered on the device stream BEFORE any later phase reuses the
     donated state buffers, so it is immune to donation.
  2. A single worker thread fetches the snapshot to host (`jax.device_get`)
     and runs the writer while training proceeds.  The queue is bounded, so
     at most `max_pending` extra state copies live in HBM.

Writers should use `atomic_write` paths (tmp + os.replace) so a kill mid-save
(crash, preemption) never leaves a truncated checkpoint for `--auto_resume`
to trip over.

RECOVERY-WINDOW SEMANTICS: asynchrony means a checkpoint becomes durable only
when its background fetch+write completes (~minutes for a GB-scale state on
this link).  A crash before that loses work back to the PREVIOUS durable
checkpoint -- the price of not blocking training for the same minutes, as the
reference's synchronous saves would.  Call `wait()` when durability matters
more than throughput (e.g. before planned preemption).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Callable

import jax
import jax.numpy as jnp

_SNAPSHOT_FN = None
_PACK_FN = None


def snapshot(tree):
    """Device-side copy of a pytree (one jitted dispatch; donation-safe)."""
    global _SNAPSHOT_FN
    if _SNAPSHOT_FN is None:
        _SNAPSHOT_FN = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    return _SNAPSHOT_FN(tree)


def snapshot_packed(tree):
    """Donation-safe device snapshot PACKED as one 1-D array per dtype.

    `jax.device_get` of a large pytree issues one transfer per leaf; on a
    ~35 ms-latency link, hundreds of leaves cost tens of seconds regardless
    of size.  Packing makes the later fetch a handful of bandwidth-bound
    transfers.  Returns (packed, spec); `unpack_snapshot(host_packed, spec)`
    rebuilds the host pytree.
    """
    global _PACK_FN
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    spec_leaves = [(l.shape, jnp.asarray(l).dtype) for l in leaves]

    if _PACK_FN is None:

        def _pack(leaves_in):
            groups = {}
            for i, l in enumerate(leaves_in):
                groups.setdefault(jnp.asarray(l).dtype.name, []).append(
                    jnp.ravel(jnp.asarray(l))
                )
            return {k: jnp.concatenate(v) for k, v in groups.items()}

        _PACK_FN = jax.jit(_pack)

    packed = _PACK_FN(leaves)
    return packed, (treedef, spec_leaves)


def fetch_packed_chunked(packed, chunk_elems: int = 4 << 20):
    """Fetch packed snapshot arrays in ~chunk-sized slices instead of one
    device_get: the host<->device link serializes transfers (~10 MB/s
    effective here), and a monolithic ~GB fetch blocks every foreground
    message (dispatches, metric syncs) for minutes.  Chunking yields the link
    back between slices so training traffic interleaves."""
    import numpy as np

    out = {}
    for k, arr in packed.items():
        n = arr.shape[0]
        if n <= chunk_elems:
            out[k] = np.asarray(arr)
        else:
            out[k] = np.concatenate(
                [np.asarray(arr[i : i + chunk_elems]) for i in range(0, n, chunk_elems)]
            )
    return out


def unpack_snapshot(host_packed, spec):
    """Rebuild the host pytree from fetched packed arrays (numpy, zero-copy
    views where possible)."""
    import numpy as np

    treedef, spec_leaves = spec
    offsets = {k: 0 for k in host_packed}
    leaves = []
    for shape, dtype in spec_leaves:
        key = dtype.name
        n = int(np.prod(shape)) if shape else 1
        buf = host_packed[key]
        leaves.append(np.asarray(buf[offsets[key] : offsets[key] + n]).reshape(shape))
        offsets[key] += n
    return jax.tree_util.tree_unflatten(treedef, leaves)


class AsyncSaver:
    """One background writer thread.

    Two submission classes:
      * `submit` — FIFO, every job runs (periodic checkpoints).  Bounded by
        `max_pending` so at most that many snapshots sit in HBM.
      * `submit_latest(key, ...)` — COALESCED: a newer job with the same key
        replaces a not-yet-started older one (the dropped snapshot is freed).
        For best.pt: when FID improves faster than the link can ship ~0.7 GB
        checkpoints, only the newest best matters — intermediate writes would
        be overwritten anyway.
    """

    def __init__(self, max_pending: int = 2):
        import collections

        self._cv = threading.Condition()
        self._fifo: "collections.deque" = collections.deque()
        self._latest: dict = {}
        self._busy = False
        self._closed = False
        self._max_pending = max_pending
        self._err: Exception | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, fn: Callable[[Any], None], tree) -> None:
        """Queue `fn(host_tree)`; `tree` is fetched to host in the worker.
        Blocks only when `max_pending` FIFO saves are already queued."""
        with self._cv:
            while len(self._fifo) >= self._max_pending:
                self._cv.wait()
            self._fifo.append((fn, tree))
            self._cv.notify_all()

    def submit_packed(self, fn: Callable[[Any], None], packed, spec) -> None:
        """FIFO submit of a `snapshot_packed` snapshot: the worker fetches the
        packed arrays in chunks (interleaving with foreground link traffic)
        and unpacks on host."""
        self.submit(lambda host: fn(unpack_snapshot(host, spec)), packed)

    def submit_latest_packed(self, key: str, fn: Callable[[Any], None], packed, spec) -> None:
        """Coalesced submit: replaces any not-yet-started job with `key`."""
        job = (lambda host: fn(unpack_snapshot(host, spec)), packed)
        with self._cv:
            self._latest[key] = job  # old snapshot (if any) freed here
            self._cv.notify_all()

    def _next_job(self):
        if self._fifo:
            return self._fifo.popleft()
        if self._latest:
            k = next(iter(self._latest))
            return self._latest.pop(k)
        return None

    def _worker(self):
        while True:
            with self._cv:
                job = self._next_job()
                while job is None and not self._closed:
                    self._cv.wait()
                    job = self._next_job()
                if job is None:  # closed and drained
                    return
                self._busy = True
                self._cv.notify_all()
            fn, tree = job
            try:
                if isinstance(tree, dict) and all(
                    hasattr(v, "shape") and getattr(v, "ndim", 0) == 1 for v in tree.values()
                ):
                    fn(fetch_packed_chunked(tree))  # packed snapshot
                else:
                    fn(jax.device_get(tree))
            except Exception as e:
                # surface immediately: wait() may not run until training end,
                # and a disk-full at iter 500 must not fail silently for hours
                import traceback

                print(
                    f"[AsyncSaver] checkpoint write FAILED: {e!r}", flush=True
                )
                traceback.print_exc()
                if self._err is None:  # keep the FIRST error for wait()
                    self._err = e
            finally:
                with self._cv:
                    self._busy = False
                    self._cv.notify_all()

    def wait(self):
        """Block until all queued saves are on disk; re-raise worker errors."""
        with self._cv:
            while self._fifo or self._latest or self._busy:
                self._cv.wait()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self):
        try:
            self.wait()
        finally:
            # always stop the thread, even when wait() re-raises a worker
            # error -- otherwise _closed is never set and the thread leaks
            with self._cv:
                self._closed = True
                self._cv.notify_all()
            self._thread.join(timeout=60)


class atomic_write:
    """`with atomic_write(path) as tmp: write(tmp)` -> os.replace(tmp, path)."""

    def __init__(self, path: str):
        self.path = path
        self.tmp = path + ".tmp"

    def __enter__(self) -> str:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        return self.tmp

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            os.replace(self.tmp, self.path)
        elif os.path.exists(self.tmp):
            os.remove(self.tmp)
        return False
