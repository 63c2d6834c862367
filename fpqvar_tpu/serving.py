"""Continuous-batching generation server.

The reference has no serving stack (single eval script, SURVEY.md §0); the
BASELINE north star calls for "continuous batching of class-conditional
generation requests across hosts".  VAR generation is fixed-length (10 scale
steps), which makes batching simple: requests are (class_label, seed) pairs,
a batcher thread coalesces up to ``max_batch`` requests (classes can be
mixed freely — labels are per-row), one fused jitted generate produces the
whole batch, and results are fanned back out to per-request futures.  Under
sustained load the worker runs a depth-2 pipeline — the next batch is
dispatched before the previous batch's results are fetched — so the
host<->device round-trip overlaps device compute instead of serializing
with it.

Across hosts, run one server per host and route requests by any sharding of
the class space (see fpqvar_tpu.eval.pipeline.class_range_for_host).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np


class GenerationServer:
    def __init__(
        self,
        generator,              # VARGenerator
        params,
        vae_params,
        max_batch: int = 16,
        max_wait_ms: float = 50.0,
        base_seed: int = 0,
    ):
        self.generator = generator
        self.params = params
        self.vae_params = vae_params
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.base_key = jax.random.PRNGKey(base_seed)
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._batches = 0
        self._served = 0
        self._pipelined = 0
        self._worker.start()

    # ------------------------------------------------------------------
    def submit(self, label: int, seed: int = 0) -> Future:
        """Enqueue one generation request; resolves to a [3, H, W] image."""
        fut: Future = Future()
        self._q.put((int(label), int(seed), fut))
        return fut

    def stats(self) -> dict:
        return {"batches": self._batches, "served": self._served,
                "pipelined": self._pipelined}

    def stop(self) -> None:
        self._stop.set()
        self._worker.join(timeout=10)

    # ------------------------------------------------------------------
    def _collect(self):
        """Block for the first request, then coalesce for up to max_wait."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = self.max_wait
        import time

        t0 = time.monotonic()
        while len(batch) < self.max_batch:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _dispatch(self, batch):
        """Issue one (async) generate for a coalesced batch; returns the
        device array without blocking on it."""
        # pad to the fixed max_batch so every batch hits the same
        # compiled program (a fresh shape would trigger a recompile)
        pad = self.max_batch - len(batch)
        labels = jnp.asarray(
            [b[0] for b in batch] + [0] * pad, jnp.int32)
        # one key PER ROW, derived only from (base_seed, request seed):
        # a request's image is reproducible regardless of what it is
        # co-batched with (the model samples each row with its own key
        # when given [B, 2] keys — see models/var.py scale_step)
        key = jnp.stack(
            [jax.random.fold_in(self.base_key, seed)
             for _, seed, _ in batch]
            + [jax.random.fold_in(self.base_key, 0)] * pad)
        return self.generator.generate(
            self.params, self.vae_params, labels, key)

    def _resolve(self, batch, imgs):
        """Fetch a dispatched batch to host and fan results out."""
        try:
            host = np.asarray(imgs[:len(batch)])
            for i, (_, _, fut) in enumerate(batch):
                fut.set_result(host[i])
            self._batches += 1
            self._served += len(batch)
        except Exception as e:  # pragma: no cover - defensive
            self._fail(batch, e)

    @staticmethod
    def _fail(batch, e):
        for _, _, fut in batch:
            if not fut.done():
                fut.set_exception(e)

    def _run(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                imgs = self._dispatch(batch)
            except Exception as e:  # pragma: no cover - defensive
                self._fail(batch, e)
                continue
            # depth-2 pipeline: while the device runs this batch, coalesce
            # and dispatch the next whenever requests are already waiting,
            # THEN fetch this batch's results — the host round-trip (a flat
            # ~40 ms through the TPU relay per synchronized dispatch; see
            # bench.py time_generate_pipelined) overlaps device compute.  A
            # lone request is fetched immediately, so idle-traffic latency
            # is unchanged.
            while not self._stop.is_set() and not self._q.empty():
                nxt = self._collect()
                if not nxt:
                    break
                try:
                    imgs_nxt = self._dispatch(nxt)
                except Exception as e:  # pragma: no cover - defensive
                    self._fail(nxt, e)
                    break
                self._pipelined += 1
                self._resolve(batch, imgs)
                batch, imgs = nxt, imgs_nxt
            self._resolve(batch, imgs)
