"""Deterministic data sharding: eval shards and infinite batch index streams.

TPU-native counterpart of the reference's `utils/data_sampler.py`: instead of
torch ``Sampler`` objects bound to a DataLoader, these are pure index
generators (numpy, seeded) that each *process* runs locally — under
``jax.distributed`` every host computes its own disjoint slice from the same
seeds, so no cross-host coordination or broadcast is needed.  Feed the
yielded index arrays to your host-local array store, then ``device_put`` with
a dp-sharded ``NamedSharding`` (`fpqvar_tpu/parallel/mesh.py`).

Semantics kept from the reference:
- `eval_shard`: contiguous ``linspace`` split, uneven tails allowed
  (`data_sampler.py:6-17`).
- `infinite_batches`: per-epoch reshuffle with seed ``epoch + base_seed``,
  optional tail-fill to a full batch (`data_sampler.py:20-65`).
- `dist_infinite_batches`: one global per-epoch permutation, optional
  repeated augmentation and tail-fill, then a ``linspace`` split across
  ranks (`data_sampler.py:68-110`).

Two deliberate deviations (documented, mirroring how `config.py` treats the
reference's dead ``--groupsize``): (a) the reference's ``start_it`` resume
offset is dead code — its ``__iter__`` pre-increments the epoch so the
``epoch == start_ep`` guard never fires (`data_sampler.py:53-56`); here the
resume offset actually applies.  (b) permutations come from numpy PCG64, not
torch's Mersenne generator — determinism is per-framework, and nothing in the
pipeline depends on torch's exact permutation values.
"""
from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def eval_shard(n: int, rank: int, world: int) -> np.ndarray:
    """Contiguous slice of ``range(n)`` for ``rank`` of ``world`` processes.
    Covers every index exactly once across ranks; tail ranks may get one
    fewer (reference `data_sampler.py:8-10`)."""
    seps = np.linspace(0, n, world + 1, dtype=int)
    return np.arange(seps[rank], seps[rank + 1])


def _epoch_perm(n: int, epoch: int, base_seed: int, shuffle: bool) -> np.ndarray:
    if not shuffle:
        return np.arange(n)
    return np.random.Generator(
        np.random.PCG64(epoch + base_seed)).permutation(n)


def infinite_batches(
    dataset_len: int,
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
    fill_last: bool = False,
    drop_last: bool = False,
    start_ep: int = 0,
    start_it: int = 0,
) -> Iterator[np.ndarray]:
    """Endless stream of index batches, reshuffled each epoch with seed
    ``epoch + seed``.  ``fill_last`` recycles head indices so the tail batch
    is full; ``drop_last`` drops it; otherwise the tail batch is short.
    Resume mid-epoch with ``(start_ep, start_it)``."""
    if drop_last:
        iters_per_ep = dataset_len // batch_size
    else:
        iters_per_ep = -(-dataset_len // batch_size)
    epoch = start_ep
    while True:
        indices = _epoch_perm(dataset_len, epoch, seed, shuffle)
        tail = iters_per_ep * batch_size - dataset_len
        if tail > 0 and fill_last:
            indices = np.concatenate([indices, indices[:tail]])
        limit = iters_per_ep * batch_size
        it = start_it if epoch == start_ep else 0
        for p in range(it * batch_size, limit, batch_size):
            yield indices[p:p + batch_size]
        epoch += 1


def dist_infinite_batches(
    world_size: int,
    rank: int,
    dataset_len: int,
    glb_batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
    fill_last: bool = False,
    repeated_aug: int = 0,
    start_ep: int = 0,
    start_it: int = 0,
) -> Iterator[np.ndarray]:
    """Per-rank slice of a globally-consistent infinite batch stream: every
    epoch all ranks draw the SAME global permutation (same seed), each takes
    its ``linspace`` slice, and yields local batches of
    ``glb_batch_size // world_size``.  With ``jax.distributed`` use
    ``world_size=jax.process_count(), rank=jax.process_index()``."""
    if glb_batch_size % world_size != 0:
        raise ValueError(
            f"glb_batch_size {glb_batch_size} % world_size {world_size} != 0")
    batch_size = glb_batch_size // world_size
    iters_per_ep = -(-dataset_len // glb_batch_size)
    global_max_p = iters_per_ep * glb_batch_size
    epoch = start_ep
    while True:
        indices = _epoch_perm(dataset_len, epoch, seed, shuffle)
        if repeated_aug > 1:
            keep = -(-dataset_len // repeated_aug)
            indices = np.repeat(indices[:keep], repeated_aug)[:global_max_p]
        filling = global_max_p - indices.shape[0]
        if filling > 0 and fill_last:
            indices = np.concatenate([indices, indices[:filling]])
        seps = np.linspace(0, indices.shape[0], world_size + 1, dtype=int)
        local = indices[seps[rank]:seps[rank + 1]]
        it = start_it if epoch == start_ep else 0
        for p in range(it * batch_size, len(local), batch_size):
            yield local[p:p + batch_size]
        epoch += 1
