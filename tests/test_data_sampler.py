"""Data-sharding iterators: coverage/disjointness across ranks, epoch
determinism, and mid-epoch resume continuity (reference
`utils/data_sampler.py` semantics; deviations documented in
`fpqvar_tpu/train/data.py`)."""
import pytest
import itertools

import numpy as np

from fpqvar_tpu.train.data import (
    dist_infinite_batches, eval_shard, infinite_batches)

pytestmark = pytest.mark.quick


def test_eval_shard_partitions_exactly():
    for n, world in [(50, 4), (7, 3), (8, 8), (5, 8)]:
        shards = [eval_shard(n, r, world) for r in range(world)]
        assert np.array_equal(np.concatenate(shards), np.arange(n))


def take(it, k):
    return list(itertools.islice(it, k))


def test_infinite_batches_epoch_coverage_and_determinism():
    batches = take(infinite_batches(10, 4, seed=7), 3)   # one epoch, tail=2
    assert [len(b) for b in batches] == [4, 4, 2]
    flat = np.sort(np.concatenate(batches))
    assert np.array_equal(flat, np.arange(10))
    again = take(infinite_batches(10, 4, seed=7), 3)
    for a, b in zip(batches, again):
        assert np.array_equal(a, b)
    # different epochs reshuffle
    ep2 = take(infinite_batches(10, 4, seed=7), 6)[3:]
    assert not all(
        np.array_equal(a, b) for a, b in zip(batches[:2], ep2[:2]))


def test_infinite_batches_fill_and_drop():
    filled = take(infinite_batches(10, 4, seed=0, fill_last=True), 3)
    assert all(len(b) == 4 for b in filled)
    dropped = take(infinite_batches(10, 4, seed=0, drop_last=True), 4)
    assert all(len(b) == 4 for b in dropped)
    # drop_last: 2 iters/epoch, so batch 3 starts epoch 1
    assert len(set(np.concatenate(dropped[:2]).tolist())) == 8


def test_infinite_batches_resume_continuity():
    ref = take(infinite_batches(10, 4, seed=3), 7)
    resumed = take(infinite_batches(10, 4, seed=3, start_ep=1, start_it=1), 4)
    for a, b in zip(ref[4:], resumed):   # epoch1 it1 = global batch index 4
        assert np.array_equal(a, b)


def test_dist_batches_disjoint_and_globally_consistent():
    world, glb = 4, 8
    per_rank = [
        take(dist_infinite_batches(world, r, 30, glb, seed=5), 3)
        for r in range(world)]
    # same epoch across ranks: rank slices are disjoint pieces of one perm
    ep0 = np.concatenate([np.concatenate(b[:3]) for b in per_rank])
    assert len(ep0) == 24 and len(set(ep0.tolist())) == 24
    # batch size is glb/world
    assert all(len(b) == 2 for bs in per_rank for b in bs)
    # disjoint within an iteration step
    step0 = np.concatenate([bs[0] for bs in per_rank])
    assert len(set(step0.tolist())) == len(step0)


def test_dist_batches_fill_last_covers_everything():
    world, glb, n = 2, 6, 10   # 2 iters/ep -> global_max_p=12, filling=2
    ranks = [
        take(dist_infinite_batches(world, r, n, glb, seed=1, fill_last=True), 2)
        for r in range(world)]
    ep = np.concatenate([np.concatenate(b) for b in ranks])
    assert len(ep) == 12
    assert set(ep.tolist()) == set(range(n))


def test_dist_batches_repeated_aug():
    it = dist_infinite_batches(1, 0, 8, 4, seed=0, repeated_aug=2)
    ep = np.concatenate(take(it, 2))   # 2 iters/ep, global_max_p=8
    vals, counts = np.unique(ep, return_counts=True)
    assert (counts == 2).all() and len(vals) == 4
