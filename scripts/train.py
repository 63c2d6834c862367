#!/usr/bin/env python
"""VAR training CLI: sharded train step + auto-resume + data sharding.

The reference carries upstream-VAR training machinery it never wires into an
entry point (SURVEY.md §2.1 #17: `utils/lr_control.py`, `utils/amp_sc.py`,
`utils/misc.py:344` auto_resume, `utils/data_sampler.py`).  This CLI makes
the whole loop live and TPU-native: a {dp, tp} mesh (`parallel/mesh.py`),
`DistInfiniteBatchSampler`-style per-process index streams
(`train/data.py`), the reference's warmup+cosine LR shape (optax), orbax
train-state checkpointing with auto-resume (`train/resume.py`), and JSONL
metrics (`utils/logging.py`).

Data: an npz with arrays ``label`` [N], ``x`` [N, L-1, Cvae] (teacher-forcing
input pyramid, see `models/var.py` var_forward) and ``targets`` [N, L];
without ``--data`` a synthetic dataset is generated (smoke/bench mode — the
image ships no ImageNet tokens).

Multi-host: pass ``--coordinator host:port --num-hosts N --host-id I`` and
run one process per host; each host feeds its own `dist_infinite_batches`
shard (same seeds → consistent global batch, no broadcast needed).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    from _common import add_model_flags

    add_model_flags(p, default_depth=16)
    p.add_argument("--data", type=str, default=None, help="npz dataset path")
    p.add_argument("--synthetic-n", type=int, default=64)
    p.add_argument("--glb-batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=0.05)
    p.add_argument("--warmup-frac", type=float, default=0.005)
    p.add_argument("--label-smooth", type=float, default=0.0)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 forward off f32 master params")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize per-block activations on backward "
                        "(jax.checkpoint over the block scan): ~depth x "
                        "less activation HBM for one extra forward")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--out", type=str, required=True, help="run directory")
    p.add_argument("--save-every", type=int, default=50)
    p.add_argument("--keep", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    args = p.parse_args()

    import jax

    from fpqvar_tpu.utils.jit_cache import enable as _jc
    _jc()  # persistent XLA compile cache (.jax_cache)
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts, process_id=args.host_id)

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from _common import model_config
    from fpqvar_tpu.config import MeshConfig
    from fpqvar_tpu.models.var import init_var_params
    from fpqvar_tpu.parallel import make_mesh, param_shardings
    from fpqvar_tpu.train import (
        auto_resume, dist_infinite_batches, make_manager, make_train_state,
        save_train_state, train_step)
    from fpqvar_tpu.train.trainer import make_optimizer
    from fpqvar_tpu.utils.logging import MetricLogger

    cfg = model_config(args)

    # --- data (host-local arrays; indices come from the shared-seed stream)
    if args.data:
        d = np.load(args.data)
        label, x, targets = d["label"], d["x"], d["targets"]
    else:
        print("[warn] synthetic dataset (smoke mode)", file=sys.stderr)
        rng = np.random.default_rng(args.seed)
        n = args.synthetic_n
        label = rng.integers(0, cfg.num_classes, n).astype(np.int32)
        x = rng.normal(size=(n, cfg.L - cfg.first_l,
                             cfg.vae.z_channels)).astype(np.float32)
        targets = rng.integers(0, cfg.vae.vocab_size,
                               (n, cfg.L)).astype(np.int32)
    assert x.shape[1] == cfg.L - cfg.first_l and targets.shape[1] == cfg.L

    # --- mesh + shardings
    mesh = make_mesh(MeshConfig(dp=args.dp, tp=args.tp))
    repl = NamedSharding(mesh, P())
    batch_sh = {"label": NamedSharding(mesh, P("dp")),
                "x": NamedSharding(mesh, P("dp", None, None)),
                "targets": NamedSharding(mesh, P("dp", None))}

    # --- optimizer with the reference's warmup+cos LR shape
    # (`utils/lr_control.py:10-49`; wp0=0.005, end value wpe=0.001 of peak)
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.005 * args.lr, peak_value=args.lr,
        warmup_steps=max(1, round(args.warmup_frac * args.steps)),
        decay_steps=args.steps, end_value=0.001 * args.lr)
    optimizer = make_optimizer(wd=args.wd, schedule=sched)

    params = init_var_params(jax.random.PRNGKey(args.seed), cfg)
    state = make_train_state(params, optimizer)
    # Adam mu/nu mirror the params tree (their leaf paths carry the same
    # key names), so param_shardings assigns them the same tp/dp specs —
    # replicating them would force an all-gather + mismatch on step 2.
    state_sh = type(state)(
        params=param_shardings(params, mesh),
        opt_state=param_shardings(state.opt_state, mesh),
        step=repl)
    state = jax.tree_util.tree_map(
        jax.device_put, state, state_sh,
        is_leaf=lambda v: isinstance(v, jnp.ndarray))

    mngr = make_manager(os.path.join(args.out, "ckpt"), max_to_keep=args.keep)
    info, state, start = auto_resume(mngr, state)
    print("\n".join(info))

    step_fn = jax.jit(
        lambda s, bt, k: train_step(
            s, cfg, optimizer, bt, key=k, mixed_precision=args.bf16,
            label_smoothing=args.label_smooth, remat=args.remat),
        in_shardings=(state_sh, batch_sh, repl),
        # pin outputs to the same specs so state round-trips across steps
        # (XLA would otherwise pick its own, e.g. tp-sharding q_bias)
        out_shardings=(state_sh, {"loss": repl}))

    world, rank = jax.process_count(), jax.process_index()
    local_bs = args.glb_batch // world
    # each train step consumes one batch per rank; resume the index stream
    # at exactly the (epoch, iter) position step `start` left off at
    iters_per_ep = -(-len(label) // args.glb_batch)
    batches = dist_infinite_batches(
        world, rank, len(label), args.glb_batch, seed=args.seed,
        fill_last=True,
        start_ep=start // iters_per_ep, start_it=start % iters_per_ep)

    logger = MetricLogger(os.path.join(args.out, "metrics.jsonl"))
    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    with mesh:
        for it in range(start, args.steps):
            idx = next(batches)
            bt = jax.device_put(
                {"label": jnp.asarray(label[idx]),
                 "x": jnp.asarray(x[idx]),
                 "targets": jnp.asarray(targets[idx])}, batch_sh)
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, bt, sub)
            if (it + 1) % args.log_every == 0 or it + 1 == args.steps:
                loss = float(metrics["loss"])
                logger.update(step=it + 1, loss=loss,
                              lr=float(sched(it)),
                              imgs_per_s=local_bs * args.log_every
                              / max(time.time() - t0, 1e-9))
                print(f"step {it + 1}/{args.steps} {logger}")
                t0 = time.time()
            if (it + 1) % args.save_every == 0 or it + 1 == args.steps:
                save_train_state(mngr, state)
    mngr.wait_until_finished()
    print(f"done: {args.steps} steps, ckpts in {args.out}/ckpt")


if __name__ == "__main__":
    main()
