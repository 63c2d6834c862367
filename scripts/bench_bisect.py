#!/usr/bin/env python
"""Component bisect of the quantized-decode overhead (TPU, d30).

Times full generations for a ladder of runtime configs between bf16 and the
full FP4 recipe, isolating what each recipe stage costs end-to-end:

  bf16          - no quantization at all (weights unquantized)
  wq-only       - weights fake-quantized offline, runtime untouched
  rotate        - + online block-Hadamard rotation (x1/x2 @ Q per block)
  actq          - weights + per-group fp4 act quant on all four layers
                  (fc2 single-grid e2m1), no rotation
  fc2dual       - weights + dual-grid act quant on fc2 ONLY
  full          - the shipped fake recipe (rotate + actq + fc2 dual)

All runs share batch/shapes so jit programs differ only in the stage under
test.  Writes one JSON line per config to stdout.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fpqvar_tpu.utils.jit_cache import enable as _enable_cache  # noqa: E402

_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="d30", choices=["tiny", "d16", "d30"])
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from bench import build, time_generate
    from fpqvar_tpu.config import GenerateConfig, QuantConfig, fpqvar_w4a4
    from fpqvar_tpu.models import VARGenerator
    from fpqvar_tpu.models.var import init_var_params
    from fpqvar_tpu.models.vqvae import init_vqvae_params
    from fpqvar_tpu.quantize import quantize_var_params
    from fpqvar_tpu.quantize.runtime import build_runtime
    import dataclasses

    cfg, batch = build(args.preset)
    if args.batch:
        batch = args.batch
    key = jax.random.PRNGKey(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        var_p = init_var_params(key, cfg, dtype=jnp.bfloat16)
        vae_p = init_vqvae_params(jax.random.PRNGKey(1), cfg.vae)
        vae_p = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            vae_p)
    dev = jax.devices()[0]
    vae_p = jax.device_put(vae_p, dev)
    label = jnp.arange(batch, dtype=jnp.int32) % cfg.num_classes
    gen_cfg = GenerateConfig()
    var_host = jax.tree_util.tree_map(np.asarray, var_p)

    qcfg = fpqvar_w4a4().replace(transform=False)
    full_rt = build_runtime(qcfg, cfg.depth, cfg.width)
    none_aq = {k: None for k in full_rt.act_q}

    # (name, weight_mode: None|"plain"|"rot", runtime)
    # weights quantized WITHOUT offline rotation for configs that skip the
    # online rotation (rotated weights + unrotated activations would feed
    # the blocks garbage and can overflow bf16)
    ladder = [
        ("bf16", None, None),
        ("wq-only", "plain", dataclasses.replace(
            full_rt, act_q=none_aq, rotation_block=None)),
        ("rotate", "rot", dataclasses.replace(full_rt, act_q=none_aq)),
        ("actq", "plain", dataclasses.replace(
            full_rt,
            act_q={**full_rt.act_q,
                   "fc2": build_runtime(
                       qcfg.replace(fc2_format="fp_e2"),
                       cfg.depth, cfg.width).act_q["fc2"]},
            rotation_block=None)),
        ("fc2dual", "plain", dataclasses.replace(
            full_rt, act_q={**none_aq, "fc2": full_rt.act_q["fc2"]},
            rotation_block=None)),
        ("full", "rot", full_rt),
    ]

    qp_host = {}
    results = {}
    for name, wmode, qrt in ladder:
        if wmode is not None and wmode not in qp_host:
            qc = qcfg if wmode == "rot" else qcfg.replace(rotate=False)
            qp = quantize_var_params(var_host, cfg, qc)
            qp = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, qp)
            qp_host[wmode] = jax.tree_util.tree_map(np.asarray, qp)
        params = jax.device_put(
            qp_host[wmode] if wmode is not None else var_host, dev)
        gen = VARGenerator(cfg, qcfg if wmode else QuantConfig(), gen_cfg,
                           qrt=qrt)
        ips = time_generate(gen, params, vae_p, label, key, args.rounds)
        results[name] = ips
        print(json.dumps({"config": name, "images_per_sec": round(ips, 3)}),
              flush=True)
        for leaf in jax.tree_util.tree_leaves(params):
            if hasattr(leaf, "delete"):
                leaf.delete()

    base = results["bf16"]
    print(json.dumps({k: round(v / base, 4) for k, v in results.items()}),
          flush=True)


if __name__ == "__main__":
    main()
