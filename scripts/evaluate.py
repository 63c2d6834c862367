#!/usr/bin/env python
"""Quantize-and-generate evaluation CLI.

One config-driven entry point replacing the reference's eight evaluate*.py
scripts (`evaluate.py`, `evaluate_quantization[_512x512].py`,
`evaluate_fp_quant[_512x512].py`, `evaluate_fp_quant_transform_rotate
[_512x512].py`; canonical flags at run.sh:4-25).  All reference flags are
accepted with the same names; model size and resolution are flags instead of
hard-coded constants.

Examples (reference run.sh equivalents):

  # FP16/bf16 baseline, d30 256x256
  python scripts/evaluate.py --depth 30 --vae-ckpt vae.pth --var-ckpt d30.pth \
      --out figs_bf16

  # full FPQVAR W4A4 recipe
  python scripts/evaluate.py --depth 30 --quant --w_bit 4 --a_bit 4 \
      --weight_quant per_group --act_quant per_group \
      --activation_fp_quant --weight_fp_quant \
      --act_fp_type fp_e2 --weight_fp_type fp_e2 \
      --fc2_fp_type fp_e1m2_neg_e2m1_pos \
      --rotate --block_rotate --transform --best-s-dir best_s/ \
      --vae-ckpt vae.pth --var-ckpt d30.pth --out figs_w4a4
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    from _common import add_model_flags

    p = argparse.ArgumentParser()
    # model
    add_model_flags(p, default_depth=30)
    p.add_argument("--vae-ckpt", type=str, default=None)
    p.add_argument("--var-ckpt", type=str, default=None)
    p.add_argument("--packed-ckpt", type=str, default=None,
                   help="pre-quantized npz checkpoint (skips transform)")
    # reference flag set (evaluate_fp_quant_transform_rotate.py:27-52)
    p.add_argument("--w_bit", type=int, default=32)
    p.add_argument("--a_bit", type=int, default=32)
    p.add_argument("--kv_bit", type=int, default=0)
    p.add_argument("--groupsize", type=int, default=128)
    p.add_argument("--act_sym", action="store_true")
    p.add_argument("--weight_quant", type=str, default="per_channel")
    p.add_argument("--act_quant", type=str, default="per_token")
    p.add_argument("--quant", action="store_true")
    p.add_argument("--fc2_act_log2_quant", action="store_true")
    p.add_argument("--quant_kv", action="store_true")
    p.add_argument("--activation_fp_quant", action="store_true")
    p.add_argument("--weight_fp_quant", action="store_true")
    p.add_argument("--act_fp_type", type=str, default="fp_e2")
    p.add_argument("--weight_fp_type", type=str, default="fp_e2")
    p.add_argument("--fc2_fp_type", type=str, default="fp_e1m2_neg_e2m1_pos")
    p.add_argument("--rotate", action="store_true")
    p.add_argument("--block_rotate", action="store_true")
    p.add_argument("--transform", action="store_true")
    p.add_argument("--best-s-dir", type=str, default=None)
    p.add_argument("--quantize_ada", action="store_true",
                   help="quantize ada_lin/shared_ada_lin (the reference "
                        "intends this but silently no-ops it)")
    p.add_argument("--ada_fp_type", type=str, default="auto")
    # backend / generation
    p.add_argument("--backend", type=str, default="fake",
                   choices=["fake", "packed", "int8"])
    p.add_argument("--kv_backend", type=str, default="fake",
                   choices=["fake", "packed"])
    p.add_argument("--attn_int8", action="store_true",
                   help="int8 MXU attention over packed KV codes "
                        "(requires --kv_backend packed)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--num-img-per-class", type=int, default=50)
    p.add_argument("--classes", type=str, default=None,
                   help="range as a:b (default all)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cfg", type=float, default=1.5)
    p.add_argument("--top_k", type=int, default=900)
    p.add_argument("--top_p", type=float, default=0.96)
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port for jax.distributed.initialize "
                        "(multi-host runs; pair with --host-id/--num-hosts)")
    p.add_argument("--pack-npz", action="store_true",
                   help="pack PNGs to npz when generation finishes")
    return p.parse_args()


def build_configs(args):
    from _common import model_config
    from fpqvar_tpu.config import GenerateConfig, QuantConfig

    cfg = model_config(args)
    qcfg = QuantConfig(
        enabled=args.quant,
        w_bit=args.w_bit, a_bit=args.a_bit,
        kv_bit=args.kv_bit if args.quant_kv else 0,
        group_size=args.groupsize,
        weight_quant=args.weight_quant, act_quant=args.act_quant,
        act_sym=args.act_sym,
        weight_format=args.weight_fp_type, act_format=args.act_fp_type,
        fc2_format=args.fc2_fp_type, fc2_log2=args.fc2_act_log2_quant,
        int_quant=args.quant and not (
            args.activation_fp_quant or args.weight_fp_quant),
        rotate=args.rotate, block_rotate=args.block_rotate,
        transform=args.transform, backend=args.backend,
        kv_backend=args.kv_backend, attn_int8=args.attn_int8,
        quantize_ada=args.quantize_ada, ada_format=args.ada_fp_type,
    )
    gen = GenerateConfig(cfg=args.cfg, top_k=args.top_k, top_p=args.top_p,
                         seed=args.seed)
    return cfg, qcfg, gen


def load_galt(args, cfg):
    import numpy as np

    from fpqvar_tpu.quantize import galt as G

    if not args.transform:
        return None
    if args.best_s_dir is None:
        raise SystemExit("--transform requires --best-s-dir")
    try:
        return G.load_best_s_pair(args.best_s_dir, args.w_bit)
    except FileNotFoundError as e:
        raise SystemExit(str(e))


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from fpqvar_tpu.utils.jit_cache import enable as _jc
    _jc()  # persistent XLA compile cache (.jax_cache)

    from fpqvar_tpu.models import VARGenerator, build_vae_var
    from fpqvar_tpu.quantize import quantize_var_params
    from fpqvar_tpu.utils import checkpoint as C
    from fpqvar_tpu.eval.pipeline import (
        class_range_for_host, generate_eval_set)

    cfg, qcfg, gen_cfg = build_configs(args)

    # multi-host wiring: one process per host, DCN-connected; jax.distributed
    # makes every host see the global device set (SURVEY.md §2.9 TPU-native
    # equivalents — the reference has no distributed execution at all)
    if args.coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts, process_id=args.host_id)

    # the two checkpoints load independently: --packed-ckpt replaces the
    # torch var ckpt entirely (skipping the multi-GB conversion), while the
    # VQVAE still needs --vae-ckpt; anything missing falls back to random
    # init with a warning (smoke-test mode)
    if args.vae_ckpt:
        vae_p = C.convert_vqvae_state_dict(
            C.load_torch_state_dict(args.vae_ckpt), cfg.vae)
    else:
        print("[warn] no --vae-ckpt - random-init VQVAE (smoke-test mode)",
              file=sys.stderr)
        vae_p, _ = build_vae_var(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.bfloat16)
    if args.packed_ckpt:
        var_p = C.load_params(args.packed_ckpt)
    else:
        if args.var_ckpt:
            var_p = C.convert_var_state_dict(
                C.load_torch_state_dict(args.var_ckpt), cfg)
            var_p = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16), var_p)
        else:
            print("[warn] no --var-ckpt - random-init VAR (smoke-test mode)",
                  file=sys.stderr)
            _, var_p = build_vae_var(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        var_p = quantize_var_params(var_p, cfg, qcfg, galt=load_galt(args, cfg))

    # model-config dump (reference logs the module repr,
    # evaluate...py:133-136)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump({"model": vars(args), "L": cfg.L, "width": cfg.width}, f,
                  indent=2, default=str)

    # single-flag sharded eval: build the {dp, tp} mesh and shard the
    # parameter tree; labels are dp-sharded inside generate_eval_set
    mesh = None
    if args.dp * args.tp > 1:
        from fpqvar_tpu.config import MeshConfig
        from fpqvar_tpu.parallel import make_mesh, shard_params

        mesh = make_mesh(MeshConfig(dp=args.dp, tp=args.tp))
        var_p = shard_params(var_p, mesh)

    generator = VARGenerator(cfg, qcfg, gen_cfg, mesh=mesh)
    if args.classes:
        a, b = args.classes.split(":")
        classes = range(int(a), int(b))
    else:
        classes = class_range_for_host(
            cfg.num_classes, args.host_id, args.num_hosts)
    generate_eval_set(
        generator, var_p, vae_p, args.out,
        num_img_per_class=args.num_img_per_class, classes=classes,
        seed=args.seed, batch=args.batch, mesh=mesh)

    if args.pack_npz:
        from fpqvar_tpu.eval.imaging import create_npz_from_sample_folder

        npz = create_npz_from_sample_folder(
            args.out, expected=len(list(classes)) * args.num_img_per_class)
        print(f"packed: {npz}")


if __name__ == "__main__":
    main()
