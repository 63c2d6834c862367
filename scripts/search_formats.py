#!/usr/bin/env python
"""FP-format search CLI (reference `search/search_fp4_format.py:783-860`):
per-block (weight, activation) format grid search over calibration data,
emitting optimal_quantization_formats_<kind>.json."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    from _common import add_model_flags

    add_model_flags(p, default_depth=30)
    p.add_argument("--var-ckpt", type=str, default=None)
    p.add_argument("--calib", type=str, required=True)
    p.add_argument("--kind", type=str, default="fc1",
                   choices=["mat_qkv", "proj", "fc1", "fc2", "ada"])
    p.add_argument("--labels", type=int, default=100,
                   help="ada kind: number of class labels for the "
                        "condition-activation search")
    p.add_argument("--bits", type=int, default=4, choices=[4, 6])
    p.add_argument("--max-samples", type=int, default=1000)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax

    from fpqvar_tpu.utils.jit_cache import enable as _jc
    _jc()  # persistent XLA compile cache (.jax_cache)
    import numpy as np

    from _common import model_config
    from fpqvar_tpu.models.var import init_var_params
    from fpqvar_tpu.quantize.calibration import CalibrationStore
    from fpqvar_tpu.quantize import search as S
    from fpqvar_tpu.utils import checkpoint as C

    cfg = model_config(args)
    if args.var_ckpt:
        var_p = C.convert_var_state_dict(
            C.load_torch_state_dict(args.var_ckpt), cfg)
    else:
        print("[warn] random init (smoke-test mode)", file=sys.stderr)
        var_p = init_var_params(jax.random.PRNGKey(0), cfg)

    space = S.FP4_SPACE if args.bits == 4 else S.FP6_SPACE
    if args.kind == "ada":
        # AdaLN condition-input search (`search_fp_format_ada.py:396-469`)
        from fpqvar_tpu.quantize.calibration import capture_condition

        cond = capture_condition(var_p, cfg, np.arange(args.labels))
        if cfg.shared_aln:
            # 512 family: ONE SharedAdaLin at params["shared_ada_lin"]
            # (per-block ada_gss has no linear to search) -> single entry
            ada_w = np.asarray(
                var_p["shared_ada_lin"]["w"], np.float32)[None]
        else:
            ada_w = np.asarray(var_p["blocks"]["ada_lin"]["w"], np.float32)
        results = S.search_ada_formats(cond, ada_w, space=space)
    else:
        weights = np.asarray(var_p["blocks"][f"{args.kind}_w"], np.float32)
        store = CalibrationStore(args.calib)
        results = S.search_formats(store, weights, args.kind, space=space,
                                   max_samples=args.max_samples)
    out = args.out or f"optimal_quantization_formats_{args.kind}.json"
    S.save_formats_json(out, results)
    print(f"wrote {out}")
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
