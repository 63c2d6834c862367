"""Shared CLI plumbing: model-shape flags and VARConfig construction.

Every model-building CLI takes the published shapes via --depth/--resolution
(the reference hard-codes these per entry script,
`evaluate_fp_quant_transform_rotate.py:54-70`) plus a --tiny override that
selects ``fpqvar_tpu.config.var_tiny`` so the full CLI surface is exercisable
in seconds on CPU (smoke tests, CI) — the reference has no small
configuration anywhere.
"""


def add_model_flags(p, default_depth: int = 30) -> None:
    p.add_argument("--depth", type=int, default=default_depth,
                   help="transformer depth (width/heads derive from it)")
    p.add_argument("--resolution", type=int, default=256, choices=[256, 512])
    p.add_argument("--tiny", action="store_true",
                   help="depth-2 48x48 smoke config (ignores "
                        "--depth/--resolution)")


def model_config(args):
    from fpqvar_tpu.config import (
        PATCH_NUMS_256, PATCH_NUMS_512, VARConfig, VQVAEConfig, var_tiny)

    if getattr(args, "tiny", False):
        return var_tiny()
    pns = PATCH_NUMS_512 if args.resolution == 512 else PATCH_NUMS_256
    return VARConfig(depth=args.depth, shared_aln=(args.resolution == 512),
                     patch_nums=pns, vae=VQVAEConfig(patch_nums=pns))
