from fpqvar_tpu.ops import grids, hadamard, packing, quantizers  # noqa: F401
