"""fpqvar_tpu — a TPU-native low-bit floating-point inference framework for
Visual AutoRegressive (VAR) next-scale-prediction image generators.

Re-implements the capabilities of PKU-SEC-Lab/FPQVAR (arXiv 2505.16335) from
scratch in JAX/XLA/Pallas:

- custom FP4/FP6 formats (e2m1, e1m2, e3m0, e2m3, e3m2, asymmetric dual-grid
  formats for the GELU-shaped fc2 input) with per-group weight + activation
  quantization (``fpqvar_tpu.ops``),
- block-diagonal randomized Hadamard rotation fused into the matmul path
  (``fpqvar_tpu.ops.hadamard``),
- GALT (GHT-aware learnable transformation) per-channel smoothing — offline
  training and weight folding (``fpqvar_tpu.quantize``),
- a single config-driven VAR + VQVAE model family (``fpqvar_tpu.models``)
  replacing the reference's five forked model packages,
- packed-code Pallas dequant+matmul kernels for real low-bit inference
  (``fpqvar_tpu.ops.pallas``), replacing the reference's fake-quant CUDA
  extension (`/root/reference/quant/quant_kernel.cu`),
- a {data, tensor}-parallel sharding layer over `jax.sharding.Mesh`
  (``fpqvar_tpu.parallel``), which the single-GPU reference lacks entirely.
"""

__version__ = "0.1.0"

from fpqvar_tpu.config import (  # noqa: F401
    GenerateConfig,
    MeshConfig,
    QuantConfig,
    VARConfig,
    VQVAEConfig,
    fpqvar_w4a4,
    fpqvar_w6a6,
    var_d16,
    var_d30,
    var_d36_512,
)
