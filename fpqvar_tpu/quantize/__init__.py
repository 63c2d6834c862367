from fpqvar_tpu.quantize.runtime import QuantRuntime, build_runtime  # noqa: F401
from fpqvar_tpu.quantize.recipe import quantize_var_params  # noqa: F401
