from fpqvar_tpu.eval import imaging, metrics  # noqa: F401
