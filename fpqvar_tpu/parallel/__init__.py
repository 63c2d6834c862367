from fpqvar_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_shardings,
    kv_cache_shardings,
    shard_params,
)
