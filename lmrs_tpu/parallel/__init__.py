from lmrs_tpu.parallel.sharding import (  # noqa: F401
    cache_sharding,
    make_mesh,
    tp_param_shardings,
)
