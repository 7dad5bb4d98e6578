from lmrs_tpu.runtime.engine import Engine, GenerationConfig  # noqa: F401
