from lmrs_tpu.runtime.engine import Engine, GenerationConfig  # noqa: F401
from lmrs_tpu.runtime.compile_cache import enable_compilation_cache  # noqa: F401
