from lmrs_tpu.ops.matmul import qmatmul  # noqa: F401
from lmrs_tpu.ops.norms import rmsnorm, layernorm  # noqa: F401
from lmrs_tpu.ops.activations import silu, gelu_tanh, quick_gelu  # noqa: F401
from lmrs_tpu.ops.rope import rope_tables, apply_rope  # noqa: F401
from lmrs_tpu.ops.attention import attention  # noqa: F401
