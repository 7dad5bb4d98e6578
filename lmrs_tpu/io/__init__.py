from lmrs_tpu.io.lmrs import read_lmrs, write_lmrs, parse_header  # noqa: F401
from lmrs_tpu.io.synthetic import random_weights, synthetic_params  # noqa: F401
