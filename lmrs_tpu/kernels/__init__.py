from lmrs_tpu.kernels.dequant_matmul import qmatmul_pallas  # noqa: F401
