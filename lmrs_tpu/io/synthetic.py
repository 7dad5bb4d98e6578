"""Random synthetic models — the test/bench substrate.

The reference has no tests and validates by converting real checkpoints; in a
zero-egress environment we instead generate random weights at any size (tiny
for unit tests, full Gemma-2-9B shape for benches), push them through the
same quantize→serialize→load→forward pipeline, and compare against the
independent numpy golden implementation (tests/golden.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from lmrs_tpu.config import ModelConfig, ModelType
from lmrs_tpu.io.lmrs import _tensor_layout
from lmrs_tpu.quant import QuantType


def random_weights(cfg: ModelConfig, seed: int = 0,
                   scale: float = 0.02) -> Dict[str, np.ndarray]:
    """Dense float32 weights for every tensor in the .lmrs layout."""
    rng = np.random.default_rng(seed)
    out: Dict[str, np.ndarray] = {}
    for name, shape, _ in _tensor_layout(cfg):
        if "norm" in name:
            # keep norms near identity so activations stay sane
            w = rng.normal(0.0, 0.05, size=shape).astype(np.float32)
        else:
            w = rng.normal(0.0, scale, size=shape).astype(np.float32)
        out[name] = w
    return out


def synthetic_params(cfg: ModelConfig, seed: int = 0):
    """Build device TransformerParams with random weights (no file)."""
    from lmrs_tpu.io.params import params_from_weights

    return params_from_weights(cfg, random_weights(cfg, seed))


def tiny_config(model_type: ModelType, quant: QuantType,
                **kw) -> ModelConfig:
    """A miniature but structurally-faithful config for unit tests."""
    defaults = dict(
        dim=64, hidden_dim=128, n_layers=3, n_heads=4, head_dim=16,
        n_kv_heads=2, vocab_size=512, seq_len=128, rms_norm_eps=1e-6,
        rope_theta=10000.0, quant=quant, group_size=32,
    )
    if model_type == ModelType.PHI:
        # phi's longrope needs head_dim/2 short factors; give a tiny table
        defaults["head_dim"] = 16
        kw.setdefault("rope_short_factor",
                      tuple(1.0 + 0.1 * i for i in range(8)))
    defaults.update(kw)
    return ModelConfig.make(model_type, **defaults)
