"""Device mesh + tensor-parallel shardings.

The reference is single-process CPU with no distributed layer at all
(SURVEY.md §2); scaling there means rayon threads.  The TPU equivalent is a
`jax.sharding.Mesh` with named axes and `NamedSharding` annotations on the
weight/KV pytrees — XLA's GSPMD partitioner then inserts the collectives
(all-reduce after row-parallel matmuls, all-gather for the logits) over
ICI/DCN automatically.

Axis layout (Megatron-style, adapted to quantized weights):

  axis "tp"  — tensor parallel:
    wq/wk/wv, w1/w3   : column-parallel  — shard out_features (head dim)
    wo, w2            : row-parallel     — shard in_features (group axis of
                         the int8 q AND the f32 scales shard identically)
    embed / lm_head   : vocab-sharded (row-parallel classifier; the token
                         gather all-gathers one row, the logits matmul
                         all-gathers V/tp shards)
    KV cache          : shard n_kv_heads — attention is fully local per shard
  axis "dp"  — data parallel over independent sequences (batch axis of the
    serving layer; engine-level single streams replicate).

Every sharding falls back to replication when a dimension doesn't divide,
so arbitrary tp sizes are safe (just not maximally efficient).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmrs_tpu.config import ModelConfig
from lmrs_tpu.quant import QuantType


def make_mesh(tp: Optional[int] = None, dp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh; defaults to all devices on the tp axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // dp
    assert dp * tp <= n, f"dp*tp={dp * tp} > {n} devices"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _div(a: int, b: int) -> bool:
    return a % b == 0


def tp_param_shardings(cfg: ModelConfig, mesh: Mesh) -> Dict[str, NamedSharding]:
    """Per-tensor-name NamedShardings for io.params._assemble.

    Keys are layout base names; layer weights have a leading L axis.
    The q and s arrays of a QTensor shard with the same spec because both
    carry (out, in/…) layout — the group axis divides like the in axis as
    long as tp divides (in / group_size).
    """
    tp = mesh.shape["tp"]

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    col = ns(None, "tp", None)     # (L, out†, in)
    row = ns(None, None, "tp")     # (L, out, in†)
    rep3 = ns(None, None, None)
    rep2 = ns(None, None)

    q4 = cfg.quant == QuantType.Q4_0
    d_packed = cfg.dim // 2 if q4 else cfg.dim
    a_packed = cfg.att_dim // 2 if q4 else cfg.att_dim
    h_packed = cfg.hidden_dim // 2 if q4 else cfg.hidden_dim
    groups_d = cfg.dim // cfg.group_size
    groups_a = cfg.att_dim // cfg.group_size
    groups_h = cfg.hidden_dim // cfg.group_size

    out: Dict[str, NamedSharding] = {}
    # column-parallel: out axis must divide
    out["wq"] = col if _div(cfg.att_dim, tp) else rep3
    out["wk"] = col if _div(cfg.kv_dim, tp) else rep3
    out["wv"] = col if _div(cfg.kv_dim, tp) else rep3
    out["w1"] = col if _div(cfg.hidden_dim, tp) else rep3
    out["w3"] = col if _div(cfg.hidden_dim, tp) else rep3
    # row-parallel: packed in axis AND the scales' group axis must divide
    out["wo"] = row if (_div(a_packed, tp) and _div(groups_a, tp)) else rep3
    out["w2"] = row if (_div(h_packed, tp) and _div(groups_h, tp)) else rep3
    # vocab-sharded embedding/classifier
    vshard = ns("tp", None)
    out["embed"] = vshard if _div(cfg.vocab_size, tp) else rep2
    out["lm_head"] = vshard if _div(cfg.vocab_size, tp) else rep2
    # norms replicate
    for name in ("att_norm", "post_att_norm", "pre_ffn_norm",
                 "post_ffn_norm"):
        out[name] = ns(None, None)
    return out


def cache_sharding(cfg: ModelConfig, mesh: Mesh,
                   batch: bool = False) -> NamedSharding:
    """KV cache (L, S, KH*hd) sharded over the merged head-lane axis
    (contiguous per-head blocks); with a leading batch axis it also shards
    over dp."""
    tp = mesh.shape["tp"]
    kv_spec = "tp" if _div(cfg.n_kv_heads, tp) else None
    if batch:
        return NamedSharding(mesh, P("dp", None, None, kv_spec))
    return NamedSharding(mesh, P(None, None, kv_spec))
