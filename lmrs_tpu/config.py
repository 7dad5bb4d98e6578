"""Model configuration for the three supported decoder families.

The reference encodes these hyperparameters in the `.lmrs` binary header
(reference: src/transformer.rs:57-74, export.py:53-84) and hardcodes several
per-family constants inside the forward pass (reference: src/transformer.rs:
443-495 RoPE variants, :516-526 Gemma attention softcap + sliding window,
:375-381 Gemma final logit softcap).  Here every one of those constants is an
explicit, documented config field.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Optional, Tuple


class ModelType(enum.IntEnum):
    """Decoder family (reference: src/transformer.rs:50-55, export.py:17)."""

    GEMMA = 0
    LLAMA = 1
    PHI = 2


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    """Llama-3 style RoPE frequency rescale (reference: src/transformer.rs:451-470)."""

    factor: float = 32.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_context_len: float = 8192.0


# Phi-3.5 "longrope" short factors for head_dim=96 (48 rotary pairs)
# (reference: src/transformer.rs:473).
PHI3_SHORT_FACTOR: Tuple[float, ...] = (
    1.08, 1.1, 1.1300000000000001, 1.2800000000000002, 1.3100000000000003,
    1.4500000000000004, 1.4500000000000004, 1.9500000000000008,
    2.030000000000001, 2.4299999999999926, 2.5699999999999896,
    2.9499999999999815, 3.729999999999965, 3.869999999999962,
    4.189999999999955, 4.43999999999995, 4.6399999999999455,
    4.979999999999938, 5.159999999999934, 5.279999999999932,
    5.759999999999922, 5.889999999999919, 5.889999999999919,
    5.969999999999917, 6.089999999999915, 6.2799999999999105,
    6.7699999999999, 6.8899999999998975, 7.109999999999893,
    7.129999999999892, 7.179999999999891, 7.289999999999889,
    7.339999999999888, 7.559999999999883, 7.619999999999882,
    7.69999999999988, 7.879999999999876, 7.879999999999876,
    7.879999999999876, 7.939999999999875, 7.949999999999875,
    7.979999999999874, 8.19999999999987, 8.439999999999864,
    8.469999999999864, 8.589999999999861, 8.809999999999857,
    8.999999999999853,
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static hyperparameters of a text decoder.

    Mirrors the `.lmrs` v4 header (reference: export.py:59-80); fields past
    `multimodal` are per-family constants the reference hardcodes.
    """

    model_type: ModelType
    dim: int
    hidden_dim: int
    n_layers: int
    n_heads: int
    head_dim: int
    n_kv_heads: int
    vocab_size: int
    seq_len: int
    rms_norm_eps: float
    rope_theta: float
    quant: "QuantType" = None  # set in __post_init__ if None
    group_size: int = 128
    multimodal: bool = False

    # --- per-family constants (defaults chosen by model_type helpers) ---
    # Gemma-2: attention logit softcap (reference: src/transformer.rs:518-522)
    attn_logit_softcap: Optional[float] = None
    # Gemma-2: final logit softcap (reference: src/transformer.rs:375-381)
    final_logit_softcap: Optional[float] = None
    # Gemma-2: sliding attention window (reference: src/transformer.rs:524-525)
    sliding_window: Optional[int] = None
    # Gemma-2: rmsnorm computes (1 + w) * x_hat (reference: src/functional.rs:68-69)
    norm_unit_offset: bool = False
    # Gemma-2: embeddings scaled by sqrt(dim) (reference: src/transformer.rs:326-332)
    embed_scale_by_sqrt_dim: bool = False
    # Llama-3 RoPE rescale (reference: src/transformer.rs:451-470)
    rope_scaling: Optional[RopeScaling] = None
    # Phi-3.5 longrope (reference: src/transformer.rs:472-478)
    rope_short_factor: Optional[Tuple[float, ...]] = None
    rope_attn_scale: float = 1.0
    # Phi has a separate lm_head; Gemma/Llama tie it to the embedding table
    # (reference: src/transformer.rs:345-373)
    tied_lm_head: bool = True
    # Quantized matmul implementation: "exact" = bit-parity integer path
    # (activation re-quantization like the reference), "fast" = fused Pallas
    # dequant-matmul kernels (the throughput path).
    matmul_impl: str = "exact"
    # Fuse the whole FFN ([gate;up] matmul -> GLU -> down matmul) into one
    # Pallas kernel per layer (kernels/fused_ffn.py).  Requires weights
    # loaded with the matching layout (params loader `fuse_ffn=True`, which
    # for Q4 pre-permutes w13 rows) and implies the fast bf16 numerics for
    # the FFN regardless of matmul_impl.
    fuse_ffn: bool = False
    # Replicate the reference bug that applies the Gemma final softcap only to
    # the first `dim` logits (reference: src/transformer.rs:375-381). Off by
    # default: we apply the softcap to ALL logits, which is what Gemma-2
    # actually specifies; flip on for bit-parity testing against lm.rs.
    parity_gemma_softcap_bug: bool = False
    # --- multi-chip (set on the LOCAL config a shard_map body runs with) ---
    # tp_axis: mesh axis name for tensor parallelism.  The forward pass then
    # expects Megatron-placed LOCAL weights (column-parallel fused wqkv/w13,
    # row-parallel wo/w2, vocab-sharded embed/lm_head, kv-head-sharded cache)
    # and inserts the psum/all_gather collectives itself — n_heads,
    # n_kv_heads and hidden_dim in this config must already be the LOCAL
    # (divided) values (see parallel.tp.local_config).
    tp_axis: Optional[str] = None
    # cp_axis: mesh axis name for context parallelism.  The KV cache's
    # sequence axis is sharded over it: cache writes land on the owning
    # shard (masked write) and attention merges across shards with an
    # online-softmax reduction (ops.attention.attention_cp).
    cp_axis: Optional[str] = None
    # cp_degree: static size of the cp axis (1 = no cp).  Prefill chunks
    # whose length divides by it run SEQUENCE-PARALLEL: each shard projects
    # its own T/cp token slice (q/k/v all_gathered for the cache write and
    # the attention_cp merge), so projection/FFN FLOPs shard over cp
    # instead of being replicated.
    cp_degree: int = 1

    def __post_init__(self):
        from lmrs_tpu.quant import QuantType  # local import to avoid cycle

        if self.quant is None:
            object.__setattr__(self, "quant", QuantType.NONE)

    # ---- derived sizes ----
    @property
    def att_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim

    @property
    def kv_group(self) -> int:
        return self.n_heads // self.n_kv_heads

    @property
    def attn_scale(self) -> float:
        # reference: src/transformer.rs:516 — score /= sqrt(head_size)
        return 1.0 / math.sqrt(self.head_dim)

    @property
    def cache_head_dim(self) -> int:
        """Runtime KV-cache head dim, padded so TPU vector lanes (128) tile
        it exactly.  Phi's head_dim=96 would otherwise force a padded-layout
        copy of the whole cache on every dynamic_update_slice (measured
        ~17x decode slowdown); zero-padded q/k/v add nothing to scores or
        outputs."""
        hd = self.head_dim
        if hd % 128 == 0 or 128 % hd == 0:
            return hd
        return ((hd + 127) // 128) * 128

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def family_defaults(model_type: ModelType) -> dict:
        """The per-family constants the reference hardcodes in its forward."""
        if model_type == ModelType.GEMMA:
            return dict(
                attn_logit_softcap=50.0,
                final_logit_softcap=30.0,
                sliding_window=4096,
                norm_unit_offset=True,
                embed_scale_by_sqrt_dim=True,
                tied_lm_head=True,
            )
        if model_type == ModelType.LLAMA:
            return dict(rope_scaling=RopeScaling(), tied_lm_head=True)
        if model_type == ModelType.PHI:
            return dict(
                rope_short_factor=PHI3_SHORT_FACTOR,
                # sqrt(1 + ln(131072/4096)/ln(4096))
                # (reference: src/transformer.rs:476-477)
                rope_attn_scale=math.sqrt(
                    1.0 + math.log(131072.0 / 4096.0) / math.log(4096.0)
                ),
                tied_lm_head=False,
            )
        raise ValueError(f"unknown model type {model_type}")

    @classmethod
    def make(cls, model_type: ModelType, **kw) -> "ModelConfig":
        """Build a config with the family constants filled in."""
        defaults = cls.family_defaults(model_type)
        defaults.update(kw)
        return cls(model_type=model_type, **defaults)


# ---------------------------------------------------------------------------
# Published configurations of the models the reference supports
# (hyperparameters from the models' HF config.json, the same values export.py
# packs into the .lmrs header).
# ---------------------------------------------------------------------------

def gemma2_2b(**kw) -> ModelConfig:
    return ModelConfig.make(
        ModelType.GEMMA, dim=2304, hidden_dim=9216, n_layers=26, n_heads=8,
        head_dim=256, n_kv_heads=4, vocab_size=256000, seq_len=8192,
        rms_norm_eps=1e-6, rope_theta=10000.0, **kw)


def gemma2_9b(**kw) -> ModelConfig:
    return ModelConfig.make(
        ModelType.GEMMA, dim=3584, hidden_dim=14336, n_layers=42, n_heads=16,
        head_dim=256, n_kv_heads=8, vocab_size=256000, seq_len=8192,
        rms_norm_eps=1e-6, rope_theta=10000.0, **kw)


def llama32_1b(**kw) -> ModelConfig:
    return ModelConfig.make(
        ModelType.LLAMA, dim=2048, hidden_dim=8192, n_layers=16, n_heads=32,
        head_dim=64, n_kv_heads=8, vocab_size=128256, seq_len=8192,
        rms_norm_eps=1e-5, rope_theta=500000.0, **kw)


def llama32_3b(**kw) -> ModelConfig:
    return ModelConfig.make(
        ModelType.LLAMA, dim=3072, hidden_dim=8192, n_layers=28, n_heads=24,
        head_dim=128, n_kv_heads=8, vocab_size=128256, seq_len=8192,
        rms_norm_eps=1e-5, rope_theta=500000.0, **kw)


def phi35_mini(**kw) -> ModelConfig:
    return ModelConfig.make(
        ModelType.PHI, dim=3072, hidden_dim=8192, n_layers=32, n_heads=32,
        head_dim=96, n_kv_heads=32, vocab_size=32064, seq_len=8192,
        rms_norm_eps=1e-5, rope_theta=10000.0, **kw)


def phi35_vision(**kw) -> ModelConfig:
    """Phi-3.5-vision: the mini text backbone + CLIP ViT-L/14-336 encoder
    (reference README.md:41; vision header values src/vision.rs:11-24)."""
    kw.setdefault("multimodal", True)
    return phi35_mini(**kw)


def phi35_vision_aux(quant, group_size: int = 128):
    """Full-size vision + processor configs matching the reference's
    Phi-3.5-vision export (CLIP-L dims, 4x-merged processor)."""
    from lmrs_tpu.models.phi3v import ProcessorConfig
    from lmrs_tpu.models.vision import VisionConfig

    return (VisionConfig(dim=1024, hidden_dim=4096, n_layers=24, n_heads=16,
                         head_dim=64, layernorm_eps=1e-5, patch_size=14,
                         image_size=336, quant=quant, group_size=group_size),
            ProcessorConfig(hidden_dim=4096, text_dim=3072, quant=quant,
                            group_size=group_size))


def tiny_llama(**kw) -> ModelConfig:
    """Small synthetic config for CPU-mesh smoke runs of the full product
    surface (bench.py / backend with LMRS_BENCH_CONFIG=tiny-llama) — not a
    published model."""
    kw.setdefault("group_size", 32)
    return ModelConfig.make(
        ModelType.LLAMA, dim=256, hidden_dim=512, n_layers=4, n_heads=8,
        head_dim=32, n_kv_heads=4, vocab_size=2048, seq_len=512,
        rms_norm_eps=1e-5, rope_theta=500000.0, **kw)


def tiny_gemma(**kw) -> ModelConfig:
    kw.setdefault("group_size", 32)
    return ModelConfig.make(
        ModelType.GEMMA, dim=256, hidden_dim=512, n_layers=4, n_heads=8,
        head_dim=32, n_kv_heads=4, vocab_size=2048, seq_len=512,
        rms_norm_eps=1e-6, rope_theta=10000.0, **kw)


def tiny_flash(**kw) -> ModelConfig:
    """Tiny config whose head_dim is flash-kernel-eligible (lane-aligned
    128): CPU-mesh smoke runs of the flash / paged-KV product surface
    (LMRS_BENCH_CONFIG=tiny-flash LMRS_BENCH_POOL=...)."""
    kw.setdefault("group_size", 32)
    return ModelConfig.make(
        ModelType.GEMMA, dim=256, hidden_dim=512, n_layers=2, n_heads=4,
        head_dim=128, n_kv_heads=2, vocab_size=2048, seq_len=512,
        rms_norm_eps=1e-6, rope_theta=10000.0, **kw)


PRESETS = {
    "gemma2-2b": gemma2_2b,
    "gemma2-9b": gemma2_9b,
    "llama3.2-1b": llama32_1b,
    "llama3.2-3b": llama32_3b,
    "phi3.5-mini": phi35_mini,
    "phi3.5-vision": phi35_vision,
    "tiny-llama": tiny_llama,
    "tiny-gemma": tiny_gemma,
    "tiny-flash": tiny_flash,
}
