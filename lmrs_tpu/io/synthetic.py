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


def tiny_vision_config(quant: QuantType):
    """Miniature CLIP config (real CLIP-L/14-336 shapes scaled down; the 577
    position count scales with image/patch size)."""
    from lmrs_tpu.models.vision import VisionConfig

    return VisionConfig(dim=32, hidden_dim=64, n_layers=3, n_heads=2,
                        head_dim=16, layernorm_eps=1e-5, patch_size=14,
                        image_size=336, quant=quant, group_size=16)


def tiny_processor_config(quant: QuantType, text_dim: int):
    from lmrs_tpu.models.phi3v import ProcessorConfig

    return ProcessorConfig(hidden_dim=128, text_dim=text_dim, quant=quant,
                           group_size=16)


def random_multimodal_weights(cfg: ModelConfig, vcfg, pcfg,
                              seed: int = 0) -> Dict[str, np.ndarray]:
    """Text + vision + processor weights for a multimodal .lmrs file."""
    from lmrs_tpu.io.lmrs import (_processor_tensor_layout,
                                  _vision_tensor_layout)

    rng = np.random.default_rng(seed + 1)
    out = random_weights(cfg, seed)
    for name, shape, _ in (_vision_tensor_layout(vcfg)
                           + _processor_tensor_layout(pcfg)):
        std = 0.05 if ("ln" in name or "_b" in name) else 0.02
        out[name] = rng.normal(0.0, std, size=shape).astype(np.float32)
    return out


def write_synthetic_lmrs(path: str, cfg: ModelConfig, seed: int = 0,
                         scale: float = 0.02, log=None,
                         vision_cfg=None, processor_cfg=None) -> None:
    """Stream a full-size random model straight to a .lmrs file, one tensor
    at a time (a Gemma-2-9B's dense f32 weights are ~37 GB — never held in
    memory at once).  Used by the benchmark harness.  With cfg.multimodal
    and vision/processor configs, streams those sections too (full-scale
    Phi-3.5-vision bench substrate)."""
    import struct

    from lmrs_tpu.io.lmrs import (HEADER_BYTES, MAGIC, SECTION_HEADER_BYTES,
                                  VERSION, _HEADER_FMT,
                                  _PROCESSOR_HEADER_FMT, _VISION_HEADER_FMT,
                                  _processor_tensor_layout, _tensor_layout,
                                  _vision_tensor_layout)
    from lmrs_tpu.quant import quantize_q40_np, quantize_q80_np

    rng = np.random.default_rng(seed)

    # Large tensors are synthesized as TILED random pools written directly in
    # the on-disk quantized layout instead of generate-floats-then-quantize:
    # a benchmark substrate only needs byte-identical size/layout and sane
    # magnitudes, and the generate+quantize path is ~25 ns/value of
    # single-core numpy — a Gemma-2-9B would take hours on a 1-core host.
    # Small tensors (unit tests, norms) keep the exact rng path so golden
    # tests see fully independent values.
    POOL = 1 << 22            # 4M values per pool (>> any tensor row)
    FAST_MIN = 1 << 21        # tensors above 2M values use the pools
    pools: Dict[str, np.ndarray] = {}

    def pool(kind: str, quant, gs, std):
        # key only on the parameters the pool contents depend on: 'q' bytes
        # are uniform regardless of quant/gs/std, scales depend on
        # (quant, std), dense floats on std alone (ADVICE r3)
        if kind == "q":
            key = "q"
        elif kind == "s":
            key = f"s-{int(quant)}-{std}"
        else:
            key = f"f-{std}"
        if key not in pools:
            if kind == "q":       # raw quantized bytes (int8 or packed Q4)
                pools[key] = rng.integers(0, 256, size=POOL,
                                          dtype=np.uint8)
            elif kind == "s":     # per-group scales: |s| ~ std/qmax,
                # jittered 0.5–1.5x; Q4 export scales are negative
                # (absmax/-7.5, utils/quantization.py:15 in the reference)
                qmax = 127.0 if quant == QuantType.Q8_0 else 7.5
                sgn = -1.0 if quant == QuantType.Q4_0 else 1.0
                pools[key] = (sgn * (std / qmax)
                              * rng.uniform(0.5, 1.5, size=POOL)
                              ).astype(np.float32)
            else:                 # dense f32 values
                pools[key] = rng.uniform(-2.0 * std, 2.0 * std,
                                         size=POOL).astype(np.float32)
        return pools[key]

    def write_tiled(f, p: np.ndarray, n: int):
        reps, rem = divmod(n, p.size)
        data = memoryview(p)  # serialize once, not once per repetition
        for _ in range(reps):
            f.write(data)
        if rem:
            f.write(memoryview(p[:rem]))

    def write_section(f, layout, quant, gs, norm_key="norm"):
        for name, shape, quantized in layout:
            if log:
                log(f"synth {name} {shape}")
            std = 0.05 if (norm_key in name or "ln" in name
                           or name.endswith("_b")) else scale
            n = int(np.prod(shape))
            if n >= FAST_MIN:
                if quantized:
                    # keep parity with the slow path's quantize_q{80,40}_np
                    # assertions: a layout tensor violating them must fail
                    # loudly, not write truncated groups
                    assert n % gs == 0 and (
                        quant != QuantType.Q4_0 or n % 2 == 0), \
                        f"{name}: {n} values not groupable at gs={gs}"
                    nq = n if quant == QuantType.Q8_0 else n // 2
                    write_tiled(f, pool("q", quant, gs, std), nq)
                    write_tiled(f, pool("s", quant, gs, std), n // gs)
                else:
                    write_tiled(f, pool("f", None, gs, std), n)
                continue
            w = rng.normal(0.0, std, size=shape).astype(np.float32)
            if not quantized:
                f.write(w.tobytes())
                continue
            if quant == QuantType.Q8_0:
                q, s, _ = quantize_q80_np(w, gs)
            else:
                q, s, _ = quantize_q40_np(w, gs)
            del w
            f.write(q.tobytes())
            f.write(s.astype(np.float32).tobytes())

    with open(path, "wb") as f:
        f.write(struct.pack("<II", MAGIC, VERSION))
        f.write(struct.pack(
            _HEADER_FMT, cfg.dim, cfg.hidden_dim, cfg.n_layers, cfg.n_heads,
            cfg.head_dim, cfg.n_kv_heads, cfg.vocab_size, cfg.seq_len,
            cfg.rms_norm_eps, cfg.rope_theta, int(cfg.quant),
            int(cfg.model_type), cfg.group_size, int(cfg.multimodal)))
        f.write(b"\0" * (HEADER_BYTES - f.tell()))
        write_section(f, _tensor_layout(cfg), cfg.quant, cfg.group_size)

        if cfg.multimodal:
            assert vision_cfg is not None and processor_cfg is not None
            base = f.tell()
            f.write(struct.pack(
                _VISION_HEADER_FMT, vision_cfg.dim, vision_cfg.hidden_dim,
                vision_cfg.n_layers, vision_cfg.n_heads, vision_cfg.head_dim,
                vision_cfg.layernorm_eps, vision_cfg.patch_size,
                vision_cfg.image_size, int(vision_cfg.quant),
                vision_cfg.group_size))
            f.write(b"\0" * (base + SECTION_HEADER_BYTES - f.tell()))
            write_section(f, _vision_tensor_layout(vision_cfg),
                          vision_cfg.quant, vision_cfg.group_size)

            base = f.tell()
            f.write(struct.pack(
                _PROCESSOR_HEADER_FMT, processor_cfg.hidden_dim,
                processor_cfg.text_dim, int(processor_cfg.quant),
                processor_cfg.group_size))
            f.write(b"\0" * (base + SECTION_HEADER_BYTES - f.tell()))
            write_section(f, _processor_tensor_layout(processor_cfg),
                          processor_cfg.quant, processor_cfg.group_size)


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
