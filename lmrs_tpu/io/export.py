"""HF safetensors → .lmrs converter (reference: export.py:16-199).

Same CLI surface and byte-identical output semantics as the reference
exporter: the fixed tensor order, Phi fused-tensor splitting (qkv thirds,
gate_up halves), group-size backoff, Q8_0 (absmax/127) and Q4_0
(absmax/-7.5, +8 offset, lo|hi<<4 nibble pack) quantization with per-group
max-error reporting, and the multimodal vision/processor sections.

Usage:
    python -m lmrs_tpu.io.export --files model-*.safetensors \
        --config config.json --save-path out --type GEMMA \
        [--quantize] [--quantize-type 1|2] [--group-size 128] \
        [--vision-config config.json]

numpy-only (safetensors' numpy interface); torch is not required.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from typing import Dict, List, Optional

import numpy as np

from lmrs_tpu.config import ModelConfig, ModelType
from lmrs_tpu.quant import QuantType


def _extract_layer_number(key: str) -> int:
    """reference: utils/general.py:1-6."""
    parts = key.split(".")
    for i, part in enumerate(parts):
        if part == "layers":
            return int(parts[i + 1])
    return 0


class SafetensorsSource:
    """Lazy multi-file safetensors reader.

    Uses the torch framework (like the reference, utils/io.py:7-19) because
    real checkpoints are bfloat16, which numpy cannot represent.
    """

    def __init__(self, paths: List[str]):
        from safetensors import safe_open

        self.handles = [safe_open(p, framework="pt", device="cpu")
                        for p in paths]

    def keys(self) -> List[str]:
        out = []
        for h in self.handles:
            out.extend(h.keys())
        return out

    def collect(self, pattern: str, m_type: str = "model.layers",
                splits: int = 0, split_idx: int = -1) -> List[np.ndarray]:
        """All tensors matching both substrings, in layer order, optionally
        taking one split (reference: utils/io.py:21-40)."""
        import torch

        out = []
        for h in self.handles:
            keys = [k for k in h.keys() if pattern in k and m_type in k]
            for key in sorted(keys, key=_extract_layer_number):
                w = h.get_tensor(key)
                if splits > 0:
                    size = w.shape[0] // splits
                    w = w[split_idx * size:(split_idx + 1) * size]
                out.append(np.ascontiguousarray(
                    w.to(torch.float32).numpy(), np.float32))
        return out


def gather_weights(src: SafetensorsSource, model_type: ModelType,
                   n_layers: int) -> Dict[str, np.ndarray]:
    """Collect text weights into our layout names, replicating the
    reference's tensor selection (reference: export.py:87-125)."""
    w: Dict[str, np.ndarray] = {}
    w["embed"] = src.collect("model.embed_tokens.weight", m_type="")[0]

    def per_layer(name, arrs):
        assert len(arrs) == n_layers, (name, len(arrs), n_layers)
        for l, a in enumerate(arrs):
            w[f"{name}@{l}"] = a

    per_layer("att_norm", src.collect("input_layernorm"))
    if model_type == ModelType.PHI:
        per_layer("wq", src.collect("self_attn.qkv_proj", splits=3, split_idx=0))
        per_layer("wk", src.collect("self_attn.qkv_proj", splits=3, split_idx=1))
        per_layer("wv", src.collect("self_attn.qkv_proj", splits=3, split_idx=2))
    else:
        per_layer("wq", src.collect("self_attn.q_proj"))
        per_layer("wk", src.collect("self_attn.k_proj"))
        per_layer("wv", src.collect("self_attn.v_proj"))
    per_layer("wo", src.collect("self_attn.o_proj"))
    per_layer("post_att_norm", src.collect("post_attention_layernorm"))
    if model_type == ModelType.GEMMA:
        per_layer("pre_ffn_norm", src.collect("pre_feedforward_layernorm"))
    if model_type == ModelType.PHI:
        per_layer("w1", src.collect("mlp.gate_up_proj", splits=2, split_idx=0))
        per_layer("w2", src.collect("mlp.down_proj"))
        per_layer("w3", src.collect("mlp.gate_up_proj", splits=2, split_idx=1))
    else:
        per_layer("w1", src.collect("mlp.gate_proj"))
        per_layer("w2", src.collect("mlp.down_proj"))
        per_layer("w3", src.collect("mlp.up_proj"))
    if model_type == ModelType.GEMMA:
        per_layer("post_ffn_norm", src.collect("post_feedforward_layernorm"))
    w["final_norm"] = src.collect("model.norm.weight", m_type="")[0]
    if model_type == ModelType.PHI:
        w["lm_head"] = src.collect("lm_head.weight", m_type="")[0]
    return w


def gather_vision_weights(src: SafetensorsSource, n_layers: int,
                          text_dim: int) -> Dict[str, np.ndarray]:
    """Vision + processor tensors (reference: export.py:150-190)."""
    V = "model.vision_embed_tokens"
    w: Dict[str, np.ndarray] = {}
    w["v.class_embedding"] = src.collect("class_embedding", m_type=V)[0]
    pe = src.collect("patch_embedding.weight", m_type=V)[0]
    w["v.patch_embedding"] = pe.reshape(pe.shape[0], -1)
    w["v.position_embedding"] = src.collect("position_embedding.weight",
                                            m_type=V)[0]

    def per_layer(name, arrs):
        for l, a in enumerate(arrs):
            w[f"v.{name}@{l}"] = a

    per_layer("ln1_w", src.collect("layer_norm1.weight", m_type=V))
    per_layer("ln1_b", src.collect("layer_norm1.bias", m_type=V))
    per_layer("ln2_w", src.collect("layer_norm2.weight", m_type=V))
    per_layer("ln2_b", src.collect("layer_norm2.bias", m_type=V))
    per_layer("wq", src.collect("self_attn.q_proj.weight", m_type=V))
    per_layer("wq_b", src.collect("self_attn.q_proj.bias", m_type=V))
    per_layer("wk", src.collect("self_attn.k_proj.weight", m_type=V))
    per_layer("wk_b", src.collect("self_attn.k_proj.bias", m_type=V))
    per_layer("wv", src.collect("self_attn.v_proj.weight", m_type=V))
    per_layer("wv_b", src.collect("self_attn.v_proj.bias", m_type=V))
    per_layer("wo", src.collect("self_attn.out_proj.weight", m_type=V))
    per_layer("wo_b", src.collect("self_attn.out_proj.bias", m_type=V))
    per_layer("w1", src.collect("mlp.fc1.weight", m_type=V))
    per_layer("w1_b", src.collect("mlp.fc1.bias", m_type=V))
    per_layer("w2", src.collect("mlp.fc2.weight", m_type=V))
    per_layer("w2_b", src.collect("mlp.fc2.bias", m_type=V))
    w["v.pre_ln_w"] = src.collect("pre_layrnorm.weight", m_type=V)[0]
    w["v.pre_ln_b"] = src.collect("pre_layrnorm.bias", m_type=V)[0]

    w["p.glb_gn"] = src.collect("glb_GN", m_type=V)[0].reshape(-1)
    w["p.sub_gn"] = src.collect("sub_GN", m_type=V)[0].reshape(-1)
    projs = src.collect("img_projection", m_type="weight")
    w["p.proj0"], w["p.proj1"] = projs[0], projs[1]
    biases = src.collect("img_projection", m_type="bias")
    w["p.proj0_b"], w["p.proj1_b"] = biases[0], biases[1]
    return w


def export(files: List[str], config: str, save_path: str, model_type: str,
           quantize: bool = False, quantize_type: int = 1,
           group_size: int = 128,
           vision_config: Optional[str] = None) -> str:
    from lmrs_tpu.io.lmrs import write_lmrs
    from lmrs_tpu.models.phi3v import ProcessorConfig
    from lmrs_tpu.models.vision import VisionConfig

    mt = ModelType[model_type.upper()]
    if vision_config and mt != ModelType.PHI:
        sys.exit("Error: --vision-config can only be used when --type is PHI.")

    with open(config) as f:
        cfg_json = json.load(f)

    qt = QuantType(quantize_type if quantize else 0)
    head_dim = cfg_json.get(
        "head_dim",
        cfg_json["hidden_size"] // cfg_json["num_attention_heads"])

    src = SafetensorsSource(files)

    if quantize:
        dim = cfg_json["hidden_size"]
        while dim % group_size != 0:
            group_size //= 2
            print(f"BACKOFF: reducing group size to {group_size} to fit"
                  " hidden_dim")

    cfg = ModelConfig.make(
        mt, dim=cfg_json["hidden_size"],
        hidden_dim=cfg_json["intermediate_size"],
        n_layers=cfg_json["num_hidden_layers"],
        n_heads=cfg_json["num_attention_heads"], head_dim=head_dim,
        n_kv_heads=cfg_json["num_key_value_heads"],
        vocab_size=cfg_json["vocab_size"],
        seq_len=cfg_json["max_position_embeddings"],
        rms_norm_eps=cfg_json["rms_norm_eps"],
        rope_theta=cfg_json["rope_theta"], quant=qt, group_size=group_size,
        multimodal=bool(vision_config))

    weights = gather_weights(src, mt, cfg.n_layers)
    vcfg = pcfg = None
    if vision_config:
        with open(vision_config) as f:
            vis_json = json.load(f)["vision_config"]
        vcfg = VisionConfig(
            dim=vis_json["hidden_size"],
            hidden_dim=vis_json["intermediate_size"],
            n_layers=vis_json["num_hidden_layers"],
            n_heads=vis_json["num_attention_heads"],
            head_dim=vis_json["hidden_size"] // vis_json["num_attention_heads"],
            layernorm_eps=vis_json["layer_norm_eps"],
            patch_size=vis_json["patch_size"],
            image_size=vis_json["image_size"], quant=qt,
            group_size=group_size)
        pcfg = ProcessorConfig(hidden_dim=vis_json["intermediate_size"],
                               text_dim=cfg_json["hidden_size"], quant=qt,
                               group_size=group_size)
        weights.update(gather_vision_weights(src, vcfg.n_layers, cfg.dim))

    out_path = f"{save_path}.lmrs"
    errors = write_lmrs(out_path, cfg, weights,
                        seq_len_header=cfg_json["max_position_embeddings"],
                        vision_cfg=vcfg, processor_cfg=pcfg)
    if quantize and errors:
        ew = sorted(errors.values(), reverse=True)
        print(f"Max quantization group error across all weights: {ew[0]}."
              f" Mean: {sum(ew) / len(ew)}.")
    print(f"Successfully converted {model_type} model to lmrs format.")
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export safetensors model to lm.rs format.")
    p.add_argument("--files", nargs="+", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--save-path", required=True)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--quantize-type", type=int, default=1,
                   help="1 = Q8_0, 2 = Q4_0")
    p.add_argument("--group-size", type=int, default=128)
    p.add_argument("--type", required=True, choices=["GEMMA", "LLAMA", "PHI"])
    p.add_argument("--vision-config")
    args = p.parse_args(argv)
    if args.quantize:
        assert args.quantize_type in (1, 2)
    export(args.files, args.config, args.save_path, args.type,
           args.quantize, args.quantize_type, args.group_size,
           args.vision_config)


if __name__ == "__main__":
    main()
