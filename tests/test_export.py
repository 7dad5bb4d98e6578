"""HF safetensors → .lmrs exporter: fake-checkpoint roundtrip per family."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.export import export
from lmrs_tpu.io.lmrs import read_lmrs
from lmrs_tpu.io.params import params_from_lmrs, params_from_weights
from lmrs_tpu.io.synthetic import tiny_config
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine

RNG = np.random.default_rng(21)


def make_fake_checkpoint(tmp_path, cfg, family: str):
    """Build a HF-style safetensors file + config.json for a tiny model.
    Returns (st_path, config_path, our-layout weights dict)."""
    D, H, A, KV, V = (cfg.dim, cfg.hidden_dim, cfg.att_dim, cfg.kv_dim,
                      cfg.vocab_size)
    t = {}
    ours = {}

    def add(hf_name, our_name, shape):
        w = RNG.normal(0, 0.02, shape).astype(np.float32)
        t[hf_name] = torch.from_numpy(w).to(torch.bfloat16)
        # exporter converts bf16→f32; mirror that in the expected weights
        ours[our_name] = t[hf_name].to(torch.float32).numpy()

    add("model.embed_tokens.weight", "embed", (V, D))
    for l in range(cfg.n_layers):
        p = f"model.layers.{l}"
        add(f"{p}.input_layernorm.weight", f"att_norm@{l}", (D,))
        if family == "PHI":
            qkv = RNG.normal(0, 0.02, (A + 2 * KV, D)).astype(np.float32)
            t[f"{p}.self_attn.qkv_proj.weight"] = torch.from_numpy(
                qkv).to(torch.bfloat16)
            f32 = t[f"{p}.self_attn.qkv_proj.weight"].to(torch.float32).numpy()
            third = f32.shape[0] // 3
            ours[f"wq@{l}"] = f32[:third]
            ours[f"wk@{l}"] = f32[third:2 * third]
            ours[f"wv@{l}"] = f32[2 * third:]
            gu = RNG.normal(0, 0.02, (2 * H, D)).astype(np.float32)
            t[f"{p}.mlp.gate_up_proj.weight"] = torch.from_numpy(
                gu).to(torch.bfloat16)
            f32g = t[f"{p}.mlp.gate_up_proj.weight"].to(torch.float32).numpy()
            ours[f"w1@{l}"] = f32g[:H]
            ours[f"w3@{l}"] = f32g[H:]
        else:
            add(f"{p}.self_attn.q_proj.weight", f"wq@{l}", (A, D))
            add(f"{p}.self_attn.k_proj.weight", f"wk@{l}", (KV, D))
            add(f"{p}.self_attn.v_proj.weight", f"wv@{l}", (KV, D))
            add(f"{p}.mlp.gate_proj.weight", f"w1@{l}", (H, D))
            add(f"{p}.mlp.up_proj.weight", f"w3@{l}", (H, D))
        add(f"{p}.self_attn.o_proj.weight", f"wo@{l}", (D, A))
        add(f"{p}.mlp.down_proj.weight", f"w2@{l}", (D, H))
        add(f"{p}.post_attention_layernorm.weight", f"post_att_norm@{l}",
            (D,))
        if family == "GEMMA":
            add(f"{p}.pre_feedforward_layernorm.weight", f"pre_ffn_norm@{l}",
                (D,))
            add(f"{p}.post_feedforward_layernorm.weight",
                f"post_ffn_norm@{l}", (D,))
    add("model.norm.weight", "final_norm", (D,))
    if family == "PHI":
        add("lm_head.weight", "lm_head", (V, D))

    st_path = str(tmp_path / "model.safetensors")
    save_file(t, st_path)
    config = dict(
        hidden_size=D, intermediate_size=H, num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads, head_dim=cfg.head_dim,
        num_key_value_heads=cfg.n_kv_heads, vocab_size=V,
        max_position_embeddings=cfg.seq_len, rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta)
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    return st_path, cfg_path, ours


@pytest.mark.parametrize("family", ["GEMMA", "LLAMA", "PHI"])
def test_export_roundtrip(tmp_path, family):
    kw = {}
    if family == "PHI":
        # Phi's fused qkv_proj splits into equal thirds, which requires
        # n_kv_heads == n_heads (true for Phi-3.5-mini/vision)
        kw["n_kv_heads"] = 4
    cfg = tiny_config(ModelType[family], QuantType.Q8_0, **kw)
    st, cj, ours = make_fake_checkpoint(tmp_path, cfg, family)
    out = export([st], cj, str(tmp_path / "model"), family, quantize=True,
                 quantize_type=1, group_size=cfg.group_size)

    f = read_lmrs(out)
    assert f.cfg.model_type == ModelType[family]
    assert f.cfg.quant == QuantType.Q8_0

    # logits from the exported file must equal logits from direct weights
    e_file = Engine(f.cfg, params_from_lmrs(f), cache_dtype=jnp.float32,
                    min_attn_bucket=32, prefill_chunk=8)
    cfg2 = f.cfg  # header-derived config (identical hyperparams)
    e_mem = Engine(cfg2, params_from_weights(cfg2, ours),
                   cache_dtype=jnp.float32, min_attn_bucket=32,
                   prefill_chunk=8)
    l1 = np.asarray(e_file.prefill([3, 7, 11]))
    l2 = np.asarray(e_mem.prefill([3, 7, 11]))
    np.testing.assert_array_equal(l1, l2)


def test_group_size_backoff(tmp_path, capsys):
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0)  # dim=64
    st, cj, _ = make_fake_checkpoint(tmp_path, cfg, "LLAMA")
    export([st], cj, str(tmp_path / "m"), "LLAMA", quantize=True,
           quantize_type=1, group_size=96)  # 96 ∤ 64 → backoff to 48? → 24...
    out = capsys.readouterr().out
    assert "BACKOFF" in out
    f = read_lmrs(str(tmp_path / "m.lmrs"))
    assert cfg.dim % f.cfg.group_size == 0
