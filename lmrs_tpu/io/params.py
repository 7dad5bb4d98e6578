"""Build device TransformerParams from a .lmrs file or dense weights.

Layer tensors are stacked onto a leading (n_layers,) axis so the forward pass
can `lax.scan` over them; quantized tensors become QTensor pytrees whose q/s
arrays go to HBM as-is (int8/packed-int4 + f32 scales — same bytes as disk).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lmrs_tpu.config import ModelConfig, ModelType
from lmrs_tpu.io.lmrs import LmrsFile
from lmrs_tpu.models.transformer import LayerWeights, TransformerParams
from lmrs_tpu.ops.rope import rope_tables
from lmrs_tpu.quant import (QTensor, QuantType, q4_file_to_runtime_np,
                            quantize_q40_np, quantize_q80_np)


def _stack(arrs):
    return np.stack(arrs, axis=0)


from functools import partial as _partial


@_partial(jax.jit, donate_argnums=(0,))
def _q4_expand_device(q: jax.Array) -> jax.Array:
    """FILE-layout packed Q4 bytes → signed int8 values, on device.

    Bit-exact with the packed representation (values are nibble-8 ∈ [-8,7],
    scales unchanged), but stored one value per byte: 2x the HBM bytes for
    ~3x less in-kernel unpack arithmetic — the fast path's default, since
    the packed Q4 kernel is VPU-bound, not bandwidth-bound, on v5e."""
    u = q.astype(jnp.uint8)
    lo = (u & 0x0F).astype(jnp.int8) - 8
    hi = ((u >> 4) & 0x0F).astype(jnp.int8) - 8
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*q.shape[:-1], q.shape[-1] * 2)


@_partial(jax.jit, static_argnames=("group_size",), donate_argnums=(0,))
def _q4_repack_device(q: jax.Array, group_size: int) -> jax.Array:
    """File layout (adjacent pairs) → runtime layout (group halves), on
    device — the host-side numpy equivalent is q4_file_to_runtime_np, but a
    multi-GB repack runs orders faster on the accelerator."""
    u = q.astype(jnp.uint8)
    half = group_size // 2
    b = u.reshape(*u.shape[:-1], -1, half)       # (..., G, gs/2 bytes)
    lo = b & 0x0F                                 # even elements (+8)
    hi = (b >> 4) & 0x0F                          # odd elements (+8)
    vals = jnp.stack([lo, hi], axis=-1).reshape(*b.shape[:-1],
                                                group_size)  # natural order
    # XOR 0x80 bias — see quant.unpack_q4
    out = (vals[..., :half] | (vals[..., half:] << 4)) ^ 0x80
    return out.reshape(u.shape).astype(jnp.uint8)


def _qtensor(cfg: ModelConfig, q: np.ndarray, s: Optional[np.ndarray],
             out_f: int, in_f: int, sharding=None,
             file_layout: bool = True, q4_as_int8: bool = False) -> QTensor:
    put = (lambda a: jax.device_put(a, sharding)) if sharding else jnp.asarray
    if cfg.quant == QuantType.NONE:
        return QTensor(put(np.ascontiguousarray(q, np.float32)), None,
                       QuantType.NONE, cfg.group_size, out_f, in_f)
    if cfg.quant == QuantType.Q4_0 and q4_as_int8:
        # expand to signed int8 on device; downstream sees a Q8_0 tensor
        # with the Q4 scales — numerically identical, kernel-cheap
        assert file_layout, "expansion expects file-layout packed bytes"
        qd = _q4_expand_device(put(np.ascontiguousarray(q)))
        if sharding is not None:
            qd = jax.device_put(qd, sharding)
        return QTensor(qd, put(np.ascontiguousarray(s, np.float32)),
                       QuantType.Q8_0, cfg.group_size, out_f, in_f)
    if cfg.quant == QuantType.Q4_0 and file_layout:
        # repack adjacent-pair file bytes into the runtime group-half
        # layout ON DEVICE — host memory here can be orders of magnitude
        # slower than the accelerator (a jitted elementwise pass per shape)
        qd = _q4_repack_device(put(np.ascontiguousarray(q)),
                               cfg.group_size)
        if sharding is not None:
            qd = jax.device_put(qd, sharding)
    else:
        qd = put(np.ascontiguousarray(q))
    return QTensor(qd, put(np.ascontiguousarray(s, np.float32)),
                   cfg.quant, cfg.group_size, out_f, in_f)


def _quantize_dense(cfg: ModelConfig, w: np.ndarray):
    """Export-side quantization of a dense (out, in) float matrix."""
    if cfg.quant == QuantType.NONE:
        return w.astype(np.float32), None
    o, i = w.shape
    if cfg.quant == QuantType.Q8_0:
        q, s, _ = quantize_q80_np(w, cfg.group_size)
        return q.reshape(o, i), s.reshape(o, i // cfg.group_size)
    q, s, _ = quantize_q40_np(w, cfg.group_size)
    return q.reshape(o, i // 2), s.reshape(o, i // cfg.group_size)


def params_from_weights(cfg: ModelConfig, weights: Dict[str, np.ndarray],
                        shardings=None, stack_layers: bool = True,
                        fuse_qkv: bool = False,
                        fuse_ffn: bool = False,
                        q4_as_int8: bool = False) -> TransformerParams:
    """From dense float weights keyed by the .lmrs layout names."""
    qw: Dict[str, tuple] = {}
    for name, w in weights.items():
        base = name.split("@")[0]
        if base in ("embed", "wq", "wk", "wv", "wo", "w1", "w2", "w3",
                    "lm_head"):
            qw[name] = _quantize_dense(cfg, w)
        else:
            qw[name] = (w.astype(np.float32), None)
    return _assemble(cfg, qw, shardings, stack_layers=stack_layers,
                     fuse_qkv=fuse_qkv, fuse_ffn=fuse_ffn,
                     q4_as_int8=q4_as_int8)


def params_from_lmrs(f: LmrsFile, shardings=None, stack_layers: bool = True,
                     fuse_qkv: bool = False,
                     fuse_ffn: bool = False,
                     q4_as_int8: bool = False) -> TransformerParams:
    """From a parsed .lmrs file's zero-copy tensor views.

    stack_layers=False + fuse_qkv=True is the fast single-chip serving
    layout (unrolled layer loop, fused [q;k;v] and [gate;up] matmuls).
    """
    return _assemble(f.cfg, f.tensors, shardings, stack_layers=stack_layers,
                     fuse_qkv=fuse_qkv, fuse_ffn=fuse_ffn,
                     q4_as_int8=q4_as_int8)


def vision_params_from_lmrs(f: LmrsFile):
    """Build (VisionConfig, VisionParams, ProcessorConfig, ProcessorParams)
    from a multimodal .lmrs file's tensor views."""
    from lmrs_tpu.models.phi3v import ProcessorParams
    from lmrs_tpu.models.vision import VisionLayerWeights, VisionParams

    vc, pc = f.cfg_vision_processor()
    t = f.tensors
    L, D, H = vc.n_layers, vc.dim, vc.hidden_dim

    def vq(name, out_f, in_f):
        qs = _stack([t[f"v.{name}@{l}"][0] for l in range(L)])
        ss = None
        if vc.quant != QuantType.NONE:
            ss = _stack([t[f"v.{name}@{l}"][1] for l in range(L)])
        qt = QTensor(jnp.asarray(np.ascontiguousarray(qs)),
                     None if ss is None else jnp.asarray(
                         np.ascontiguousarray(ss, np.float32)),
                     vc.quant, vc.group_size, out_f, in_f)
        return qt

    def vf(name):
        return jnp.asarray(_stack([np.asarray(t[f"v.{name}@{l}"][0],
                                              np.float32)
                                   for l in range(L)]))

    layers = VisionLayerWeights(
        ln1_w=vf("ln1_w"), ln1_b=vf("ln1_b"),
        ln2_w=vf("ln2_w"), ln2_b=vf("ln2_b"),
        wq=vq("wq", D, D), wq_b=vf("wq_b"),
        wk=vq("wk", D, D), wk_b=vf("wk_b"),
        wv=vq("wv", D, D), wv_b=vf("wv_b"),
        wo=vq("wo", D, D), wo_b=vf("wo_b"),
        w1=vq("w1", H, D), w1_b=vf("w1_b"),
        w2=vq("w2", D, H), w2_b=vf("w2_b"),
    )
    vparams = VisionParams(
        class_embedding=jnp.asarray(np.asarray(t["v.class_embedding"][0],
                                               np.float32)),
        patch_embedding=jnp.asarray(np.asarray(t["v.patch_embedding"][0],
                                               np.float32)),
        position_embedding=jnp.asarray(np.asarray(
            t["v.position_embedding"][0], np.float32)),
        layers=layers,
        pre_ln_w=jnp.asarray(np.asarray(t["v.pre_ln_w"][0], np.float32)),
        pre_ln_b=jnp.asarray(np.asarray(t["v.pre_ln_b"][0], np.float32)),
    )

    def pq(name, out_f, in_f):
        q, s = t[f"p.{name}"]
        return QTensor(jnp.asarray(np.ascontiguousarray(q)),
                       None if s is None else jnp.asarray(
                           np.ascontiguousarray(s, np.float32).reshape(
                               out_f, in_f // pc.group_size)),
                       pc.quant, pc.group_size, out_f, in_f)

    pparams = ProcessorParams(
        glb_gn=jnp.asarray(np.asarray(t["p.glb_gn"][0], np.float32)),
        sub_gn=jnp.asarray(np.asarray(t["p.sub_gn"][0], np.float32)),
        proj0=pq("proj0", pc.text_dim, pc.hidden_dim),
        proj0_b=jnp.asarray(np.asarray(t["p.proj0_b"][0], np.float32)),
        proj1=pq("proj1", pc.text_dim, pc.text_dim),
        proj1_b=jnp.asarray(np.asarray(t["p.proj1_b"][0], np.float32)),
    )
    return vc, vparams, pc, pparams


def _assemble(cfg: ModelConfig, t: Dict[str, tuple],
              shardings=None, stack_layers: bool = True,
              fuse_qkv: bool = False,
              fuse_ffn: bool = False,
              q4_as_int8: bool = False) -> TransformerParams:
    sh = shardings or {}
    L, D, H = cfg.n_layers, cfg.dim, cfg.hidden_dim
    A, KV, V = cfg.att_dim, cfg.kv_dim, cfg.vocab_size
    gemma = cfg.model_type == ModelType.GEMMA

    def stacked_q(name, out_f, in_f):
        qs = _stack([t[f"{name}@{l}"][0] for l in range(L)])
        ss = None
        if cfg.quant != QuantType.NONE:
            ss = _stack([t[f"{name}@{l}"][1] for l in range(L)])
        return _qtensor(cfg, qs, ss, out_f, in_f, sh.get(name),
                        q4_as_int8=q4_as_int8)

    def stacked_f(name):
        arr = _stack([np.asarray(t[f"{name}@{l}"][0], np.float32)
                      for l in range(L)])
        return jax.device_put(arr, sh[name]) if name in sh else jnp.asarray(arr)

    def layer_q(name, l, out_f, in_f):
        q, s = t[f"{name}@{l}"]
        return _qtensor(cfg, np.asarray(q), None if s is None else
                        np.asarray(s), out_f, in_f, None,
                        q4_as_int8=q4_as_int8)

    def fused_q(names, l, out_f, in_f, row_perm=None):
        qs = np.concatenate([np.asarray(t[f"{n}@{l}"][0]) for n in names],
                            axis=0)
        ss = None
        if cfg.quant != QuantType.NONE:
            ss = np.concatenate([np.asarray(t[f"{n}@{l}"][1])
                                 for n in names], axis=0)
            if ss.ndim == 1:
                ss = ss.reshape(out_f, -1)
        if row_perm is not None:
            qs = np.ascontiguousarray(qs.reshape(out_f, -1)[row_perm])
            if ss is not None:
                ss = np.ascontiguousarray(ss[row_perm])
        return _qtensor(cfg, qs, ss, out_f, in_f, None,
                        q4_as_int8=q4_as_int8)

    def layer_f(name, l):
        return jnp.asarray(np.asarray(t[f"{name}@{l}"][0], np.float32))

    def stacked_fused_q(names, out_f, in_f, row_perm=None):
        qs, ss = [], []
        for l in range(L):
            q = np.concatenate([np.asarray(t[f"{n}@{l}"][0])
                                for n in names], axis=0)
            if row_perm is not None:
                q = q.reshape(out_f, -1)[row_perm]
            qs.append(q)
            if cfg.quant != QuantType.NONE:
                s = np.concatenate([np.asarray(t[f"{n}@{l}"][1])
                                    for n in names], axis=0)
                if s.ndim == 1:
                    s = s.reshape(out_f, -1)
                if row_perm is not None:
                    s = s[row_perm]
                ss.append(s)
        return _qtensor(cfg, _stack(qs), _stack(ss) if ss else None,
                        out_f, in_f, None, q4_as_int8=q4_as_int8)

    if stack_layers:
        if fuse_qkv:
            perm = None
            if fuse_ffn and cfg.quant == QuantType.Q4_0 and not q4_as_int8:
                from lmrs_tpu.kernels.fused_ffn import ffn_split_perm

                p = ffn_split_perm(H, cfg.group_size)
                perm = np.concatenate([p, H + p])
            wqkv_s = stacked_fused_q(("wq", "wk", "wv"), A + 2 * KV, D)
            w13_s = stacked_fused_q(("w1", "w3"), 2 * H, D, row_perm=perm)
            wq = wk = wv = w1 = w3 = None
        else:
            wqkv_s = w13_s = None
            wq = stacked_q("wq", A, D)
            wk = stacked_q("wk", KV, D)
            wv = stacked_q("wv", KV, D)
            w1 = stacked_q("w1", H, D)
            w3 = stacked_q("w3", H, D)
        layers = LayerWeights(
            att_norm=stacked_f("att_norm"),
            wq=wq,
            wk=wk,
            wv=wv,
            wo=stacked_q("wo", D, A),
            post_att_norm=stacked_f("post_att_norm"),
            pre_ffn_norm=stacked_f("pre_ffn_norm") if gemma else None,
            w1=w1,
            w2=stacked_q("w2", D, H),
            w3=w3,
            post_ffn_norm=stacked_f("post_ffn_norm") if gemma else None,
            wqkv=wqkv_s, w13=w13_s,
        )
    else:
        layers = []
        # Fused-FFN Q4 path: pre-permute [gate;up] output rows into W2's
        # group-half nibble order so the kernel's GLU scratch is already
        # split (kernels/fused_ffn.py `ffn_split_perm`); identical perm on
        # both halves keeps gate[i]*up[i] aligned.
        w13_perm = None
        if fuse_ffn and cfg.quant == QuantType.Q4_0 and not q4_as_int8:
            from lmrs_tpu.kernels.fused_ffn import ffn_split_perm

            p = ffn_split_perm(H, cfg.group_size)
            w13_perm = np.concatenate([p, H + p])
        for l in range(L):
            if fuse_qkv:
                wqkv = fused_q(("wq", "wk", "wv"), l, A + 2 * KV, D)
                w13 = fused_q(("w1", "w3"), l, 2 * H, D,
                              row_perm=w13_perm)
                wq = wk = wv = w1 = w3 = None
            else:
                wqkv = w13 = None
                wq = layer_q("wq", l, A, D)
                wk = layer_q("wk", l, KV, D)
                wv = layer_q("wv", l, KV, D)
                w1 = layer_q("w1", l, H, D)
                w3 = layer_q("w3", l, H, D)
            layers.append(LayerWeights(
                att_norm=layer_f("att_norm", l),
                wq=wq, wk=wk, wv=wv,
                wo=layer_q("wo", l, D, A),
                post_att_norm=layer_f("post_att_norm", l),
                pre_ffn_norm=layer_f("pre_ffn_norm", l) if gemma else None,
                w1=w1,
                w2=layer_q("w2", l, D, H),
                w3=w3,
                post_ffn_norm=layer_f("post_ffn_norm", l) if gemma else None,
                wqkv=wqkv, w13=w13,
            ))

    embed = _qtensor(cfg, t["embed"][0], t["embed"][1], V, D,
                     sh.get("embed"), q4_as_int8=q4_as_int8)
    lm_head = None
    if cfg.model_type == ModelType.PHI:
        lm_head = _qtensor(cfg, t["lm_head"][0], t["lm_head"][1], V, D,
                           sh.get("lm_head"), q4_as_int8=q4_as_int8)

    cos, sin = rope_tables(cfg)
    return TransformerParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.asarray(np.asarray(t["final_norm"][0], np.float32)),
        lm_head=lm_head,
        rope_cos=jnp.asarray(cos),
        rope_sin=jnp.asarray(sin),
    )
