"""`.lmrs` v4 single-file model format — reader and writer.

Format (reference: export.py:51-125, src/transformer.rs:134-314):

    offset 0:   magic  u32 = 0x73726d6c ("lmrs" little-endian)
    offset 4:   version u32 (= 4)
    offset 8:   packed header: dim, hidden_dim, n_layers, n_heads, head_dim,
                n_kv_heads, vocab_size, seq_len (u32 x8); rms_norm_eps,
                rope_theta (f32 x2); q_type, model_type (u8 x2);
                group_size (u32); multimodal (u8)      [47 bytes]
    offset 256: tensor data in fixed order (see _tensor_layout below).

Quantized tensors are stored per-tensor as [int8 q-bytes][f32 scales]
(reference: src/transformer.rs:24-48); Q4_0 packs two values per byte so its
q-bytes section is size/2.  Float tensors are raw little-endian f32.

The reader memory-maps the file and returns zero-copy numpy views; the
param-building step in lmrs_tpu.runtime.engine turns them into device arrays
(that transfer is the only copy).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from lmrs_tpu.config import ModelConfig, ModelType
from lmrs_tpu.quant import QuantType, quantize_q40_np, quantize_q80_np

MAGIC = 0x73726D6C
VERSION = 4
HEADER_BYTES = 256
_HEADER_FMT = "<IIIIIIIIffBBIB"  # after magic+version


def parse_header(data: memoryview) -> Tuple[ModelConfig, int]:
    """Parse the 256-byte header; returns (config, version)."""
    magic, version = struct.unpack_from("<II", data, 0)
    if magic != MAGIC:
        raise ValueError("not an lm.rs model file (bad magic)")
    (dim, hidden_dim, n_layers, n_heads, head_dim, n_kv_heads, vocab_size,
     seq_len, rms_norm_eps, rope_theta, q_type, model_type, group_size,
     multimodal) = struct.unpack_from(_HEADER_FMT, data, 8)
    cfg = ModelConfig.make(
        ModelType(model_type),
        dim=dim, hidden_dim=hidden_dim, n_layers=n_layers, n_heads=n_heads,
        head_dim=head_dim, n_kv_heads=n_kv_heads, vocab_size=vocab_size,
        # the reference clamps its host-RAM f32 cache to 8192
        # (src/transformer.rs:157-160); we keep the same default limit.
        seq_len=min(seq_len, 8192),
        rms_norm_eps=rms_norm_eps, rope_theta=rope_theta,
        quant=QuantType(q_type), group_size=group_size,
        multimodal=bool(multimodal),
    )
    return cfg, version


def _tensor_layout(cfg: ModelConfig) -> List[Tuple[str, Tuple[int, ...], bool]]:
    """(name, shape, quantized?) in file order (reference: export.py:87-125,
    src/transformer.rs:169-270).  Per-layer tensors appear as name@l."""
    L, D, H = cfg.n_layers, cfg.dim, cfg.hidden_dim
    A, KV, V = cfg.att_dim, cfg.kv_dim, cfg.vocab_size
    q = cfg.quant != QuantType.NONE
    gemma = cfg.model_type == ModelType.GEMMA
    phi = cfg.model_type == ModelType.PHI

    out: List[Tuple[str, Tuple[int, ...], bool]] = []
    out.append(("embed", (V, D), q))
    out += [(f"att_norm@{l}", (D,), False) for l in range(L)]
    for name, shape in (("wq", (A, D)), ("wk", (KV, D)), ("wv", (KV, D)),
                        ("wo", (D, A))):
        out += [(f"{name}@{l}", shape, q) for l in range(L)]
    out += [(f"post_att_norm@{l}", (D,), False) for l in range(L)]
    if gemma:
        out += [(f"pre_ffn_norm@{l}", (D,), False) for l in range(L)]
    for name, shape in (("w1", (H, D)), ("w2", (D, H)), ("w3", (H, D))):
        out += [(f"{name}@{l}", shape, q) for l in range(L)]
    if gemma:
        out += [(f"post_ffn_norm@{l}", (D,), False) for l in range(L)]
    out.append(("final_norm", (D,), False))
    if phi:
        out.append(("lm_head", (V, D), q))
    return out


def write_lmrs(path: str, cfg: ModelConfig, weights: Dict[str, np.ndarray],
               seq_len_header: Optional[int] = None) -> Dict[str, float]:
    """Serialize dense float weights to a .lmrs file, quantizing per cfg.quant.

    `weights` maps layout names ("embed", "wq@0", ...) to float arrays of the
    layout shapes.  Returns per-tensor max quantization group errors (the
    reference prints these at export, export.py:193-195).
    """
    errors: Dict[str, float] = {}
    with open(path, "wb") as f:
        f.write(struct.pack("<II", MAGIC, VERSION))
        f.write(struct.pack(
            _HEADER_FMT, cfg.dim, cfg.hidden_dim, cfg.n_layers, cfg.n_heads,
            cfg.head_dim, cfg.n_kv_heads, cfg.vocab_size,
            seq_len_header or cfg.seq_len, cfg.rms_norm_eps, cfg.rope_theta,
            int(cfg.quant), int(cfg.model_type), cfg.group_size,
            int(cfg.multimodal)))
        f.write(b"\0" * (HEADER_BYTES - f.tell()))
        for name, shape, quantized in _tensor_layout(cfg):
            w = np.ascontiguousarray(weights[name], dtype=np.float32)
            assert w.shape == shape, (name, w.shape, shape)
            if not quantized:
                f.write(w.tobytes())
                continue
            if cfg.quant == QuantType.Q8_0:
                qv, s, err = quantize_q80_np(w, cfg.group_size)
            else:
                qv, s, err = quantize_q40_np(w, cfg.group_size)
            f.write(qv.tobytes())
            f.write(s.astype(np.float32).tobytes())
            errors[name] = err
    return errors


class LmrsFile:
    """Zero-copy view of a .lmrs file's tensors (numpy memmap)."""

    def __init__(self, path: str):
        self.path = path
        self.data = np.memmap(path, dtype=np.uint8, mode="r")
        self.cfg, self.version = parse_header(memoryview(self.data[:HEADER_BYTES]))
        self.tensors: Dict[str, Tuple[np.ndarray, Optional[np.ndarray]]] = {}
        self._offset = HEADER_BYTES
        self._index_text()

    def _take(self, nbytes: int) -> np.ndarray:
        view = self.data[self._offset:self._offset + nbytes]
        if view.size != nbytes:
            raise ValueError(f"file truncated at offset {self._offset}")
        self._offset += nbytes
        return view

    def _read_tensor(self, shape, quantized: bool, qtype: QuantType, gs: int):
        n = int(np.prod(shape))
        if not quantized:
            arr = self._take(n * 4).view(np.float32).reshape(shape)
            return arr, None
        qbytes = n // 2 if qtype == QuantType.Q4_0 else n
        q = self._take(qbytes)
        q = q.view(np.uint8) if qtype == QuantType.Q4_0 else q.view(np.int8)
        s = self._take((n // gs) * 4).view(np.float32)
        if len(shape) == 2:
            q = q.reshape(shape[0], -1)
            s = s.reshape(shape[0], shape[1] // gs)
        return q, s

    def _index_text(self):
        cfg = self.cfg
        for name, shape, quantized in _tensor_layout(cfg):
            self.tensors[name] = self._read_tensor(
                shape, quantized, cfg.quant, cfg.group_size)

    @property
    def text_end_offset(self) -> int:
        """Offset after text weights — start of the vision section if multimodal
        (reference: Transformer::new returns this offset, chat.rs:65-76)."""
        return self._offset


def read_lmrs(path: str) -> LmrsFile:
    return LmrsFile(path)
