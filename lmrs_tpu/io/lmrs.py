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
_VISION_HEADER_FMT = "<IIIIIfIIBI"  # reference: export.py:134-142
_PROCESSOR_HEADER_FMT = "<IIBI"     # reference: export.py:175-181
SECTION_HEADER_BYTES = 128
DEFAULT_MAX_SEQ_LEN = 32768


def _seq_len_cap(max_seq_len: Optional[int]) -> int:
    import os

    cap = max_seq_len if max_seq_len is not None else int(
        os.environ.get("LMRS_MAX_SEQ_LEN", str(DEFAULT_MAX_SEQ_LEN)))
    return cap if cap > 0 else (1 << 31)


def parse_header(data: memoryview,
                 max_seq_len: Optional[int] = None) -> Tuple[ModelConfig, int]:
    """Parse the 256-byte header; returns (config, version)."""
    magic, version = struct.unpack_from("<II", data, 0)
    if magic != MAGIC:
        raise ValueError("not an lm.rs model file (bad magic)")
    (dim, hidden_dim, n_layers, n_heads, head_dim, n_kv_heads, vocab_size,
     seq_len, rms_norm_eps, rope_theta, q_type, model_type, group_size,
     multimodal) = struct.unpack_from(_HEADER_FMT, data, 8)
    kw = {}
    if ModelType(model_type) == ModelType.PHI:
        # the longrope table is sized for Phi-3.5's head_dim=96; adapt for
        # other (e.g. test-scale) head dims
        from lmrs_tpu.config import PHI3_SHORT_FACTOR

        half = head_dim // 2
        sf = PHI3_SHORT_FACTOR[:half]
        kw["rope_short_factor"] = sf + (1.0,) * (half - len(sf))
    cfg = ModelConfig.make(
        ModelType(model_type),
        dim=dim, hidden_dim=hidden_dim, n_layers=n_layers, n_heads=n_heads,
        head_dim=head_dim, n_kv_heads=n_kv_heads, vocab_size=vocab_size,
        # The reference clamps seq_len to 8192 because its KV cache is
        # host-RAM f32 (src/transformer.rs:157-160).  On TPU the cache is
        # on-device bf16 and shardable, so the limit is only HBM-budget
        # policy: default cap 32768, overridable per call or via
        # LMRS_MAX_SEQ_LEN (0 = header value uncapped).
        seq_len=min(seq_len, _seq_len_cap(max_seq_len)),
        rms_norm_eps=rms_norm_eps, rope_theta=rope_theta,
        quant=QuantType(q_type), group_size=group_size,
        multimodal=bool(multimodal), **kw,
    )
    return cfg, version


def _vision_tensor_layout(vc) -> List[Tuple[str, Tuple[int, ...], bool]]:
    """Vision section tensor order (reference: src/vision.rs:112-204,
    export.py:150-170).  577 positions are hardcoded in the reference."""
    from lmrs_tpu.models.vision import N_POSITIONS

    L, D, H = vc.n_layers, vc.dim, vc.hidden_dim
    q = vc.quant != QuantType.NONE
    out: List[Tuple[str, Tuple[int, ...], bool]] = [
        ("v.class_embedding", (D,), False),
        ("v.patch_embedding", (D, 3 * vc.patch_size * vc.patch_size), False),
        ("v.position_embedding", (N_POSITIONS, D), False),
    ]
    for name in ("ln1_w", "ln1_b", "ln2_w", "ln2_b"):
        out += [(f"v.{name}@{l}", (D,), False) for l in range(L)]
    for name in ("wq", "wk", "wv", "wo"):
        out += [x for l in range(L) for x in
                ((f"v.{name}@{l}", (D, D), q),)]
        out += [(f"v.{name}_b@{l}", (D,), False) for l in range(L)]
    out += [(f"v.w1@{l}", (H, D), q) for l in range(L)]
    out += [(f"v.w1_b@{l}", (H,), False) for l in range(L)]
    out += [(f"v.w2@{l}", (D, H), q) for l in range(L)]
    out += [(f"v.w2_b@{l}", (D,), False) for l in range(L)]
    out += [("v.pre_ln_w", (D,), False), ("v.pre_ln_b", (D,), False)]
    return out


def _processor_tensor_layout(pc) -> List[Tuple[str, Tuple[int, ...], bool]]:
    """Processor section tensor order (reference: src/processor.rs:182-213,
    export.py:187-190)."""
    q = pc.quant != QuantType.NONE
    return [
        ("p.glb_gn", (pc.hidden_dim,), False),
        ("p.sub_gn", (pc.hidden_dim,), False),
        ("p.proj0", (pc.text_dim, pc.hidden_dim), q),
        ("p.proj1", (pc.text_dim, pc.text_dim), q),
        ("p.proj0_b", (pc.text_dim,), False),
        ("p.proj1_b", (pc.text_dim,), False),
    ]


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
               seq_len_header: Optional[int] = None,
               vision_cfg=None, processor_cfg=None) -> Dict[str, float]:
    """Serialize dense float weights to a .lmrs file, quantizing per cfg.quant.

    `weights` maps layout names ("embed", "wq@0", ...) to float arrays of the
    layout shapes; with cfg.multimodal also "v.*"/"p.*" vision/processor
    tensors.  Returns per-tensor max quantization group errors (the
    reference prints these at export, export.py:193-195).
    """
    errors: Dict[str, float] = {}

    def write_section(f, layout, quant, gs):
        for name, shape, quantized in layout:
            w = np.ascontiguousarray(weights[name], dtype=np.float32)
            assert w.shape == shape, (name, w.shape, shape)
            if not quantized:
                f.write(w.tobytes())
                continue
            if quant == QuantType.Q8_0:
                qv, s, err = quantize_q80_np(w, gs)
            else:
                qv, s, err = quantize_q40_np(w, gs)
            f.write(qv.tobytes())
            f.write(s.astype(np.float32).tobytes())
            errors[name] = err

    with open(path, "wb") as f:
        f.write(struct.pack("<II", MAGIC, VERSION))
        f.write(struct.pack(
            _HEADER_FMT, cfg.dim, cfg.hidden_dim, cfg.n_layers, cfg.n_heads,
            cfg.head_dim, cfg.n_kv_heads, cfg.vocab_size,
            seq_len_header or cfg.seq_len, cfg.rms_norm_eps, cfg.rope_theta,
            int(cfg.quant), int(cfg.model_type), cfg.group_size,
            int(cfg.multimodal)))
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
    return errors


class LmrsFile:
    """Zero-copy view of a .lmrs file's tensors (numpy memmap)."""

    def __init__(self, path: str, max_seq_len: Optional[int] = None):
        self.path = path
        self.data = np.memmap(path, dtype=np.uint8, mode="r")
        self.cfg, self.version = parse_header(
            memoryview(self.data[:HEADER_BYTES]), max_seq_len)
        self.tensors: Dict[str, Tuple[np.ndarray, Optional[np.ndarray]]] = {}
        self.vision_cfg = None
        self.processor_cfg = None
        self._offset = HEADER_BYTES
        self._index_text()
        if self.cfg.multimodal:
            self._index_vision()
            self._index_processor()

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

    def _index_vision(self):
        """Vision section: 37-byte header, data at +128
        (reference: src/vision.rs:99-108)."""
        from lmrs_tpu.models.vision import VisionConfig

        base = self._offset
        (dim, hidden, layers, heads, head_dim, eps, patch, img, qt,
         gs) = struct.unpack_from(_VISION_HEADER_FMT, self.data, base)
        self.vision_cfg = VisionConfig(
            dim=dim, hidden_dim=hidden, n_layers=layers, n_heads=heads,
            head_dim=head_dim, layernorm_eps=eps, patch_size=patch,
            image_size=img, quant=QuantType(qt), group_size=gs)
        self._offset = base + SECTION_HEADER_BYTES
        for name, shape, quantized in _vision_tensor_layout(self.vision_cfg):
            self.tensors[name] = self._read_tensor(shape, quantized,
                                                   QuantType(qt), gs)

    def _index_processor(self):
        """Processor section: 13-byte header, data at +128
        (reference: src/processor.rs:169-176)."""
        from lmrs_tpu.models.phi3v import ProcessorConfig

        base = self._offset
        hidden, text, qt, gs = struct.unpack_from(_PROCESSOR_HEADER_FMT,
                                                  self.data, base)
        self.processor_cfg = ProcessorConfig(
            hidden_dim=hidden, text_dim=text, quant=QuantType(qt),
            group_size=gs)
        self._offset = base + SECTION_HEADER_BYTES
        for name, shape, quantized in _processor_tensor_layout(
                self.processor_cfg):
            self.tensors[name] = self._read_tensor(shape, quantized,
                                                   QuantType(qt), gs)

    def cfg_vision_processor(self):
        if self.vision_cfg is None:
            raise ValueError("model file has no vision section")
        return self.vision_cfg, self.processor_cfg

    @property
    def text_end_offset(self) -> int:
        """Offset after text weights — start of the vision section if multimodal
        (reference: Transformer::new returns this offset, chat.rs:65-76)."""
        return self._offset


def read_lmrs(path: str, max_seq_len: Optional[int] = None) -> LmrsFile:
    return LmrsFile(path, max_seq_len)
