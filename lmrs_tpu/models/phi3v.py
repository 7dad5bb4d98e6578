"""Phi-3.5-vision image processor + projector (the "HD transform").

Re-implementation of the reference processor (reference: src/processor.rs:
1-497): host-side image ops in numpy/PIL (resize/pad/crop/normalize/patch
extraction — these run once per image and are not TPU work), and the
2x2-patch-merge + newline-token + 2-layer projection MLP as jitted JAX.

Pipeline (reference: src/processor.rs:344-375):
  1. hd_transform: transpose-if-portrait, find the largest scale s.t.
     #crops ≤ hd_num, bilinear-resize to (scale*336, ·), pad height to a
     336 multiple with white, transpose back.
  2. global 336x336 resize + per-crop 336 tiles.  (The reference skips the
     crop step when w_crop*h_crop ≤ 2 and reuses the raw buffer, which
     scrambles pixels when w_crop=2 — src/processor.rs:361-365; we always
     crop correctly.)
  3. CLIP mean/std normalize; channel-planar 14x14 patch extraction.
  4. CLIP encode (models.vision) batched over crops.
  5. reshape_hd_patches_2x2merge → add sub_GN newlines → [sub, glb_GN,
     global] sequence → img_projection MLP (GELU) into text-embedding space.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lmrs_tpu.ops.activations import gelu_tanh
from lmrs_tpu.ops.matmul import qmatmul
from lmrs_tpu.quant import QTensor, QuantType

# CLIP normalization constants (reference: src/processor.rs:345-346)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
CROP = 336


@dataclasses.dataclass(frozen=True)
class ProcessorConfig:
    """13-byte processor header (reference: export.py:175-181)."""

    hidden_dim: int = 4096   # merged-channel dim = 4 * CLIP dim
    text_dim: int = 3072
    quant: QuantType = QuantType.NONE
    group_size: int = 128
    matmul_impl: str = "exact"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("glb_gn", "sub_gn", "proj0", "proj0_b", "proj1", "proj1_b"),
    meta_fields=(),
)
@dataclasses.dataclass
class ProcessorParams:
    glb_gn: jax.Array    # (hidden_dim,)
    sub_gn: jax.Array    # (hidden_dim,)
    proj0: QTensor       # (text_dim, hidden_dim)
    proj0_b: jax.Array   # (text_dim,)
    proj1: QTensor       # (text_dim, text_dim)
    proj1_b: jax.Array   # (text_dim,)


# ---------------------------------------------------------------------------
# Host-side image preprocessing (numpy / PIL)
# ---------------------------------------------------------------------------

def _resize_bilinear(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Triangle-filter resize like the reference's image crate
    (reference: src/processor.rs:352,456).  Uses PIL BILINEAR."""
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))


def hd_transform(img: np.ndarray, hd_num: int) -> Tuple[np.ndarray, int, int]:
    """reference: src/processor.rs:430-468.  img (H, W, 3) uint8 →
    (padded image, w_crop, h_crop)."""
    h, w = img.shape[:2]
    trans = w < h
    if trans:
        img = img.transpose(1, 0, 2)
        h, w = w, h

    ratio = w / h
    scale = 1.0
    while scale * np.ceil(scale / ratio) <= hd_num:
        scale += 1.0
    scale -= 1.0

    new_w = int(scale * CROP)
    new_h = int(new_w / ratio)
    img = _resize_bilinear(img, new_w, new_h)

    # pad height to a 336 multiple with white, split evenly
    # (reference: src/processor.rs:420-428)
    tar = int(np.ceil(new_h / CROP) * CROP)
    top = (tar - new_h) // 2
    bot = tar - new_h - top
    img = np.pad(img, ((top, bot), (0, 0), (0, 0)), constant_values=255)
    new_h = tar

    if trans:
        img = img.transpose(1, 0, 2)
        new_w, new_h = new_h, new_w
    return img, new_w // CROP, new_h // CROP


def preprocess_image(img: np.ndarray, hd_num: int,
                     patch_size: int = 14) -> Tuple[np.ndarray, int, int, int]:
    """Full processor.process (reference: src/processor.rs:344-375).

    img (H, W, 3) uint8 → (patches (num_crops+1, 576, 3*ps*ps) f32,
    w_crop, h_crop, num_crops+1).  Crop 0 is the global 336x336 view.
    """
    padded, w_crop, h_crop = hd_transform(img, hd_num)
    global_img = _resize_bilinear(padded, CROP, CROP)

    # (h_crop, w_crop, 336, 336, 3) tiles — always correctly cropped
    tiles = padded.reshape(h_crop, CROP, w_crop, CROP, 3).transpose(
        0, 2, 1, 3, 4).reshape(-1, CROP, CROP, 3)
    crops = np.concatenate([global_img[None], tiles], axis=0)

    norm = (crops.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD

    # channel-planar patch extraction (reference: src/processor.rs:114-139):
    # per patch, all R values row-major, then G, then B
    n = norm.shape[0]
    pps = CROP // patch_size
    p = norm.reshape(n, pps, patch_size, pps, patch_size, 3)
    p = p.transpose(0, 1, 3, 5, 2, 4)  # (n, py, px, c, y, x)
    patches = p.reshape(n, pps * pps, 3 * patch_size * patch_size)
    return patches.astype(np.float32), w_crop, h_crop, n


# ---------------------------------------------------------------------------
# Feature post-processing + projection (JAX)
# ---------------------------------------------------------------------------

def reshape_hd_patches_2x2merge(features: jax.Array, h_crop: int,
                                w_crop: int) -> jax.Array:
    """(N, 576, C) → (h_crop*12, w_crop*12, 4C) spatial grid with 2x2
    channel merge (reference: src/processor.rs:377-418).  N = h_crop*w_crop.
    """
    n, l, c = features.shape
    hh = int(np.sqrt(l))          # 24
    f = features.reshape(n, hh // 2, 2, hh // 2, 2, c)
    # merge order: (di, dj) = (0,0),(0,1),(1,0),(1,1)
    f = f.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh // 2, hh // 2, 4 * c)
    f = f.reshape(h_crop, w_crop, hh // 2, hh // 2, 4 * c)
    f = f.transpose(0, 2, 1, 3, 4).reshape(h_crop * hh // 2,
                                           w_crop * hh // 2, 4 * c)
    return f


def add_image_newline(grid: jax.Array, sub_gn: jax.Array) -> jax.Array:
    """Append the sub_GN separator to each row: (h, w, C) → (h*(w+1), C)
    (reference: src/processor.rs:470-484)."""
    h, w, c = grid.shape
    sep = jnp.broadcast_to(sub_gn, (h, 1, c))
    return jnp.concatenate([grid, sep], axis=1).reshape(h * (w + 1), c)


def processor_forward(params: ProcessorParams, cfg: ProcessorConfig,
                      features: jax.Array, w_crop: int,
                      h_crop: int) -> jax.Array:
    """CLIP features (num_crops+1, 576, C) → text embeddings (N, text_dim)
    (reference: src/processor.rs:234-342).  features[0] is the global crop.
    """
    glb = reshape_hd_patches_2x2merge(features[:1], 1, 1)
    glb = add_image_newline(glb, params.sub_gn)

    sub = reshape_hd_patches_2x2merge(features[1:], h_crop, w_crop)
    sub = add_image_newline(sub, params.sub_gn)

    seq = jnp.concatenate(
        [sub, params.glb_gn[None, :], glb], axis=0)      # (N, hidden)

    hid = qmatmul(seq, params.proj0, cfg.matmul_impl) + params.proj0_b
    hid = gelu_tanh(hid)
    out = qmatmul(hid, params.proj1, cfg.matmul_impl) + params.proj1_b
    return out


# ---------------------------------------------------------------------------
# End-to-end image → text-embedding helper for the frontends
# ---------------------------------------------------------------------------

def encode_image_to_embeds(lmrs_file, text_params, text_cfg, image_path: str,
                           num_crops: int) -> jax.Array:
    """Image file → prefix/image/suffix embedding sequence ready for
    fill_kv_cache (reference: src/bin/chat.rs:83-121)."""
    from PIL import Image

    from lmrs_tpu.io.params import vision_params_from_lmrs
    from lmrs_tpu.models.transformer import embed_tokens
    from lmrs_tpu.models.vision import vision_forward

    img = np.asarray(Image.open(image_path).convert("RGB"))
    vcfg, vparams, pcfg, pparams = vision_params_from_lmrs(lmrs_file)

    patches, w_crop, h_crop, _ = preprocess_image(img, num_crops,
                                                  vcfg.patch_size)
    feats = vision_forward(vparams, vcfg, jnp.asarray(patches))
    img_embeds = processor_forward(pparams, pcfg, feats, w_crop, h_crop)

    # Phi-3.5-vision prompt wrapping (reference: src/bin/chat.rs:110-115)
    prefix = embed_tokens(text_params, text_cfg,
                          jnp.asarray([1, 32010, 29871, 13], jnp.int32))
    suffix = embed_tokens(text_params, text_cfg,
                          jnp.asarray([1, 29871, 13], jnp.int32))
    return jnp.concatenate([prefix, img_embeds, suffix], axis=0)
