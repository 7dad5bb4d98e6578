"""Vision stack: HD transform geometry, patch extraction, 2x2 merge +
newline layout vs literal ports of the reference loops, and the multimodal
end-to-end path through a synthetic .lmrs file."""

import numpy as np
import jax.numpy as jnp
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.lmrs import read_lmrs, write_lmrs
from lmrs_tpu.io.params import (params_from_lmrs, vision_params_from_lmrs)
from lmrs_tpu.io.synthetic import (random_multimodal_weights,
                                   tiny_config, tiny_processor_config,
                                   tiny_vision_config)
from lmrs_tpu.models.phi3v import (add_image_newline, hd_transform,
                                   preprocess_image,
                                   reshape_hd_patches_2x2merge)
from lmrs_tpu.quant import QuantType

RNG = np.random.default_rng(9)


def ref_2x2merge(image_features, h_crop, w_crop, C, H):
    """Literal port of reference src/processor.rs:377-418."""
    L = H * H
    n = image_features.size // (L * C)
    num_images = n // (h_crop * w_crop)
    out_h, out_w, out_c = h_crop * H // 2, w_crop * H // 2, 4 * C
    flat = image_features.reshape(-1)
    result = np.zeros(num_images * out_h * out_w * out_c, np.float32)
    for img_idx in range(num_images):
        for hc in range(h_crop):
            for wc in range(w_crop):
                patch_idx = img_idx * h_crop * w_crop + hc * w_crop + wc
                for i in range(H // 2):
                    for j in range(H // 2):
                        merged = []
                        for di in range(2):
                            for dj in range(2):
                                oy, ox = i * 2 + di, j * 2 + dj
                                start = patch_idx * L * C + (oy * H + ox) * C
                                merged.append(flat[start:start + C])
                        nh, nw = hc * H // 2 + i, wc * H // 2 + j
                        idx = ((img_idx * out_h + nh) * out_w + nw) * out_c
                        result[idx:idx + out_c] = np.concatenate(merged)
    return result.reshape(out_h, out_w, out_c)


def ref_add_newline(img_flat, separator, h, w, dim):
    """Literal port of reference src/processor.rs:470-484."""
    vec = list(img_flat)
    for i in range(h):
        idx = i * w * dim + i * dim + w * dim
        vec[idx:idx] = list(separator)
    return np.array(vec, np.float32)


@pytest.mark.parametrize("h_crop,w_crop", [(1, 1), (2, 1), (2, 2)])
def test_2x2merge_matches_reference_loop(h_crop, w_crop):
    C, H = 8, 6  # small stand-ins for 1024, 24
    n = h_crop * w_crop
    feats = RNG.normal(size=(n, H * H, C)).astype(np.float32)
    got = np.asarray(reshape_hd_patches_2x2merge(jnp.asarray(feats),
                                                 h_crop, w_crop))
    want = ref_2x2merge(feats, h_crop, w_crop, C, H)
    np.testing.assert_array_equal(got, want)


def test_add_image_newline_matches_reference_loop():
    h, w, dim = 3, 4, 8
    grid = RNG.normal(size=(h, w, dim)).astype(np.float32)
    sep = RNG.normal(size=(dim,)).astype(np.float32)
    got = np.asarray(add_image_newline(jnp.asarray(grid), jnp.asarray(sep)))
    want = ref_add_newline(grid.reshape(-1), sep, h, w, dim).reshape(
        h * (w + 1), dim)
    np.testing.assert_array_equal(got, want)


def test_hd_transform_geometry():
    # landscape 800x400, hd_num 4: ratio 2 → scale 2 → 672x336, no pad
    img = RNG.integers(0, 255, (400, 800, 3), dtype=np.uint8)
    out, w_crop, h_crop = hd_transform(img, 4)
    assert out.shape == (336, 672, 3)
    assert (w_crop, h_crop) == (2, 1)
    # portrait gets transposed and back
    img = RNG.integers(0, 255, (800, 400, 3), dtype=np.uint8)
    out, w_crop, h_crop = hd_transform(img, 4)
    assert out.shape == (672, 336, 3)
    assert (w_crop, h_crop) == (1, 2)


def test_preprocess_patches_shape_and_channel_planar_layout():
    img = np.zeros((336, 336, 3), np.uint8)
    img[..., 0] = 255  # pure red
    patches, w_crop, h_crop, n = preprocess_image(img, 1)
    assert patches.shape == (2, 576, 588)  # global + 1 crop
    # channel-planar: first 196 values are R-plane (constant, max-normalized)
    r_plane = patches[0, 0, :196]
    g_plane = patches[0, 0, 196:392]
    assert np.allclose(r_plane, r_plane[0])
    assert r_plane[0] > g_plane[0]  # red >> green after normalization


@pytest.mark.parametrize("quant", [QuantType.NONE, QuantType.Q8_0])
def test_multimodal_lmrs_end_to_end(tmp_path, quant):
    """Synthetic multimodal .lmrs → image → embeddings → prefill → decode."""
    # image sequences are ~320 embeddings (12x13 global + 12x13 sub + GN)
    cfg = tiny_config(ModelType.PHI, quant, multimodal=True, seq_len=512)
    vcfg = tiny_vision_config(quant)
    pcfg = tiny_processor_config(quant, text_dim=cfg.dim)
    weights = random_multimodal_weights(cfg, vcfg, pcfg, seed=4)

    path = str(tmp_path / "mm.lmrs")
    write_lmrs(path, cfg, weights, vision_cfg=vcfg, processor_cfg=pcfg)
    f = read_lmrs(path)
    assert f.cfg.multimodal
    vc, pc = f.cfg_vision_processor()
    assert vc.dim == vcfg.dim and pc.text_dim == cfg.dim

    # image → embeds
    from PIL import Image
    img_path = str(tmp_path / "img.png")
    Image.fromarray(RNG.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
        img_path)

    params = params_from_lmrs(f)
    from lmrs_tpu.models.phi3v import encode_image_to_embeds
    embeds = encode_image_to_embeds(f, params, f.cfg, img_path, num_crops=1)
    assert embeds.shape[1] == cfg.dim
    assert np.isfinite(np.asarray(embeds)).all()

    # prefill image embeds then chat (reference: chat.rs:110-121)
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig
    eng = Engine(f.cfg, params, cache_dtype=jnp.float32, min_attn_bucket=64,
                 prefill_chunk=16)
    eng.prefill_embeds(embeds, want_logits=False)
    pos_after_image = eng.pos
    assert pos_after_image == embeds.shape[0]
    out = eng.generate([7, 8, 9], GenerationConfig(temperature=0.0,
                                                   max_new_tokens=4))
    assert len(out) == 4
