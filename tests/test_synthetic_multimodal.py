"""Streaming synthetic writer emits valid multimodal .lmrs files (the
full-scale Phi-3.5-vision bench substrate; reference layout export.py:127-190)."""

import os

import jax.numpy as jnp
import numpy as np

from lmrs_tpu.config import ModelType, PRESETS, phi35_vision_aux
from lmrs_tpu.io.lmrs import read_lmrs
from lmrs_tpu.io.params import params_from_lmrs, vision_params_from_lmrs
from lmrs_tpu.io.synthetic import (tiny_config, tiny_processor_config,
                                   tiny_vision_config, write_synthetic_lmrs)
from lmrs_tpu.models.vision import vision_forward
from lmrs_tpu.quant import QuantType


def test_synthetic_multimodal_roundtrip(tmp_path):
    cfg = tiny_config(ModelType.PHI, QuantType.Q8_0, multimodal=True)
    vc = tiny_vision_config(QuantType.Q8_0)
    pc = tiny_processor_config(QuantType.Q8_0, cfg.dim)
    path = str(tmp_path / "mm.lmrs")
    write_synthetic_lmrs(path, cfg, seed=0, vision_cfg=vc, processor_cfg=pc)

    f = read_lmrs(path)
    assert f.cfg.multimodal
    params_from_lmrs(f)
    vcfg, vp, pcfg, pp = vision_params_from_lmrs(f)
    assert (vcfg.dim, vcfg.n_layers) == (vc.dim, vc.n_layers)
    assert (pcfg.hidden_dim, pcfg.text_dim) == (pc.hidden_dim, pc.text_dim)

    patches = np.random.default_rng(0).standard_normal(
        (2, vcfg.n_patches, 3 * vcfg.patch_size ** 2)).astype(np.float32)
    feats = vision_forward(vp, vcfg, jnp.asarray(patches))
    assert feats.shape == (2, vcfg.n_patches, vcfg.dim)
    assert np.isfinite(np.asarray(feats)).all()


def test_phi35_vision_preset():
    cfg = PRESETS["phi3.5-vision"](quant=QuantType.Q8_0)
    assert cfg.multimodal and cfg.dim == 3072 and cfg.n_layers == 32
    vc, pc = phi35_vision_aux(QuantType.Q8_0)
    # CLIP ViT-L/14-336 constants (reference: src/vision.rs:11-24)
    assert (vc.dim, vc.hidden_dim, vc.n_layers, vc.n_heads) == \
        (1024, 4096, 24, 16)
    assert (pc.hidden_dim, pc.text_dim) == (4096, 3072)
