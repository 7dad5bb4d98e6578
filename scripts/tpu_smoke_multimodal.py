"""TPU smoke: synthetic multimodal .lmrs → image → vision encoder →
projector → prefill → decode, on the real chip, both matmul impls."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.lmrs import read_lmrs, write_lmrs
from lmrs_tpu.io.params import params_from_lmrs
from lmrs_tpu.io.synthetic import (random_multimodal_weights, tiny_config,
                                   tiny_processor_config, tiny_vision_config)
from lmrs_tpu.models.phi3v import encode_image_to_embeds
from lmrs_tpu.quant import QuantType
from lmrs_tpu.runtime.engine import Engine, GenerationConfig

print("devices:", jax.devices(), flush=True)
tmp = tempfile.mkdtemp()
rng = np.random.default_rng(0)

cfg = tiny_config(ModelType.PHI, QuantType.Q8_0, multimodal=True,
                  seq_len=512)
vcfg = tiny_vision_config(QuantType.Q8_0)
pcfg = tiny_processor_config(QuantType.Q8_0, text_dim=cfg.dim)
weights = random_multimodal_weights(cfg, vcfg, pcfg, seed=4)
path = os.path.join(tmp, "mm.lmrs")
write_lmrs(path, cfg, weights, vision_cfg=vcfg, processor_cfg=pcfg)
img_path = os.path.join(tmp, "img.png")
Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(
    img_path)

for impl in ("exact", "fast"):
    f = read_lmrs(path)
    f.cfg = f.cfg.replace(matmul_impl=impl)
    params = params_from_lmrs(f)
    t0 = time.perf_counter()
    embeds = encode_image_to_embeds(f, params, f.cfg, img_path, num_crops=1)
    assert np.isfinite(np.asarray(embeds)).all()
    eng = Engine(f.cfg, params, cache_dtype=jnp.bfloat16, min_attn_bucket=64,
                 prefill_chunk=16, decode_chunk=4)
    eng.prefill_embeds(embeds, want_logits=False)
    out = eng.generate([1, 7, 9],
                       GenerationConfig(temperature=0.0, max_new_tokens=8))
    assert len(out) == 8 and all(0 <= t < cfg.vocab_size for t in out)
    print(f"impl={impl}: image {embeds.shape} -> tokens {out} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
print("MULTIMODAL TPU SMOKE OK", flush=True)
