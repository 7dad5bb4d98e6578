"""Interactive chat CLI (reference: src/bin/chat.rs:1-227).

Same flag surface as the reference binary; multi-turn conversations share the
KV cache with `pos` only ever growing within a session, Llama gets the
hardcoded system-prompt template with today's date, multimodal models take
--image for Phi-3.5-vision HD image ingestion.

Usage:
    python -m lmrs_tpu.cli.chat --model model.lmrs [--tokenizer tokenizer.bin]
        [--temperature 0.7] [--top-p 0.9] [--seed N] [--show-metrics]
        [--image img.png] [--num-crops 1]
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import time
from typing import List, Optional

LOGO = r"""
    L      M     M  RRRR    ssss
    L      MM   MM  R   R  s
    L      M M M M  RRRR    sss
    L      M  M  M  R  R       s
    LLLL   M     M  R   R  sssss
"""

# Llama-3 system prompt template with knowledge-cutoff header
# (reference: src/bin/chat.rs:158-167)
LLAMA_SYSTEM_PREFIX = [128000, 128006, 9125, 128007, 271, 38766, 1303, 33025,
                       2696, 25, 6790, 220, 2366, 18, 198, 15724, 2696, 25,
                       220]
LLAMA_SYSTEM_SUFFIX = [271, 128009]

# Phi-3.5-vision wraps the first (image) turn manually
# (reference: src/bin/chat.rs:110-115,170-172)
PHI_IMAGE_PREFIX_IDS = [1, 32010, 29871, 13]
PHI_IMAGE_SUFFIX_IDS = [1, 29871, 13]
PHI_TURN_SUFFIX = [32007, 29871, 13, 32001, 29871, 13]


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lmrs_tpu chat")
    p.add_argument("--model", required=True)
    p.add_argument("--tokenizer", default="tokenizer.bin")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--spec-k", dest="spec_k", type=int, default=0,
                   help="prompt-lookup speculative decoding: verify K "
                        "drafted tokens per forward (greedy streams "
                        "accept by token equality; sampled streams by "
                        "rejection sampling — both distribution-exact)")
    p.add_argument("--top-p", dest="top_p", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--show-metrics", action="store_true")
    p.add_argument("--image", default=None)
    p.add_argument("--num-crops", dest="num_crops", type=int, default=1)
    p.add_argument("--cache-dtype",
                   choices=["bfloat16", "float32", "int8", "int4"],
                   default="bfloat16",
                   help="KV cache storage; int8 (per-position-per-head "
                        "scales) halves attention HBM traffic and doubles "
                        "the max context per chip; int4 (nibble-packed) "
                        "doubles capacity again (single-device only)")
    p.add_argument("--max-new-tokens", type=int, default=4096)
    p.add_argument("--impl", choices=["fast", "exact"], default="fast",
                   help="matmul path: 'fast' = fused Pallas dequant kernels"
                        " (Q8 decode runs W8A8, the reference's own integer"
                        " scheme; Q4/prefill run W4A16/W8A16); 'exact' = "
                        "bit-parity XLA path")
    p.add_argument("--seq-len", dest="seq_len", type=int, default=None,
                   help="override the context length (the reference clamps "
                        "to 8192 to bound its host-RAM f32 cache; the TPU "
                        "bf16 cache can go further, HBM permitting)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways: shard the weights over a "
                        "tp-axis device mesh (Megatron column/row-parallel "
                        "under shard_map)")
    p.add_argument("--cp", type=int, default=1,
                   help="context-parallel ways: shard the KV cache's "
                        "sequence axis — context capacity scales with cp")
    return p


def main(argv: Optional[List[str]] = None) -> None:
    args = build_argparser().parse_args(argv)
    print(LOGO)

    for path, what in ((args.tokenizer, "Tokenizer"), (args.model, "Model")):
        if not os.path.exists(path):
            sys.exit(f"{what} file not found: {path}")

    import jax.numpy as jnp

    from lmrs_tpu.config import ModelType
    from lmrs_tpu.io.lmrs import read_lmrs
    from lmrs_tpu.io.params import params_from_lmrs
    from lmrs_tpu.runtime.compile_cache import enable_compilation_cache
    from lmrs_tpu.runtime.engine import Engine, GenerationConfig

    enable_compilation_cache()
    from lmrs_tpu.tokenizer import EXTRA_STOP_TOKENS, StreamDecoder, Tokenizer

    tokenizer = Tokenizer.from_file(args.tokenizer)
    f = read_lmrs(args.model)
    # the .lmrs header carries no runtime knobs — select the matmul path
    fuse = args.impl == "fast"
    # fuse_ffn off: the stacked fused-xe FFN measures equal to the unfused
    # path (58.8 vs 58.9 tok/s, gemma-9b Q4) and benches run unfused
    f.cfg = f.cfg.replace(matmul_impl=args.impl, fuse_ffn=False)
    if args.seq_len:
        f.cfg = f.cfg.replace(seq_len=args.seq_len)
    cfg = f.cfg
    print(f"Model type: {cfg.model_type.name}")
    if cfg.quant.value:
        print(f"Using {cfg.quant.name} quantization.")
    print("Loading weights...")
    from lmrs_tpu.runtime.engine import CACHE_DTYPES
    cache_dtype = CACHE_DTYPES[args.cache_dtype]
    if args.tp > 1 or args.cp > 1:
        # multi-chip serving: the same Engine API over a (tp[, cp]) mesh
        from lmrs_tpu.parallel.tp import make_mesh_engine

        engine = make_mesh_engine(f, tp=args.tp, cp=args.cp,
                                  cache_dtype=cache_dtype)
        print(f"Done (mesh: tp={args.tp} cp={args.cp}).\n")
        params = engine.params
    else:
        # scan-fast layout: stacked weights + fused [q;k;v]/[gate;up] with
        # the scalar-prefetch kernels; packed-resident Q4 (the xe kernels
        # made it faster than int8 expansion in round 2)
        params = params_from_lmrs(f, fuse_qkv=fuse)
        print("Done.\n")
        engine = Engine(cfg, params, cache_dtype=cache_dtype)
    gen = GenerationConfig(temperature=args.temperature, top_p=args.top_p,
                           seed=args.seed, max_new_tokens=args.max_new_tokens,
                           speculative_k=args.spec_k)

    image_turn = False
    if args.image:
        if not cfg.multimodal:
            sys.exit("Cannot use images in a non-multimodal model.")
        if args.cp > 1:
            sys.exit("--image with --cp is not supported yet (image-prefix "
                     "chunks would straddle sequence shards).")
        # --image with --tp works: the vision tower runs replicated and
        # the float embedding prefix rides the mesh engine's prefill path
        # (tests/test_engine_mesh.py::test_tp_engine_prefill_embeds_parity)
        from lmrs_tpu.models.phi3v import encode_image_to_embeds

        print("Preprocessing the image...")
        embeds = encode_image_to_embeds(f, params, cfg, args.image,
                                        args.num_crops)
        print("Filling KV Cache...\n")
        engine.prefill_embeds(embeds, want_logits=False)
        image_turn = True

    stop_tokens = {tokenizer.eos, *EXTRA_STOP_TOKENS.get(cfg.model_type, ())}
    suppress = stop_tokens

    while True:
        try:
            user_prompt = input("You: ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return
        if not user_prompt:
            continue

        prompt_tokens: List[int] = []
        if cfg.model_type == ModelType.LLAMA and engine.pos == 0:
            prompt_tokens.extend(LLAMA_SYSTEM_PREFIX)
            today = datetime.date.today().strftime("%d %b %Y")
            prompt_tokens.extend(tokenizer.encode(today))
            prompt_tokens.extend(LLAMA_SYSTEM_SUFFIX)

        if image_turn:
            # first turn after an image: no chat prefix, manual suffix
            prompt_tokens.extend(tokenizer.encode(user_prompt))
            prompt_tokens.extend(PHI_TURN_SUFFIX)
            image_turn = False
        else:
            prompt_tokens.extend(tokenizer.encode(
                user_prompt, chat_format=True, model_type=cfg.model_type))

        print("Assistant:")
        decoder = StreamDecoder(tokenizer)
        t0 = time.perf_counter()
        n_tokens = 0

        def on_token(tok: int):
            nonlocal n_tokens
            n_tokens += 1
            if tok not in suppress:
                sys.stdout.write(decoder.push(tok))
                sys.stdout.flush()

        engine.generate(prompt_tokens, gen, stop_tokens=stop_tokens,
                        on_token=on_token)
        sys.stdout.write(decoder.flush() + "\n")
        if args.show_metrics:
            dt = time.perf_counter() - t0
            m = engine.metrics
            extra = ""
            if m.spec_proposed:
                extra = (f"  (draft acceptance "
                         f"{m.spec_accepted / m.spec_proposed:.0%})")
            print(f"Speed: {n_tokens / dt:.2f} tok/s{extra}")


if __name__ == "__main__":
    main()
