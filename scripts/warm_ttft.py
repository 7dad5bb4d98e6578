#!/usr/bin/env python
"""Process-start -> first served token, on a warm compile cache
(round-5 VERDICT #4's bar: "TTFT < 60 s on a warm-cache process").

Drives the REAL serving surface: a BackendServer with
--background-warmup (admitted traffic compiles only its own
prefill-chunk + first-decode-bucket programs; the full bucket sweep
finishes on a daemon thread), a websocket client connecting the moment
the server listens.  The measured span is Python interpreter start ->
first OUTPUT frame: model load + the two first-request programs
(XLA from the persistent cache; Mosaic kernels rebuilt per process —
the part the chunked vm kernels made cheap).

Run this in a FRESH process after any bench has populated
/tmp/lmrs_tpu_bench and the compile cache:
  LMRS_BENCH_CONFIG=gemma2-2b LMRS_BENCH_QUANT=q8_0 python scripts/warm_ttft.py
"""

import asyncio
import json
import os
import sys
import time

T0 = time.perf_counter()   # process-start proxy: first line of main module

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_tokenizer(path: str, vocab_size: int) -> None:
    """A tokenizer.bin with byte fallback sized to the model's vocab —
    synthetic-weight servers only need SOME valid tokenizer."""
    from lmrs_tpu.tokenizer import Tokenizer

    vocab = ["<pad>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    import string
    vocab += list(" " + string.ascii_letters + ".,!?")
    vocab += [f"<unused{i}>" for i in range(vocab_size - len(vocab))]
    Tokenizer(vocab, [0.0] * len(vocab), 1, 2).save(path)


def main():
    config_name = os.environ.get("LMRS_BENCH_CONFIG", "gemma2-2b")
    quant_name = os.environ.get("LMRS_BENCH_QUANT", "q8_0").lower()
    cache_dir = os.environ.get("LMRS_BENCH_CACHE_DIR", "/tmp/lmrs_tpu_bench")
    model_path = os.path.join(cache_dir, f"{config_name}-{quant_name}.lmrs")
    if not os.path.exists(model_path):
        sys.exit(f"model {model_path} missing — run bench.py first")

    from lmrs_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from lmrs_tpu.io.lmrs import read_lmrs
    vocab_size = read_lmrs(model_path).cfg.vocab_size   # header peek (memmap)
    tok_path = os.path.join(cache_dir, f"tok-{vocab_size}.bin")
    if not os.path.exists(tok_path):
        synth_tokenizer(tok_path, vocab_size)

    from lmrs_tpu.serve.backend import BackendServer

    t_import = time.perf_counter() - T0
    server = BackendServer(model_path, tok_path, temperature=0.0)
    t_load = time.perf_counter() - T0
    server.warmup(background=True)   # --background-warmup: serve NOW

    import websockets

    async def drive():
        async with websockets.serve(server.handle, "127.0.0.1", 0) as srv:
            port = srv.sockets[0].getsockname()[1]
            t_listen = time.perf_counter() - T0
            async with websockets.connect(f"ws://127.0.0.1:{port}",
                                          open_timeout=600) as ws:
                await ws.send(json.dumps({"text": "Hello there, how are"}))
                t_first = None
                n = 0
                async for raw in ws:
                    msg = json.loads(raw)
                    if msg["category"] == "OUTPUT":
                        if msg["text"] == "<eos>":
                            break
                        if t_first is None:
                            t_first = time.perf_counter() - T0
                        n += 1
                        if n >= 16:
                            break
                return t_listen, t_first

    t_listen, t_first = asyncio.run(drive())
    print(json.dumps({
        "metric": f"{config_name} {quant_name} warm-process first-token "
                  "seconds (process start -> first OUTPUT frame, "
                  "--background-warmup)",
        "import_s": round(t_import, 1),
        "load_s": round(t_load, 1),
        "listen_s": round(t_listen, 1),
        "first_token_s": round(t_first, 1) if t_first else None,
    }), flush=True)


if __name__ == "__main__":
    main()
