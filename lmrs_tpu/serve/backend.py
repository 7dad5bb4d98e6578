"""WebSocket serving backend (reference: src/bin/backend.rs:1-313).

Speaks the reference's exact JSON protocol (for the lm.rs-webui project):

  client → server: {"text": "...", "image": "<base64>"?}
  server → client: {"category": "STATUS"|"OUTPUT"|"FEATURE", "text": "..."}
    FEATURE "multimodal"      — sent at connect when the model has vision
    STATUS  progress lines    — image preprocessing/encode/KV-fill phases
    OUTPUT  token pieces      — streamed during generation
    OUTPUT  "<eos>"           — end of each generation

Design differences from the reference, both deliberate:
  * The reference instantiates a whole new model per connection over the
    shared mmap (backend.rs:88-110); here the device weights are loaded once
    and shared — each connection gets its own Engine (KV cache + position),
    and generations serialize through an asyncio lock (single-stream
    decode).  `--batch` switches to the continuous-batching scheduler,
    and `--dp N` shards it across N data-parallel replica meshes
    (serve/replicas.py), each stepped by its own thread.
  * The reference double-counts positions after an image
    (`pos += fill_kv_cache(...)` where fill returns the new absolute
    position, backend.rs:215 — cf. chat.rs:119 which assigns); the engine
    tracks positions internally, so that bug has no equivalent here.

Usage:
    python -m lmrs_tpu.serve.backend --model m.lmrs --tokenizer tokenizer.bin
        [--ip 127.0.0.1] [--port 5000] [--temperature 0.7] [--top-p 0.9]
        [--seed N] [--multimodal] [--num-crops 1]
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import datetime
import io
import json
import sys
from typing import List, Optional

from lmrs_tpu.cli.chat import (LLAMA_SYSTEM_PREFIX, LLAMA_SYSTEM_SUFFIX,
                               PHI_TURN_SUFFIX)
from lmrs_tpu.config import ModelType


def _response(category: str, text: str) -> str:
    return json.dumps({"category": category, "text": text})


class BackendServer:
    def __init__(self, model_path: str, tokenizer_path: str,
                 temperature: float = 0.7, top_p: float = 0.9,
                 seed: Optional[int] = None, multimodal: bool = False,
                 num_crops: int = 1, cache_dtype: str = "bfloat16",
                 max_new_tokens: Optional[int] = None, batch: int = 0,
                 max_ctx: Optional[int] = None, matmul_impl: str = "fast",
                 tp: int = 1, cp: int = 1, spec_k: int = 0,
                 pool_tokens: Optional[int] = None, page_size: int = 512,
                 dp: int = 1, no_paged: bool = False):
        import jax.numpy as jnp

        from lmrs_tpu.runtime.engine import CACHE_DTYPES

        from lmrs_tpu.io.lmrs import read_lmrs
        from lmrs_tpu.io.params import params_from_lmrs
        from lmrs_tpu.tokenizer import Tokenizer

        self.tokenizer = Tokenizer.from_file(tokenizer_path)
        self.file = read_lmrs(model_path)
        # serving default is the fast fused-kernel path; the .lmrs header
        # carries no runtime knobs
        fuse = matmul_impl == "fast"
        # fuse_ffn off to match the benchmarked serving configuration (the
        # fused-xe FFN measures equal; see bench.py)
        self.file.cfg = self.file.cfg.replace(matmul_impl=matmul_impl,
                                              fuse_ffn=False)
        self.cfg = self.file.cfg
        self.tp, self.cp = tp, cp
        if pool_tokens is not None and (batch == 0 or cp > 1):
            raise ValueError("--pool-tokens (paged KV cache) requires "
                             "--batch; --cp is not supported (pages are "
                             "head-sharded, not sequence-sharded)")
        # PAGED IS THE BATCHED DEFAULT (round 4 measured paging free at a
        # fair pool — RESULTS_r4.md §7 — and it buys sum-of-contexts
        # memory + admission backpressure instead of OOM): --batch alone
        # auto-sizes a pool; --pool-tokens overrides the size; --no-paged
        # restores the contiguous cache; unsupported configs (cp meshes,
        # exact impl, unaligned head dims) silently stay contiguous.
        from lmrs_tpu.serve.scheduler import (auto_pool_tokens,
                                              paged_supported)

        if (batch > 0 and pool_tokens is None and not no_paged
                and paged_supported(self.cfg, cp, CACHE_DTYPES[cache_dtype])):
            pool_tokens = auto_pool_tokens(
                batch, min(max_ctx or self.cfg.seq_len, self.cfg.seq_len),
                page_size)
        self._mesh_engine_proto = None
        self._mesh_scheduler = None
        # dp>1: data-parallel serving — dp scheduler replicas over disjoint
        # tp-chip device groups behind a least-loaded router
        # (serve.replicas.ReplicaRouter); each replica drives its own
        # SchedulerThread, so decode chunks on different replicas overlap
        self.router = None
        self._replica_threads = []
        if dp > 1:
            if batch <= 0:
                raise ValueError("--dp requires --batch (the router "
                                 "multiplies the batched scheduler)")
            if cp > 1:
                raise ValueError("--dp with --cp is not supported")
            from lmrs_tpu.serve.replicas import ReplicaRouter

            self.router = ReplicaRouter(
                self.file, dp=dp, tp=tp, max_batch=batch, max_ctx=max_ctx,
                cache_dtype=CACHE_DTYPES[cache_dtype],
                temperature=temperature, top_p=top_p,
                seed=seed if seed is not None else 0,
                speculative_k=spec_k, pool_tokens=pool_tokens,
                page_size=page_size)
            self.params = self.router.replicas[0].params
        elif tp > 1 or cp > 1:
            # multi-chip serving: build the mesh/sharded params ONCE; each
            # connection gets its own Engine over the shared params +
            # compiled programs (engine._mesh_fns_cached), or — with
            # --batch — all connections share one tp-mesh scheduler
            # --multimodal composes with cp: the engine feeds ragged image
            # prefixes through the fixed cp chunk grid (pad rows stay
            # causally dead, misaligned resumes fall back to single-token
            # steps) — parity-tested in tests/test_engine_mesh.py
            if batch > 0:
                # --batch --cp composes: the batched contiguous cache's
                # sequence axis shards over cp (straddle-safe row-exact
                # writes + cross-shard flash LSE merge, parity-tested in
                # tests/test_scheduler_mesh.py)
                from lmrs_tpu.parallel.tp import make_mesh_scheduler

                self._mesh_scheduler = make_mesh_scheduler(
                    self.file, tp=tp, cp=cp, max_batch=batch,
                    max_ctx=max_ctx,
                    cache_dtype=CACHE_DTYPES[cache_dtype],
                    temperature=temperature, top_p=top_p,
                    seed=seed if seed is not None else 0,
                    speculative_k=spec_k, pool_tokens=pool_tokens,
                    page_size=page_size)
                self.params = self._mesh_scheduler.params
            else:
                from lmrs_tpu.parallel.tp import make_mesh_engine

                self._mesh_engine_proto = make_mesh_engine(
                    self.file, tp=tp, cp=cp,
                    cache_dtype=CACHE_DTYPES[cache_dtype])
                self.params = self._mesh_engine_proto.params
        else:
            self.params = params_from_lmrs(self.file, fuse_qkv=fuse)
        self.cache_dtype = CACHE_DTYPES[cache_dtype]
        self.temperature = temperature
        # speculative decoding applies to greedy AND sampled streams:
        # greedy accepts by token equality, sampled by rejection sampling
        # (runtime/speculative.py) — both distribution-exact.  cp
        # composes: the row-exact cp_masked_write splits straddling
        # verify windows.
        self.spec_k = spec_k
        self.top_p = top_p
        self.seed = seed
        self.num_crops = num_crops
        self.max_new_tokens = max_new_tokens or self.cfg.seq_len
        self.multimodal = multimodal
        if multimodal and not self.cfg.multimodal:
            raise ValueError("Current model doesn't support multimodality.")
        # single accelerator: one generation at a time
        self.gpu_lock = asyncio.Lock()
        self._warmup_thread = None
        # batch>0: continuous batching — connections share one scheduler
        # and decode concurrently instead of serializing on gpu_lock
        self.scheduler = None
        if self.router is not None:
            from lmrs_tpu.serve.scheduler import SchedulerThread

            self._replica_threads = [SchedulerThread(r)
                                     for r in self.router.replicas]
        elif batch > 0:
            from lmrs_tpu.serve.scheduler import (BatchScheduler,
                                                  SchedulerThread)

            sched = self._mesh_scheduler
            if sched is None:
                sched = BatchScheduler(
                    self.cfg, self.params, max_batch=batch,
                    max_ctx=max_ctx, cache_dtype=self.cache_dtype,
                    temperature=temperature, top_p=top_p,
                    seed=seed if seed is not None else 0,
                    speculative_k=self.spec_k,
                    pool_tokens=pool_tokens, page_size=page_size)
            self.scheduler = SchedulerThread(sched)

    def warmup(self, background: bool = False):
        """Precompile the serving programs before taking traffic (the CLI
        does this by default; library users and tests opt in).  Batch
        mode warms the shared scheduler; engine mode warms one engine —
        its compiled programs are shared by every connection
        (engine._compiled_fns / _mesh_fns_cached).

        background=True returns immediately and compiles on a daemon
        thread: traffic admitted meanwhile compiles only the programs it
        actually needs (the jit cache is process-global), so first-token
        latency on a fresh process is bounded by the first REQUEST's own
        prefill-chunk + decode-bucket programs, not the full bucket
        sweep; the sweep finishes behind it.  In batch mode the warmup
        runs as one scheduler-thread job, so requests queue behind it
        only until the (short, single-bucket) paged warmup completes."""
        if background:
            import threading

            # engines created while the sweep runs serve through the
            # pure-XLA fallback programs (Engine.fallback_until): first
            # tokens flow in seconds (XLA hits the persistent cache
            # across processes) and the stream switches to the fast
            # kernels the moment the sweep finishes
            self._fb_event = threading.Event()

            def _bg():
                try:
                    self.warmup()
                finally:
                    self._fb_event.set()   # even on failure: don't pin
                    #                        connections to the fallback

            self._warmup_thread = threading.Thread(target=_bg, daemon=True)
            self._warmup_thread.start()
            return
        import time
        t0 = time.time()
        if self._replica_threads:
            for th in self._replica_threads:
                th.call(th.sched.warmup)
        elif self.scheduler is not None:
            self.scheduler.call(self.scheduler.sched.warmup)
        else:
            self._new_engine().warmup(spec_k=self.spec_k,
                                      temperature=self.temperature,
                                      top_p=self.top_p)
        print(f"Warmup (compile): {time.time() - t0:.1f}s", flush=True)

    def _new_engine(self):
        from lmrs_tpu.runtime.engine import Engine

        if self._mesh_engine_proto is not None:
            proto = self._mesh_engine_proto
            return Engine(self.cfg, self.params,
                          cache_dtype=self.cache_dtype,
                          mesh=proto.mesh,
                          param_spec=None if proto.mesh is None else
                          self._proto_spec())
        eng = Engine(self.cfg, self.params, cache_dtype=self.cache_dtype)
        # during a --background-warmup sweep, serve through the XLA
        # fallback programs until the event fires (no-op afterwards)
        eng.fallback_until = getattr(self, "_fb_event", None)
        return eng

    def _proto_spec(self):
        import jax

        return jax.tree.map(lambda a: a.sharding.spec, self.params)

    # ------------------------------------------------------------------
    async def handle(self, ws):
        """One connection = one conversation (engine + growing pos)."""
        from lmrs_tpu.runtime.engine import GenerationConfig
        from lmrs_tpu.tokenizer import EXTRA_STOP_TOKENS, StreamDecoder

        if self.scheduler is not None or self._replica_threads:
            return await self.handle_batched(ws)

        engine = self._new_engine()
        image_turn = False

        if self.multimodal:
            await ws.send(_response("FEATURE", "multimodal"))

        gen = GenerationConfig(temperature=self.temperature,
                               top_p=self.top_p, seed=self.seed,
                               max_new_tokens=self.max_new_tokens,
                               speculative_k=self.spec_k)
        stop_tokens = {self.tokenizer.eos,
                       *EXTRA_STOP_TOKENS.get(self.cfg.model_type, ())}

        async for raw in ws:
            try:
                msg = json.loads(raw)
                text = msg["text"]
            except (ValueError, KeyError, TypeError) as e:
                # covers malformed JSON, non-UTF-8 binary frames, missing
                # "text" — the reference likewise skips bad frames
                # (backend.rs:221-236)
                print(f"Error parsing message: {e}")
                continue

            if self.multimodal and msg.get("image"):
                image_turn = await self._ingest_image(ws, engine,
                                                      msg["image"])

            prompt_tokens: List[int] = []
            if (self.cfg.model_type == ModelType.LLAMA and engine.pos == 0):
                prompt_tokens.extend(LLAMA_SYSTEM_PREFIX)
                today = datetime.date.today().strftime("%d %b %Y")
                prompt_tokens.extend(self.tokenizer.encode(today))
                prompt_tokens.extend(LLAMA_SYSTEM_SUFFIX)

            if image_turn:
                prompt_tokens.extend(self.tokenizer.encode(text.strip()))
                prompt_tokens.extend(PHI_TURN_SUFFIX)
                image_turn = False
            else:
                prompt_tokens.extend(self.tokenizer.encode(
                    text.strip(), chat_format=True,
                    model_type=self.cfg.model_type))

            decoder = StreamDecoder(self.tokenizer)
            loop = asyncio.get_running_loop()
            queue: asyncio.Queue = asyncio.Queue()

            def on_token(tok: int):
                if tok not in stop_tokens:
                    piece = decoder.push(tok)
                    if piece:
                        loop.call_soon_threadsafe(queue.put_nowait, piece)

            if engine.pos + len(prompt_tokens) + 1 >= self.cfg.seq_len:
                # the reference never evicts its cache and would walk off
                # the end (chat.rs:67,216); we surface it cleanly instead
                await ws.send(_response(
                    "STATUS", "Context window full — start a new session"))
                await ws.send(_response("OUTPUT", "<eos>"))
                continue

            async with self.gpu_lock:
                gen_task = loop.run_in_executor(
                    None, lambda: engine.generate(
                        prompt_tokens, gen, stop_tokens=stop_tokens,
                        on_token=on_token))
                while True:
                    get = asyncio.ensure_future(queue.get())
                    done, _ = await asyncio.wait(
                        {get, gen_task}, return_when=asyncio.FIRST_COMPLETED)
                    if get in done:
                        await ws.send(_response("OUTPUT", get.result()))
                    else:
                        get.cancel()
                        break
                await gen_task
                while not queue.empty():
                    await ws.send(_response("OUTPUT", queue.get_nowait()))
            tail = decoder.flush()
            if tail:
                await ws.send(_response("OUTPUT", tail))
            await ws.send(_response("OUTPUT", "<eos>"))
            print("Done!\n")

    async def handle_batched(self, ws):
        """Continuous-batching connection handler: the conversation leases
        one scheduler slot; turns decode concurrently with other
        connections (the reference serializes — one whole model per
        connection, src/bin/backend.rs:88-110)."""
        from lmrs_tpu.tokenizer import EXTRA_STOP_TOKENS, StreamDecoder

        if self.router is not None:
            # pin the conversation to the least-loaded replica; its own
            # SchedulerThread drives it (replicas overlap device-side)
            rlease = self.router.new_conversation()
            if rlease is None:
                await ws.send(_response(
                    "STATUS", "Server at capacity — try again later"))
                return
            thread = self._replica_threads[rlease.replica]
            sched = thread.sched
            lease = rlease.lease
        else:
            thread = self.scheduler
            sched = thread.sched
            lease = thread.call(sched.new_conversation)
            if lease is None:
                await ws.send(_response(
                    "STATUS", "Server at capacity — try again later"))
                return

        stop_tokens = {self.tokenizer.eos,
                       *EXTRA_STOP_TOKENS.get(self.cfg.model_type, ())}
        first_turn = True
        image_turn = False
        if self.multimodal:
            await ws.send(_response("FEATURE", "multimodal"))

        try:
            async for raw in ws:
                try:
                    msg = json.loads(raw)
                    text = msg["text"]
                except (ValueError, KeyError, TypeError) as e:
                    print(f"Error parsing message: {e}")
                    continue

                if self.multimodal and msg.get("image"):
                    image_turn = await self._ingest_image_batched(
                        ws, thread, lease, msg["image"])

                prompt_tokens: List[int] = []
                if self.cfg.model_type == ModelType.LLAMA and first_turn:
                    prompt_tokens.extend(LLAMA_SYSTEM_PREFIX)
                    today = datetime.date.today().strftime("%d %b %Y")
                    prompt_tokens.extend(self.tokenizer.encode(today))
                    prompt_tokens.extend(LLAMA_SYSTEM_SUFFIX)
                first_turn = False

                if image_turn:
                    prompt_tokens.extend(self.tokenizer.encode(text.strip()))
                    prompt_tokens.extend(PHI_TURN_SUFFIX)
                    image_turn = False
                else:
                    prompt_tokens.extend(self.tokenizer.encode(
                        text.strip(), chat_format=True,
                        model_type=self.cfg.model_type))

                pos = sched.slots[lease.slot_idx].pos
                if pos + len(prompt_tokens) + 1 >= sched.S:
                    await ws.send(_response(
                        "STATUS",
                        "Context window full — start a new session"))
                    await ws.send(_response("OUTPUT", "<eos>"))
                    continue

                decoder = StreamDecoder(self.tokenizer)
                loop = asyncio.get_running_loop()
                queue: asyncio.Queue = asyncio.Queue()
                done_ev = asyncio.Event()

                def on_token(tok: int):
                    if tok not in stop_tokens:
                        piece = decoder.push(tok)
                        if piece:
                            loop.call_soon_threadsafe(queue.put_nowait,
                                                      piece)

                def on_done(out):
                    loop.call_soon_threadsafe(done_ev.set)

                thread.submit(
                    prompt_tokens, max_new_tokens=self.max_new_tokens,
                    stop_tokens=stop_tokens, on_token=on_token,
                    on_done=on_done, lease=lease)

                wait = asyncio.ensure_future(done_ev.wait())
                while True:
                    get = asyncio.ensure_future(queue.get())
                    done, _ = await asyncio.wait(
                        {get, wait}, return_when=asyncio.FIRST_COMPLETED)
                    if get in done:
                        await ws.send(_response("OUTPUT", get.result()))
                    else:
                        get.cancel()
                        break
                while not queue.empty():
                    await ws.send(_response("OUTPUT", queue.get_nowait()))
                tail = decoder.flush()
                if tail:
                    await ws.send(_response("OUTPUT", tail))
                await ws.send(_response("OUTPUT", "<eos>"))
        finally:
            thread.call(lambda: sched.end_conversation(lease))

    async def _ingest_image_batched(self, ws, thread, lease,
                                    image_b64: str) -> bool:
        import io as _io

        from PIL import Image

        from lmrs_tpu.models.phi3v import encode_image_to_embeds

        await ws.send(_response("STATUS", "Preprocessing the image"))
        img_bytes = base64.b64decode(image_b64)
        img = Image.open(_io.BytesIO(img_bytes)).convert("RGB")
        tmp2 = _io.BytesIO()
        img.save(tmp2, format="PNG")
        await ws.send(_response("STATUS", "Encoding the image"))
        loop = asyncio.get_running_loop()
        sched = thread.sched

        def encode_and_fill():
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".png") as f:
                f.write(tmp2.getvalue())
                f.flush()
                embeds = encode_image_to_embeds(self.file, self.params,
                                                self.cfg, f.name,
                                                self.num_crops)
            import numpy as np

            # via host: the embeds live on replica 0's devices; the leased
            # slot may be on another replica's mesh (dp mode)
            sched.prefill_embeds(lease, np.asarray(embeds))

        await loop.run_in_executor(
            None, lambda: thread.call(encode_and_fill))
        await ws.send(_response("STATUS", "Filling KV cache"))
        return True

    async def _ingest_image(self, ws, engine, image_b64: str) -> bool:
        import numpy as np
        from PIL import Image

        from lmrs_tpu.models.phi3v import encode_image_to_embeds

        await ws.send(_response("STATUS", "Preprocessing the image"))
        img_bytes = base64.b64decode(image_b64)
        tmp = io.BytesIO(img_bytes)
        img = Image.open(tmp).convert("RGB")
        tmp2 = io.BytesIO()
        img.save(tmp2, format="PNG")

        await ws.send(_response("STATUS", "Encoding the image"))
        loop = asyncio.get_running_loop()

        def encode():
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".png") as f:
                f.write(tmp2.getvalue())
                f.flush()
                return encode_image_to_embeds(self.file, self.params,
                                              self.cfg, f.name,
                                              self.num_crops)

        async with self.gpu_lock:
            embeds = await loop.run_in_executor(None, encode)
            await ws.send(_response("STATUS", "Filling KV cache"))
            await loop.run_in_executor(
                None, lambda: engine.prefill_embeds(embeds,
                                                    want_logits=False))
        return True

    async def serve(self, ip: str, port: int):
        import websockets

        async with websockets.serve(self.handle, ip, port,
                                    max_size=64 * 1024 * 1024):
            print(f"Listening on: {ip}:{port}")
            await asyncio.Future()


def main(argv=None):
    p = argparse.ArgumentParser(description="lmrs_tpu WebSocket backend")
    p.add_argument("--ip", default="127.0.0.1")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--model", required=True)
    p.add_argument("--tokenizer", default="tokenizer.bin")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-p", dest="top_p", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--multimodal", action="store_true")
    p.add_argument("--num-crops", dest="num_crops", type=int, default=1)
    p.add_argument("--batch", type=int, default=0,
                   help="continuous-batching slots (0 = per-connection "
                        "engine like the reference)")
    p.add_argument("--max-ctx", dest="max_ctx", type=int, default=None,
                   help="per-slot context length in batch mode")
    p.add_argument("--impl", choices=["fast", "exact"], default="fast")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways (Megatron shard_map over a "
                        "tp-axis device mesh)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel scheduler replicas (requires "
                        "--batch): dp disjoint tp-chip device groups "
                        "behind a least-loaded router — aggregate "
                        "throughput scales with dp")
    p.add_argument("--spec-k", dest="spec_k", type=int, default=0,
                   help="prompt-lookup speculative decoding: greedy "
                        "streams accept by token equality, sampled "
                        "streams by rejection sampling (both "
                        "distribution-exact)")
    p.add_argument("--cp", type=int, default=1,
                   help="context-parallel ways (sequence-sharded KV cache)")
    p.add_argument("--pool-tokens", dest="pool_tokens", type=int,
                   default=None,
                   help="batch mode: pool-row override for the PAGED KV "
                        "cache (memory = sum of live contexts, not "
                        "batch x max-ctx).  --batch is paged BY DEFAULT "
                        "at 0.75 x batch x max-ctx rows")
    p.add_argument("--no-paged", dest="no_paged", action="store_true",
                   help="batch mode: use the contiguous batched KV cache "
                        "instead of the default paged pool")
    p.add_argument("--page-size", dest="page_size", type=int, default=512,
                   help="paged-cache page rows (= flash block size)")
    p.add_argument("--no-warmup", dest="no_warmup", action="store_true",
                   help="skip precompiling the serving programs at "
                        "startup (the first request then pays every "
                        "compile)")
    p.add_argument("--background-warmup", dest="background_warmup",
                   action="store_true",
                   help="serve immediately and precompile behind traffic: "
                        "the first request compiles only its own programs "
                        "while the full bucket sweep finishes on a "
                        "background thread")
    args = p.parse_args(argv)

    from lmrs_tpu.runtime.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    server = BackendServer(args.model, args.tokenizer, args.temperature,
                           args.top_p, args.seed, args.multimodal,
                           args.num_crops, batch=args.batch,
                           max_ctx=args.max_ctx, matmul_impl=args.impl,
                           tp=args.tp, cp=args.cp, spec_k=args.spec_k,
                           pool_tokens=args.pool_tokens,
                           page_size=args.page_size, dp=args.dp,
                           no_paged=args.no_paged)
    if not args.no_warmup:
        server.warmup(background=args.background_warmup)
    try:
        asyncio.run(server.serve(args.ip, args.port))
    except KeyboardInterrupt:
        print("\nShutting down.")


if __name__ == "__main__":
    main()
