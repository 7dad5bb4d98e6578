"""WebSocket backend: protocol round-trip over a live localhost server."""

import asyncio
import json
import threading

import numpy as np
import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.io.lmrs import write_lmrs
from lmrs_tpu.io.synthetic import random_weights, tiny_config
from lmrs_tpu.quant import QuantType
from lmrs_tpu.tokenizer import Tokenizer

websockets = pytest.importorskip("websockets")


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("backend")
    cfg = tiny_config(ModelType.LLAMA, QuantType.Q8_0, vocab_size=512)
    model_path = str(d / "m.lmrs")
    write_lmrs(model_path, cfg, random_weights(cfg, 2))
    vocab = ["<pad>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    import string
    vocab += list(" " + string.ascii_letters + ".,!?")
    vocab += ["~"] * (512 - len(vocab))
    tok_path = str(d / "tok.bin")
    Tokenizer(vocab, [0.0] * len(vocab), 1, 2).save(tok_path)
    return model_path, tok_path


def test_backend_protocol(artifacts):
    from lmrs_tpu.serve.backend import BackendServer

    model_path, tok_path = artifacts
    server = BackendServer(model_path, tok_path, temperature=0.0)

    async def run():
        import websockets

        async with websockets.serve(server.handle, "127.0.0.1", 0) as ws_srv:
            port = list(ws_srv.sockets)[0].getsockname()[1]
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send(json.dumps({"text": "hello"}))
                pieces = []
                categories = set()
                while True:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 60))
                    categories.add(msg["category"])
                    if msg["category"] == "OUTPUT":
                        if msg["text"] == "<eos>":
                            break
                        pieces.append(msg["text"])
                assert "OUTPUT" in categories
                # second turn on the same connection continues the session
                await ws.send(json.dumps({"text": "again"}))
                got_eos = False
                while True:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 60))
                    if msg["category"] == "OUTPUT" and msg["text"] == "<eos>":
                        got_eos = True
                        break
                assert got_eos
        return pieces

    pieces = asyncio.run(run())
    # a tiny random model may emit anything (or immediately hit a stop
    # token); the protocol contract is what we assert
    assert isinstance(pieces, list)


def test_backend_background_warmup_serves_immediately(artifacts):
    """warmup(background=True) must return without blocking and traffic
    sent right away must complete (compiling its own programs on demand)
    while the bucket sweep finishes on the daemon thread."""
    import time

    from lmrs_tpu.serve.backend import BackendServer

    model_path, tok_path = artifacts
    server = BackendServer(model_path, tok_path, temperature=0.0)
    t0 = time.time()
    server.warmup(background=True)
    assert time.time() - t0 < 5.0, "background warmup blocked the caller"
    assert server._warmup_thread is not None

    async def run():
        import websockets

        async with websockets.serve(server.handle, "127.0.0.1", 0) as ws_srv:
            port = list(ws_srv.sockets)[0].getsockname()[1]
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send(json.dumps({"text": "hi"}))
                while True:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 120))
                    if msg["category"] == "OUTPUT" and msg["text"] == "<eos>":
                        return True

    assert asyncio.run(run())
    server._warmup_thread.join(timeout=300)
    assert not server._warmup_thread.is_alive(), "warmup never finished"


def test_backend_bad_json_ignored(artifacts):
    from lmrs_tpu.serve.backend import BackendServer

    model_path, tok_path = artifacts
    server = BackendServer(model_path, tok_path, temperature=0.0)

    async def run():
        import websockets

        async with websockets.serve(server.handle, "127.0.0.1", 0) as ws_srv:
            port = list(ws_srv.sockets)[0].getsockname()[1]
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send("{not json")
                await ws.send(json.dumps({"text": "ok"}))
                while True:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 60))
                    if msg["category"] == "OUTPUT" and msg["text"] == "<eos>":
                        return True

    assert asyncio.run(run())


@pytest.mark.slow  # heavy: excluded from the default fast run
def test_backend_batched_concurrent(artifacts):
    """--batch mode: two connections decode concurrently through one
    shared scheduler; both conversations stream and keep multi-turn
    state."""
    from lmrs_tpu.serve.backend import BackendServer

    model_path, tok_path = artifacts
    server = BackendServer(model_path, tok_path, temperature=0.0,
                           batch=2, max_ctx=96, max_new_tokens=8)

    async def converse(port, text):
        import websockets

        pieces = []
        async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
            for turn in (text, text + " more"):
                await ws.send(json.dumps({"text": turn}))
                while True:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 120))
                    if msg["category"] == "OUTPUT":
                        if msg["text"] == "<eos>":
                            break
                        pieces.append(msg["text"])
        return pieces

    async def run():
        import websockets

        async with websockets.serve(server.handle, "127.0.0.1", 0) as srv:
            port = list(srv.sockets)[0].getsockname()[1]
            return await asyncio.gather(converse(port, "hi"),
                                        converse(port, "yo"))

    out = asyncio.run(run())
    assert len(out) == 2
    server.scheduler.shutdown()


@pytest.mark.slow  # heavy: excluded from the default fast run
def test_backend_batched_tp(artifacts):
    """--batch --tp: connections share one scheduler whose batched step
    runs under shard_map over a 2-device tp mesh (the full serving stack:
    websocket -> scheduler -> mesh program)."""
    from lmrs_tpu.serve.backend import BackendServer

    model_path, tok_path = artifacts
    server = BackendServer(model_path, tok_path, temperature=0.0,
                           batch=2, max_ctx=96, max_new_tokens=8, tp=2)
    assert server._mesh_scheduler is not None

    async def converse(port, text):
        import websockets

        pieces = []
        async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
            await ws.send(json.dumps({"text": text}))
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), 120))
                if msg["category"] == "OUTPUT":
                    if msg["text"] == "<eos>":
                        break
                    pieces.append(msg["text"])
        return pieces

    async def run():
        import websockets

        async with websockets.serve(server.handle, "127.0.0.1", 0) as srv:
            port = list(srv.sockets)[0].getsockname()[1]
            return await asyncio.gather(converse(port, "hi"),
                                        converse(port, "yo"))

    out = asyncio.run(run())
    assert len(out) == 2
    server.scheduler.shutdown()


@pytest.mark.slow  # heavy: excluded from the default fast run
def test_backend_batched_dp(artifacts):
    """--batch --dp: two concurrent connections land on DIFFERENT
    scheduler replicas (least-loaded routing) and both stream tokens —
    the dp serving product path (VERDICT r3 next #5)."""
    from lmrs_tpu.serve.backend import BackendServer

    model_path, tok_path = artifacts
    server = BackendServer(model_path, tok_path, temperature=0.0,
                           batch=1, max_ctx=96, max_new_tokens=8, dp=2)
    assert server.router is not None
    assert len(server._replica_threads) == 2
    server.warmup()

    async def converse(port, text):
        import websockets

        pieces = []
        async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
            await ws.send(json.dumps({"text": text}))
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), 120))
                if msg["category"] == "OUTPUT":
                    if msg["text"] == "<eos>":
                        break
                    pieces.append(msg["text"])
        return pieces

    async def run():
        import websockets

        async with websockets.serve(server.handle, "127.0.0.1", 0) as srv:
            port = list(srv.sockets)[0].getsockname()[1]
            # batch=1 per replica: two concurrent conversations only fit
            # if the router spreads them across both replicas
            return await asyncio.gather(converse(port, "hi"),
                                        converse(port, "yo"))

    out = asyncio.run(run())
    assert len(out) == 2 and all(out)
    assert all(r.tokens_emitted > 0 for r in server.router.replicas)
    for th in server._replica_threads:
        th.shutdown()


def test_backend_dp_requires_batch(artifacts):
    from lmrs_tpu.serve.backend import BackendServer

    model_path, tok_path = artifacts
    with pytest.raises(ValueError, match="--dp requires --batch"):
        BackendServer(model_path, tok_path, dp=2)
