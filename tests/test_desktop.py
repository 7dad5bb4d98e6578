"""Local web chat app: page serving + model socket."""

import json
import threading
import urllib.request

import pytest

websockets = pytest.importorskip("websockets")

from test_backend import artifacts  # fixture reuse  # noqa: F401


def test_desktop_page_and_socket(artifacts):  # noqa: F811
    import asyncio
    from http.server import ThreadingHTTPServer

    from lmrs_tpu.cli.desktop import _PageHandler
    from lmrs_tpu.serve.backend import BackendServer

    model_path, tok_path = artifacts

    _PageHandler.ws_port = 0  # placeholder; patched below
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _PageHandler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    http_port = httpd.server_address[1]

    page = urllib.request.urlopen(
        f"http://127.0.0.1:{http_port}", timeout=10).read().decode()
    assert "<!DOCTYPE html>" in page
    assert "WebSocket" in page

    server = BackendServer(model_path, tok_path, temperature=0.0)

    async def run():
        import websockets

        async with websockets.serve(server.handle, "127.0.0.1", 0) as srv:
            port = list(srv.sockets)[0].getsockname()[1]
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send(json.dumps({"text": "hi"}))
                while True:
                    msg = json.loads(await asyncio.wait_for(ws.recv(), 60))
                    if (msg["category"] == "OUTPUT"
                            and msg["text"] == "<eos>"):
                        return True

    assert asyncio.run(run())
    httpd.shutdown()
