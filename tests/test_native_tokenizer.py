"""C++ tokenizer engine vs the pure-Python merge loop: identical results."""

import time

import numpy as np
import pytest

from lmrs_tpu.native import available
from test_tokenizer import make_toy_tokenizer

pytestmark = pytest.mark.skipif(not available(),
                                reason="native toolchain unavailable")


def _py_fallback(tok):
    """Clone with the native engine detached."""
    import copy

    t2 = copy.copy(tok)
    t2._native = None
    return t2


def test_native_matches_python_merge():
    tok = make_toy_tokenizer()
    assert tok._native is not None, "native engine should attach"
    py = _py_fallback(tok)
    for text in ["hello world", "hello", "wordword hello", "é hello",
                 "w o r l d"]:
        assert tok.encode(text) == py.encode(text)


def test_native_handles_out_of_vocab_ids():
    tok = make_toy_tokenizer()
    py = _py_fallback(tok)
    ids = [999999, tok._lookup["h"], tok._lookup["e"], 888888]
    assert tok._merge(ids) == py._merge(ids)


def test_native_q4_repack_matches_numpy():
    import numpy as np

    from lmrs_tpu.native import q4_repack
    from lmrs_tpu.quant import q4_file_to_runtime_np

    rng = np.random.default_rng(1)
    for gs in (16, 32, 128):
        src = rng.integers(0, 256, (32, 4 * gs // 2), dtype=np.uint8)
        want = q4_file_to_runtime_np(src, gs)
        got = q4_repack(src, gs).reshape(src.shape)
        np.testing.assert_array_equal(got, want)


def test_native_is_faster_on_long_text():
    tok = make_toy_tokenizer()
    py = _py_fallback(tok)
    text = "hello world " * 300

    t0 = time.perf_counter()
    a = tok.encode(text)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    b = py.encode(text)
    t_py = time.perf_counter() - t0

    assert a == b
    # informational speedup check — native should win by a wide margin
    assert t_native < t_py, (t_native, t_py)
