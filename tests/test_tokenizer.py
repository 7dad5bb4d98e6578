"""Tokenizer: greedy scored merges, byte fallback, chat templates, container
roundtrip, streaming decode."""

import pytest

from lmrs_tpu.config import ModelType
from lmrs_tpu.tokenizer import (
    CHAT_PREFIX,
    CHAT_SUFFIX,
    StreamDecoder,
    Tokenizer,
)


def make_toy_tokenizer():
    """Vocab with single chars, merges with distinct scores, byte tokens."""
    vocab = ["<pad>", "<s>", "</s>"]
    vocab += [f"<0x{b:02X}>" for b in range(256)]  # ids 3..258, like llama2.c
    base = len(vocab)
    pieces = {
        "h": 0.1, "e": 0.1, "l": 0.1, "o": 0.1, " ": 0.1, "w": 0.1,
        "r": 0.1, "d": 0.1,
        "he": 1.0, "ll": 2.0, "llo": 3.0, "hello": 5.0, " w": 1.5,
        "or": 1.2, "ld": 1.1, "orld": 2.5, "world": 4.0, " world": 4.5,
    }
    scores = [0.0] * base
    for p, s in pieces.items():
        vocab.append(p)
        scores.append(s)
    return Tokenizer(vocab, scores, bos=1, eos=2)


def test_greedy_merge_order():
    tok = make_toy_tokenizer()
    ids = tok.encode("hello world")
    texts = [tok.vocab[i] for i in ids]
    # greedy scored merging must reach the full words
    assert texts == ["hello", " world"]


def test_merge_prefers_highest_score_not_leftmost():
    # "ll" (2.0) merges before "he" (1.0) even though "he" is leftmost
    tok = make_toy_tokenizer()
    toks = [tok._lookup[c] for c in "hel"] + [tok._lookup["l"]]
    merged = tok._merge(toks)
    # hell -> he + ll -> ... final should be [he, ll] since "hell" not in vocab
    assert [tok.vocab[i] for i in merged] == ["he", "ll"]


def test_byte_fallback():
    tok = make_toy_tokenizer()
    ids = tok.encode("é")  # not in vocab; utf-8 C3 A9 → bytes + 3
    assert ids == [0xC3 + 3, 0xA9 + 3]


def test_bos_eos_flags():
    tok = make_toy_tokenizer()
    ids = tok.encode("hello", bos=True, eos=True)
    assert ids[0] == tok.bos and ids[-1] == tok.eos


@pytest.mark.parametrize("family", [ModelType.GEMMA, ModelType.LLAMA,
                                    ModelType.PHI])
def test_chat_format_tokens(family):
    tok = make_toy_tokenizer()
    ids = tok.encode("hello", chat_format=True, model_type=family)
    prefix = CHAT_PREFIX[family](tok.bos)
    suffix = CHAT_SUFFIX[family]
    assert ids[: len(prefix)] == prefix
    assert ids[-len(suffix):] == suffix
    # reference values (src/tokenizer.rs:88-96,136-144)
    if family == ModelType.GEMMA:
        assert prefix == [1, 106, 1645, 108]
        assert suffix == [107, 108, 106, 2516, 108]
    elif family == ModelType.LLAMA:
        assert prefix == [128006, 882, 128007, 271]
        assert suffix == [128009, 128006, 78191, 128007, 271]
    else:
        assert prefix == [1, 32010, 29871, 13]
        assert suffix == [32007, 29871, 13, 32001, 29871, 13]


def test_empty_text_raises():
    tok = make_toy_tokenizer()
    with pytest.raises(ValueError):
        tok.encode("")


def test_container_roundtrip(tmp_path):
    tok = make_toy_tokenizer()
    path = str(tmp_path / "tokenizer.bin")
    tok.save(path)
    tok2 = Tokenizer.from_file(path)
    assert tok2.vocab == tok.vocab
    assert tok2.scores == pytest.approx(tok.scores)
    assert (tok2.bos, tok2.eos) == (tok.bos, tok.eos)
    assert tok2.encode("hello world") == tok.encode("hello world")


def test_decode_byte_token_reference_semantics():
    tok = make_toy_tokenizer()
    # reference maps <0xHH> to the Unicode scalar U+00HH (latin-1)
    assert tok.decode(0xC3 + 3) == "Ã"
    assert tok.decode_bytes(0xC3 + 3) == b"\xc3"


def test_stream_decoder_reassembles_utf8():
    tok = make_toy_tokenizer()
    sd = StreamDecoder(tok)
    # 'é' arrives as two byte tokens; nothing emitted until complete
    assert sd.push(0xC3 + 3) == ""
    assert sd.push(0xA9 + 3) == "é"
    # plain tokens pass through
    assert sd.push(tok._lookup["hello"]) == "hello"
    assert sd.flush() == ""
