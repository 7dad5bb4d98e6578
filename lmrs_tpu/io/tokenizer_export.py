"""Export HuggingFace tokenizers to the `tokenizer.bin` container.

Re-implementation of the reference's conversion scripts
(reference: tokenizer.py:1-17, utils/tokenizers/{gemma,llama,phi}.py).
Requires `transformers` (and a downloadable/local model) — offline
environments can construct `lmrs_tpu.tokenizer.Tokenizer` directly instead.
"""

from __future__ import annotations

from typing import List, Tuple

from lmrs_tpu.tokenizer import Tokenizer


def _sp_tokens(sp_model, bos_id: int, eos_id: int) -> Tuple[List[str], List[float]]:
    """SentencePiece vocab with the reference's post-processing
    (reference: utils/tokenizers/gemma.py:22-37): bos/eos renamed to
    '\\n<s>\\n' / '\\n</s>\\n', '▁' → space."""
    tokens, scores = [], []
    for i in range(sp_model.vocab_size()):
        t = sp_model.id_to_piece(i)
        if i == bos_id:
            t = "\n<s>\n"
        elif i == eos_id:
            t = "\n</s>\n"
        t = t.replace("\u2581", " ")
        tokens.append(t)
        scores.append(float(sp_model.get_score(i)))
    return tokens, scores


def export_gemma(model_id: str) -> Tokenizer:
    """reference: utils/tokenizers/gemma.py:8-46."""
    from transformers import AutoTokenizer

    sp = AutoTokenizer.from_pretrained(model_id, use_fast=False).sp_model
    tokens, scores = _sp_tokens(sp, sp.bos_id(), sp.eos_id())
    return Tokenizer(tokens, scores, sp.bos_id(), sp.eos_id())


def export_llama(model_id: str) -> Tokenizer:
    """reference: utils/tokenizers/llama.py:7-36 — tiktoken-style vocab,
    all scores 1.0 (merge priority resolved by the decoded strings)."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_id, use_fast=False)
    n = len(tok)
    tokens = [tok.decode([i]) for i in range(n)]
    scores = [1.0] * n
    return Tokenizer(tokens, scores, tok.bos_token_id, tok.eos_token_id)


def export_phi(model_id: str) -> Tokenizer:
    """reference: utils/tokenizers/phi.py:6-68 — sp_model + added special
    tokens, eos forced to 32007 (<|end|>), '<|placeholder7|>' pad appended
    for the mini variant."""
    from transformers import AutoTokenizer

    special = AutoTokenizer.from_pretrained(model_id).added_tokens_decoder
    base_id = ("microsoft/Phi-3.5-mini-instruct"
               if "vision" in model_id else model_id)
    sp = AutoTokenizer.from_pretrained(base_id, use_fast=False).sp_model

    n_words = sp.vocab_size()
    eos_id = 32007
    tokens, scores = _sp_tokens(sp, sp.bos_id(), sp.eos_id())
    for i in sorted(special.keys()):
        if i <= n_words:
            continue
        t = special[i].content.replace("\u2581", " ")
        tokens.append(t)
        scores.append(0.0)
        n_words += 1
    if model_id == "microsoft/Phi-3.5-mini-instruct":
        tokens.append("<|placeholder7|>")
        scores.append(0.0)
    return Tokenizer(tokens, scores, sp.bos_id(), eos_id)


EXPORTERS = {"GEMMA": export_gemma, "LLAMA": export_llama, "PHI": export_phi}


def export_tokenizer(model_id: str, tokenizer_type: str,
                     out_path: str = "tokenizer.bin") -> Tokenizer:
    tok = EXPORTERS[tokenizer_type.upper()](model_id)
    tok.save(out_path)
    return tok
