"""Grammar engine against a REAL byte-level-BPE tokenizer at a
six-figure vocab (round-2 review item 6: the GPT-2 byte-unmapping branch
of TokenIndex.from_tokenizer — the one every real Qwen deployment hits,
including the 151665 -> 151936 logit-pad path — previously had no test
with an actual byte-BPE tokenizer).

A Qwen-SHAPED tokenizer is fabricated locally with `tokenizers` (no
network): byte-level alphabet + programmatic merges up to 151,665
entries plus an <|endoftext|> special, saved and reloaded through the
real HFTokenizer path. This also gives HFTokenizer its first test.
"""

import json
import time

import numpy as np
import pytest

from vllm_omni_draft_tpu.core.grammar import (
    JsonSchemaGrammar,
    RegexGrammar,
    TokenIndex,
    get_token_index,
)

QWEN_VOCAB = 151_665  # tokenizer entries (Qwen2.5 convention)
MODEL_VOCAB = 151_936  # padded logit width


@pytest.fixture(scope="module")
def bpe_tokenizer(tmp_path_factory):
    """Fabricate a byte-level BPE tokenizer with a Qwen-sized vocab and
    load it back through the real HFTokenizer/AutoTokenizer path."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from tokenizers.pre_tokenizers import ByteLevel
    from transformers import PreTrainedTokenizerFast

    from vllm_omni_draft_tpu.core.tokenizer import HFTokenizer

    alphabet = sorted(ByteLevel.alphabet())
    assert len(alphabet) == 256
    vocab: dict[str, int] = {ch: i for i, ch in enumerate(alphabet)}
    merges: list[tuple[str, str]] = []
    # level 1: all byte pairs (65,536 merges)
    for a in alphabet:
        for b in alphabet:
            if len(vocab) >= QWEN_VOCAB:
                break
            tok = a + b
            if tok not in vocab:
                vocab[tok] = len(vocab)
                merges.append((a, b))
        if len(vocab) >= QWEN_VOCAB:
            break
    # level 2: pair + byte until the Qwen count is reached — includes
    # 3-byte tokens so the mask walk exercises multi-byte strings
    outer = False
    for a in alphabet:
        for b in alphabet:
            pair = a + b
            if pair not in vocab:
                continue
            for c in alphabet:
                tok = pair + c
                if tok in vocab:
                    continue
                vocab[tok] = len(vocab)
                merges.append((pair, c))
                if len(vocab) >= QWEN_VOCAB:
                    outer = True
                    break
            if outer:
                break
        if outer:
            break
    assert len(vocab) == QWEN_VOCAB

    tk = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tk,
        eos_token="<|endoftext|>",  # appended at id 151665
        model_max_length=10**9,
    )
    path = tmp_path_factory.mktemp("qwen_bpe")
    fast.save_pretrained(str(path))
    return HFTokenizer(str(path))


def test_bpe_index_byte_unmapping(bpe_tokenizer):
    """TokenIndex must invert the bytes_to_unicode table: every token's
    byte string must round-trip the tokenizer's own decode."""
    idx = get_token_index(bpe_tokenizer)
    assert idx.V >= QWEN_VOCAB
    assert idx.eos_token_id == bpe_tokenizer.eos_token_id
    text = 'the quick {"a": 1, "b": [2.5, null]} éü✓'
    ids = bpe_tokenizer._tok.encode(text, add_special_tokens=False)
    got = b"".join(idx.tok[t, : idx.len[t]].tobytes() for t in ids)
    assert got == text.encode("utf-8")


def test_bpe_grammar_walk_and_logit_pad(bpe_tokenizer):
    """Encode a schema-valid JSON doc with the REAL tokenizer and walk
    the grammar token-by-token: every emitted token must be allowed by
    the mask at the padded MODEL vocab width (151936), and no padding id
    may ever be allowed."""
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string", "maxLength": 12},
            "vals": {"type": "array", "items": {"type": "integer"},
                     "maxItems": 4},
        },
        "required": ["name", "vals"],
        "additionalProperties": False,
    }
    g = JsonSchemaGrammar(schema, bpe_tokenizer)
    g.validate(MODEL_VOCAB)
    doc = json.dumps({"name": "ab", "vals": [1, 23]}, separators=(",", ":"))
    ids = bpe_tokenizer._tok.encode(doc, add_special_tokens=False)
    assert len(ids) < len(doc), "merges should compress the doc"
    st = g.initial_state()
    for t in ids:
        mask = g.allowed_mask(st)
        assert mask.size == MODEL_VOCAB // 32
        bits = np.unpackbits(mask.view(np.uint8), bitorder="little")
        assert bits[t], (t, bpe_tokenizer.decode([t]))
        # the logit-pad region must stay dead
        assert not bits[g.index.V:MODEL_VOCAB].any()
        st = g.advance(st, t)
    bits = np.unpackbits(g.allowed_mask(st).view(np.uint8), bitorder="little")
    assert bits[bpe_tokenizer.eos_token_id], "EOS must be allowed at accept"


def test_bpe_mask_build_latency(bpe_tokenizer):
    """Record mask-build latency per FRESH state at V=152k (the
    '19 KB/state ride-along' claim from round 1). Prints the number for
    PERF_NOTES; asserts only a generous ceiling so CI stays stable."""
    g = RegexGrammar(r'\{"k": ?"[a-z]{1,20}"\}', bpe_tokenizer)
    g.validate(MODEL_VOCAB)
    states = []
    st = g.initial_state()
    for b in b'{"k": "abcdefg':
        states.append(st)
        st = g.advance(st, b)
    t0 = time.perf_counter()
    n = 0
    for s in dict.fromkeys(states):  # unique, order-kept; all uncached
        g.allowed_mask(s)
        n += 1
    dt = (time.perf_counter() - t0) / n
    print(f"\nmask build: {dt*1e3:.1f} ms/state at V={g.index.V} "
          f"(packed mask {MODEL_VOCAB // 8 / 1024:.1f} KiB/state)")
    assert dt < 2.0, f"mask build pathologically slow: {dt:.2f}s/state"


def test_bpe_specials_never_allowed(bpe_tokenizer):
    """Special ids (here: EOS) must be excluded from text masks except
    via the accept-state EOS rule."""
    g = RegexGrammar(r"[a-z]+", bpe_tokenizer)
    g.validate(MODEL_VOCAB)
    st = g.initial_state()
    bits = np.unpackbits(g.allowed_mask(st).view(np.uint8), bitorder="little")
    assert not bits[bpe_tokenizer.eos_token_id]  # not accepting yet
    st = g.advance(st, bpe_tokenizer._tok.encode("ab", add_special_tokens=False)[0])
    bits = np.unpackbits(g.allowed_mask(st).view(np.uint8), bitorder="little")
    assert bits[bpe_tokenizer.eos_token_id]  # accepting now
