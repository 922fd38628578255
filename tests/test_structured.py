"""Structured (grammar-constrained) output tests."""

import numpy as np
import pytest

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_omni_draft_tpu.core.request import SamplingParams
from vllm_omni_draft_tpu.core.structured import (
    MAX_ALLOWED,
    StructuredOutputManager,
    TrieGrammar,
)
from vllm_omni_draft_tpu.core.tokenizer import ByteTokenizer
from vllm_omni_draft_tpu.engine.llm import LLM


def _config(**kw):
    return EngineConfig(
        model=ModelConfig.tiny(vocab_size=258, max_model_len=128),
        cache=CacheConfig(block_size=4, num_blocks=64),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  prefill_buckets=(16, 64), **kw),
    )


def test_trie_grammar_mechanics():
    g = TrieGrammar([[1, 2, 3], [1, 5], [7]])
    s = g.initial_state()
    assert sorted(g.allowed(s)) == [1, 7]
    s = g.advance(s, 1)
    assert sorted(g.allowed(s)) == [2, 5]
    s = g.advance(s, 5)
    assert g.is_terminal(s)
    with pytest.raises(ValueError):
        TrieGrammar([])
    with pytest.raises(ValueError):
        TrieGrammar([[1], []])


def test_manager_advance_and_terminal():
    m = StructuredOutputManager()
    m.add("r", TrieGrammar([[4, 5, 6]]))
    assert m.allowed("r") == [4]
    assert not m.advance("r", [4, 5])
    assert m.allowed("r") == [6]
    assert m.advance("r", [6])
    m.remove("r")
    assert m.allowed("r") is None


def test_constrained_generation_follows_grammar():
    """The engine must emit exactly one of the grammar's sequences, even
    though the random model would never choose it freely."""
    llm = LLM(_config())
    tok = ByteTokenizer()
    choices = ["yes", "no", "maybe"]
    g = TrieGrammar.from_choices(choices, tok)
    sp = SamplingParams(max_tokens=16, temperature=0.0, grammar=g,
                        ignore_eos=True)
    out = llm.generate(["please answer:"], [sp])[0]
    assert out.outputs[0].text in choices
    assert out.outputs[0].finish_reason == "stop"


def test_constrained_sampled_generation():
    llm = LLM(_config())
    tok = ByteTokenizer()
    g = TrieGrammar.from_choices(["aa", "bb"], tok)
    sp = SamplingParams(max_tokens=8, temperature=1.0, grammar=g,
                        ignore_eos=True)
    texts = {llm.generate(["x"], [SamplingParams(**{**sp.__dict__})])[0]
             .outputs[0].text for _ in range(6)}
    assert texts <= {"aa", "bb"}


def test_mixed_batch_constrained_and_free():
    llm = LLM(_config())
    tok = ByteTokenizer()
    g = TrieGrammar.from_choices(["ok"], tok)
    free_sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    con_sp = SamplingParams(max_tokens=6, temperature=0.0, grammar=g,
                            ignore_eos=True)
    # free-only reference run
    ref = LLM(_config()).generate(["hello"], [free_sp])[0]
    outs = llm.generate(["hello", "choose"], [free_sp, con_sp])
    assert outs[1].outputs[0].text == "ok"
    # the free request must be unaffected by its constrained batchmate
    assert outs[0].outputs[0].token_ids == ref.outputs[0].token_ids


def test_grammar_with_fused_decode_steps():
    """decode_steps > 1 must not break constrained requests (runner drops
    to single-step while a grammar is active)."""
    llm = LLM(_config(decode_steps=4))
    tok = ByteTokenizer()
    g = TrieGrammar.from_choices(["abc"], tok)
    sp = SamplingParams(max_tokens=10, temperature=0.0, grammar=g,
                        ignore_eos=True)
    out = llm.generate(["x"], [sp])[0]
    assert out.outputs[0].text == "abc"


def test_wide_trie_no_branching_cap():
    """Branching beyond the old MAX_ALLOWED=64 is fine now (packed
    bitmask path replaced the padded id list)."""
    g = TrieGrammar([[i] for i in range(200)])
    assert len(g.allowed(g.initial_state())) == 200
    m = StructuredOutputManager(vocab_size=258)
    m.add("r", g)
    mask = m.mask("r")
    assert mask.dtype == np.uint32 and mask.shape == (-(-258 // 32),)
    bits = np.unpackbits(mask.view(np.uint8), bitorder="little")[:258]
    assert bits.sum() == 200
