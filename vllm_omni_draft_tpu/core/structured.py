"""Structured (grammar-constrained) output.

Capability parity with the reference's structured-output plane
(`src/doc/engine_core.md:86, 106-107, 307-310`): per-request grammar
initialized at admission, advanced on every emitted token, and surfaced
to the sampler as a per-step PACKED TOKEN BITMASK (uint32 words, bit i of
word w = token id w*32+i) — the same grammar-bitmask contract the
reference inherits from vLLM/xgrammar. The runner unpacks the words
in-trace and -inf-masks the logits, so arbitrary-width allowed sets
(e.g. "any valid JSON string continuation", ~150k tokens) cost one
[B, ceil(V/32)] h2d ride-along per step.

Grammar backends:
  * `TrieGrammar` — token-sequence tries (enums/choices/forced strings);
  * `core/grammar.RegexGrammar` — byte-level regex → DFA;
  * `core/grammar.JsonSchemaGrammar` — JSON schema → regex → DFA.

Requests with a grammar decode one token per device call (the host FSM
must advance between tokens); in a MIXED batch the runner keeps spec
decode / fused multi-step for the unconstrained rows and runs the masked
single-step program only over the constrained rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

# legacy padded-list width, kept for small-set fast paths and backward
# compatibility; NOT a grammar limit anymore (wide sets use the bitmask)
MAX_ALLOWED = 64


def pack_token_ids(ids: Sequence[int], vocab_size: int) -> np.ndarray:
    """Token id list -> packed uint32 bitmask [ceil(V/32)] (little bit
    order: bit i of word w covers id w*32+i)."""
    W = -(-vocab_size // 32)
    bits = np.zeros(W * 32, bool)
    arr = np.asarray(list(ids), np.int64)
    if arr.size:
        bits[arr] = True
    return np.packbits(bits, bitorder="little").view(np.uint32)


class Grammar:
    """Interface: immutable spec + explicit state threading."""

    def initial_state(self):
        raise NotImplementedError

    def allowed(self, state) -> list[int] | None:
        """Allowed next token ids, or None when unconstrained."""
        raise NotImplementedError

    def allowed_mask(self, state) -> np.ndarray | None:
        """Packed uint32 bitmask of allowed ids, or None to have the
        manager pack `allowed()` (fine for small sets). FSM grammars
        override this with cached per-DFA-state masks."""
        return None

    def advance(self, state, token: int):
        raise NotImplementedError

    def is_terminal(self, state) -> bool:
        raise NotImplementedError

    def validate(self, vocab_size: int) -> None:
        """Reject grammars referencing out-of-vocab tokens (a masked row
        whose whole allowed set is invalid would degenerate to uniform
        sampling)."""


@dataclass
class _TrieNode:
    children: dict[int, "_TrieNode"] = field(default_factory=dict)
    terminal: bool = False


class TrieGrammar(Grammar):
    """Constrain output to one of a set of token sequences (enums /
    choices / forced strings). After completing a sequence the grammar is
    terminal; the engine stops the request there."""

    def __init__(self, sequences: Sequence[Sequence[int]]):
        if not sequences:
            raise ValueError("TrieGrammar needs at least one sequence")
        self.root = _TrieNode()
        for seq in sequences:
            if not seq:
                raise ValueError("empty sequence in TrieGrammar")
            node = self.root
            for t in seq:
                node = node.children.setdefault(int(t), _TrieNode())
            node.terminal = True

    @classmethod
    def from_choices(cls, choices: Sequence[str], tokenizer) -> "TrieGrammar":
        return cls([tokenizer.encode(c) for c in choices])

    def initial_state(self):
        return self.root

    def allowed(self, state) -> list[int] | None:
        return list(state.children.keys())

    def advance(self, state, token: int):
        nxt = state.children.get(int(token))
        if nxt is None:
            # ill-formed emission (shouldn't happen under masking); stay
            return state
        return nxt

    def is_terminal(self, state) -> bool:
        # stop at the first completed sequence (shortest-match)
        return state.terminal

    def validate(self, vocab_size: int) -> None:
        def walk(node):
            for t, child in node.children.items():
                if not (0 <= t < vocab_size):
                    raise ValueError(
                        f"grammar token id {t} outside vocab (size {vocab_size})"
                    )
                walk(child)

        walk(self.root)


class StructuredOutputManager:
    """Per-request grammar-state bookkeeping (reference:
    StructuredOutputManager, `VLLM_V1_Interface.md:65`)."""

    def __init__(self, vocab_size: int | None = None):
        self.states: dict[str, tuple[Grammar, object]] = {}
        self.vocab_size = vocab_size
        # cache of packed list-derived masks keyed on (rid, state id)
        self._packed: dict[tuple[str, int], np.ndarray] = {}

    def add(self, request_id: str, grammar: Grammar) -> None:
        self.states[request_id] = (grammar, grammar.initial_state())

    def remove(self, request_id: str) -> None:
        self.states.pop(request_id, None)
        self._packed = {
            k: v for k, v in self._packed.items() if k[0] != request_id
        }

    def allowed(self, request_id: str) -> list[int] | None:
        entry = self.states.get(request_id)
        if entry is None:
            return None
        grammar, state = entry
        return grammar.allowed(state)

    def mask(self, request_id: str) -> np.ndarray | None:
        """Packed uint32 bitmask of allowed next tokens, or None when the
        request is unconstrained. FSM grammars serve their own per-state
        cache; list grammars are packed here (cached per trie node)."""
        entry = self.states.get(request_id)
        if entry is None:
            return None
        grammar, state = entry
        m = grammar.allowed_mask(state)
        if m is not None:
            return m
        if self.vocab_size is None:
            raise ValueError(
                "StructuredOutputManager needs vocab_size to pack id-list "
                "grammars"
            )
        key = (request_id, id(state))
        m = self._packed.get(key)
        if m is None:
            m = pack_token_ids(grammar.allowed(state) or [], self.vocab_size)
            self._packed[key] = m
        return m

    def advance(self, request_id: str, tokens: Sequence[int]) -> bool:
        """Advance through emitted tokens; returns True when terminal."""
        entry = self.states.get(request_id)
        if entry is None:
            return False
        grammar, state = entry
        for t in tokens:
            state = grammar.advance(state, t)
        self.states[request_id] = (grammar, state)
        return grammar.is_terminal(state)
