"""Structured (grammar-constrained) output.

Capability parity with the reference's structured-output plane
(`src/doc/engine_core.md:86, 106-107, 307-310`): per-request grammar
initialized at admission, advanced on every emitted token, and surfaced
to the sampler as a per-step allowed-token set.

TPU-native shape discipline: instead of shipping a [B, V] bitmask to the
device every step (V=152k → tens of MB), the host sends a padded
[B, MAX_ALLOWED] allowed-token-id list; the masked sampler scatters -inf
everywhere else in-trace. Rows with count==0 are unconstrained.

Grammars here are token-trie based (enums/choices/forced prefixes —
`TrieGrammar`), plus a regex-free JSON-array-of-strings style constraint
can be composed from tries. Requests with a grammar decode one token per
device call (the fused multi-step path cannot consult the host FSM
mid-call); the runner handles the switch automatically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

MAX_ALLOWED = 64  # padded width of the per-step allowed-token list


class Grammar:
    """Interface: immutable spec + explicit state threading."""

    def initial_state(self):
        raise NotImplementedError

    def allowed(self, state) -> list[int] | None:
        """Allowed next token ids, or None when unconstrained."""
        raise NotImplementedError

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
        max_branch = self._max_branching(self.root)
        if max_branch > MAX_ALLOWED:
            raise ValueError(
                f"grammar branching factor {max_branch} exceeds {MAX_ALLOWED}"
            )

    @classmethod
    def from_choices(cls, choices: Sequence[str], tokenizer) -> "TrieGrammar":
        return cls([tokenizer.encode(c) for c in choices])

    def _max_branching(self, node) -> int:
        m = len(node.children)
        for c in node.children.values():
            m = max(m, self._max_branching(c))
        return m

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

    def __init__(self):
        self.states: dict[str, tuple[Grammar, object]] = {}

    def add(self, request_id: str, grammar: Grammar) -> None:
        self.states[request_id] = (grammar, grammar.initial_state())

    def remove(self, request_id: str) -> None:
        self.states.pop(request_id, None)

    def allowed(self, request_id: str) -> list[int] | None:
        entry = self.states.get(request_id)
        if entry is None:
            return None
        grammar, state = entry
        return grammar.allowed(state)

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
