"""Regex / JSON-schema grammar engine: byte-level DFA + token bitmasks.

The real structured-output backend (capability parity with the
reference's grammar bitmask plane, `src/doc/engine_core.md:307-310`,
which upstream is xgrammar's JSON-schema/regex/EBNF compiler): a regex
subset is compiled to a byte-level DFA (Thompson NFA → subset
construction → live-state pruning), JSON schemas compile to regexes, and
for each DFA state the set of vocabulary tokens whose ENTIRE byte
sequence survives from that state is computed vectorized over the vocab
and cached as a packed uint32 bitmask (V=152k → 19 KB/state). The runner
ships the per-row masks to the device each step and applies them
in-trace (ops: `decode_bitmask` path in core/runner.py).

Design notes (TPU-shaped):
  * Masks are per-STATE, not per-step: a JSON grammar visits few distinct
    DFA states across a generation, so the per-step host cost is a dict
    lookup + the 19 KB h2d ride-along.
  * Byte-level matching makes unicode trivial: negated classes
    ([^"\\...]) naturally admit multi-byte UTF-8, and token pieces are
    just byte strings (GPT-2 byte-BPE unmapping handled in TokenIndex).
  * EOS is allowed exactly at accepting states; generation finishes on
    EOS or when the state has no live continuation.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

logger = logging.getLogger(__name__)

# Count of tokens that reached RegexGrammar.advance despite being
# disallowed by the grammar — always a masking bug; see advance().
MASK_VIOLATIONS = 0

DEAD = 0  # DFA dead-state index (row 0 of every transition table)


# ---------------------------------------------------------------------------
# regex AST + parser (byte-level subset: literals, escapes, classes,
# groups, alternation, ., quantifiers * + ? {m} {m,} {m,n})
# ---------------------------------------------------------------------------


@dataclass
class _Lit:
    mask: np.ndarray  # [256] bool — accepted bytes


@dataclass
class _Cat:
    parts: list


@dataclass
class _Alt:
    options: list


@dataclass
class _Rep:
    node: object
    lo: int
    hi: int | None  # None = unbounded


@dataclass
class _CallAtom:
    """`(?&name)` — recursive rule invocation (PCRE recursion syntax).
    Only meaningful when compiling a RULE SET to a pushdown automaton
    (core/pushdown.py); plain compile_regex rejects it."""

    rule: str


_ESCAPES = {
    "n": b"\n", "t": b"\t", "r": b"\r", "f": b"\f", "b": b"\b",
    "0": b"\x00", "a": b"\a", "v": b"\v",
}
_CLASS_D = np.zeros(256, bool); _CLASS_D[ord("0"): ord("9") + 1] = True
_CLASS_W = _CLASS_D.copy()
_CLASS_W[ord("a"): ord("z") + 1] = True
_CLASS_W[ord("A"): ord("Z") + 1] = True
_CLASS_W[ord("_")] = True
_CLASS_S = np.zeros(256, bool)
for _c in b" \t\n\r\f\v":
    _CLASS_S[_c] = True
_DOT = np.ones(256, bool); _DOT[ord("\n")] = False


def _lit_bytes(bs: bytes):
    """A literal byte sequence as a concat of single-byte literals."""
    parts = []
    for b in bs:
        m = np.zeros(256, bool)
        m[b] = True
        parts.append(_Lit(m))
    return parts[0] if len(parts) == 1 else _Cat(parts)


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def error(self, msg):
        raise ValueError(f"regex error at {self.i} in {self.p!r}: {msg}")

    def peek(self):
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self):
        c = self.peek()
        if c is None:
            self.error("unexpected end")
        self.i += 1
        return c

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            self.error(f"unexpected {self.p[self.i]!r}")
        return node

    def _alt(self):
        opts = [self._cat()]
        while self.peek() == "|":
            self.next()
            opts.append(self._cat())
        return opts[0] if len(opts) == 1 else _Alt(opts)

    def _cat(self):
        parts = []
        while self.peek() not in (None, "|", ")"):
            parts.append(self._repeat())
        if not parts:
            return _Cat([])  # empty match
        return parts[0] if len(parts) == 1 else _Cat(parts)

    def _repeat(self):
        node = self._atom()
        while True:
            c = self.peek()
            if c == "*":
                self.next(); node = _Rep(node, 0, None)
            elif c == "+":
                self.next(); node = _Rep(node, 1, None)
            elif c == "?":
                self.next(); node = _Rep(node, 0, 1)
            elif c == "{":
                save = self.i
                self.next()
                digits = ""
                while self.peek() and self.peek().isdigit():
                    digits += self.next()
                if not digits:  # a literal '{'
                    self.i = save
                    break
                lo = int(digits)
                hi = lo
                if self.peek() == ",":
                    self.next()
                    digits = ""
                    while self.peek() and self.peek().isdigit():
                        digits += self.next()
                    hi = int(digits) if digits else None
                if self.peek() != "}":
                    self.i = save
                    break
                self.next()
                if hi is not None and hi < lo:
                    self.error("{m,n} with n < m")
                if (hi or lo) > 256:
                    self.error("repetition bound > 256 (DFA blowup guard)")
                node = _Rep(node, lo, hi)
            else:
                break
        return node

    def _atom(self):
        c = self.next()
        if c == "(":
            if self.peek() == "?":  # (?: groups and (?&name) calls
                self.next()
                k = self.next()
                if k == "&":
                    j = self.i
                    while j < len(self.p) and self.p[j] != ")":
                        j += 1
                    if j >= len(self.p):
                        self.error("unclosed (?&name)")
                    name = self.p[self.i: j]
                    self.i = j + 1
                    if not name:
                        self.error("empty rule name in (?&)")
                    return _CallAtom(name)
                if k != ":":
                    self.error("only (?: and (?&name) supported")
            node = self._alt()
            if self.next() != ")":
                self.error("unclosed group")
            return node
        if c == "[":
            return self._char_class()
        if c == ".":
            return _Lit(_DOT.copy())
        if c == "\\":
            return self._escape()
        if c in "*+?":
            self.error(f"dangling quantifier {c!r}")
        return _lit_bytes(c.encode("utf-8"))

    def _escape(self):
        c = self.next()
        if c == "d":
            return _Lit(_CLASS_D.copy())
        if c == "D":
            return _Lit(~_CLASS_D)
        if c == "w":
            return _Lit(_CLASS_W.copy())
        if c == "W":
            return _Lit(~_CLASS_W)
        if c == "s":
            return _Lit(_CLASS_S.copy())
        if c == "S":
            return _Lit(~_CLASS_S)
        if c == "x":
            h = self.next() + self.next()
            return _lit_bytes(bytes([int(h, 16)]))
        if c in _ESCAPES:
            return _lit_bytes(_ESCAPES[c])
        return _lit_bytes(c.encode("utf-8"))  # \. \\ \[ etc.

    def _class_escape(self) -> tuple[np.ndarray | None, int | None]:
        """Escape inside []: returns (class mask, None) or (None, byte)."""
        c = self.next()
        if c == "d":
            return _CLASS_D.copy(), None
        if c == "w":
            return _CLASS_W.copy(), None
        if c == "s":
            return _CLASS_S.copy(), None
        if c == "x":
            h = self.next() + self.next()
            return None, int(h, 16)
        if c in _ESCAPES:
            return None, _ESCAPES[c][0]
        b = c.encode("utf-8")
        if len(b) != 1:
            self.error("non-ASCII escape in class")
        return None, b[0]

    def _char_class(self):
        neg = False
        if self.peek() == "^":
            self.next()
            neg = True
        mask = np.zeros(256, bool)
        first = True
        while True:
            c = self.peek()
            if c is None:
                self.error("unclosed [")
            if c == "]" and not first:
                self.next()
                break
            first = False
            if c == "\\":
                self.next()
                cls, b = self._class_escape()
                if cls is not None:
                    mask |= cls
                    continue
                lo = b
            else:
                self.next()
                eb = c.encode("utf-8")
                if len(eb) != 1:
                    self.error(
                        "non-ASCII char in class (byte-level matcher; use "
                        "negated classes for unicode ranges)"
                    )
                lo = eb[0]
            if self.peek() == "-" and self.i + 1 < len(self.p) and \
                    self.p[self.i + 1] != "]":
                self.next()  # '-'
                c2 = self.next()
                if c2 == "\\":
                    cls, b2 = self._class_escape()
                    if cls is not None:
                        self.error("class escape as range end")
                    hi = b2
                else:
                    eb2 = c2.encode("utf-8")
                    if len(eb2) != 1:
                        self.error("non-ASCII range end in class")
                    hi = eb2[0]
                if hi < lo:
                    self.error("inverted range")
                mask[lo: hi + 1] = True
            else:
                mask[lo] = True
        return _Lit(~mask if neg else mask)


# ---------------------------------------------------------------------------
# Thompson NFA → DFA (subset construction over byte-equivalence classes)
# ---------------------------------------------------------------------------


class _NFABuilder:
    def __init__(self):
        self.eps: list[list[int]] = []
        self.trans: list[tuple[int, np.ndarray, int]] = []  # (src, mask, dst)

    def state(self) -> int:
        self.eps.append([])
        return len(self.eps) - 1

    def build(self, node) -> tuple[int, int]:
        """Returns (start, accept) fragment states."""
        if isinstance(node, _CallAtom):
            raise ValueError(
                f"(?&{node.rule}) recursion requires a rule set — compile "
                "with core.pushdown.PDA, not compile_regex"
            )
        if isinstance(node, _Lit):
            s, a = self.state(), self.state()
            self.trans.append((s, node.mask, a))
            return s, a
        if isinstance(node, _Cat):
            if not node.parts:
                s = self.state()
                return s, s
            s, a = self.build(node.parts[0])
            for part in node.parts[1:]:
                s2, a2 = self.build(part)
                self.eps[a].append(s2)
                a = a2
            return s, a
        if isinstance(node, _Alt):
            s, a = self.state(), self.state()
            for opt in node.options:
                os, oa = self.build(opt)
                self.eps[s].append(os)
                self.eps[oa].append(a)
            return s, a
        if isinstance(node, _Rep):
            lo, hi = node.lo, node.hi
            s = self.state()
            cur = s
            for _ in range(lo):
                fs, fa = self.build(node.node)
                self.eps[cur].append(fs)
                cur = fa
            if hi is None:  # star tail
                fs, fa = self.build(node.node)
                a = self.state()
                self.eps[cur].append(fs)
                self.eps[cur].append(a)
                self.eps[fa].append(fs)
                self.eps[fa].append(a)
                return s, a
            a = self.state()
            self.eps[cur].append(a)
            for _ in range(hi - lo):
                fs, fa = self.build(node.node)
                self.eps[cur].append(fs)
                cur = fa
                self.eps[cur].append(a)
            return s, a
        raise TypeError(node)


@dataclass
class DFA:
    trans: np.ndarray   # [S, 256] int32, row DEAD=0 all-DEAD
    accept: np.ndarray  # [S] bool
    start: int
    pattern: str = ""

    @property
    def num_states(self) -> int:
        return self.trans.shape[0]

    def walk_bytes(self, state: int, data: bytes) -> int:
        for b in data:
            state = int(self.trans[state, b])
            if state == DEAD:
                return DEAD
        return state

    def has_live_out(self, state: int) -> bool:
        return bool((self.trans[state] != DEAD).any())

    def accepting(self, state: int) -> bool:
        return bool(self.accept[state])

    def token_survival(self, index: "TokenIndex", state: int) -> np.ndarray:
        """[V] bool: tokens whose whole byte string survives from
        `state` (vectorized level-walk over the transition table)."""
        cur = np.full(index.V, state, np.int32)
        for j in range(index.Lmax):
            act = (index.len > j) & (cur != DEAD)
            if not act.any():
                break
            cur[act] = self.trans[cur[act], index.tok[act, j]]
        return (cur != DEAD) & (index.len > 0)


def compile_regex(pattern: str, max_states: int = 20_000) -> DFA:
    """Compile a regex (full-match semantics) to a pruned byte DFA."""
    ast = _Parser(pattern).parse()
    nfa = _NFABuilder()
    start, accept = nfa.build(ast)
    n = len(nfa.eps)

    # eps closures (iterative DFS per state)
    closures: list[frozenset[int]] = []
    for s0 in range(n):
        seen = {s0}
        stack = [s0]
        while stack:
            s = stack.pop()
            for t in nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        closures.append(frozenset(seen))

    # byte-equivalence classes: bytes with identical transition behavior
    if nfa.trans:
        masks = np.stack([m for (_, m, _) in nfa.trans])  # [T, 256]
        _, class_of = np.unique(masks, axis=1, return_inverse=True)
        class_reps: dict[int, int] = {}
        for b in range(256):
            class_reps.setdefault(int(class_of[b]), b)
        rep_bytes = sorted(class_reps.values())
    else:
        class_of = np.zeros(256, np.int64)
        rep_bytes = [0]

    by_src: dict[int, list[tuple[np.ndarray, int]]] = {}
    for (src, m, dst) in nfa.trans:
        by_src.setdefault(src, []).append((m, dst))

    # subset construction
    start_set = closures[start]
    sets: dict[frozenset, int] = {frozenset(): DEAD, start_set: 1}
    order = [frozenset(), start_set]
    rows: list[np.ndarray] = [np.zeros(256, np.int32)]
    i = 1
    while i < len(order):
        cur = order[i]
        row = np.zeros(256, np.int32)
        for rb in rep_bytes:
            nxt: set[int] = set()
            for s in cur:
                for (m, dst) in by_src.get(s, ()):
                    if m[rb]:
                        nxt |= closures[dst]
            fz = frozenset(nxt)
            if fz not in sets:
                sets[fz] = len(order)
                order.append(fz)
                if len(order) > max_states:
                    raise ValueError(
                        f"regex {pattern!r} exceeds {max_states} DFA states"
                    )
            row[class_of == class_of[rb]] = sets[fz]
        rows.append(row)
        i += 1

    trans = np.stack(rows)
    acc = np.array([accept in st for st in order], bool)

    # live-state pruning: collapse states that cannot reach acceptance
    S = len(order)
    live = acc.copy()
    changed = True
    while changed:
        changed = False
        reaches = live[trans].any(axis=1) & (np.arange(S) != DEAD)
        new_live = live | reaches
        if (new_live != live).any():
            live = new_live
            changed = True
    remap = np.where(live, np.arange(S), DEAD).astype(np.int32)
    trans = remap[trans]
    trans[DEAD, :] = DEAD
    if not live[1]:
        raise ValueError(f"regex {pattern!r} matches nothing")
    return DFA(trans=trans, accept=acc & live, start=1, pattern=pattern)


# ---------------------------------------------------------------------------
# vocabulary index: token id -> byte sequence, vectorized mask computation
# ---------------------------------------------------------------------------


def _gpt2_byte_decoder() -> dict[str, int]:
    """Inverse of GPT-2/Qwen byte-level BPE's bytes_to_unicode table."""
    bs = list(range(ord("!"), ord("~") + 1)) + \
        list(range(ord("\xa1"), ord("\xac") + 1)) + \
        list(range(ord("\xae"), ord("\xff") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


class TokenIndex:
    """Token-id → byte-sequence table with vectorized per-DFA-state
    allowed-mask computation. Build once per tokenizer; share across
    grammars (masks are cached per (dfa, state) on the grammar)."""

    def __init__(self, token_bytes: list[bytes | None], eos_token_id: int | None):
        self.V = len(token_bytes)
        self.eos_token_id = eos_token_id
        lens = [len(t) if t else 0 for t in token_bytes]
        self.Lmax = max(lens) if lens else 0
        self.tok = np.zeros((self.V, self.Lmax), np.uint8)
        self.len = np.asarray(lens, np.int32)
        for i, t in enumerate(token_bytes):
            if t:
                self.tok[i, : len(t)] = np.frombuffer(t, np.uint8)
        # packed-words width (ceil(V/32)); mask bit i of word w = id w*32+i
        self.W = -(-self.V // 32)

    @classmethod
    def from_tokenizer(cls, tokenizer) -> "TokenIndex":
        eos = getattr(tokenizer, "eos_token_id", None)
        inner = getattr(tokenizer, "_tok", None)
        if inner is not None and hasattr(inner, "get_vocab"):
            vocab = inner.get_vocab()
            size = max(len(inner), max(vocab.values()) + 1)
            toks: list[bytes | None] = [None] * size
            dec = _gpt2_byte_decoder()
            special = set(getattr(inner, "all_special_ids", []) or [])
            for piece, idx in vocab.items():
                if idx in special:
                    continue  # specials are structure, not text
                try:
                    toks[idx] = bytes(dec[ch] for ch in piece)
                except KeyError:
                    # not byte-level BPE: sentencepiece-style pieces
                    toks[idx] = piece.replace("▁", " ").encode("utf-8")
            return cls(toks, eos)
        # ByteTokenizer and friends: ids < 256 are raw bytes
        size = getattr(tokenizer, "vocab_size", 258)
        toks = [bytes([i]) if i < 256 else None for i in range(size)]
        return cls(toks, eos)

    def allowed_packed(
        self, dfa, state: int, total: int | None = None
    ) -> np.ndarray:
        """Packed uint32 [ceil(total/32)] of tokens whose whole byte
        string survives from `state` (plus EOS iff accepting). `dfa` is
        any automaton exposing token_survival/accepting (grammar.DFA or
        pushdown.PDA). `total` pads to the MODEL vocab (>= tokenizer
        vocab — e.g. Qwen pads 151665 tokenizer entries to a 151936
        logit width); the padding ids are never allowed."""
        ok = dfa.token_survival(self, state)
        if self.eos_token_id is not None and dfa.accepting(state):
            ok = ok.copy()
            ok[self.eos_token_id] = True
        total = max(total or self.V, self.V)
        W = -(-total // 32)
        pad = W * 32 - self.V
        if pad:
            ok = np.concatenate([ok, np.zeros(pad, bool)])
        return np.packbits(ok, bitorder="little").view(np.uint32)


@lru_cache(maxsize=8)
def _shared_token_index(key) -> TokenIndex:  # pragma: no cover - thin cache
    raise RuntimeError("use get_token_index")


_TOKEN_INDEX_CACHE: dict[int, TokenIndex] = {}


def get_token_index(tokenizer) -> TokenIndex:
    key = id(tokenizer)
    idx = _TOKEN_INDEX_CACHE.get(key)
    if idx is None:
        idx = TokenIndex.from_tokenizer(tokenizer)
        _TOKEN_INDEX_CACHE[key] = idx
    return idx


# ---------------------------------------------------------------------------
# Grammar implementations (interface: core/structured.Grammar)
# ---------------------------------------------------------------------------


class RegexGrammar:
    """Constrain output to match `pattern` (full match, then EOS)."""

    def __init__(self, pattern: str, tokenizer, *, automaton=None):
        # `automaton`: a prebuilt DFA-compatible matcher (pushdown.PDA);
        # defaults to compiling `pattern` to a byte DFA.
        self.dfa = automaton if automaton is not None else compile_regex(pattern)
        self.index = get_token_index(tokenizer)
        self._mask_cache: dict[int, np.ndarray] = {}
        self._pad_V: int | None = None  # model vocab width (validate())

    def initial_state(self) -> int:
        return self.dfa.start

    def allowed(self, state) -> list[int] | None:
        """Explicit id list (compat path; exponential for wide masks —
        prefer allowed_mask)."""
        packed = self.allowed_mask(state)
        bits = np.unpackbits(packed.view(np.uint8), bitorder="little")
        return np.nonzero(bits[: self.index.V])[0].tolist()

    def allowed_mask(self, state) -> np.ndarray:
        m = self._mask_cache.get(state)
        if m is None:
            m = self.index.allowed_packed(self.dfa, state, self._pad_V)
            self._mask_cache[state] = m
        return m

    def advance(self, state, token: int):
        if self.index.eos_token_id is not None and token == self.index.eos_token_id:
            return state  # terminal handled by engine EOS stop
        t = int(token)
        if not (0 <= t < self.index.V) or self.index.len[t] == 0:
            return state
        data = self.tok_bytes(t)
        nxt = self.dfa.walk_bytes(state, data)
        if nxt == DEAD:
            # The device-side mask makes a disallowed emission unreachable
            # — so reaching DEAD here means a MASKING BUG (or a sampler
            # bypassing the mask). Staying keeps serving alive, but the
            # event must be loud, not silently swallowed.
            global MASK_VIOLATIONS
            MASK_VIOLATIONS += 1
            logger.error(
                "grammar mask violation: token %d (%r) is not accepted "
                "from state %r — the device bitmask should have excluded "
                "it (violations so far: %d)",
                t, data, state, MASK_VIOLATIONS,
            )
            return state
        return nxt

    def tok_bytes(self, t: int) -> bytes:
        return self.index.tok[t, : self.index.len[t]].tobytes()

    def is_terminal(self, state) -> bool:
        # nothing live can follow: the match is complete
        return self.dfa.accepting(state) and not self.dfa.has_live_out(state)

    def validate(self, vocab_size: int) -> None:
        if self.index.V > vocab_size:
            raise ValueError(
                f"tokenizer vocab {self.index.V} exceeds model vocab "
                f"{vocab_size}"
            )
        if self._pad_V != vocab_size:
            self._pad_V = vocab_size
            self._mask_cache.clear()  # masks must match the logit width


class JsonSchemaGrammar(RegexGrammar):
    """Constrain output to JSON documents valid under `schema` (the
    flagship structured-output case; reference surface:
    xgrammar-compiled JSON-schema bitmasks, `engine_core.md:307-310`).

    Recursive schemas (`$ref` cycles through $defs/definitions) compile
    to a PUSHDOWN automaton (core/pushdown.py) — recursion depth is
    unbounded, true CFG semantics. Acyclic schemas take the byte-DFA
    fast path.

    Documented deviations from full JSON Schema (raise or are listed
    here rather than silently differing):
      * `additionalProperties` defaults to false (rejected if truthy) —
        the grammar must enumerate every allowed property;
      * properties are emitted in SCHEMA ORDER (a fixed order; JSON
        Schema itself is order-free);
      * absent `required` means NO property is required (per spec).
    """

    def __init__(self, schema: dict | str, tokenizer, max_depth: int = 6):
        if isinstance(schema, str):
            schema = json.loads(schema)
        self.schema = schema
        rules, recursive = schema_to_rules(schema, max_depth=max_depth)
        if recursive:
            from vllm_omni_draft_tpu.core.pushdown import PDA

            super().__init__(
                rules["root"], tokenizer, automaton=PDA(rules, root="root")
            )
        else:
            super().__init__(rules["root"], tokenizer)


class EbnfGrammar(RegexGrammar):
    """Constrain output by an EBNF grammar (the third leg of the
    xgrammar surface: JSON-schema / regex / EBNF; GBNF-style dialect).

    Acyclic rule graphs inline to a single regex -> byte DFA. RECURSIVE
    rules compile to a pushdown automaton (core/pushdown.py): unbounded
    nesting with true CFG semantics (left recursion is rejected at
    compile time with a clear error)."""

    def __init__(self, ebnf: str, tokenizer, root: str = "root",
                 max_depth: int = 6):
        # max_depth kept for API compatibility; recursion is now exact
        # via the PDA, so no depth bound applies.
        del max_depth
        self.rules = parse_ebnf(ebnf)
        rule_strs, recursive = ebnf_to_rules(self.rules, root=root)
        if recursive:
            from vllm_omni_draft_tpu.core.pushdown import PDA

            super().__init__(
                rule_strs[root], tokenizer,
                automaton=PDA(rule_strs, root=root),
            )
        else:
            super().__init__(rule_strs[root], tokenizer)


# ---------------------------------------------------------------------------
# EBNF → regex (bounded-recursion expansion)
# ---------------------------------------------------------------------------
#
# Supported EBNF dialect (GBNF-style, as used by llama.cpp / xgrammar):
#   rule ::= alternation            one per line; '#' comments
#   alternation: seq ("|" seq)*
#   seq: item+
#   item: '"literal"' | [class] | rulename | "(" alternation ")"
#        with optional postfix ? * + or {m,n}


@dataclass
class _ERef:
    name: str


@dataclass
class _ELit:
    text: str


@dataclass
class _EClass:
    body: str  # raw [...] source including brackets


@dataclass
class _ESeq:
    items: list


@dataclass
class _EAlt:
    options: list


@dataclass
class _ERep:
    node: object
    suffix: str  # '?', '*', '+' or '{m,n}'


class _EbnfParser:
    def __init__(self, text: str, rule_names: set[str]):
        self.t = text
        self.i = 0
        self.rule_names = rule_names

    def error(self, msg):
        raise ValueError(f"EBNF error at {self.i}: {msg} in {self.t!r}")

    def ws(self):
        while self.i < len(self.t) and self.t[self.i] in " \t":
            self.i += 1

    def parse_alt(self):
        opts = [self.parse_seq()]
        self.ws()
        while self.i < len(self.t) and self.t[self.i] == "|":
            self.i += 1
            opts.append(self.parse_seq())
            self.ws()
        return opts[0] if len(opts) == 1 else _EAlt(opts)

    def parse_seq(self):
        items = []
        while True:
            self.ws()
            if self.i >= len(self.t) or self.t[self.i] in "|)":
                break
            items.append(self.parse_item())
        if not items:
            return _ESeq([])
        return items[0] if len(items) == 1 else _ESeq(items)

    def parse_item(self):
        c = self.t[self.i]
        if c == '"':
            j = self.i + 1
            out = []
            while j < len(self.t) and self.t[j] != '"':
                if self.t[j] == "\\" and j + 1 < len(self.t):
                    out.append({"n": "\n", "t": "\t", "r": "\r"}.get(
                        self.t[j + 1], self.t[j + 1]
                    ))
                    j += 2
                else:
                    out.append(self.t[j])
                    j += 1
            if j >= len(self.t):
                self.error("unterminated literal")
            self.i = j + 1
            node = _ELit("".join(out))
        elif c == "[":
            j = self.i + 1
            while j < len(self.t) and self.t[j] != "]":
                if self.t[j] == "\\":
                    j += 1
                j += 1
            if j >= len(self.t):
                self.error("unterminated class")
            node = _EClass(self.t[self.i: j + 1])
            self.i = j + 1
        elif c == "(":
            self.i += 1
            node = self.parse_alt()
            self.ws()
            if self.i >= len(self.t) or self.t[self.i] != ")":
                self.error("unclosed group")
            self.i += 1
        elif c.isalnum() or c in "_-":
            j = self.i
            while j < len(self.t) and (self.t[j].isalnum() or self.t[j] in "_-"):
                j += 1
            name = self.t[self.i: j]
            self.i = j
            if name not in self.rule_names:
                self.error(f"unknown rule {name!r}")
            node = _ERef(name)
        else:
            self.error(f"unexpected {c!r}")
        # postfix repetition
        if self.i < len(self.t) and self.t[self.i] in "?*+":
            node = _ERep(node, self.t[self.i])
            self.i += 1
        elif self.i < len(self.t) and self.t[self.i] == "{":
            j = self.t.index("}", self.i)
            node = _ERep(node, self.t[self.i: j + 1])
            self.i = j + 1
        return node


def parse_ebnf(text: str) -> dict[str, object]:
    """Parse GBNF-style rules `name ::= body` into ASTs."""
    lines = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if line.strip():
            lines.append(line)
    # continuation lines (no '::=') append to the previous rule
    merged: list[str] = []
    for line in lines:
        if "::=" in line or not merged:
            merged.append(line)
        else:
            merged[-1] += " " + line.strip()
    names = set()
    bodies = {}
    for line in merged:
        if "::=" not in line:
            raise ValueError(f"EBNF line without '::=': {line!r}")
        name, body = line.split("::=", 1)
        names.add(name.strip())
        bodies[name.strip()] = body.strip()
    return {
        name: _EbnfParser(body, names).parse_alt()
        for name, body in bodies.items()
    }


def ebnf_to_regex(rules: dict[str, object], root: str = "root",
                  max_depth: int = 6) -> str:
    """Expand the rule graph from `root` into one regex. Rule references
    expand inline; recursion is admitted up to `max_depth` levels and
    REJECTED beyond (regular approximation of the CFG)."""
    if root not in rules:
        raise ValueError(f"no rule named {root!r}")

    def conv(node, stack: dict[str, int]) -> str:
        if isinstance(node, _ERef):
            n = stack.get(node.name, 0)
            if n >= max_depth:
                # recursion beyond the bound: this branch contributes no
                # strings (regular approximation) — emit a never-matching
                # atom; compile_regex prunes it as a dead alternative
                return "[^\\x00-\\xff]"
            body = conv(
                rules[node.name], {**stack, node.name: n + 1}
            )
            return "(" + body + ")"
        if isinstance(node, _ELit):
            return _regex_escape(node.text)
        if isinstance(node, _EClass):
            return node.body
        if isinstance(node, _ESeq):
            return "".join(conv(i, stack) for i in node.items)
        if isinstance(node, _EAlt):
            return "(" + "|".join(conv(o, stack) for o in node.options) + ")"
        if isinstance(node, _ERep):
            return "(" + conv(node.node, stack) + ")" + node.suffix
        raise TypeError(node)

    out = conv(rules[root], {root: 1})
    if len(out) > 500_000:
        raise ValueError(
            f"EBNF expansion too large ({len(out)} chars) — lower "
            "max_depth or simplify the grammar"
        )
    return out


def _ebnf_refs(node) -> set[str]:
    if isinstance(node, _ERef):
        return {node.name}
    if isinstance(node, _ESeq):
        return set().union(*[_ebnf_refs(i) for i in node.items]) \
            if node.items else set()
    if isinstance(node, _EAlt):
        return set().union(*[_ebnf_refs(o) for o in node.options])
    if isinstance(node, _ERep):
        return _ebnf_refs(node.node)
    return set()


def _recursive_names(graph: dict[str, set[str]]) -> set[str]:
    """Names reachable from themselves through the reference graph."""
    out = set()
    for name in graph:
        seen: set[str] = set()
        work = list(graph.get(name, ()))
        while work:
            n = work.pop()
            if n == name:
                out.add(name)
                break
            if n not in seen:
                seen.add(n)
                work.extend(graph.get(n, ()))
    return out


def ebnf_to_rules(rules: dict[str, object], root: str = "root",
                  ) -> tuple[dict[str, str], bool]:
    """Rule ASTs -> regex strings with `(?&name)` calls for RECURSIVE
    rules (compiled by pushdown.PDA) and inline expansion for acyclic
    ones. Returns ({name: regex}, any_recursion)."""
    if root not in rules:
        raise ValueError(f"no rule named {root!r}")
    graph = {n: _ebnf_refs(ast) for n, ast in rules.items()}
    for n, refs in graph.items():
        missing = refs - set(rules)
        if missing:
            raise ValueError(f"rule {n!r} references unknown {missing}")
    recursive = _recursive_names(graph)

    def conv(node) -> str:
        if isinstance(node, _ERef):
            if node.name in recursive:
                return f"(?&{node.name})"
            return "(" + conv(rules[node.name]) + ")"
        if isinstance(node, _ELit):
            return _regex_escape(node.text)
        if isinstance(node, _EClass):
            return node.body
        if isinstance(node, _ESeq):
            return "".join(conv(i) for i in node.items)
        if isinstance(node, _EAlt):
            return "(" + "|".join(conv(o) for o in node.options) + ")"
        if isinstance(node, _ERep):
            return "(" + conv(node.node) + ")" + node.suffix
        raise TypeError(node)

    out = {root: conv(rules[root])}
    for name in recursive:
        out[name] = conv(rules[name])
    for name, body in out.items():
        if len(body) > 500_000:
            raise ValueError(
                f"EBNF rule {name!r} expands too large ({len(body)} chars)"
            )
    return out, bool(recursive)


# ---------------------------------------------------------------------------
# JSON schema → regex
# ---------------------------------------------------------------------------

_WS = r"[ ]?"  # optional single space between JSON tokens (bounded states)
STRING_INNER = r'([^"\\\x00-\x1f]|\\(["\\/bfnrt]|u[0-9a-fA-F]{4}))'
STRING = f'"{STRING_INNER}*"'
INTEGER = r"(-?(0|[1-9][0-9]*))"
NUMBER = r"(-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?)"
BOOLEAN = r"(true|false)"
NULL = r"null"


def _regex_escape(text: str) -> str:
    out = []
    for ch in text:
        if ch in r"\.^$*+?{}[]()|/":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _const_regex(value) -> str:
    return _regex_escape(json.dumps(value, ensure_ascii=False, separators=(",", ":")))


def _schema_refs(node) -> set[str]:
    """All `$ref` def-names in a schema subtree."""
    out: set[str] = set()
    if isinstance(node, dict):
        ref = node.get("$ref")
        if isinstance(ref, str):
            out.add(ref.split("/")[-1])
        for v in node.values():
            out |= _schema_refs(v)
    elif isinstance(node, list):
        for v in node:
            out |= _schema_refs(v)
    return out


def schema_to_regex(schema: dict, max_depth: int = 6) -> str:
    """Legacy single-regex form of `schema_to_rules` (acyclic schemas
    only; a recursive schema raises — use JsonSchemaGrammar, which
    routes recursion to the pushdown backend)."""
    rules, recursive = schema_to_rules(schema, max_depth=max_depth)
    if recursive:
        raise ValueError(
            "recursive schema cannot compile to a single regex; use "
            "JsonSchemaGrammar (pushdown backend)"
        )
    return rules["root"]


def schema_to_rules(
    schema: dict, max_depth: int = 6
) -> tuple[dict[str, str], bool]:
    """JSON-schema subset → rule set ({name: regex}, any_recursion).
    Recursive `$ref` cycles through #/$defs or #/definitions become
    `(?&def:name)` calls (pushdown backend, unbounded nesting); acyclic
    refs inline (depth-capped against exponential DAG expansion).

    Supported: type object/array/string/number/integer/boolean/null,
    enum, const, properties/required/additionalProperties:false, items,
    minItems/maxItems, minLength/maxLength, pattern (inlined),
    anyOf/oneOf, $ref.

    Semantics notes (deviations documented on JsonSchemaGrammar):
    absent `required` means NO property required (JSON Schema
    semantics); properties are emitted in schema order;
    `additionalProperties` must be false/absent."""
    defs = {}
    for key in ("$defs", "definitions"):
        defs.update(schema.get(key, {}))
    graph = {name: _schema_refs(sub) & set(defs) for name, sub in defs.items()}
    recursive = _recursive_names(graph)

    def conv(s: dict, depth: int) -> str:
        if depth <= 0:
            raise ValueError("schema nesting exceeds max_depth")
        if not isinstance(s, dict):
            raise ValueError(f"unsupported schema node: {s!r}")
        if "$ref" in s:
            ref = s["$ref"]
            name = ref.split("/")[-1]
            if name not in defs:
                raise ValueError(f"unresolvable $ref {ref!r}")
            if name in recursive:
                return f"(?&def:{name})"
            return conv(defs[name], depth - 1)
        if "const" in s:
            return _const_regex(s["const"])
        if "enum" in s:
            return "(" + "|".join(_const_regex(v) for v in s["enum"]) + ")"
        if "anyOf" in s or "oneOf" in s:
            opts = s.get("anyOf") or s.get("oneOf")
            return "(" + "|".join(conv(o, depth - 1) for o in opts) + ")"
        t = s.get("type")
        if isinstance(t, list):
            return "(" + "|".join(
                conv({**s, "type": ti}, depth) for ti in t
            ) + ")"
        if t == "string":
            if "pattern" in s:
                # inline, anchored: the pattern constrains the content
                # between the quotes
                return f'"(?:{s["pattern"]})"'
            lo = s.get("minLength", 0)
            hi = s.get("maxLength")
            if lo == 0 and hi is None:
                return STRING
            rep = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
            return f'"{STRING_INNER}{rep}"'
        if t == "integer":
            return INTEGER
        if t == "number":
            return NUMBER
        if t == "boolean":
            return BOOLEAN
        if t == "null":
            return NULL
        if t == "array":
            item = conv(s.get("items", {"type": "string"}), depth - 1)
            lo = s.get("minItems", 0)
            hi = s.get("maxItems")
            if hi is not None and hi < lo:
                raise ValueError("maxItems < minItems")
            if hi == 0 or (hi is None and lo == 0):
                body = f"({item}({_WS},{_WS}{item})*)?" if hi is None else ""
            elif lo == 0:
                body = f"({item}({_WS},{_WS}{item}){{0,{hi - 1}}})?"
            elif hi is None:
                body = f"{item}({_WS},{_WS}{item}){{{lo - 1},}}"
            else:
                body = f"{item}({_WS},{_WS}{item}){{{lo - 1},{hi - 1}}}"
            return rf"\[{_WS}{body}{_WS}\]"
        if t == "object" or "properties" in s:
            props = s.get("properties", {})
            # JSON Schema semantics: absent `required` requires NOTHING
            # (round-2 review: the old all-required default silently
            # deviated)
            required = set(s.get("required", []))
            if s.get("additionalProperties", False) not in (False, None):
                raise ValueError("additionalProperties must be false")
            pairs = []
            for name, sub in props.items():
                pr = f'"{_regex_escape(name)}"{_WS}:{_WS}{conv(sub, depth - 1)}'
                pairs.append((name, pr, name in required))
            if not pairs:
                return rf"\{{{_WS}\}}"
            # fixed property order; optional properties may be absent.
            # Build suffix(i) = the regex for properties i.. given that at
            # least one property before i was emitted (so a comma prefixes
            # each present one).
            def suffix(i: int) -> str:
                if i == len(pairs):
                    return ""
                _, pr, req = pairs[i]
                rest = suffix(i + 1)
                this = f"{_WS},{_WS}{pr}{rest}"
                return this if req else f"({this}|{rest})"

            # head: the first present property is pairs[j] for the first
            # required j, or any optional before it
            opts = []
            for j, (_, pr, req) in enumerate(pairs):
                opts.append(pr + suffix(j + 1))
                if req:
                    break
            else:
                opts.append("")  # all optional, none present
            body = "(" + "|".join(opts) + ")" if len(opts) > 1 else opts[0]
            return rf"\{{{_WS}{body}{_WS}\}}"
        raise ValueError(f"unsupported schema: {s!r}")

    rules = {"root": conv(schema, max_depth)}
    for name in recursive:
        rules[f"def:{name}"] = conv(defs[name], max_depth)
    return rules, bool(recursive)
