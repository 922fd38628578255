"""Pushdown-backend property tests: brute-force equivalence against
hand-written CFG oracles over enumerated strings.

The masks the engine ships to the device must be EXACT: a byte is
allowed iff some completion exists (an over-approximation wedges
generation; an under-approximation changes the distribution). These
tests enumerate every string up to a horizon and compare PDA liveness/
acceptance against ground-truth recursive matchers."""

import itertools

import numpy as np
import pytest

from vllm_omni_draft_tpu.core.grammar import DEAD
from vllm_omni_draft_tpu.core.pushdown import PDA


def _accepted(pda: PDA, s: bytes) -> bool:
    st = pda.walk_bytes(pda.start, s)
    return st != DEAD and pda.accepting(st)


def _live(pda: PDA, s: bytes) -> bool:
    return pda.walk_bytes(pda.start, s) != DEAD


def _enumerate(alphabet: bytes, max_len: int):
    for n in range(max_len + 1):
        for tup in itertools.product(alphabet, repeat=n):
            yield bytes(tup)


def _check_against_oracle(pda, alphabet, accepts, max_len, horizon):
    """PDA acceptance == oracle for every string up to max_len, and PDA
    liveness == 'is a prefix of some accepted string up to horizon'."""
    accepted_set = {
        s for s in _enumerate(alphabet, horizon) if accepts(s)
    }
    prefixes = set()
    for s in accepted_set:
        for i in range(len(s) + 1):
            prefixes.add(s[:i])
    for s in _enumerate(alphabet, max_len):
        assert _accepted(pda, s) == (s in accepted_set), s
        assert _live(pda, s) == (s in prefixes), s


def test_balanced_parens_exact():
    pda = PDA({"root": r"\((?&root)\)|x"})

    def accepts(s: bytes) -> bool:
        # root := '(' root ')' | 'x'
        def match(i):
            if i < len(s) and s[i] == ord("x"):
                return i + 1
            if i < len(s) and s[i] == ord("("):
                j = match(i + 1)
                if j is not None and j < len(s) and s[j] == ord(")"):
                    return j + 1
            return None

        return match(0) == len(s)

    # live prefix of length L completes within 2L+1
    _check_against_oracle(pda, b"()x", accepts, max_len=5, horizon=11)


def test_ab_star_nested_exact():
    # root := 'a' root 'b' root | '' (Dyck-like with epsilon)
    pda = PDA({"root": r"(a(?&root)b(?&root))?"})

    def accepts(s: bytes) -> bool:
        # balanced 'ab' language: every prefix has #a >= #b, total equal
        bal = 0
        for ch in s:
            if ch == ord("a"):
                bal += 1
            elif ch == ord("b"):
                bal -= 1
            else:
                return False
            if bal < 0:
                return False
        return bal == 0

    _check_against_oracle(pda, b"ab", accepts, max_len=6, horizon=12)


def test_expression_grammar_exact():
    rules = {
        "root": r"(?&term)(\+(?&term))*",
        "term": r"[0-9]|\((?&root)\)",
    }
    pda = PDA(rules)

    def accepts(s: bytes) -> bool:
        # recursive descent for: root := term ('+' term)*; term := d | '(' root ')'
        def term(i):
            if i < len(s) and ord("0") <= s[i] <= ord("9"):
                return i + 1
            if i < len(s) and s[i] == ord("("):
                j = root(i + 1)
                if j is not None and j < len(s) and s[j] == ord(")"):
                    return j + 1
            return None

        def root(i):
            j = term(i)
            if j is None:
                return None
            while j is not None and j < len(s) and s[j] == ord("+"):
                k = term(j + 1)
                if k is None:
                    return j  # partial; '+' not consumed
                j = k
            return j

        return root(0) == len(s)

    _check_against_oracle(
        pda, b"0+()", accepts, max_len=4, horizon=9
    )


def test_mutual_recursion_exact():
    # a := 'x' | '[' b ']';  b := a (',' a)*
    rules = {
        "root": r"(?&a)",
        "a": r"x|\[(?&b)\]",
        "b": r"(?&a)(,(?&a))*",
    }
    pda = PDA(rules)

    def accepts(s: bytes) -> bool:
        def a(i):
            if i < len(s) and s[i] == ord("x"):
                return i + 1
            if i < len(s) and s[i] == ord("["):
                j = b(i + 1)
                if j is not None and j < len(s) and s[j] == ord("]"):
                    return j + 1
            return None

        def b(i):
            j = a(i)
            if j is None:
                return None
            while j is not None and j < len(s) and s[j] == ord(","):
                k = a(j + 1)
                if k is None:
                    return None  # trailing comma is NOT allowed
                j = k
            return j

        return a(0) == len(s)

    _check_against_oracle(pda, b"x[],", accepts, max_len=4, horizon=9)


def test_macro_state_reuse_bounded():
    """Generation over a repetitive grammar must INTERN macro states —
    walking deep in-and-out nesting must not grow states linearly with
    the walk length (structure sharing check)."""
    pda = PDA({"root": r"\((?&root)\)|x"})
    st = pda.start
    for b in (b"(" * 30 + b"x" + b")" * 30):
        st = pda.walk_bytes(st, bytes([b]))
    n1 = pda.num_states
    # a second identical walk must create NO new states
    st = pda.start
    for b in (b"(" * 30 + b"x" + b")" * 30):
        st = pda.walk_bytes(st, bytes([b]))
    assert pda.num_states == n1


def test_sequential_nullable_recursive_calls_not_flagged():
    """root := r r r r r with r nullable-and-recursive: many SEQUENTIAL
    calls to the same rule in one epsilon closure are legal; only a true
    no-byte-consumed re-entry cycle is left recursion (ADVICE r3: the
    old depth counter capped at len(rules)+2 and false-fired here,
    lazily — mid-generation)."""
    pda = PDA({
        "root": r"(?&r)(?&r)(?&r)(?&r)(?&r)",
        "r": r"(\((?&r)\))?",
    })

    def accepts(s: bytes) -> bool:
        # r matches balanced single-nest chains: '', '()', '(())', ...
        def r(i):
            outs = {i}
            if i < len(s) and s[i] == ord("("):
                for j in r(i + 1):
                    if j < len(s) and s[j] == ord(")"):
                        outs.add(j + 1)
            return outs

        def seq(i, n):
            if n == 0:
                return i == len(s) and False or (i == len(s))
            return any(seq(j, n - 1) for j in r(i))

        return seq(0, 5)

    # horizon 10: '(((((' only completes at '((((()))))'
    _check_against_oracle(pda, b"()", accepts, max_len=5, horizon=10)


def test_true_left_recursion_still_raises():
    with pytest.raises(ValueError, match="left-recursive"):
        pda = PDA({"root": r"(?&root)a|b"})
        # closures are lazy: force the start closure + a row
        pda.walk_bytes(pda.start, b"b")


def test_repeated_nullable_subcall_in_sibling_instantiation():
    """a := b b, b := (?&c), c := x? — the second instantiation of b
    legitimately re-takes b's internal call edge to c; edge chains must
    restore on completion pops, not accumulate through them."""
    pda = PDA({
        "root": r"(?&b)(?&b)",
        "b": r"(?&c)",
        "c": r"x?",
    })

    def accepts(s: bytes) -> bool:
        return s in (b"", b"x", b"xx")

    _check_against_oracle(pda, b"x", accepts, max_len=4, horizon=4)
