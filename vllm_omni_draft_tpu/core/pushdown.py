"""True context-free structured output: a lazily-determinized pushdown
automaton (PDA) over bytes.

Round-2 review finding: EBNF / JSON-schema grammars compiled to REGEXES
with recursion expanded to a fixed depth — a regular approximation that
rejects valid deeply-nested output. The reference surface is xgrammar's
pushdown-backed token bitmask (`/root/reference/src/doc/engine_core.md:307-310`,
cited as capability spec only). This module is the TPU-compatible form the
review prescribed: a token-synchronized stack automaton whose per-state
masks are computed lazily and cached.

Design (host-side; the device only ever sees packed bitmasks):

* Each grammar RULE compiles to a byte-DFA over an EXTENDED alphabet:
  256 byte columns plus one "call" column per referenced rule
  (`(?&name)` atoms in the rule regex — PCRE recursion syntax). Subset
  construction merges call returns exactly like byte targets, so each
  (state, callee) has ONE deterministic return state.
* The matcher state is a CONFIG SET {(rule, dfa_state, stack)} with
  interned immutable stacks (structure-shared frames). Epsilon closure
  descends into calls (push) and completes accepting rules (pop).
* Config sets are interned as MACRO-STATES (small ints — the `state`
  object the Grammar interface threads). Byte transitions between macro
  states are computed lazily, one 256-entry row per macro state, so the
  hot region of the infinite determinized automaton materializes on
  demand as generation actually walks it. Token masks then reduce to the
  same vectorized level-walk the DFA path uses — identical mask cost
  once rows exist, while recursion depth is unbounded (new macro states
  simply materialize as the stack grows).

Left recursion (a rule reachable from itself without consuming a byte)
would make the closure diverge; it is detected at compile/closure time
and rejected with a clear error. JSON and GBNF-style grammars are not
left-recursive.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from vllm_omni_draft_tpu.core.grammar import (
    DEAD,
    _CallAtom,
    _NFABuilder,
    _Parser,
)

# closure guard: a single epsilon-closure may not nest more call frames
# than there are rules (+2 slack) without consuming a byte — deeper means
# a left-recursive cycle that would push forever.
_MAX_MACROS = 500_000


class _CallNFA(_NFABuilder):
    """NFA builder that accepts `(?&name)` call atoms as labeled edges."""

    def __init__(self):
        super().__init__()
        self.calls: list[tuple[int, str, int]] = []  # (src, rule, dst)

    def build(self, node):
        if isinstance(node, _CallAtom):
            s, a = self.state(), self.state()
            self.calls.append((s, node.rule, a))
            return s, a
        return super().build(node)


@dataclass
class RuleDFA:
    """One rule's automaton: byte transitions plus deterministic call
    edges (per (state, callee): one merged return state)."""

    trans: np.ndarray  # [S, 256] int32, DEAD=0
    accept: np.ndarray  # [S] bool
    start: int
    # calls[state] = tuple of (callee rule index, return state)
    calls: dict[int, tuple[tuple[int, int], ...]]


def _compile_rule(pattern: str, rule_ids: dict[str, int],
                  max_states: int = 20_000) -> RuleDFA:
    """Compile one rule body (regex with `(?&name)` atoms) to a RuleDFA
    via subset construction over the extended alphabet."""
    ast = _Parser(pattern).parse()
    nfa = _CallNFA()
    start, accept = nfa.build(ast)
    n = len(nfa.eps)

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

    if nfa.trans:
        masks = np.stack([m for (_, m, _) in nfa.trans])
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
    calls_by_src: dict[int, list[tuple[str, int]]] = {}
    for (src, rule, dst) in nfa.calls:
        calls_by_src.setdefault(src, []).append((rule, dst))

    start_set = closures[start]
    sets: dict[frozenset, int] = {frozenset(): DEAD, start_set: 1}
    order = [frozenset(), start_set]
    rows: list[np.ndarray] = [np.zeros(256, np.int32)]
    call_rows: list[dict[int, int]] = [{}]

    def register(fz: frozenset) -> int:
        if fz not in sets:
            sets[fz] = len(order)
            order.append(fz)
            if len(order) > max_states:
                raise ValueError(
                    f"rule {pattern!r} exceeds {max_states} DFA states"
                )
        return sets[fz]

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
            row[class_of == class_of[rb]] = register(frozenset(nxt))
        rows.append(row)
        # call edges: merge all returns per callee into one subset state
        rets: dict[str, set[int]] = {}
        for s in cur:
            for (rule, dst) in calls_by_src.get(s, ()):
                rets.setdefault(rule, set()).update(closures[dst])
        call_rows.append(
            {
                rule_ids[rule]: register(frozenset(t))
                for rule, t in sorted(rets.items())
            }
        )
        i += 1

    trans = np.stack(rows)
    acc = np.array([accept in st for st in order], bool)
    calls = {
        s: tuple(sorted(c.items()))
        for s, c in enumerate(call_rows) if c
    }
    return RuleDFA(trans=trans, accept=acc, start=1, calls=calls)


def _prune_rules(rules: list[RuleDFA], root: int) -> None:
    """Interprocedural liveness: drop states from which no completion is
    reachable (a mask that admits a token leading into such a state would
    wedge generation). In place."""
    n = len(rules)
    completable = [False] * n
    changed = True
    while changed:
        changed = False
        for ri, r in enumerate(rules):
            if completable[ri]:
                continue
            # BFS backward is awkward with call conditions; forward BFS
            # from start asking "accept reachable"
            seen = {r.start}
            work = [r.start]
            ok = False
            while work and not ok:
                s = work.pop()
                if r.accept[s]:
                    ok = True
                    break
                nxts = set(int(x) for x in np.unique(r.trans[s]) if x != DEAD)
                for (callee, ret) in r.calls.get(s, ()):
                    if completable[callee]:
                        nxts.add(ret)
                for t in nxts:
                    if t not in seen:
                        seen.add(t)
                        work.append(t)
            if ok:
                completable[ri] = True
                changed = True
    if not completable[root]:
        raise ValueError(
            "grammar has no terminating derivation from the root rule"
        )

    for ri, r in enumerate(rules):
        S = r.trans.shape[0]
        # backward liveness within the rule: accept-reachable via byte
        # edges and completable-call edges
        preds: dict[int, set[int]] = {}
        for s in range(S):
            if s == DEAD:
                continue
            for t in np.unique(r.trans[s]):
                if t != DEAD:
                    preds.setdefault(int(t), set()).add(s)
            for (callee, ret) in r.calls.get(s, ()):
                if completable[callee]:
                    preds.setdefault(ret, set()).add(s)
        live = set(np.nonzero(r.accept)[0].tolist())
        work = list(live)
        while work:
            t = work.pop()
            for p in preds.get(t, ()):
                if p not in live:
                    live.add(p)
                    work.append(p)
        remap = np.array(
            [s if (s in live and s != DEAD) else DEAD for s in range(S)],
            np.int32,
        )
        r.trans = remap[r.trans]
        r.trans[DEAD, :] = DEAD
        r.calls = {
            s: tuple(
                (c, ret) for (c, ret) in cs
                if completable[c] and remap[ret] != DEAD
            )
            for s, cs in r.calls.items()
            if remap[s] != DEAD
        }
        r.calls = {s: cs for s, cs in r.calls.items() if cs}


class PDA:
    """Lazily-determinized pushdown automaton. The public surface
    mirrors grammar.DFA (walk_bytes / accepting / has_live_out /
    token_survival) so RegexGrammar can thread either."""

    def __init__(self, rules: dict[str, str], root: str = "root"):
        if root not in rules:
            raise ValueError(f"no rule named {root!r}")
        names = sorted(rules, key=lambda n: (n != root, n))
        self.rule_ids = {n: i for i, n in enumerate(names)}
        self.rules = [
            _compile_rule(rules[n], self.rule_ids) for n in names
        ]
        _prune_rules(self.rules, self.rule_ids[root])
        self.pattern = "; ".join(f"{n} := {rules[n]}" for n in names)

        # interned stacks: id -> (rule, ret_state, parent_id); -1 = empty
        self._stack_nodes: list[tuple[int, int, int]] = []
        self._stack_intern: dict[tuple[int, int, int], int] = {}
        # interned macro states: id -> (configs tuple, accepting flag)
        self._macros: list[tuple[tuple[tuple[int, int, int], ...], bool]] = []
        self._macro_intern: dict[tuple, int] = {}
        # lazily built byte rows [n_macros, 256]
        self._rows: list[np.ndarray | None] = []

        # macro 0 = DEAD (empty config set)
        self._intern_macro((), False)
        start_cfgs, start_acc = self._closure(
            [(self.rule_ids[root], self.rules[0].start, -1)]
        )
        self.start = self._intern_macro(start_cfgs, start_acc)

    # -- interning ---------------------------------------------------------

    def _push(self, rule: int, ret: int, parent: int) -> int:
        key = (rule, ret, parent)
        sid = self._stack_intern.get(key)
        if sid is None:
            sid = len(self._stack_nodes)
            self._stack_nodes.append(key)
            self._stack_intern[key] = sid
        return sid

    def _intern_macro(self, cfgs: tuple, accepting: bool) -> int:
        key = cfgs
        mid = self._macro_intern.get(key)
        if mid is None:
            mid = len(self._macros)
            if mid > _MAX_MACROS:
                raise ValueError(
                    "pushdown state explosion (grammar too ambiguous "
                    "or generation pathologically deep)"
                )
            self._macros.append((cfgs, accepting))
            self._macro_intern[key] = mid
            self._rows.append(None)
        return mid

    # -- core PDA steps ----------------------------------------------------

    def _closure(self, cfgs) -> tuple[tuple, bool]:
        """Epsilon closure: descend into calls, complete accepting rules.
        Returns (sorted config tuple, accepting_at_root)."""
        # Divergence (left recursion / infinitely-nullable loop) is
        # detected by CALL-EDGE cycles: if one epsilon-chain path takes
        # the same (caller_rule, caller_state, callee) edge twice without
        # consuming a byte, the closure re-enters an identical situation
        # on an ever-growing stack and cannot terminate. Sequential calls
        # to a nullable rule (root := r r r r) take edges from DIFFERENT
        # caller states, so they never trip this (ADVICE r3: the old
        # depth counter capped at len(rules)+2 and false-fired on those).
        seen: set[tuple[int, int, int]] = set()
        out: set[tuple[int, int, int]] = set()
        # caller's edge chain at the moment each frame was pushed, so a
        # completion pop RESTORES the caller's chain (edges must describe
        # the live push path only — a second instantiation of a nullable
        # rule legitimately re-takes its internal call edges).
        push_edges: dict[int, frozenset] = {}
        accepting = False
        work: list = [(c, frozenset()) for c in cfgs]
        while work:
            (cfg, edges) = work.pop()
            if cfg in seen:
                continue
            seen.add(cfg)
            (ri, st, sk) = cfg
            r = self.rules[ri]
            out.add(cfg)
            # calls: push a frame, descend
            for (callee, ret) in r.calls.get(st, ()):
                edge = (ri, st, callee)
                if edge in edges:
                    raise ValueError(
                        "left-recursive grammar: a rule re-enters itself "
                        "without consuming input"
                    )
                child = self._push(ri, ret, sk)
                push_edges.setdefault(child, edges)
                work.append(((callee, self.rules[callee].start, child),
                             edges | {edge}))
            # completion: pop to the caller with the caller's own chain
            # (nullable call loops terminate via `seen`: interned stack
            # nodes make the pop reproduce the exact caller cfg).
            if r.accept[st]:
                if sk == -1:
                    accepting = True
                else:
                    (prule, pret, pparent) = self._stack_nodes[sk]
                    work.append(((prule, pret, pparent),
                                 push_edges.get(sk, frozenset())))
        return tuple(sorted(out)), accepting

    def _step(self, mid: int, byte: int) -> int:
        cfgs, _ = self._macros[mid]
        nxt = []
        for (ri, st, sk) in cfgs:
            t = int(self.rules[ri].trans[st, byte])
            if t != DEAD:
                nxt.append((ri, t, sk))
        if not nxt:
            return 0
        out, acc = self._closure(nxt)
        return self._intern_macro(out, acc)

    def _ensure_row(self, mid: int) -> np.ndarray:
        row = self._rows[mid]
        if row is None:
            row = np.array(
                [self._step(mid, b) for b in range(256)], np.int32
            )
            self._rows[mid] = row
        return row

    # -- DFA-compatible surface -------------------------------------------

    def walk_bytes(self, state: int, data: bytes) -> int:
        for b in data:
            if state == DEAD:
                return DEAD
            state = int(self._ensure_row(state)[b])
        return state

    def accepting(self, state: int) -> bool:
        return self._macros[state][1]

    def has_live_out(self, state: int) -> bool:
        return bool((self._ensure_row(state) != DEAD).any())

    @property
    def num_states(self) -> int:
        return len(self._macros)

    def token_survival(self, index, state: int) -> np.ndarray:
        """Vectorized per-token survival from `state` (same level-walk as
        the DFA path; rows materialize lazily)."""
        cur = np.full(index.V, state, np.int32)
        for j in range(index.Lmax):
            act = (index.len > j) & (cur != DEAD)
            if not act.any():
                break
            # group tokens by their current macro state; one vectorized
            # row lookup per distinct state per level
            nxt = cur.copy()
            act_idx = np.nonzero(act)[0]
            sub = cur[act_idx]
            for mid in np.unique(sub):
                sel = act_idx[sub == mid]
                nxt[sel] = self._ensure_row(int(mid))[index.tok[sel, j]]
            cur = nxt
        return (cur != DEAD) & (index.len > 0)
