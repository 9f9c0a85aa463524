"""Row-pattern matching (MATCH_RECOGNIZE) as a vectorized DFA scan.

The TPU-native redesign of the reference's per-partition backtracking
matcher (``operator/window/PatternRecognitionPartition.java`` + the
``sql/planner/rowpattern/`` IR): instead of walking rows one at a time
with a thread stack, the pattern compiles (host-side, once per query) to

    regex over symbols → Thompson NFA → subset-construction DFA

whose input alphabet is the PREDICATE BITMASK of a row (bit s = symbol
s's DEFINE predicate holds).  On device:

1. every DEFINE predicate evaluates vectorized → k bool columns → one
   int8/int16 code per row,
2. every candidate start row advances its own DFA copy in lockstep over a
   static window of L rows (one ``lax.scan``, [n] states per step) —
   leftmost-LONGEST match length per start, all starts in parallel,
3. AFTER MATCH SKIP PAST LAST ROW resolves with one compiled
   ``while_loop`` hop chain over match lengths.

Semantics note: step 2 yields leftmost-longest matches.  This equals the
reference's greedy-quantifier semantics for concatenation/+/*/? patterns
(the practical corpus); exotic alternations where POSIX-longest and
backtracking-preferment diverge are documented as unsupported.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, FrozenSet, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEAD = 0  # DFA dead state is always index 0


# ----------------------------------------------------------- pattern AST

@dataclass(frozen=True)
class Sym:
    name: str


@dataclass(frozen=True)
class Seq:
    parts: Tuple[object, ...]


@dataclass(frozen=True)
class Alt:
    options: Tuple[object, ...]


@dataclass(frozen=True)
class Quant:
    arg: object
    kind: str  # '+', '*', '?'


# ------------------------------------------------------------ NFA builder

class _NFA:
    def __init__(self):
        self.eps: List[set] = []
        self.edges: List[Dict[int, set]] = []  # state -> {symbol: {states}}

    def new(self) -> int:
        self.eps.append(set())
        self.edges.append({})
        return len(self.eps) - 1


def _build(nfa: _NFA, node, symbols: Dict[str, int]) -> Tuple[int, int]:
    """Thompson construction → (start, accept) state pair."""
    if isinstance(node, Sym):
        s, a = nfa.new(), nfa.new()
        nfa.edges[s].setdefault(symbols[node.name], set()).add(a)
        return s, a
    if isinstance(node, Seq):
        s0, a0 = _build(nfa, node.parts[0], symbols)
        for p in node.parts[1:]:
            s1, a1 = _build(nfa, p, symbols)
            nfa.eps[a0].add(s1)
            a0 = a1
        return s0, a0
    if isinstance(node, Alt):
        s, a = nfa.new(), nfa.new()
        for opt in node.options:
            so, ao = _build(nfa, opt, symbols)
            nfa.eps[s].add(so)
            nfa.eps[ao].add(a)
        return s, a
    if isinstance(node, Quant):
        si, ai = _build(nfa, node.arg, symbols)
        s, a = nfa.new(), nfa.new()
        nfa.eps[s].add(si)
        if node.kind in ("*", "?"):
            nfa.eps[s].add(a)
        nfa.eps[ai].add(a)
        if node.kind in ("*", "+"):
            nfa.eps[ai].add(si)
        return s, a
    raise ValueError(f"bad pattern node {node!r}")


def _eclose(nfa: _NFA, states: FrozenSet[int]) -> FrozenSet[int]:
    out = set(states)
    stack = list(states)
    while stack:
        s = stack.pop()
        for t in nfa.eps[s]:
            if t not in out:
                out.add(t)
                stack.append(t)
    return frozenset(out)


@dataclass
class CompiledPattern:
    symbols: Tuple[str, ...]          # bit order of the predicate mask
    table: np.ndarray                 # [n_states, 2^k] int32 DFA transitions
    accepting: np.ndarray             # [n_states] bool
    start: int

    @property
    def n_states(self) -> int:
        return self.table.shape[0]


def compile_pattern(node, symbols: List[str]) -> CompiledPattern:
    """Pattern AST + symbol order → DFA over predicate bitmasks.

    A row whose predicate mask has bit s set may act as symbol s; the DFA
    input is the full mask, so subset construction resolves 'which symbol
    does this row play' exactly like the reference explores alternatives."""
    k = len(symbols)
    assert k <= 8, "at most 8 pattern symbols"
    sym_ids = {s: i for i, s in enumerate(symbols)}
    nfa = _NFA()
    start, accept = _build(nfa, node, sym_ids)

    start_set = _eclose(nfa, frozenset([start]))
    dfa_states: Dict[FrozenSet[int], int] = {frozenset(): DEAD,
                                             start_set: 1}
    rows: List[List[int]] = [[DEAD] * (1 << k),   # dead state loops
                             [0] * (1 << k)]
    accepting = [False, accept in start_set]
    work = [start_set]
    while work:
        cur = work.pop()
        ci = dfa_states[cur]
        for mask in range(1 << k):
            nxt = set()
            for st in cur:
                for sym, targets in nfa.edges[st].items():
                    if mask & (1 << sym):
                        nxt.update(targets)
            closed = _eclose(nfa, frozenset(nxt)) if nxt else frozenset()
            di = dfa_states.get(closed)
            if di is None:
                di = len(rows)
                dfa_states[closed] = di
                rows.append([DEAD] * (1 << k))
                accepting.append(accept in closed)
                work.append(closed)
            rows[ci][mask] = di
    return CompiledPattern(tuple(symbols),
                           np.asarray(rows, np.int32),
                           np.asarray(accepting, bool), 1)


# ------------------------------------------------------------ device match

def match_lengths(codes: jnp.ndarray, new_part: jnp.ndarray,
                  pat: CompiledPattern, window: int = 256) -> jnp.ndarray:
    """Per-start leftmost-longest match length (0 = no match), bounded by
    ``window`` rows.  ``codes`` is the per-row predicate bitmask (−1 for
    invalid/padding rows); ``new_part`` marks partition starts — a match
    in flight dies when it would cross into a new partition."""
    n = codes.shape[0]
    table = jnp.asarray(pat.table)
    acc = jnp.asarray(pat.accepting)
    states0 = jnp.full((n,), pat.start, jnp.int32)
    best0 = jnp.zeros((n,), jnp.int32)

    def step(carry, j):
        states, best = carry
        idx = jnp.arange(n, dtype=jnp.int32) + j
        inb = idx < n
        idx_c = jnp.minimum(idx, n - 1)
        code = jnp.where(inb, codes[idx_c], -1)
        crosses = inb & new_part[idx_c] & (j > 0)
        code = jnp.where(crosses, -1, code)
        nxt = jnp.where(code >= 0, table[states, jnp.maximum(code, 0)],
                        DEAD)
        best = jnp.where(acc[nxt], j + 1, best)
        return (nxt, best), None

    (_, best), _ = jax.lax.scan(step, (states0, best0),
                                jnp.arange(window, dtype=jnp.int32))
    return best


def select_matches(mlen: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """AFTER MATCH SKIP PAST LAST ROW: scan starts left→right, accepting a
    match when its start row is live, then hopping past its last row —
    one compiled ``while_loop`` (the reference's sequential skip logic)."""
    n = mlen.shape[0]

    def body(state):
        i, sel = state
        m = jnp.where(mask[jnp.minimum(i, n - 1)],
                      mlen[jnp.minimum(i, n - 1)], 0)
        hit = (m > 0) & (i < n)
        sel = sel.at[jnp.minimum(i, n - 1)].set(
            sel[jnp.minimum(i, n - 1)] | hit)
        return jnp.where(hit, i + m, i + 1), sel

    _, sel = jax.lax.while_loop(lambda st: st[0] < n, body,
                                (jnp.int32(0),
                                 jnp.zeros((n,), jnp.bool_)))
    return sel
