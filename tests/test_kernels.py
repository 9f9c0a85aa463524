"""Kernel unit tests vs numpy oracles (the analogue of the reference's
operator/data-structure unit tests, e.g. ``TestGroupByHash``,
``operator/join/TestHashJoinOperator``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from presto_tpu.ops import hashtable as ht
from presto_tpu.ops import agg, sort, strings, decimal as dec


def rng(seed=0):
    return np.random.default_rng(seed)


class TestHashTable:
    def test_groupby_single_key(self):
        r = rng(1)
        keys = r.integers(0, 50, size=1000).astype(np.int64)
        mask = np.ones(1000, bool)
        cap = ht.capacity_for(50)
        owner, slot, _ = ht.insert([jnp.asarray(keys)], jnp.asarray(mask), cap)
        slot = np.asarray(slot)
        # same key -> same slot; different keys -> different slots
        for k in np.unique(keys):
            assert len(np.unique(slot[keys == k])) == 1
        uniq = {}
        for k, s in zip(keys, slot):
            assert uniq.setdefault(s, k) == k
        assert len(np.unique(slot)) == len(np.unique(keys))

    def test_groupby_masked_and_multikey(self):
        r = rng(2)
        k1 = r.integers(0, 10, size=500).astype(np.int64)
        k2 = r.integers(0, 7, size=500).astype(np.int64)
        mask = r.random(500) < 0.7
        cap = ht.capacity_for(70)
        owner, slot, _ = ht.insert([jnp.asarray(k1), jnp.asarray(k2)], jnp.asarray(mask), cap)
        slot = np.asarray(slot)
        assert (slot[~mask] == -1).all()
        assert (slot[mask] >= 0).all()
        groups = set(zip(k1[mask].tolist(), k2[mask].tolist()))
        assert len(np.unique(slot[mask])) == len(groups)

    def test_probe_unique_join(self):
        r = rng(3)
        build = np.arange(1, 201, dtype=np.int64)  # unique PK
        probe = r.integers(1, 400, size=1000).astype(np.int64)
        cap = ht.capacity_for(len(build))
        table = ht.build([jnp.asarray(build)], jnp.ones(len(build), bool), cap)
        m = ht.probe_unique(table, [jnp.asarray(probe)], jnp.ones(1000, bool))
        m = np.asarray(m)
        for i, p in enumerate(probe):
            if p <= 200:
                assert build[m[i]] == p
            else:
                assert m[i] == -1

    def test_expand_join_duplicates(self):
        r = rng(4)
        build = r.integers(0, 20, size=300).astype(np.int64)  # dup keys
        probe = r.integers(0, 30, size=100).astype(np.int64)
        cap = ht.capacity_for(30)
        table = ht.build([jnp.asarray(build)], jnp.ones(len(build), bool), cap)
        slot, cnt = ht.probe_counts(table, [jnp.asarray(probe)], jnp.ones(100, bool))
        cnt_np = np.asarray(cnt)
        expect_cnt = np.array([(build == p).sum() for p in probe])
        assert np.array_equal(cnt_np, expect_cnt)
        total = int(cnt_np.sum())
        out_size = max(8, total + 5)
        pi, bi, valid, matched = ht.expand_matches(table, slot, cnt, out_size)
        pi, bi, valid = map(np.asarray, (pi, bi, valid))
        assert valid.sum() == total
        got = sorted(zip(pi[valid].tolist(), probe[pi[valid]].tolist(),
                         build[bi[valid]].tolist()))
        expect = sorted((i, p, p) for i, p in enumerate(probe)
                        for _ in range((build == p).sum()))
        assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expect]
        assert all(p == b for _, p, b in got)  # joined rows match on key


class TestAgg:
    def test_seg_reductions(self):
        r = rng(5)
        g = r.integers(0, 16, size=400)
        v = r.integers(-100, 100, size=400).astype(np.int64)
        mask = r.random(400) < 0.8
        s = np.asarray(agg.seg_sum(jnp.asarray(v), jnp.asarray(g), jnp.asarray(mask), 16))
        c = np.asarray(agg.seg_count(jnp.asarray(g), jnp.asarray(mask), 16))
        mn = np.asarray(agg.seg_min(jnp.asarray(v), jnp.asarray(g), jnp.asarray(mask), 16))
        mx = np.asarray(agg.seg_max(jnp.asarray(v), jnp.asarray(g), jnp.asarray(mask), 16))
        for grp in range(16):
            sel = (g == grp) & mask
            assert s[grp] == v[sel].sum()
            assert c[grp] == sel.sum()
            if sel.any():
                assert mn[grp] == v[sel].min()
                assert mx[grp] == v[sel].max()


class TestSort:
    def test_multi_key(self):
        r = rng(6)
        a = r.integers(0, 5, size=200).astype(np.int64)
        b = r.integers(-50, 50, size=200).astype(np.int64)
        mask = r.random(200) < 0.9
        perm = np.asarray(sort.argsort_multi(
            [(jnp.asarray(a), False), (jnp.asarray(b), True)], jnp.asarray(mask)))
        nvalid = mask.sum()
        got = [(a[i], -b[i]) for i in perm[:nvalid]]
        assert got == sorted(got)
        assert (~mask[perm[nvalid:]]).all()

    def test_bytes_keys(self):
        words = ["apple", "app", "banana", "cherry", "apples", "b", ""]
        w = 8
        vals = np.zeros((len(words), w), np.uint8)
        lens = np.zeros(len(words), np.int32)
        for i, word in enumerate(words):
            e = word.encode()
            vals[i, :len(e)] = np.frombuffer(e, np.uint8)
            lens[i] = len(e)
        packs = sort.bytes_sort_keys(jnp.asarray(vals), jnp.asarray(lens))
        perm = np.asarray(sort.argsort_multi([(p, False) for p in packs]))
        assert [words[i] for i in perm] == sorted(words)


class TestStrings:
    def _mk(self, strs, w=24):
        vals = np.zeros((len(strs), w), np.uint8)
        lens = np.zeros(len(strs), np.int32)
        for i, word in enumerate(strs):
            e = word.encode()
            vals[i, :len(e)] = np.frombuffer(e, np.uint8)
            lens[i] = len(e)
        return jnp.asarray(vals), jnp.asarray(lens)

    def test_like_patterns(self):
        data = ["special requests", "the special pending requests run",
                "requests special", "nothing here", "forest green dreams",
                "forestry", "xforest", "special", ""]
        v, l = self._mk(data, 33)
        import re
        for pat in ["%special%requests%", "forest%", "%green%", "%requests",
                    "special", "%s%p%q%"]:
            got = np.asarray(strings.like(v, l, pat)).tolist()
            rx = re.compile("^" + re.escape(pat).replace("%", ".*") + "$", re.S)
            expect = [bool(rx.match(s)) for s in data]
            assert got == expect, (pat, got, expect)

    def test_eq_and_substring(self):
        data = ["13-345-678-9012", "29-000-111-2222", "7"]
        v, l = self._mk(data, 16)
        assert np.asarray(strings.eq_literal(v, l, "7")).tolist() == [False, False, True]
        sv, sl = strings.substring(v, l, 1, 2)
        assert np.asarray(sl).tolist() == [2, 2, 1]
        assert bytes(np.asarray(sv)[0, :2]) == b"13"
        assert bytes(np.asarray(sv)[2, :1]) == b"7"


class TestDecimal:
    def test_div_round_half_up(self):
        cases = [(5, 2, 3), (-5, 2, -3), (5, -2, -3), (7, 2, 4), (-7, 2, -4),
                 (1, 3, 0), (2, 3, 1), (-2, 3, -1), (10, 5, 2)]
        for num, den, expect in cases:
            got = int(dec.div_round_half_up(jnp.asarray([num], jnp.int64), den)[0])
            assert got == expect, (num, den, got, expect)

    def test_decimal_div(self):
        # 1.00 / 3.00 at scale 4 = 0.3333
        got = int(dec.decimal_div(jnp.asarray([100], jnp.int64), 2,
                                  jnp.asarray([300], jnp.int64), 2, 4)[0])
        assert got == 3333
        # 2.00 / 3.00 at scale 2 = 0.67
        got = int(dec.decimal_div(jnp.asarray([200], jnp.int64), 2,
                                  jnp.asarray([300], jnp.int64), 2, 2)[0])
        assert got == 67


# ---- segment-aggregation strategy equivalence (TPU paths tested on CPU) ----

def test_seg_strategies_agree():
    """The bcast (small-cap TPU) and sort (large-cap TPU) strategies must
    produce exactly the scatter (CPU) results for every seg op."""
    import numpy as np
    import jax.numpy as jnp
    from presto_tpu.ops import agg as A

    rng = np.random.default_rng(7)
    n, cap = 5000, 64
    group = jnp.asarray(rng.integers(-1, cap, n).astype(np.int32))
    mask = jnp.asarray(rng.random(n) < 0.8)
    vi = jnp.asarray(rng.integers(-1000, 1000, n).astype(np.int64))
    vf = jnp.asarray(rng.normal(size=n))

    def ref_sum(v):
        return A._bcast_sum(v, group, mask & (group >= 0), cap, jnp.int64)

    scatter_sum = A.seg_sum(vi, group, mask, cap)  # CPU default = scatter
    assert np.array_equal(np.asarray(scatter_sum), np.asarray(ref_sum(vi)))
    sort_sum = A._sort_sum(vi, group, mask & (group >= 0), cap, jnp.int64)
    assert np.array_equal(np.asarray(scatter_sum), np.asarray(sort_sum))

    scatter_cnt = A.seg_count(group, mask, cap)
    _, _, lo, hi = A._sorted_runs(group, mask & (group >= 0), cap)
    assert np.array_equal(np.asarray(scatter_cnt), np.asarray(hi - lo))

    for v in (vi, vf):
        mn_scatter = A.seg_min(v, group, mask, cap)
        mx_scatter = A.seg_max(v, group, mask, cap)
        init_mn = A.I64_MAX if v.dtype == jnp.int64 else jnp.inf
        init_mx = A.I64_MIN if v.dtype == jnp.int64 else -jnp.inf
        vmask = mask & (group >= 0)
        mn_b = A._bcast_reduce(v, group, vmask, cap, init_mn, jnp.min)
        mx_b = A._bcast_reduce(v, group, vmask, cap, init_mx, jnp.max)
        assert np.array_equal(np.asarray(mn_scatter), np.asarray(mn_b))
        assert np.array_equal(np.asarray(mx_scatter), np.asarray(mx_b))
        mn_s = A._sort_extreme(v, group, vmask, cap, init_mn, False)
        mx_s = A._sort_extreme(v, group, vmask, cap, init_mx, True)
        assert np.array_equal(np.asarray(mn_scatter), np.asarray(mn_s))
        assert np.array_equal(np.asarray(mx_scatter), np.asarray(mx_s))
