import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from presto_tpu.ops import hashtable as HT, agg as A

N = 1 << 23                   # 8.4M rows (Q3's padded join output)
CAP = HT.capacity_for(2_400_000)   # = 8M slots
print(f"N={N} CAP={CAP}", flush=True)
key = jax.jit(lambda: (jax.lax.iota(jnp.int64, N) * 2654435761) % 1_500_000)()
vals = jax.jit(lambda: jax.lax.iota(jnp.int64, N) % 10_000)()
mask = jnp.ones((N,), bool)
key.block_until_ready(); vals.block_until_ready()

def bench(name, fn, *args):
    f = jax.jit(lambda *a: jax.tree_util.tree_leaves(fn(*a))[0].ravel()[-1])
    r = f(*args); _ = np.asarray(r)
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); _=np.asarray(f(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {np.median(ts)*1000:.1f} ms", flush=True)

bench("insert cap8M", lambda k: HT.insert([k], mask, CAP), key)
o, s, _ = jax.jit(lambda k: HT.insert([k], mask, CAP))(key)
bench("seg_sum cap8M (sort strat)", lambda v, sl: A.seg_sum(v, sl, mask, CAP, jnp.int64), vals, s)
bench("seg_count cap8M", lambda sl: A.seg_count(sl, mask, CAP), s)
bench("take rep (gather 8M from N)", lambda o2: key[jnp.minimum(o2, N-1)], o)
