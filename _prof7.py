import time
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np
from presto_tpu.exec.runner import LocalRunner
from presto_tpu.tpch.queries import QUERIES

r = LocalRunner(scale_factor=10.0)
for tag, q in (("q6", 6), ("q1", 1)):
    t0=time.time(); r.run_sql(QUERIES[q]); c=time.time()-t0
    ts=[]
    for _ in range(5):
        t0=time.time(); r.run_sql(QUERIES[q]); ts.append(time.time()-t0)
    print(f"{tag} SF10 warm {np.median(ts)*1000:.0f} ms (cold {c:.0f}s)", flush=True)
n = 59_986_052
print(f"pair throughput: {2*n/ (0.0+sum(np.median, []) if False else 0) if False else ''}", flush=True)
