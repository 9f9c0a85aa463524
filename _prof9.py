import time
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np
from presto_tpu.exec.runner import LocalRunner
from presto_tpu.tpch.queries import QUERIES

r = LocalRunner(scale_factor=1.0)
for tag, q in (("q3", 3), ("q1", 1), ("q6", 6), ("q18", 18), ("q5", 5)):
    t0=time.time(); r.run_sql(QUERIES[q]); c=time.time()-t0
    ts=[]
    for _ in range(3):
        t0=time.time(); r.run_sql(QUERIES[q]); ts.append(time.time()-t0)
    print(f"{tag} SF1 warm {np.median(ts)*1000:.0f} ms (cold {c:.0f}s)", flush=True)
