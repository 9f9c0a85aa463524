import time
import jax
jax.config.update("jax_enable_x64", True)
from presto_tpu.exec.runner import LocalRunner
from presto_tpu.tpch.queries import QUERIES

r = LocalRunner(scale_factor=1.0)
r.run_sql("explain analyze " + QUERIES[3], fused=False)   # cold: compiles
t = r.run_sql("explain analyze " + QUERIES[3], fused=False)  # warm
for line in t.to_pydict()["Query Plan"]:
    print(line, flush=True)
