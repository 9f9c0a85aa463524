"""Quick TPU health probe: prints one line OK/WEDGED.

Run under an external timeout; exit 0 + 'OK' means the axon tunnel is
usable (device compute AND host readback both completed)."""
import time

t0 = time.time()
import jax  # noqa: E402

ds = jax.devices()
x = jax.numpy.ones((256, 256))
y = (x @ x).block_until_ready()
import numpy as np  # noqa: E402

h = float(np.asarray(y)[0, 0])
print(f"OK {ds[0]} matmul+readback {h} in {time.time() - t0:.1f}s",
      flush=True)
