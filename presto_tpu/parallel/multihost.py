"""Multi-host (DCN) execution: N processes × K local devices, one mesh.

The TPU-native replacement for the reference's multi-node deployment
plane — coordinator/worker HTTP task protocol, discovery announcements and
the cross-node exchange (``server/remotetask/HttpRemoteTask.java:103``,
``metadata/DiscoveryNodeManager.java``, ``operator/ExchangeClient.java:56``)
collapse into the JAX multi-controller runtime:

- every process runs the SAME program (SPMD): planning is deterministic, so
  N controllers agree without a coordinator; "discovery" is
  ``jax.distributed.initialize`` barriering on the coordinator address
- the ``DistributedRunner``'s ``jit(shard_map)`` programs run unchanged —
  XLA lowers in-program collectives to cross-process transfers wherever the
  mesh axis spans hosts (ICI within a host, DCN across), with
  latency-hiding scheduling overlapping transfer and compute
- base tables never cross hosts: each process generates and device_puts
  only its addressable devices' row ranges (``slice_row_count`` keeps pad
  capacities globally consistent)
- the client result edge is a tiled process allgather (the ExchangeClient
  pull of the root stage buffer)

On real TPU pods the same code initializes from the TPU topology; here the
simulation harness (``tools/multihost_worker.py``, the
``DistributedQueryRunner.java:72`` analogue) boots N OS processes on one
box with gloo CPU collectives over loopback — the accepted multi-host
evidence path for this environment.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def init_multihost(process_id: int, num_processes: int,
                   coordinator: str = "localhost:9955",
                   local_devices: Optional[int] = None,
                   platform: str = "cpu") -> None:
    """Initialize this process as one controller of an N-process cluster.

    Must run before any JAX computation.  ``local_devices`` forces K
    virtual CPU devices per process (simulated hosts); on real TPU pods
    leave it None and the runtime discovers the local chips."""
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if local_devices is not None:
        jax.config.update("jax_num_cpu_devices", local_devices)
    if platform == "cpu":
        # cross-process CPU collectives ride gloo (the DCN stand-in)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_mesh():
    """1-D mesh over every device of every process (axis ``d``).

    Device order is process-major, so contiguous mesh neighbors are
    intra-host: XLA maps the frequent small sub-exchanges onto the
    fast tier and only host-crossing routes onto DCN."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("d",))
