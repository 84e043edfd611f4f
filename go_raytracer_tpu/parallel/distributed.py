"""Multi-host entry points (SURVEY.md §7.6).

The reference is a single process (its only concurrency is the goroutine
row pool, camera/camera.go:112-132). The TPU-native multi-host story:

* `initialize()` wires `jax.distributed` from the standard coordinator
  environment (or explicit args) so every host sees the global device set;
* a 1-D global mesh + `render_regen_sharded` gives each chip — across all
  hosts — an independent item-range queue (zero per-step collectives; the
  per-window done/segment scalars ride a psum over ICI/DCN and the final
  image assembly allgathers once);
* per-shard RNG decorrelation is `fold_in(key, axis_index)` inside the
  shard, so streams are global-device-unique without host coordination.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for multi-host runs.

    Uses explicit args when given, else the standard env vars
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS + NUM_PROCESSES +
    PROCESS_ID, or a cloud-TPU environment where jax.distributed can
    auto-detect). Returns True when distributed mode was initialized,
    False for the single-process fallback."""
    addr = (coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if addr is None:
        # no explicit coordinator -> single-process mode. (Deliberately no
        # TPU_WORKER_HOSTNAMES auto-detection: dev environments export it
        # with placeholder values.)
        return False
    kwargs = {"coordinator_address": addr}
    if num_processes is not None or "NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ["NUM_PROCESSES"])
    if process_id is not None or "PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def global_render_mesh():
    """Flat 1-D mesh over every device in the job (all hosts), for
    `integrator.regen.render_regen_sharded`."""
    from go_raytracer_tpu.parallel import mesh as pmesh

    return pmesh.make_mesh(len(jax.devices()), axes=("data",))
