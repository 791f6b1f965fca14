"""Multi-host initialization and host-local data placement (SURVEY.md §5.8).

The reference has no distributed backend of any kind (SURVEY.md §2.8). The
TPU-native design: one process per host, `jax.distributed.initialize` wires
the cluster, a single global ("data", "gauss") Mesh spans all hosts' devices,
and every collective (the tile-shard all_to_all, the grad psum, the color
all_gather) is emitted by XLA over ICI within a slice / DCN across slices —
nothing in tpugs changes between single-host and multi-host beyond this
entry point plus per-host data loading (Trainer._image_bank uses
jax.make_array_from_callback so each host only reads the views its data rows
own).

Usage (one command per host):

  TPUGS_DISTRIBUTED=1 \
  TPUGS_COORDINATOR=host0:8476 TPUGS_NUM_PROCESSES=4 TPUGS_PROCESS_ID=n \
  python -m tpugs.apps.train -d scene -o out --mesh data=8,gauss=4

On Cloud TPU pod slices the three coordinator variables may be omitted —
jax.distributed auto-detects the topology from the TPU runtime.
"""
from __future__ import annotations

import os


def maybe_init_distributed(log=print) -> bool:
    """Initialize jax.distributed from env vars when TPUGS_DISTRIBUTED is set.

    Must run before any other JAX call (backends initialize on first use).
    Returns True when multi-process mode was initialized."""
    if os.environ.get("TPUGS_DISTRIBUTED", "") not in ("1", "true"):
        return False
    import jax

    kwargs = {}
    coord = os.environ.get("TPUGS_COORDINATOR")
    if coord:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(os.environ["TPUGS_NUM_PROCESSES"]),
            process_id=int(os.environ["TPUGS_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    log(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global "
        f"devices"
    )
    return True
