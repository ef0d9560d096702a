"""Multi-host (DCN) scale-out for the NVR pipeline.

The reference is single-host/single-accelerator; SURVEY.md §2.3 names DCN
federation as the TPU-native extension. Two layers:

1. **Device layer (this module)** — `jax.distributed` multi-process meshes:
   every NVR host joins one coordinator, the global mesh puts the `data`
   (camera-batch) axis across hosts so its collectives ride DCN, and `model`
   (tensor-parallel) stays within a host's chips so those collectives ride
   ICI. Each host contributes its local cameras' frames with
   `host_batch_to_global` (no frame ever crosses hosts — only activations /
   gradients do), then the same sharded detect/train steps from
   parallel/mesh.py run unchanged over the global mesh.

2. **Service layer** — cloud/federation.py: HTTP peering so one primary UI
   fronts every host's cameras.

Tested with real multi-process execution (2 processes x 2 virtual CPU
devices, Gloo collectives over localhost = the DCN stand-in;
tests/test_federation.py).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str, num_processes: int, process_id: int,
                     local_device_ids=None) -> None:
    """Join the federation's jax.distributed cluster. Call once per host
    before any device use. coordinator: "host:port" of process 0."""
    jax.distributed.initialize(coordinator, num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def make_global_mesh(model: int = 1) -> Mesh:
    """(data, model) mesh over every process's devices: `data` spans hosts
    (DCN collectives), `model` stays inside a host (ICI). Device order from
    jax.devices() is process-major, so reshaping [data, model] with
    model <= devices-per-host keeps each model group on one host."""
    devs = jax.devices()
    n = len(devs)
    per_host = len(jax.local_devices())
    if model > per_host or per_host % model:
        raise ValueError(f"model={model} must divide local device count "
                         f"{per_host} (model groups must not span DCN)")
    arr = np.asarray(devs).reshape(n // model, model)
    return Mesh(arr, ("data", "model"))


def host_batch_to_global(mesh: Mesh, local_batch: np.ndarray):
    """Each host's [B_local, ...] camera batch -> one global jax.Array of
    shape [B_local * n_hosts, ...] sharded over `data`. Frames stay on the
    host that captured them; only the detect outputs are small enough to
    gather."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local_batch)


def global_detect_step(mesh: Mesh, size: str = "t", res: int = 640, **kw):
    """Sharded detect over the global mesh — same program as the single-host
    path (parallel/mesh.sharded_detect_fn); GSPMD handles the DCN boundary."""
    from . import mesh as pmesh
    return pmesh.sharded_detect_fn(mesh, size, res=res, **kw)


def fetch_local(out) -> np.ndarray:
    """Gather this host's shards of a `data`-sharded result (its own
    cameras' rows) without pulling other hosts' shards over DCN."""
    shards = [s for s in out.addressable_shards]
    shards.sort(key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])
