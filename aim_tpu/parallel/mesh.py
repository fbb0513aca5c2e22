"""Device mesh + sharding for pair-parallel scaling.

The reference scales by sharding contiguous pair blocks across up to 2,500
DPUs (ref: host.c:191 ``nb_reads_per_dpu = ROUND_UP_MULTIPLE_8(total/nr)``,
broadcast transfers :246-268).  Here the same data parallelism is a 1-D
``jax.sharding.Mesh`` over a ``pairs`` axis: batches are device_put with a
NamedSharding that splits dim 0 contiguously (preserving pair idx order),
and the batch kernels — being per-pair independent — partition trivially
under jit's SPMD; the only cross-device collective is the while-loop
any(active) all-reduce in the WFA kernel and the final result gather.

Multi-host: initialize jax.distributed and the same code path scales over
all addressable devices; each host parses/feeds its contiguous pair range
(see parallel.runner.shard_range).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=("pairs",))


def pair_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (the pair axis) across the mesh; replicate the rest."""
    return NamedSharding(mesh, P("pairs"))


def shard_range(total: int, host_id: int, n_hosts: int) -> tuple[int, int]:
    """Contiguous per-host pair range, mirroring the reference's per-DPU
    block assignment (file order preserved => output idx order preserved)."""
    per = -(-total // n_hosts)
    lo = min(host_id * per, total)
    return lo, min(lo + per, total)
