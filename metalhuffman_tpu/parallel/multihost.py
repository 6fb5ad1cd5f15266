"""Multi-host decode: jax.distributed + global mesh + stream-order gather.

Capability absent from the reference (single device, single process —
SURVEY.md section 2.6). Design per the sharding model in SURVEY.md section 5
("long-context" row): the per-block bit-offset index makes any chip on any
host able to decode any block range, so

- every process loads (or receives) the full compressed words + tables —
  these are small (the compressed stream) and replicated over DCN once;
- the block-offset index is sharded in contiguous ranges over the GLOBAL
  device order (stable range -> chip mapping keeps output deterministic);
- decode runs under the same ``shard_decode.decode_blocks_sharded`` as
  single-host — XLA addresses ICI within a host and DCN across hosts
  (swap in ``shard_decode.decode_tiles_sharded`` for the Pallas kernel on
  real TPU pods; the XLA path shown here is the portable default);
- the decoded global array is sharded in stream order; fetch spans you need,
  or use :func:`gather_blocks` for a host-local full copy.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from . import shard_decode
from .mesh import SEQ_AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> tuple[int, int]:
    """Bring up jax.distributed; returns (process_index, process_count).

    On Cloud TPU pods call with no arguments (auto-detected). For local
    multi-process testing pass explicit coordinator/count/rank.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_index(), jax.process_count()


def global_mesh(axis_name: str = SEQ_AXIS) -> Mesh:
    """1-D mesh over ALL devices of the distributed job (global order)."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def shard_global_inputs(mesh: Mesh, words, offsets, t1, t2,
                        axis_name: str = SEQ_AXIS):
    """Build globally-sharded jax.Arrays from full host copies.

    Every process holds the same full numpy arrays (the compressed stream is
    broadcast/loaded everywhere — it is the small side of the codec); each
    host materializes only the shards its own devices address, so no host
    ever touches remote data.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis_name]
    offsets = np.asarray(offsets, dtype=np.int32)
    pad = (-offsets.shape[0]) % n
    if pad:
        offsets = np.pad(offsets, (0, pad))

    def globalize(arr, spec):
        arr = np.asarray(arr)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return (
        globalize(words, P()),
        globalize(offsets, P(axis_name)),
        globalize(t1, P()),
        globalize(t2, P()),
    )


def decode_blocks_multihost(words, offsets, t1, t2, *, mesh: Mesh, width: int,
                            num_steps: int = 64, delta: bool = True,
                            axis_name: str = SEQ_AXIS):
    """Globally-sharded decode (same program as single-host; global mesh)."""
    return shard_decode.decode_blocks_sharded(
        words, offsets, t1, t2, mesh=mesh, width=width, num_steps=num_steps,
        delta=delta, axis_name=axis_name,
    )


def gather_blocks(decoded, n_blocks: int) -> np.ndarray:
    """Fetch the full decoded (n_blocks, steps) array to every host.

    Stream order is preserved by the stable block-range -> device mapping;
    cross-host spans travel once over DCN.
    """
    from jax.experimental import multihost_utils

    full = multihost_utils.process_allgather(decoded, tiled=True)
    return np.asarray(full)[:n_blocks]
