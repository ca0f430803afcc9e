"""Device mesh + sharded stylizer execution.

Frames are sharded over the ``data`` mesh axis (ICI); model params are
replicated. XLA inserts the collectives — there is no hand-written
communication on this path. The reference has no distributed backend at all
(SURVEY §2.8: NCCL/MPI absent; its only "parallelism" is serial
subprocesses), so this is a new capability, not a port.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_stylizer(stylize_fn, params, mesh: Mesh, *, axis: str = "data"):
    """Return f(batch01) running ``stylize_fn(params, batch)`` data-parallel.

    batch dim must be divisible by the mesh size; params replicate.
    """
    batch_sharding = NamedSharding(mesh, P(axis, None, None, None))
    replicated = NamedSharding(mesh, P())

    fn = jax.jit(
        stylize_fn,
        in_shardings=(replicated, batch_sharding),
        out_shardings=batch_sharding,
    )

    def run(batch01: jnp.ndarray) -> jnp.ndarray:
        return fn(params, batch01)

    return run


def temporal_halo_exchange(prev_last_frames: jnp.ndarray, axis: str = "data") -> jnp.ndarray:
    """Shift each shard's last frame to its right neighbor over the ICI ring.

    Used by the chunked temporal stage: shard k needs shard k-1's final
    stylized frame to seed its EMA recurrence. Call inside shard_map.
    """
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(prev_last_frames, axis, perm)
