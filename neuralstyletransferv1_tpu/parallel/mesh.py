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


def temporal_postprocess_sharded(
    mesh: Mesh,
    styled01: jnp.ndarray,
    orig01: jnp.ndarray,
    flows: jnp.ndarray,
    *,
    state,
    first: bool,
    mask_alphas: jnp.ndarray | None = None,
    mask_has: jnp.ndarray | None = None,
    axis: str = "data",
    **scan_kwargs,
):
    """The temporal chain over an ICI-sharded frame batch: each shard scans
    its local time chunk; the EMA seed for shard k is shard k-1's boundary
    stylized frame, moved over the ring (temporal_halo_exchange). Shard 0
    seeds from ``state`` — the true sequential carry from the previous batch —
    so only the interior shard boundaries are chunked approximations: their
    init ``prev`` is the raw boundary frame rather than its EMA-smoothed
    version, an error that decays like (1-alpha)^t into each chunk (SURVEY §5:
    the flow-EMA warp makes the recurrence non-associative, so chip-local
    chunks with a 1-frame ICI halo is the TPU mapping).

    ``flows`` must already be computed globally (flow t-1→t for every t, the
    boundary pairs included), so the warp across each chunk seam uses the
    true cross-boundary flow. Returns (out THWC, final TemporalState of the
    LAST shard — the sequential carry for the next batch).
    """
    from jax import shard_map
    from ..ops.color import rgb_to_lab_u8
    from ..temporal.ema import TemporalState, temporal_postprocess_scan

    n = mesh.shape[axis]
    T = styled01.shape[0]
    assert T % n == 0, (T, n)
    if mask_alphas is None:
        mask_alphas = jnp.zeros((T, 1, 1, 1), jnp.float32)
        mask_has = jnp.zeros((T,), bool)

    def chunk(styled_l, orig_l, flows_l, alphas_l, has_l, carry_styled, carry_lab):
        idx = jax.lax.axis_index(axis)
        halo = temporal_halo_exchange(styled_l[-1], axis)
        init = TemporalState(
            jnp.where(idx == 0, carry_styled, halo),
            jnp.where(idx == 0, carry_lab, rgb_to_lab_u8(halo)),
        )
        warmup = jnp.logical_and(idx == 0, first)
        out, fstate = temporal_postprocess_scan(
            styled_l, orig_l, flows_l,
            mask_alphas=alphas_l, mask_has=has_l,
            init=init, warmup=warmup, **scan_kwargs,
        )
        return out, fstate.prev_styled01[None], fstate.prev_lab[None]

    P_t = P(axis)
    P_thwc = P(axis, None, None, None)
    out, last_styled, last_lab = shard_map(
        chunk,
        mesh=mesh,
        in_specs=(P_thwc, P_thwc, P_thwc, P_thwc, P_t, P(), P()),
        out_specs=(P_thwc, P_thwc, P_thwc),
    )(styled01, orig01, flows, mask_alphas, mask_has,
      state.prev_styled01, state.prev_lab)
    return out, TemporalState(last_styled[-1], last_lab[-1])
