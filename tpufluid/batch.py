"""Batched multi-simulation serving mode: B independent sims, ONE dispatch.

The reference runs exactly one interactive simulation (one global set of
FBOs, script.js:982-1010); tpufluid adds batching as a production-serving
extension: a multi-tenant server (one sim per user/session), parameter
sweeps, and — on TPU — restoring chip utilization at small grids, where a
single sim leaves the VPU idle and the per-dispatch latency dominates
(~450 us on tunneled backends; one batched dispatch amortizes it over B).

Design (TPU-first):

* ``jax.vmap`` over the single-sim :func:`tpufluid.step.fluid_step`. The
  trace-time Pallas dispatch sees the UNBATCHED per-sim shapes (vmap
  batches at the primitive level), so every kernel-selection gate behaves
  exactly as in the single-sim step; JAX's ``pallas_call`` batching rule
  then adds a leading grid dimension to the shipped kernels. Per-sim
  results are BIT-EXACT vs the unbatched step for every kernel family —
  windowed/HBM-segment gathers, Jacobi, fused stencil (tests/test_batch.py
  pins this in interpret mode; tests/test_tpu.py on the compiled Mosaic
  path).
* Per-sim time steps: ``dt`` may be a scalar (lock-step) or a ``(B,)``
  vector — interactive tenants run at their own wall clocks (the
  reference recomputes dt from wall time every frame,
  script.js:1188-1194). Both shapes run the COMPILED Mosaic kernel path:
  the kernels take dt as a (1, 1) SMEM block, the shape whose batched
  form ((B, 1, 1) with (1, 1, 1) blocks) Mosaic accepts — block dims
  equal to the array dims satisfy the (8, 128)-divisibility rule
  (out/jobs/done/c01_batched_smem_probe.py). Lock-step dt still rides
  ``in_axes=None`` so the shared clock is a single unbatched operand.
* Multi-chip: the batch axis is embarrassingly parallel. ``shard_map``
  places ``B // n_devices`` sims on each device and runs the SAME vmapped
  step on the local slice — pure data parallelism, ZERO collectives (no
  halos; contrast parallel/sharded_step.py, which decomposes ONE large
  grid spatially and pays halo ppermutes). Scaling sims-per-second over a
  mesh is therefore linear by construction.

The batch axis is the leading axis of every field: velocity (B, 2, H, W),
dye (B, 3, Hd, Wd), pressure (B, H, W), splats (B, MAX_SPLATS, 8).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpufluid.config import FluidConfig
from tpufluid.state import FluidState, init_state
from tpufluid.step import fluid_step


def init_batch(config: FluidConfig, batch: int) -> FluidState:
    """Zeroed batched state: every field gains a leading (batch,) axis."""
    one = init_state(config)
    return jax.tree.map(
        lambda x: jnp.zeros((batch,) + x.shape, dtype=x.dtype), one)


def stack_states(states: Sequence[FluidState]) -> FluidState:
    """Stack per-sim states into one batched state (leading batch axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(batched: FluidState, i: int) -> FluidState:
    """Extract sim ``i`` from a batched state."""
    return jax.tree.map(lambda x: x[i], batched)


def _vmapped_step(config: FluidConfig, per_sim_dt: bool):
    """vmap of the single-sim step.

    ``per_sim_dt=False`` (lock-step, a SCALAR dt) maps dt with
    ``in_axes=None`` so the shared clock stays ONE unbatched SMEM operand
    inside the Pallas kernels. ``per_sim_dt=True`` (a (B,) dt — serving
    tenants on their own wall clocks) vmaps dt; the kernels' (1, 1) SMEM
    dt batches to (B, 1, 1) with (1, 1, 1) blocks, which Mosaic lowers
    (block dims equal to the array dims pass the divisibility rule —
    device probe out/jobs/done/c01_batched_smem_probe.py; a (1,)-shaped
    dt would NOT batch). Both branches are bit-exact per sim vs the
    unbatched step on the compiled kernel path (tests/test_tpu.py) and
    the jnp oracle (tests/test_batch.py)."""
    step = partial(fluid_step, config=config)
    return jax.vmap(step, in_axes=(0, 0 if per_sim_dt else None, 0))


@lru_cache(maxsize=None)
def make_batched_step(config: FluidConfig):
    """Compile step(batched_state, dt, splats) -> batched_state.

    ``splats`` is (B, MAX_SPLATS, 8); ``dt`` a scalar (lock-step) or (B,)
    per-sim — both compile to the TPU kernel path (see
    :func:`_vmapped_step`). Buffers are donated like the single-sim
    :func:`tpufluid.step.make_step`.
    """

    def step(state: FluidState, dt, splats):
        per_sim = jnp.ndim(dt) >= 1
        return _vmapped_step(config, per_sim)(
            state, jnp.asarray(dt, jnp.float32), splats)

    return jax.jit(step, donate_argnums=0)


@lru_cache(maxsize=None)
def make_batched_multi_step(config: FluidConfig):
    """Compile multi(batched_state, dt, splats_seq) -> batched_state.

    A ``lax.scan`` of T vmapped steps in ONE dispatch — the batched
    analog of :func:`tpufluid.step.make_multi_step` and the serving
    throughput benchmark entry point. ``splats_seq`` is (T, B, MAX_SPLATS,
    8); ``dt`` is a scalar or (T,) (lock-step across sims) or (T, B)
    per-sim — all compile to the TPU kernel path.
    """

    def multi(state: FluidState, dt, splats_seq):
        t, b = splats_seq.shape[0], splats_seq.shape[1]
        per_sim = jnp.ndim(dt) == 2
        # A (B,) per-sim dt (make_batched_step's vector shape) is NOT a
        # valid multi-step dt — a 1-D dt here means per-TIMESTEP. Reject
        # it loudly rather than silently reading tenant dts as a time
        # sequence (when B == T the broadcast would even succeed).
        if jnp.ndim(dt) == 1 and jnp.shape(dt)[0] not in (1, t):
            raise ValueError(
                f"1-D dt has length {jnp.shape(dt)[0]} but there are {t} "
                f"steps; per-sim dts for multi-step must be (T, B) = "
                f"({t}, {b})")
        vstep = _vmapped_step(config, per_sim)
        dts = (jnp.asarray(dt, jnp.float32) if per_sim
               else jnp.broadcast_to(
                   jnp.asarray(dt, jnp.float32).reshape(-1), (t,)))

        def body(s, xs):
            dt_t, splats_t = xs
            return vstep(s, dt_t, splats_t), None

        out, _ = jax.lax.scan(body, state, (dts, splats_seq))
        return out

    return jax.jit(multi, donate_argnums=0)


@lru_cache(maxsize=None)
def make_batched_render(config: FluidConfig,
                        out_hw: Optional[Tuple[int, int]] = None,
                        to_screen: bool = True):
    """Compile render(batched_state, dither) -> (B, C, H, W) frames.

    The shared dither texture is broadcast (in_axes=None), matching the
    reference's single ditheringTexture bound for every draw."""
    from tpufluid.render import render_frame

    fn = partial(render_frame, config=config, out_hw=out_hw,
                 to_screen=to_screen)

    def render(state: FluidState, dither: Optional[jnp.ndarray] = None):
        return jax.vmap(lambda s: fn(s, dither=dither))(state)

    return jax.jit(render)


# ---------------------------------------------------------------------------
# Batch data parallelism over a device mesh (zero collectives).
# ---------------------------------------------------------------------------

def batch_specs() -> FluidState:
    """PartitionSpecs for a batched FluidState: the batch axis is sharded
    over EVERY mesh axis (flattened), fields replicated within a sim."""
    from tpufluid.parallel.mesh import COL_AXIS, ROW_AXIS

    bp = P((ROW_AXIS, COL_AXIS))
    return FluidState(velocity=bp, dye=bp, pressure=bp)


def shard_batch(state: FluidState, mesh) -> FluidState:
    """Place a batched state onto the mesh, batch-axis sharded."""
    specs = batch_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)


BATCH_AXIS = "b"


def make_batch_spatial_mesh(shape, devices=None):
    """3-D (nb, ny, nx) mesh for the COMBINED mode: batch DP over axis
    ``'b'`` x spatial domain decomposition over ``('y', 'x')`` — a fleet of
    tenants whose grids are each too large for one chip. Lay the spatial
    axes innermost so each sim's halo ppermutes ride adjacent-ICI links
    while the batch axis (zero traffic) spans the slower dimension."""
    import numpy as np

    from tpufluid.parallel.mesh import COL_AXIS, ROW_AXIS

    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    nb, ny, nx = shape
    devices = np.asarray(devices)[:nb * ny * nx]
    return Mesh(devices.reshape(shape), (BATCH_AXIS, ROW_AXIS, COL_AXIS))


def batch_spatial_specs() -> FluidState:
    """PartitionSpecs for the combined mode: leading batch axis over 'b',
    each sim's (rows, cols) over ('y', 'x')."""
    from tpufluid.parallel.mesh import COL_AXIS, ROW_AXIS

    return FluidState(
        velocity=P(BATCH_AXIS, None, ROW_AXIS, COL_AXIS),
        dye=P(BATCH_AXIS, None, ROW_AXIS, COL_AXIS),
        pressure=P(BATCH_AXIS, ROW_AXIS, COL_AXIS),
    )


def shard_batch_spatial(state: FluidState, mesh) -> FluidState:
    """Place a batched state onto a (nb, ny, nx) mesh, batch- AND
    spatially-sharded."""
    specs = batch_spatial_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, specs)


@lru_cache(maxsize=None)
def make_batch_spatial_multi_step(config: FluidConfig, mesh):
    """Compile multi(batched_state, dt, splats_seq) over a 3-D
    ``('b', 'y', 'x')`` mesh: the batch axis is pure data parallelism
    (zero collectives) and each sim's grid runs the halo-exchange
    spatially-sharded step (parallel/sharded_step.py) over its own
    ``(ny, nx)`` sub-grid of devices — so the halo ppermutes stay WITHIN a
    sim's device group by construction (a collective over 'y'/'x' never
    crosses 'b'). This is the pod-scale serving layout: B interactive
    tenants, each on a grid one chip cannot hold.

    ``dt`` is a scalar, (T,) lock-step, or (T, B) per-sim — the same
    contract as :func:`make_batch_sharded_multi_step`; vmap batches the
    spatial step's kernels and its ppermutes alike. Per-sim results match
    the unsharded vmapped step to the same fp-reorder tolerance as the
    plain spatial decomposition (tests/test_batch.py)."""
    from tpufluid.parallel.mesh import COL_AXIS, ROW_AXIS
    from tpufluid.parallel.sharded_step import sharded_fluid_step

    nb, ny, nx = mesh.devices.shape
    sw, sh = config.sim_size
    dw, dh = config.dye_size
    if sh % ny or dh % ny or sw % nx or dw % nx:
        raise ValueError(
            f"grid extents {(sh, sw)}/{(dh, dw)} must divide mesh "
            f"spatial shape {(ny, nx)}")

    specs = batch_spatial_specs()

    def make_local_multi(per_sim):
        vstep = jax.vmap(partial(sharded_fluid_step, config=config),
                         in_axes=(0, 0 if per_sim else None, 0))

        def local_multi(state: FluidState, dts, splats_seq):
            def body(s, xs):
                dt_t, splats_t = xs
                return vstep(s, dt_t, splats_t), None

            out, _ = jax.lax.scan(body, state, (dts, splats_seq))
            return out

        return local_multi

    def multi(state: FluidState, dt, splats_seq):
        t, b = splats_seq.shape[0], splats_seq.shape[1]
        if b % nb:
            raise ValueError(f"batch {b} not divisible by mesh batch axis {nb}")
        per_sim = jnp.ndim(dt) == 2
        if jnp.ndim(dt) == 1 and jnp.shape(dt)[0] not in (1, t):
            raise ValueError(
                f"1-D dt has length {jnp.shape(dt)[0]} but there are {t} "
                f"steps; per-sim dts for multi-step must be (T, B) = "
                f"({t}, {b})")
        dts = (jnp.asarray(dt, jnp.float32) if per_sim
               else jnp.broadcast_to(
                   jnp.asarray(dt, jnp.float32).reshape(-1), (t,)))
        dt_spec = P(None, BATCH_AXIS) if per_sim else P(None)
        sharded = jax.shard_map(
            make_local_multi(per_sim), mesh=mesh,
            in_specs=(specs, dt_spec, P(None, BATCH_AXIS)),
            out_specs=specs, check_vma=False)
        return sharded(state, dts, splats_seq)

    return jax.jit(multi, donate_argnums=0)


@lru_cache(maxsize=None)
def make_batch_sharded_multi_step(config: FluidConfig, mesh):
    """Compile multi(batched_state, dt, splats_seq) with the batch axis
    sharded over ``mesh`` — each device scans its own B/n sims with the
    same vmapped kernel suite; no collective appears in the program (the
    body touches no mesh axis, unlike the halo ppermutes of the spatial
    decomposition). B must divide mesh.size evenly; per-sim results are
    bit-exact vs the unsharded batched step (tests/test_batch.py)."""
    from tpufluid.parallel.mesh import COL_AXIS, ROW_AXIS

    specs = batch_specs()

    def make_local_multi(per_sim):
        vstep = _vmapped_step(config, per_sim)

        def local_multi(state: FluidState, dts, splats_seq):
            def body(s, xs):
                dt_t, splats_t = xs
                return vstep(s, dt_t, splats_t), None

            out, _ = jax.lax.scan(body, state, (dts, splats_seq))
            return out

        return local_multi

    def multi(state: FluidState, dt, splats_seq):
        t, b = splats_seq.shape[0], splats_seq.shape[1]
        if b % mesh.size:
            raise ValueError(f"batch {b} not divisible by mesh size {mesh.size}")
        per_sim = jnp.ndim(dt) == 2
        if jnp.ndim(dt) == 1 and jnp.shape(dt)[0] not in (1, t):
            raise ValueError(
                f"1-D dt has length {jnp.shape(dt)[0]} but there are {t} "
                f"steps; per-sim dts for multi-step must be (T, B) = "
                f"({t}, {b})")
        dts = (jnp.asarray(dt, jnp.float32) if per_sim
               else jnp.broadcast_to(
                   jnp.asarray(dt, jnp.float32).reshape(-1), (t,)))
        dt_spec = (P(None, (ROW_AXIS, COL_AXIS)) if per_sim else P(None))
        sharded = jax.shard_map(
            make_local_multi(per_sim), mesh=mesh,
            in_specs=(specs, dt_spec, P(None, (ROW_AXIS, COL_AXIS))),
            out_specs=specs, check_vma=False)
        return sharded(state, dts, splats_seq)

    return jax.jit(multi, donate_argnums=0)
