"""Batched multi-sim serving mode (tpufluid/batch.py).

The reference runs exactly ONE interactive simulation (one global FBO set,
script.js:982-1010); batching is a tpufluid serving extension, so the spec
here is internal consistency: every sim in a batch must advance EXACTLY as
it would alone — bit-for-bit on both the jnp oracle and the Pallas kernel
suite (vmap batches pallas_call by adding a leading grid dimension; the
trace-time dispatch gates see unbatched per-sim shapes either way) — and
the batch-DP shard_map must emit zero collectives while matching the
unsharded vmap.
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpufluid.ops.pallas.advect as pa
from tpufluid import FluidConfig, init_state
from tpufluid.batch import (init_batch, make_batch_sharded_multi_step,
                            make_batched_multi_step, make_batched_render,
                            make_batched_step, shard_batch, stack_states,
                            unstack_state)
from tpufluid.ops.pallas import dispatch as D
from tpufluid.parallel import make_mesh
from tpufluid.render import render_frame
from tpufluid.step import fluid_step, make_multi_step
from tpufluid.trace import swirl_trace


def _cfg(**kw):
    base = dict(SIM_RESOLUTION=64, DYE_RESOLUTION=128, CANVAS_WIDTH=128,
                CANVAS_HEIGHT=128, MAX_SPLATS=4, USE_PALLAS=False)
    base.update(kw)
    return FluidConfig(**base).validate()


def _seeded_states(cfg, batch, steps=2):
    """Distinct per-sim states: advance each from zero with its own trace."""
    out, traces = [], []
    step = jax.jit(lambda s, d, sp: fluid_step(s, d, sp, cfg))
    for i in range(batch):
        tr = swirl_trace(cfg, steps, seed=10 + i)
        s = init_state(cfg)
        for t in range(steps):
            s = step(s, jnp.float32(tr.dt), jnp.asarray(tr.batches[t]))
        out.append(s)
        traces.append(tr)
    return out, traces


def test_init_stack_unstack_roundtrip():
    cfg = _cfg()
    b = init_batch(cfg, 3)
    assert b.velocity.shape == (3, 2, 64, 64)
    assert b.dye.shape == (3, 3, 128, 128)
    assert b.pressure.shape == (3, 64, 64)
    assert b.velocity.dtype == cfg.dtype
    states, _ = _seeded_states(cfg, 2)
    stacked = stack_states(states)
    for i, s in enumerate(states):
        u = unstack_state(stacked, i)
        for name in ("velocity", "dye", "pressure"):
            np.testing.assert_array_equal(np.asarray(getattr(u, name)),
                                          np.asarray(getattr(s, name)))


def test_batched_step_bit_exact_per_sim_jnp():
    """One vmapped step == B independent steps, including PER-SIM dt (a
    serving tenant runs at its own wall clock)."""
    cfg = _cfg()
    B = 3
    states, _ = _seeded_states(cfg, B)
    splats = jnp.stack([jnp.asarray(swirl_trace(cfg, 1, seed=50 + i).batches[0])
                        for i in range(B)])
    dts = jnp.asarray([1 / 60, 1 / 90, 1 / 120], jnp.float32)
    out = make_batched_step(cfg)(stack_states(states), dts, splats)
    step = jax.jit(lambda s, d, sp: fluid_step(s, d, sp, cfg))
    for i in range(B):
        ref = step(states[i], dts[i], splats[i])
        for name in ("velocity", "dye", "pressure"):
            np.testing.assert_array_equal(
                np.asarray(getattr(unstack_state(out, i), name)),
                np.asarray(getattr(ref, name)), err_msg=f"sim {i} {name}")


def test_lockstep_dt_equals_uniform_per_sim_dt():
    """The lock-step branch (dt in_axes=None — the compiled-TPU shape)
    and the per-sim branch with equal dts are the same program output."""
    cfg = _cfg()
    B = 2
    states, _ = _seeded_states(cfg, B)
    splats = jnp.stack([jnp.asarray(swirl_trace(cfg, 1, seed=50 + i).batches[0])
                        for i in range(B)])
    step = make_batched_step(cfg)
    a = step(stack_states(states), jnp.float32(1 / 60), splats)
    b = step(stack_states(states), jnp.full((B,), 1 / 60, jnp.float32), splats)
    for name in ("velocity", "dye", "pressure"):
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)),
                                      err_msg=name)


def test_batched_multi_step_matches_single_multi_step():
    """T-step scan of vmapped steps == per-sim T-step scans (lock-step dt,
    the throughput-benchmark shape)."""
    cfg = _cfg()
    B, T = 2, 3
    states, _ = _seeded_states(cfg, B)
    seqs = [jnp.asarray(swirl_trace(cfg, T, seed=70 + i).batches) for i in range(B)]
    splats_seq = jnp.stack(seqs, axis=1)  # (T, B, MAX_SPLATS, 8)
    dt = jnp.float32(1 / 60)
    out = make_batched_multi_step(cfg)(stack_states(states), dt, splats_seq)
    multi = make_multi_step(cfg)
    for i in range(B):
        ref = multi(states[i], dt, seqs[i])
        for name in ("velocity", "dye", "pressure"):
            np.testing.assert_array_equal(
                np.asarray(getattr(unstack_state(out, i), name)),
                np.asarray(getattr(ref, name)), err_msg=f"sim {i} {name}")


def test_batched_step_bit_exact_per_sim_pallas_interpret():
    """The SHIPPED Pallas kernel suite under vmap with PER-SIM dts: JAX's
    pallas_call batching rule adds a leading grid dim and batches the
    (1, 1) SMEM dt to (B, 1, 1); per-sim results must stay bit-identical
    to the unbatched kernel step at that sim's own dt."""
    cfg = FluidConfig(SIM_RESOLUTION=128, DYE_RESOLUTION=256,
                      CANVAS_WIDTH=256, CANVAS_HEIGHT=256,
                      MAX_SPLATS=4).validate()
    B = 2
    calls = {"n": 0}
    orig = pa.pl.pallas_call

    def wrapped(*a, **k):
        calls["n"] += 1
        k["interpret"] = True
        return orig(*a, **k)

    states = [init_state(cfg) for _ in range(B)]
    splats = jnp.stack([jnp.asarray(swirl_trace(cfg, 1, seed=3 + i).batches[0])
                        for i in range(B)])
    dts = jnp.asarray([1 / 60, 1 / 90], jnp.float32)
    # pa.pl IS the shared jax.experimental.pallas module: one patch covers
    # every kernel family's pallas_call.
    with mock.patch.object(D, "_on_tpu", lambda: True), \
         mock.patch.object(pa.pl, "pallas_call", wrapped):
        out = jax.jit(jax.vmap(
            lambda s, d, sp: fluid_step(s, d, sp, cfg)))(
                stack_states(states), dts, splats)
        single = jax.jit(lambda s, d, sp: fluid_step(s, d, sp, cfg))
        refs = [single(states[i], dts[i], splats[i]) for i in range(B)]
        out.velocity.block_until_ready()
    assert calls["n"] >= 8, f"Pallas kernels did not engage (calls={calls['n']})"
    for i in range(B):
        for name in ("velocity", "dye", "pressure"):
            np.testing.assert_array_equal(
                np.asarray(getattr(unstack_state(out, i), name), np.float32),
                np.asarray(getattr(refs[i], name), np.float32),
                err_msg=f"sim {i} {name}")


def test_batch_sharded_multi_step_matches_unsharded():
    """Batch DP over the 8-device mesh with PER-SIM dts: same result as
    the unsharded batched scan (each device scans its own sims at their
    own clocks — the (T, B) dt shards along B), and the compiled program
    contains NO collectives (the batch axis is embarrassingly parallel —
    no halos)."""
    cfg = _cfg()
    B, T = 8, 2
    states, _ = _seeded_states(cfg, B, steps=1)
    batched = stack_states(states)
    splats_seq = jnp.stack(
        [jnp.asarray(swirl_trace(cfg, T, seed=90 + i).batches) for i in range(B)],
        axis=1)
    dt = jnp.broadcast_to(
        jnp.linspace(1 / 90, 1 / 60, B, dtype=jnp.float32), (T, B))
    truth = make_batched_multi_step(cfg)(
        jax.tree.map(jnp.copy, batched), dt, splats_seq)

    mesh = make_mesh()  # (8, 1)
    multi = make_batch_sharded_multi_step(cfg, mesh)
    hlo = multi.lower(shard_batch(batched, mesh), dt, splats_seq
                      ).compile().as_text()
    for coll in ("all-reduce", "collective-permute", "all-gather",
                 "all-to-all", "reduce-scatter"):
        assert coll not in hlo, f"unexpected collective {coll} in batch DP"
    out = multi(shard_batch(batched, mesh), dt, splats_seq)
    for name in ("velocity", "dye", "pressure"):
        np.testing.assert_array_equal(np.asarray(getattr(out, name)),
                                      np.asarray(getattr(truth, name)),
                                      err_msg=name)


def test_batch_sharded_substepped_tick_matches_unsharded():
    """Multi-chip FAST-FORWARD serving (round 11): the K-substep masked
    tick under batch DP on the 8-device mesh — per-sim state AND rendered
    frames bit-equal to the unsharded tick, with varied substep counts
    across the shard boundary (masked zero rows on some devices only),
    and NO collectives in the compiled program."""
    from tpufluid.serve_batch import (make_batch_sharded_substepped_tick,
                                      make_substepped_tick)

    cfg = _cfg()
    B, K = 8, 3
    states, _ = _seeded_states(cfg, B, steps=1)
    batched = stack_states(states)
    splats = jnp.stack([jnp.asarray(swirl_trace(cfg, 1, seed=50 + i)
                                    .batches[0]) for i in range(B)])
    # 1..3 substeps per sim, distinct sub-dts — every device's local slice
    # sees a different masking pattern.
    n_sub = (np.arange(B) % K) + 1
    subs = np.linspace(1 / 120, 1 / 60, B).astype(np.float32)
    dts = jnp.asarray(np.where(np.arange(K)[:, None] < n_sub[None, :],
                               subs[None, :], 0.0).astype(np.float32))
    truth_state, truth_frames = make_substepped_tick(cfg)(
        jax.tree.map(jnp.copy, batched), dts, splats)

    mesh = make_mesh()  # (8, 1)
    tick = make_batch_sharded_substepped_tick(cfg, mesh)
    hlo = tick.lower(shard_batch(batched, mesh), dts, splats
                     ).compile().as_text()
    for coll in ("all-reduce", "collective-permute", "all-gather",
                 "all-to-all", "reduce-scatter"):
        assert coll not in hlo, f"unexpected collective {coll} in batch DP"
    out_state, out_frames = tick(shard_batch(batched, mesh), dts, splats)
    for name in ("velocity", "dye", "pressure"):
        np.testing.assert_array_equal(np.asarray(getattr(out_state, name)),
                                      np.asarray(getattr(truth_state, name)),
                                      err_msg=name)
    np.testing.assert_array_equal(np.asarray(out_frames),
                                  np.asarray(truth_frames))


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 2, 1)])
def test_batch_spatial_multi_step_matches_unsharded(mesh_shape):
    """COMBINED batch x spatial parallelism (the pod-scale serving layout:
    B tenants, each grid spatially sharded over its own (ny, nx) device
    sub-grid). Per-sim dts exercise the dt spec; results must match the
    unsharded vmapped scan to the spatial decomposition's fp-reorder
    tolerance (the halo step is not bit-exact vs single-device — same
    scaling as tests/test_sharding.py), and the halo ppermutes must stay
    within a sim's spatial group (equality across distinct per-'b' sims
    proves no cross-batch leakage)."""
    from tpufluid.batch import (make_batch_spatial_mesh,
                                make_batch_spatial_multi_step,
                                shard_batch_spatial)

    cfg = _cfg()
    nb = mesh_shape[0]
    B, T = nb * 2, 2
    states, _ = _seeded_states(cfg, B, steps=1)
    batched = stack_states(states)
    splats_seq = jnp.stack(
        [jnp.asarray(swirl_trace(cfg, T, seed=70 + i).batches)
         for i in range(B)], axis=1)
    dt = jnp.broadcast_to(
        jnp.linspace(1 / 90, 1 / 60, B, dtype=jnp.float32), (T, B))
    truth = make_batched_multi_step(cfg)(
        jax.tree.map(jnp.copy, batched), dt, splats_seq)

    mesh = make_batch_spatial_mesh(mesh_shape)
    multi = make_batch_spatial_multi_step(cfg, mesh)
    out = multi(shard_batch_spatial(batched, mesh), dt, splats_seq)
    for name in ("velocity", "dye", "pressure"):
        x = np.asarray(getattr(truth, name), dtype=np.float32)
        y = np.asarray(getattr(out, name), dtype=np.float32)
        assert np.isfinite(y).all(), f"{name}: non-finite"
        scale = max(float(np.abs(x).max()), 1e-3)
        err = float(np.abs(x - y).max()) / scale
        assert err < 4e-4, f"{name}@{mesh_shape}: rel err {err:.2e}"


def test_batch_spatial_rejects_bad_shapes():
    from tpufluid.batch import (make_batch_spatial_mesh,
                                make_batch_spatial_multi_step,
                                shard_batch_spatial)

    cfg = _cfg()
    mesh = make_batch_spatial_mesh((2, 2, 2))
    multi = make_batch_spatial_multi_step(cfg, mesh)
    batched = init_batch(cfg, 3)  # 3 % nb=2 != 0
    splats_seq = jnp.zeros((2, 3, cfg.MAX_SPLATS, 8), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        multi(batched, jnp.float32(1 / 60), splats_seq)
    # Grid extents that do not divide the spatial mesh axes (64 % 3 != 0).
    with pytest.raises(ValueError, match="must divide"):
        make_batch_spatial_multi_step(cfg, make_batch_spatial_mesh((2, 3, 1)))


def test_multi_step_rejects_per_sim_dt_vector():
    """A (B,) per-sim dt (make_batched_step's shape) is not a multi-step
    dt — 1-D means per-TIMESTEP there. Reject loudly instead of silently
    reading tenant dts as a time sequence (when B == T the broadcast would
    even succeed)."""
    cfg = _cfg()
    B, T = 4, 3
    state = init_batch(cfg, B)
    splats_seq = jnp.zeros((T, B, cfg.MAX_SPLATS, 8), jnp.float32)
    bad_dt = jnp.full((B,), 1 / 60, jnp.float32)  # B != T and B != 1
    with pytest.raises(ValueError, match="per-sim dts for multi-step"):
        make_batched_multi_step(cfg)(state, bad_dt, splats_seq)


def test_batch_sharded_rejects_indivisible_batch():
    cfg = _cfg()
    mesh = make_mesh()
    multi = make_batch_sharded_multi_step(cfg, mesh)
    bad = init_batch(cfg, 3)
    splats = jnp.zeros((1, 3, cfg.MAX_SPLATS, 8), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        multi(bad, jnp.float32(1 / 60), splats)


def test_batched_render_matches_per_sim():
    cfg = _cfg(SHADING=True, BLOOM=True, SUNRAYS=True)
    B = 2
    states, _ = _seeded_states(cfg, B)
    frames = make_batched_render(cfg)(stack_states(states))
    for i in range(B):
        ref = render_frame(states[i], cfg)
        # The step is bit-exact under vmap (tests above); the display
        # pipeline is not: vmap changes XLA's fusion grouping across the
        # bloom/sunrays reductions, reassociating fp sums (measured
        # <= 4e-6 absolute — invisible at 1/255 = 3.9e-3 quantization).
        np.testing.assert_allclose(np.asarray(frames[i]), np.asarray(ref),
                                   atol=1e-5, rtol=0, err_msg=f"sim {i}")
