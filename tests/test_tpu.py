"""On-device (TPU) validation of the Pallas path — SKIPPED on CPU backends.

The regular suite runs the kernels in interpret mode on CPU; this file checks
the compiled Mosaic path against the jnp oracle on real hardware. Run with a
TPU visible:  python -m pytest tests/test_tpu.py -q

Note: tests/conftest.py forces the CPU backend for the rest of the suite, so
these tests self-skip there; run this file in a separate process with
JAX_PLATFORMS unset (or via out/tpu_worker.py) to exercise the device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a TPU backend")


@pytest.fixture(scope="module")
def warm_tunnel():
    # First device->host transfer can take minutes on tunneled backends.
    np.asarray(jnp.ones((8, 128)))


def test_step_pallas_matches_jnp_on_device(warm_tunnel):
    from tpufluid import FluidConfig, init_state
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                      CANVAS_HEIGHT=256, MAX_SPLATS=8).validate()
    cfg_np = FluidConfig(**{**cfg.__dict__, "USE_PALLAS": False})
    tr = swirl_trace(cfg, 1, seed=42)
    dt = jnp.float32(1 / 60)
    s0 = init_state(cfg)
    sp = jnp.asarray(tr.batches[0])
    a = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg))(s0, dt, sp)
    b = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg_np))(s0, dt, sp)
    vel_scale = max(float(jnp.abs(b.velocity).max()), 1.0)
    assert float(jnp.abs(a.velocity - b.velocity).max()) < 1e-4 * vel_scale
    assert float(jnp.abs(a.dye - b.dye).max()) < 1e-3


def test_jacobi_select_free_bit_exact_on_device(warm_tunnel):
    """The select-free sweep path (unpadded grids) must stay BIT-equal to
    the masked chain on compiled Mosaic, for a full-width tile and a
    column-tiled one (out/jobs/b53/b55/b65 pinned this; regression guard).
    """
    from unittest import mock

    import tpufluid.ops.pallas.jacobi as pj

    orig = pj._jacobi_chunk_kernel

    def masked(*a, **k):
        k["exact"] = False
        return orig(*a, **k)

    key = jax.random.PRNGKey(5)
    for n, dtp in ((1024, jnp.bfloat16), (4096, jnp.bfloat16),
                   (1024, jnp.float32)):
        k1, k2 = jax.random.split(jax.random.fold_in(key, n))
        p = (5.0 * jax.random.normal(k1, (n, n))).astype(dtp)
        d = jax.random.normal(k2, (n, n)).astype(dtp)
        got = np.asarray(jax.jit(
            lambda p, d: pj.jacobi_pressure(p, d, 20, prescale=0.8))(p, d),
            np.float32)
        with mock.patch.object(pj, "_jacobi_chunk_kernel", masked):
            want = np.asarray(jax.jit(
                lambda p, d: pj.jacobi_pressure(p, d, 20,
                                                prescale=0.8))(p, d),
                np.float32)
        assert (got != want).sum() == 0, (n, dtp)


def test_ragged_demo_config_on_device(warm_tunnel):
    from tpufluid import FluidConfig, init_state
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=64, DYE_RESOLUTION=128, CANVAS_WIDTH=320,
                      CANVAS_HEIGHT=180, MAX_SPLATS=8).validate()
    cfg_np = FluidConfig(**{**cfg.__dict__, "USE_PALLAS": False})
    tr = swirl_trace(cfg, 1, seed=1)
    dt = jnp.float32(1 / 60)
    s0 = init_state(cfg)
    sp = jnp.asarray(tr.batches[0])
    a = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg))(s0, dt, sp)
    b = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg_np))(s0, dt, sp)
    assert float(jnp.abs(a.dye - b.dye).max()) < 1e-3


def test_bf16_step_on_device(warm_tunnel):
    """Native-bf16 kernels vs the f32 step at bf16 tolerance."""
    from tpufluid import FluidConfig, init_state
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                      CANVAS_HEIGHT=256, MAX_SPLATS=8, DTYPE="bfloat16").validate()
    cfg_f = FluidConfig(**{**cfg.__dict__, "DTYPE": "float32"})
    tr = swirl_trace(cfg, 1, seed=42)
    dt = jnp.float32(1 / 60)
    sp = jnp.asarray(tr.batches[0])
    a = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg))(init_state(cfg), dt, sp)
    b = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg_f))(init_state(cfg_f), dt, sp)
    scale = max(float(jnp.abs(b.velocity).max()), 1.0)
    assert a.velocity.dtype == jnp.bfloat16
    assert float(jnp.abs(a.velocity.astype(jnp.float32) - b.velocity).max()) < 0.02 * scale
    assert float(jnp.abs(a.dye.astype(jnp.float32) - b.dye).max()) < 0.02


def test_rgb9e5_dye_on_device(warm_tunnel):
    """config.DYE_RGB9E5 on the real chip: (a) the packed-gather kernel
    matches the quantized jnp oracle (same pack/unpack procedure,
    ops/quant.py) at fp-order tolerance; (b) the full bf16 step with the
    knob on stays within the established bf16-vs-f32 step tolerance — the
    quantization adds 9-bit shared-exponent noise, a strict subset of the
    bf16 noise class."""
    import tpufluid.ops.pallas.advect as pa
    from tpufluid import FluidConfig, init_state
    from tpufluid.ops.advect import advect
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    rng = np.random.default_rng(5)
    H, W = 256, 512
    dt = jnp.float32(1 / 60)
    vel = jnp.clip(jnp.asarray(rng.standard_normal((2, H, W)) * 400),
                   -1000, 1000).astype(jnp.bfloat16)
    src = jnp.asarray(rng.random((3, H, W)) * 2).astype(jnp.bfloat16)
    got = jax.jit(lambda v, s: pa.advect_pallas(v, s, dt, 1.0,
                                                quant="rgb9e5"))(vel, src)
    want = advect(vel.astype(jnp.float32), src.astype(jnp.float32), dt, 1.0,
                  quant="rgb9e5")
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    assert err.max() < 2.0 ** -7, err.max()

    cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256,
                      CANVAS_WIDTH=256, CANVAS_HEIGHT=256, MAX_SPLATS=8,
                      DTYPE="bfloat16", DYE_RGB9E5=True).validate()
    cfg_f = FluidConfig(**{**cfg.__dict__, "DTYPE": "float32",
                           "DYE_RGB9E5": False})
    tr = swirl_trace(cfg, 1, seed=42)
    sp = jnp.asarray(tr.batches[0])
    a = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg))(init_state(cfg), dt, sp)
    b = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg_f))(init_state(cfg_f), dt, sp)
    assert a.dye.dtype == jnp.bfloat16
    assert float(jnp.abs(a.dye.astype(jnp.float32) - b.dye).max()) < 0.02


def test_sharded_step_kernels_on_device(warm_tunnel):
    """The shard_map body runs the Pallas kernel suite on the real chip
    (1-device mesh) and matches the fused single-device step."""
    from tpufluid import FluidConfig, init_state
    from tpufluid.parallel import make_mesh, shard_state
    from tpufluid.parallel.sharded_step import make_sharded_step
    from tpufluid.step import make_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                      CANVAS_HEIGHT=256, MAX_SPLATS=8).validate()
    mesh = make_mesh(1)
    sharded = make_sharded_step(cfg, mesh)
    single = make_step(cfg)
    tr = swirl_trace(cfg, 3, seed=5)
    dt = jnp.float32(1 / 60)
    a = init_state(cfg)
    b = shard_state(init_state(cfg), mesh)
    for t in range(3):
        sp = jnp.asarray(tr.batches[t])
        a = single(a, dt, sp)
        b = sharded(b, dt, sp)
        if t == 0:
            # Tight single-step equivalence: the meaningful claim. (Multi-step
            # diffs grow ~3x/step — near-clamp |v|~1000 flow is chaotic — so
            # only the first step bounds the implementations' true distance.)
            scale = max(float(jnp.abs(a.velocity).max()), 1.0)
            d0 = float(jnp.abs(jnp.asarray(b.velocity) - a.velocity).max())
            assert d0 < 5e-6 * scale, (d0, scale)
            assert float(jnp.abs(jnp.asarray(b.dye) - a.dye).max()) < 1e-5
    # Loose 3-step sanity: same attractor, no structural drift.
    scale = max(float(jnp.abs(a.velocity).max()), 1.0)
    assert float(jnp.abs(jnp.asarray(b.velocity) - a.velocity).max()) < 1e-3 * scale
    assert float(jnp.abs(jnp.asarray(b.dye) - a.dye).max()) < 1e-4


def test_scan_throughput_smoke(warm_tunnel):
    """The benchmark execution mode stays finite and makes progress."""
    from tpufluid import FluidConfig, init_state
    from tpufluid.step import make_multi_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                      CANVAS_HEIGHT=256, MAX_SPLATS=8).validate()
    tr = swirl_trace(cfg, 50, seed=2)
    multi = make_multi_step(cfg)
    s = multi(init_state(cfg), jnp.float32(1 / 60), jnp.asarray(tr.batches))
    checksum = float(jnp.sum(jnp.abs(s.velocity.astype(jnp.float32))))
    assert np.isfinite(checksum) and checksum > 0


def test_golden_frame_pallas_on_device(warm_tunnel):
    """DEVICE golden: 30 swirl-trace steps + full render through the
    compiled Mosaic kernel path, against a committed device-generated frame
    (the CPU golden in tests/test_golden.py covers only the jnp path).
    Regenerate with out/jobs pattern: see out/jobs/done/b11_device_golden.py."""
    import os

    from tpufluid import FluidConfig, init_state
    from tpufluid.render import render_frame
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    golden = os.path.join(os.path.dirname(__file__), "golden_frame_tpu.npz")
    cfg = FluidConfig(SIM_RESOLUTION=128, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                      CANVAS_HEIGHT=256, BLOOM_RESOLUTION=64,
                      SUNRAYS_RESOLUTION=64, MAX_SPLATS=8).validate()
    step = jax.jit(lambda s, dt, sp: fluid_step(s, dt, sp, cfg))
    trace = swirl_trace(cfg, 30, seed=77)
    s = init_state(cfg)
    dt = jnp.float32(trace.dt)
    for t in range(30):
        s = step(s, dt, jnp.asarray(trace.batches[t]))
    frame = np.asarray(render_frame(s, cfg), dtype=np.float32)
    want = np.load(golden)["frame"]
    err = np.abs(np.clip(frame, 0, 1) - np.clip(want, 0, 1))
    # Same-hardware recompute is deterministic; 2/255 is libtpu-version
    # headroom (same rationale as the CPU golden bound).
    assert err.max() < 2.0 / 255.0, f"device golden drifted: {err.max():.4f}"
    assert err.mean() < 0.25 / 255.0


def test_golden_frame_pallas_on_device_bf16(warm_tunnel):
    """bf16 DEVICE golden: same trace/shape as the f32 device golden but
    through the 16-bit storage path UNDER THE ROUND-9 DEFAULT (rgb9e5
    packed-dye gather) — locks the quantized default end to end on the
    compiled Mosaic path. Regenerate: out/jobs/done/b74_bf16_device_golden.py."""
    import os

    from tpufluid import FluidConfig, init_state
    from tpufluid.render import render_frame
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    golden = os.path.join(os.path.dirname(__file__), "golden_frame_tpu_bf16.npz")
    cfg = FluidConfig(SIM_RESOLUTION=128, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                      CANVAS_HEIGHT=256, BLOOM_RESOLUTION=64,
                      SUNRAYS_RESOLUTION=64, MAX_SPLATS=8,
                      DTYPE="bfloat16").validate()
    assert cfg.DYE_RGB9E5  # the default this golden locks
    step = jax.jit(lambda s, dt, sp: fluid_step(s, dt, sp, cfg))
    trace = swirl_trace(cfg, 30, seed=77)
    s = init_state(cfg)
    dt = jnp.float32(trace.dt)
    for t in range(30):
        s = step(s, dt, jnp.asarray(trace.batches[t]))
    frame = np.asarray(render_frame(s, cfg), dtype=np.float32)
    want = np.load(golden)["frame"]
    err = np.abs(np.clip(frame, 0, 1) - np.clip(want, 0, 1))
    # Same-hardware recompute is deterministic; 2/255 is libtpu-version
    # headroom (same rationale as the f32 device golden bound).
    assert err.max() < 2.0 / 255.0, f"bf16 device golden drifted: {err.max():.4f}"
    assert err.mean() < 0.25 / 255.0


def test_float16_staged_step_on_device(warm_tunnel):
    """float16 state via the f32-staged pass path (Mosaic has no f16):
    runs the Pallas kernels, returns f16, tracks the f32 step closely."""
    from tpufluid import FluidConfig, init_state
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256, CANVAS_WIDTH=256,
                      CANVAS_HEIGHT=256, MAX_SPLATS=8, DTYPE="float16").validate()
    cfg_f = FluidConfig(**{**cfg.__dict__, "DTYPE": "float32"})
    tr = swirl_trace(cfg, 1, seed=42)
    dt = jnp.float32(1 / 60)
    sp = jnp.asarray(tr.batches[0])
    a = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg))(init_state(cfg), dt, sp)
    b = jax.jit(lambda s, d, b: fluid_step(s, d, b, cfg_f))(init_state(cfg_f), dt, sp)
    assert a.velocity.dtype == jnp.float16
    scale = max(float(jnp.abs(b.velocity).max()), 1.0)
    err = float(jnp.abs(a.velocity.astype(jnp.float32) - b.velocity).max())
    # f16 rounding only (11 mantissa bits): ~8x tighter than the bf16 bound.
    assert err < 0.003 * scale, (err, scale)


def test_f16_packed_gather_bit_exact_on_device(warm_tunnel):
    """Channel-packed float16 gather (pre-packed uint32 planes + in-register
    IEEE-half decode) must be BIT-IDENTICAL on device to the staged-f32
    kernel it replaces — same f32 math on the same values (quant.
    f16_bits_to_f32 is exact, incl. subnormal halves). Also pins that the
    f16 dispatch ROUTES through the packed kernel (returns non-None)."""
    from tpufluid.ops.pallas import advect as pa
    from tpufluid.ops.pallas import dispatch as K
    from tpufluid.ops.quant import f16_pack_planes

    rng = np.random.default_rng(7)
    H, W = 256, 256
    vel16 = jnp.clip(jnp.asarray(
        (rng.standard_normal((2, H, W)) * 700).astype(np.float16)),
        -1000, 1000)
    src_np = rng.random((3, H, W)).astype(np.float16)
    src_np[:, 10:14, 20:40] = (rng.random((3, 4, 20)) * 5e-5
                               ).astype(np.float16)  # subnormal halves
    src16 = jnp.asarray(src_np)
    dt = jnp.float32(0.016666)
    vel = vel16.astype(jnp.float32)
    mdx = 1000.0 / 60.0
    want = jax.jit(lambda v, s: pa.advect_pallas(
        v, s.astype(jnp.float32), dt, 1.0, max_disp_x=mdx))(vel, src16)
    got = jax.jit(lambda v, s: pa.advect_pallas(
        v, f16_pack_planes(s), dt, 1.0, max_disp_x=mdx, f16c=3))(vel, src16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    routed = jax.jit(lambda v, s: K._advect_f16_packed(
        v, s, dt, 1.0, pa.HALO - 2, mdx))(vel16, src16)
    assert routed is not None
    np.testing.assert_array_equal(np.asarray(routed), np.asarray(want))


def test_display_kernel_matches_jnp_on_device(warm_tunnel):
    """Fused display resample+shading kernel (compiled Mosaic) == jnp taps.

    Compares the shaded base directly (the kernel's contract) — comparing
    full frames instead would route differences through the bloom gamma pow,
    whose derivative blows up at 0 and amplifies fp-order noise ~1000x."""
    from tpufluid.ops.display import shaded_base
    from tpufluid.ops.pallas import display as pdl

    rng = np.random.default_rng(7)
    for (h, w, oh, ow, shading) in [(1024, 1820, 720, 1280, True),
                                    (256, 456, 48, 256, True),
                                    (1024, 1820, 360, 640, False)]:
        dye = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
        assert pdl.supported((3, h, w), (oh, ow), shading)
        got = jax.jit(lambda d: pdl.resample_shade_pallas(
            d, (oh, ow), shading))(dye)
        want = jax.jit(lambda d: shaded_base(d, (oh, ow), shading))(dye)
        err = float(jnp.abs(got - want).max())
        assert err < 2e-5, (h, w, oh, ow, shading, err)


def test_display_composite_on_device(warm_tunnel):
    """Fused display composite (compiled Mosaic) == jnp display_composite at
    the config-2 geometry, including the ragged-row sunrays source whose
    unaligned window starts once miscompiled."""
    from tpufluid.ops.display import display_composite
    from tpufluid.ops.pallas import display as pdl
    from tpufluid.utils.bluenoise import blue_noise_64

    rng = np.random.default_rng(3)
    dye = jnp.asarray(rng.random((3, 1024, 1820)).astype(np.float32))
    bloom = jnp.asarray((rng.random((3, 256, 455)) * 2).astype(np.float32))
    rays = jnp.asarray(rng.random((196, 348)).astype(np.float32))
    dith = jnp.asarray(blue_noise_64())
    got = jax.jit(lambda d: pdl.display_pallas(
        d, (720, 1280), True, bloom, rays, dith))(dye)
    want = jax.jit(lambda d: display_composite(
        d, (720, 1280), True, bloom, rays, dith))(dye)
    err = float(jnp.abs(got - want).max())
    assert err < 5e-5, err  # gamma pow near 0 amplifies fp-order noise


def test_bloom_pyramid_on_device(warm_tunnel):
    """Bloom pyramid kernel (compiled, HIGHEST-precision MXU hats) == jnp."""
    from tpufluid import FluidConfig
    from tpufluid.ops.bloom import apply_bloom
    from tpufluid.ops.pallas import bloom as pb
    from tpufluid.ops.sampling import resample_bilinear

    cfg = FluidConfig(SIM_RESOLUTION=128, DYE_RESOLUTION=1024,
                      CANVAS_WIDTH=1280, CANVAS_HEIGHT=720,
                      MAX_SPLATS=8).validate()
    bw, bh = cfg.bloom_size
    mips = cfg.bloom_mip_sizes()
    rng = np.random.default_rng(5)
    dye = jnp.asarray((rng.random((3, 1024, 1820)) * 2).astype(np.float32))
    want = jax.jit(lambda d: apply_bloom(
        d, (bh, bw), mips, cfg.BLOOM_THRESHOLD, cfg.BLOOM_SOFT_KNEE,
        cfg.BLOOM_INTENSITY))(dye)
    got = jax.jit(lambda d: pb.bloom_pyramid_pallas(
        resample_bilinear(d, (bh, bw)), mips, cfg.BLOOM_THRESHOLD,
        cfg.BLOOM_SOFT_KNEE, cfg.BLOOM_INTENSITY))(dye)
    assert float(jnp.abs(got - want).max()) < 1e-5


def test_portrait_config_on_device(warm_tunnel):
    """Portrait canvas (ragged rows AND ragged cols on both grids): the
    geometry class where round 4's config fuzz caught a tile-alignment crash
    and the half-precision splat-bump divergence. Contract tolerances: the
    fused bumps are bf16x3-exact (~1e-6 of the bump), so two chaotic steps
    stay within ~1e-3 relative of the jnp oracle."""
    from tpufluid import FluidConfig, init_state
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=96, DYE_RESOLUTION=384, CANVAS_WIDTH=480,
                      CANVAS_HEIGHT=854, MAX_SPLATS=4).validate()
    cfg_np = FluidConfig(**{**cfg.__dict__, "USE_PALLAS": False})
    tr = swirl_trace(cfg, 2, seed=13)
    dt = jnp.float32(1 / 60)
    a, b = init_state(cfg), init_state(cfg_np)
    for t in range(2):
        sp = jnp.asarray(tr.batches[t])
        a = jax.jit(lambda s, d, x: fluid_step(s, d, x, cfg))(a, dt, sp)
        b = jax.jit(lambda s, d, x: fluid_step(s, d, x, cfg_np))(b, dt, sp)
    scale = max(float(jnp.abs(b.velocity).max()), 1.0)
    assert float(jnp.abs(a.velocity - b.velocity).max()) < 1e-3 * scale
    assert float(jnp.abs(a.dye - b.dye).max()) < 2e-3
    assert bool(jnp.isfinite(a.velocity).all())


def test_batched_step_and_render_bit_exact_on_device(warm_tunnel):
    """Serving mode on compiled Mosaic: a vmapped batch of B sims with
    PER-SIM dts must advance and render BIT-identically to the unbatched
    step per sim at that sim's own dt (pallas_call's batching rule adds a
    leading grid dimension and batches the (1, 1) SMEM dt to (B, 1, 1),
    which Mosaic lowers — device probe out/jobs/done/c01; lock-step dt
    pinned 0.0 worst err in out/jobs/done/b76/b78)."""
    from tpufluid import FluidConfig, init_state
    from tpufluid.batch import make_batched_step, make_batched_render, \
        stack_states, unstack_state
    from tpufluid.render import make_render
    from tpufluid.step import fluid_step
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=256, DYE_RESOLUTION=256,
                      CANVAS_WIDTH=256, CANVAS_HEIGHT=256, MAX_SPLATS=8,
                      DTYPE="bfloat16").validate()
    B = 2
    dts = jnp.asarray([1 / 60, 1 / 90], jnp.float32)
    splats = jnp.stack([jnp.asarray(swirl_trace(cfg, 1, seed=3 + i).batches[0])
                        for i in range(B)])
    states = [init_state(cfg) for _ in range(B)]
    out = make_batched_step(cfg)(stack_states(states), dts, splats)
    frames = make_batched_render(cfg)(out)
    single = jax.jit(lambda s, d, sp: fluid_step(s, d, sp, cfg))
    render = make_render(cfg)
    for i in range(B):
        ref = single(states[i], dts[i], splats[i])
        for name in ("velocity", "dye", "pressure"):
            np.testing.assert_array_equal(
                np.asarray(getattr(unstack_state(out, i), name), np.float32),
                np.asarray(getattr(ref, name), np.float32),
                err_msg=f"sim {i} {name}")
        np.testing.assert_array_equal(
            np.asarray(frames[i], np.float32),
            np.asarray(render(unstack_state(out, i)), np.float32),
            err_msg=f"sim {i} render")
