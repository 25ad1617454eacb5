#!/usr/bin/env python3
"""Batched-serving demo artifact: ONE vmapped dispatch advances four
identically-seeded sims at four different clock rates (per-sim dt —
tpufluid/batch.py), rendering a 2x2 grid GIF. Panels start bit-identical
and drift apart only by their speed knobs: the visual proof that the
per-sim dt path really runs each tenant at its own wall clock.

  TPUFLUID_DEVICE=cpu python tools/batch_demo.py --out docs/batch_grid.gif
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/batch_grid.gif")
    p.add_argument("--steps", type=int, default=360)
    p.add_argument("--every", type=int, default=6)
    p.add_argument("--sim-res", type=int, default=96)
    p.add_argument("--dye-res", type=int, default=192)
    args = p.parse_args()

    if os.environ.get("TPUFLUID_DEVICE", "cpu").lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpufluid import FluidConfig
    from tpufluid.batch import (make_batched_render, make_batched_step,
                                stack_states)
    from tpufluid.io import frame_to_uint8, save_gif
    from tpufluid.state import init_state
    from tpufluid.trace import swirl_trace

    cfg = FluidConfig(SIM_RESOLUTION=args.sim_res, DYE_RESOLUTION=args.dye_res,
                      CANVAS_WIDTH=args.dye_res, CANVAS_HEIGHT=args.dye_res,
                      MAX_SPLATS=8).validate()
    B = 4
    speeds = np.array([0.25, 0.5, 0.75, 1.0], np.float32)
    dts = jnp.asarray(speeds / 60.0)  # per-sim dt, all <= the 1/60 ceiling
    # One shared trace: every panel sees the SAME splat stream, so the only
    # divergence between panels is their clock rate.
    tr = swirl_trace(cfg, args.steps, seed=11)
    state = stack_states([init_state(cfg) for _ in range(B)])
    step = make_batched_step(cfg)
    render = make_batched_render(cfg)

    frames = []
    for t in range(args.steps):
        splats = jnp.broadcast_to(jnp.asarray(tr.batches[t]),
                                  (B,) + tr.batches[t].shape)
        state = step(state, dts, splats)
        if (t + 1) % args.every == 0:
            f = np.asarray(render(state))  # (B, 4, H, W) float RGBA
            u = [frame_to_uint8(f[i])[..., :3] for i in range(B)]
            top = np.concatenate([u[0], u[1]], axis=1)
            bot = np.concatenate([u[2], u[3]], axis=1)
            frames.append(np.concatenate([top, bot], axis=0))
            print(f"step {t + 1}/{args.steps}", flush=True)

    # Panels are (H, W, 3) uint8 grids; frame_to_uint8 passes them through.
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_gif(frames, args.out, fps=15)
    print(f"wrote {args.out} ({len(frames)} frames, speeds {speeds.tolist()})")


if __name__ == "__main__":
    main()
