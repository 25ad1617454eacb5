"""Fused bloom pyramid Pallas kernel.

The reference's bloom is a prefilter plus a mip chain of 4-tap cross blurs
(applyBloom, /root/reference/script.js:1350-1394; shaders 614-674): ~16
passes over arrays no larger than the 256-scale base. As XLA ops the chain
is FIXED-OVERHEAD-bound, not compute-bound — dozens of tiny fusions, layout
copies and constant-vector DMAs measured ~0.35 ms of the config-2 frame
(out/jaxtrace_render4) for ~0.1 ms of actual work.

This kernel runs the ENTIRE pyramid in one grid=(1,) program, VMEM-resident
(every mip of a 256-base pyramid together is ~2 MB):

  * each 4-tap blur stage is two matmul chains on the MXU —
    0.25 * (A0 @ src @ Bh^T  +  Av @ src @ B0^T) — where A*/B* are bilinear
    "hat" matrices (two nonzeros per row) for the tap offsets: the +/-1
    source-texel u-taps share the center row matrix A0, the v-taps share
    B0, and opposite taps pre-sum into one matrix. Row selection on TPU has
    no cheap dynamic-sublane gather, but a hat matmul IS the bilinear
    resample, and the MXU is idle during rendering;
  * the matrices come from sampling.affine_axis_plan — the same coordinate
    code path the jnp oracle uses — built OUTSIDE the kernel (pure
    functions of the static mip geometry, so XLA constant-folds them) and
    passed as inputs;
  * the soft-knee prefilter and the final intensity scale are in-register.

Semantics match ops.bloom.apply_bloom minus the dye->base resample, which
stays outside (it reads the full-resolution dye). Verified in interpret
mode by tests/test_pallas.py and on device by tests/test_tpu.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufluid.ops.sampling import affine_axis_plan

_VMEM_BUDGET = 8 * 1024 * 1024


def _hat(n_in: int, n_out: int, off: float) -> jnp.ndarray:
    """(n_out, n_in) bilinear sampling matrix for one affine axis tap:
    row k holds weight 1-f at column i0(k) and f at i1(k) (summed where the
    edge clamp makes them coincide — value-equal to the jnp take pair)."""
    i0, i1, f = affine_axis_plan(n_in, n_out, off=off)
    cols = jnp.arange(n_in, dtype=jnp.int32)[None, :]
    return (jnp.where(cols == i0[:, None], (1.0 - f)[:, None], 0.0)
            + jnp.where(cols == i1[:, None], f[:, None], 0.0))


def _stage_matrices(src_hw: Tuple[int, int], out_hw: Tuple[int, int]):
    """The four matrices of one blur4 stage (A0, Av, B0t, Bht)."""
    sh, sw = src_hw
    oh, ow = out_hw
    tx, ty = 1.0 / sw, 1.0 / sh
    a0 = _hat(sh, oh, 0.0)
    av = _hat(sh, oh, -ty) + _hat(sh, oh, ty)
    b0t = jnp.transpose(_hat(sw, ow, 0.0))
    bht = jnp.transpose(_hat(sw, ow, -tx) + _hat(sw, ow, tx))
    return a0, av, b0t, bht


def _transitions(base_hw, mip_sizes):
    """(src_hw, out_hw) for every blur4 in apply_bloom's chain order:
    downs, additive ups, final."""
    hws = [base_hw] + [(mh, mw) for (mw, mh) in mip_sizes]
    steps = [(hws[i], hws[i + 1]) for i in range(len(hws) - 1)]       # down
    steps += [(hws[i + 1], hws[i]) for i in range(len(hws) - 2, 0, -1)]  # up
    steps.append((hws[1], base_hw))                                   # final
    return steps


def supported(base_hw: Tuple[int, int], mip_sizes, itemsize: int = 4) -> bool:
    if itemsize != 4 or len(mip_sizes) < 2:
        return False
    bh, bw = base_hw
    area = sum((mh + 2) * (mw + 2) for (mw, mh) in mip_sizes)
    mats = sum((o[0] * s[0] + s[1] * o[1]) * 2
               for s, o in _transitions(base_hw, mip_sizes))
    vmem = 4 * (2 * 3 * bh * bw + 3 * area + mats)
    return vmem <= _VMEM_BUDGET


def _kernel(*refs, n_mips: int, threshold: float, soft_knee: float,
            intensity: float):
    base_ref = refs[0]
    mat_refs = refs[1:1 + 4 * (2 * n_mips)]
    out_ref = refs[1 + 4 * (2 * n_mips)]

    def blur4(src, step: int):
        a0, av, b0t, bht = (r[...] for r in mat_refs[4 * step:4 * step + 4])
        # HIGHEST precision: Mosaic's default f32 matmul runs single-pass
        # bf16 (~1e-2 relative on device); the hat weights need true f32.
        dot = functools.partial(lax.dot_general,
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)
        horiz = dot(dot(a0, src, (((1,), (0,)), ((), ()))), bht,
                    (((1,), (0,)), ((), ())))
        vert = dot(dot(av, src, (((1,), (0,)), ((), ()))), b0t,
                   (((1,), (0,)), ((), ())))
        return (horiz + vert) * 0.25

    # Soft-knee prefilter (bloomPrefilterShader, script.js:614-631).
    c = base_ref[...].astype(jnp.float32)
    knee = threshold * soft_knee + 1e-4
    br = jnp.maximum(jnp.maximum(c[0], c[1]), c[2])
    rq = jnp.clip(br - (threshold - knee), 0.0, knee * 2.0)
    rq = (0.25 / knee) * rq * rq
    scale = jnp.maximum(rq, br - threshold) / jnp.maximum(br, 1e-4)

    for ch in range(3):
        last = c[ch] * scale
        mips = []
        for k in range(n_mips):
            last = blur4(last, k)
            mips.append(last)
        step = n_mips
        for i in range(n_mips - 2, -1, -1):
            mips[i] = mips[i] + blur4(last, step)
            last = mips[i]
            step += 1
        out_ref[ch] = blur4(last, step) * intensity


def bloom_pyramid_pallas(base: jnp.ndarray, mip_sizes: Sequence[Tuple[int, int]],
                         threshold: float, soft_knee: float,
                         intensity: float) -> jnp.ndarray:
    """Full bloom chain on the pre-resampled base (3, bh, bw) f32 ->
    (3, bh, bw). Equals ops.bloom.apply_bloom after its base resample."""
    _, bh, bw = base.shape
    steps = _transitions((bh, bw), mip_sizes)
    mats = []
    for src_hw, out_hw in steps:
        mats.extend(_stage_matrices(src_hw, out_hw))

    kernel = functools.partial(
        _kernel, n_mips=len(mip_sizes), threshold=float(threshold),
        soft_knee=float(soft_knee), intensity=float(intensity))
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(mats)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, bh, bw), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=sum(4 * s[0] * s[1] * (o[0] + o[1])
                      for s, o in steps) * 3,
            bytes_accessed=4 * 6 * bh * bw,
            transcendentals=0,
        ),
    )(base, *mats)
