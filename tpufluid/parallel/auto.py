"""GSPMD auto-sharded step: NamedSharding annotations + XLA-inserted collectives.

The scaling-book baseline recipe: annotate the state's shardings, jit the
SAME single-device step function, and let XLA partition every op and insert
the halo collectives itself. This is the correctness baseline the explicit
shard_map path (tpufluid.parallel.sharded_step) is measured against; it also
composes with any grid shape (no divisibility requirement — XLA pads).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax

from tpufluid.config import FluidConfig
from tpufluid.parallel.mesh import make_mesh, state_shardings
from tpufluid.step import fluid_step


@lru_cache(maxsize=None)
def make_auto_sharded_step(config: FluidConfig, mesh=None):
    """jit(fluid_step) with row-sharded in/out shardings over ``mesh``.

    Pallas kernels don't auto-partition, so this path forces the jnp
    implementation (USE_PALLAS off) — XLA handles the distribution.
    """
    if mesh is None:
        mesh = make_mesh()
    cfg = FluidConfig(**{**config.__dict__, "USE_PALLAS": False})
    sh = state_shardings(mesh)
    step = partial(fluid_step, config=cfg)
    return jax.jit(step, donate_argnums=0,
                   in_shardings=(sh, None, None), out_shardings=sh)
