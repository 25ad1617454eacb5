"""tpufluid.parallel — multi-chip scaling via spatial domain decomposition.

The reference is strictly single-GPU (SURVEY.md §2.4); the TPU-native scaling
story is the fluid-grid analog of sequence/context parallelism: shard the 2-D
grids over a device mesh and exchange 1-texel halos for the 5-point stencils.

Two paths:
  * ``auto``  — GSPMD: NamedSharding annotations on the state, XLA inserts
    the collectives (the scaling-book recipe; correct baseline).
  * ``halo``  — shard_map with explicit lax.ppermute halo exchange per
    stencil/Jacobi sweep (the optimized, communication-explicit path).
"""

from tpufluid.parallel.mesh import make_mesh, shard_state
from tpufluid.parallel.halo import exchange_halo_rows
from tpufluid.parallel.sharded_step import (make_sharded_multi_step, make_sharded_step, sharded_fluid_step)
from tpufluid.parallel.auto import make_auto_sharded_step
