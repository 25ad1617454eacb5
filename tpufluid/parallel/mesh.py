"""Mesh construction and state sharding rules.

Fields are sharded along the grid's row (H / v) axis over a 1-D mesh axis
named 'y'. Rows are the TPU sublane dimension; splitting H keeps each shard's
trailing (rows, W) layout tile-friendly and makes halo exchange a pure
neighbor ppermute over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufluid.state import FluidState

ROW_AXIS = "y"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the row axis. Defaults to all visible devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def state_specs() -> FluidState:
    """PartitionSpecs for a FluidState: all fields row-sharded."""
    return FluidState(
        velocity=P(None, ROW_AXIS, None),
        dye=P(None, ROW_AXIS, None),
        pressure=P(ROW_AXIS, None),
    )


def state_shardings(mesh: Mesh) -> FluidState:
    specs = state_specs()
    return FluidState(
        velocity=NamedSharding(mesh, specs.velocity),
        dye=NamedSharding(mesh, specs.dye),
        pressure=NamedSharding(mesh, specs.pressure),
    )


def shard_state(state: FluidState, mesh: Mesh) -> FluidState:
    """Place a host/single-device state onto the mesh, row-sharded."""
    sh = state_shardings(mesh)
    return FluidState(
        velocity=jax.device_put(state.velocity, sh.velocity),
        dye=jax.device_put(state.dye, sh.dye),
        pressure=jax.device_put(state.pressure, sh.pressure),
    )
