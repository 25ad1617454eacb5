"""Mesh construction and state sharding rules.

Fields are sharded over a 2-D device mesh with axes ('y', 'x'): grid rows
(H / v) over 'y' and columns (W / u) over 'x' (SURVEY.md §2.4). Rows are the
TPU sublane dimension and columns the lane dimension, so each shard's
trailing (rows, cols) layout stays tile-friendly and halo exchange is a pure
neighbor ppermute over ICI in either mesh direction. A 1-D row decomposition
is the (ny, 1) special case.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufluid.state import FluidState

ROW_AXIS = "y"
COL_AXIS = "x"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None,
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """2-D (ny, nx) mesh over (rows, columns). Defaults to all visible
    devices as a 1-D row decomposition (nx = 1)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if shape is None:
        shape = (devices.size, 1)
    return Mesh(devices.reshape(shape), (ROW_AXIS, COL_AXIS))


def state_specs() -> FluidState:
    """PartitionSpecs for a FluidState: fields sharded (rows, cols)."""
    return FluidState(
        velocity=P(None, ROW_AXIS, COL_AXIS),
        dye=P(None, ROW_AXIS, COL_AXIS),
        pressure=P(ROW_AXIS, COL_AXIS),
    )


def state_shardings(mesh: Mesh) -> FluidState:
    specs = state_specs()
    return FluidState(
        velocity=NamedSharding(mesh, specs.velocity),
        dye=NamedSharding(mesh, specs.dye),
        pressure=NamedSharding(mesh, specs.pressure),
    )


def shard_state(state: FluidState, mesh: Mesh) -> FluidState:
    """Place a host/single-device state onto the mesh, (rows, cols)-sharded."""
    sh = state_shardings(mesh)
    return FluidState(
        velocity=jax.device_put(state.velocity, sh.velocity),
        dye=jax.device_put(state.dye, sh.dye),
        pressure=jax.device_put(state.pressure, sh.pressure),
    )
