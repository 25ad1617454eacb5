"""Checkpoint / resume (SURVEY.md §5.4).

The reference persists nothing (fields live only in GL textures; the only
export is the PNG screenshot). Long-horizon TPU runs need real snapshots:
``save_state``/``load_state`` serialize the state pytree + config + step
cursor to an .npz, and — when a ``tracer`` is passed — the full input-side
session state (PointerTracer.state_dict: both RNG cursors, pointer state
machines, pending bursts), so an interactive session resumes
deterministically across the boundary. ``resize_state`` (tpufluid.state) is
the parity op for the reference's resize-preserves-fields behavior
(script.js:1108-1126).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import numpy as np

from tpufluid.config import FluidConfig
from tpufluid.state import FluidState

_FORMAT_VERSION = 1


def save_state(path: str, state: FluidState, config: FluidConfig,
               step: int = 0, extra: Optional[dict] = None,
               tracer=None) -> None:
    cfg = dataclasses.asdict(config)
    extra = dict(extra or {})
    if tracer is not None:
        extra["tracer"] = tracer.state_dict()
    meta = {"version": _FORMAT_VERSION, "step": int(step), "config": cfg,
            "extra": extra}
    np.savez_compressed(
        path,
        velocity=np.asarray(state.velocity),
        dye=np.asarray(state.dye),
        pressure=np.asarray(state.pressure),
        meta=json.dumps(meta),
    )


def load_state(path: str) -> Tuple[FluidState, FluidConfig, int, dict]:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"unknown checkpoint version {meta['version']}")
    cfg_dict = meta["config"]
    cfg_dict["BACK_COLOR"] = tuple(cfg_dict["BACK_COLOR"])
    config = FluidConfig(**cfg_dict).validate()
    import jax.numpy as jnp

    state = FluidState(
        velocity=jnp.asarray(data["velocity"]),
        dye=jnp.asarray(data["dye"]),
        pressure=jnp.asarray(data["pressure"]),
    )
    return state, config, int(meta["step"]), meta["extra"]
