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


def _to_npz(arr) -> np.ndarray:
    """bfloat16 is an ml_dtypes extension type: np.savez writes it, but
    np.load(allow_pickle=False) hands back raw void '|V2' that jnp.asarray
    rejects — so bf16 fields travel as a uint16 bit view (lossless) and
    load_state restores the dtype from the config."""
    arr = np.asarray(arr)
    if arr.dtype.kind == "V" or arr.dtype.name == "bfloat16":
        return arr.view(np.uint16)
    return arr


def _from_npz(arr: np.ndarray, dtype) -> np.ndarray:
    if arr.dtype == np.uint16 and np.dtype(dtype).itemsize == 2:
        return arr.view(dtype)
    return arr


def save_state(path: str, state: FluidState, config: FluidConfig,
               step: int = 0, extra: Optional[dict] = None,
               tracer=None, compress: bool = True) -> None:
    """compress=False skips DEFLATE — latency-sensitive callers (the
    serving /checkpoint.npz endpoint) pay seconds of single-core zlib on
    turbulent 16-bit fields for almost no size win; np.load reads both."""
    cfg = dataclasses.asdict(config)
    extra = dict(extra or {})
    if tracer is not None:
        extra["tracer"] = tracer.state_dict()
    meta = {"version": _FORMAT_VERSION, "step": int(step), "config": cfg,
            "extra": extra}
    savez = np.savez_compressed if compress else np.savez
    savez(
        path,
        velocity=_to_npz(state.velocity),
        dye=_to_npz(state.dye),
        pressure=_to_npz(state.pressure),
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
        velocity=jnp.asarray(_from_npz(data["velocity"], config.dtype)),
        dye=jnp.asarray(_from_npz(data["dye"], config.dtype)),
        pressure=jnp.asarray(_from_npz(data["pressure"], config.dtype)),
    )
    return state, config, int(meta["step"]), meta["extra"]
