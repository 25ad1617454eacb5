"""JAX persistent compilation cache, one switch (SURVEY.md §5 aux infra).

The serving layer's latency story (tpufluid/serve_batch.py) makes every
XLA compile a background, off-lock event — but each program still costs
seconds of a small host's CPU the first time its (padded batch, dt kind)
shape is seen. The persistent cache turns that into a once-per-MACHINE
cost: every ``jit`` (and AOT ``lower().compile()``) consults an on-disk
store keyed by the HLO fingerprint, so server restarts, soak reruns and
bench re-runs load executables from disk in ~100 ms instead of recompiling
(measured on this host: 29 s -> 5 s whole-process, the residual being
imports/tracing). The reference has no analog — WebGL shader programs
recompile per page load (script.js compileShader) with the browser's own
driver-level shader cache as the silent equivalent.

CPU caveat: XLA:CPU stores AOT objects with host-feature fingerprints and
logs a (spurious on the same machine) feature-mismatch warning when
loading; results are correct. TPU is the first-class path.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing) and drop the min-time/min-size gates so even the serving
    layer's small per-shape programs are cached. Call BEFORE the first
    compile; returns the resolved directory."""
    import jax

    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: the defaults skip compiles under 1 s / small
    # executables, which is exactly the serving program matrix.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
