"""Fused Pallas TPU kernels for the hot stencil ops.

Same semantics as tpufluid.ops.stencil (the jnp oracle); used when
FluidConfig.USE_PALLAS is set and the backend/shape supports them.
"""
