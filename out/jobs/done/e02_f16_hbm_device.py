# Round-5 device job e02: certify the HBM-segment kernel's pre-packed f16
# mode on compiled Mosaic at the demo's cross-resolution geometry, and
# check the f16 dispatch routes it (halo > HALO path).
import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jnp.ones((8, 128)))  # tunnel warmup

from tpufluid.ops.pallas import advect_hbm as ah
from tpufluid.ops.quant import f16_pack_planes

rng = np.random.default_rng(11)
H, W, C = 1024, 1024, 3
# Demo-scale displacement: velocity in DYE texels/s after the 8x rescale.
vel16 = jnp.clip(jnp.asarray(
    (rng.standard_normal((2, H, W)) * 5000).astype(np.float16)),
    -8000, 8000)
src16 = jnp.asarray(rng.random((C, H, W)).astype(np.float16))
dt = jnp.float32(0.016666)
vel = vel16.astype(jnp.float32)
mdx = 8.0 * 1000.0 / 60.0
want = np.asarray(jax.jit(lambda v, s: ah.advect_pallas_hbm(
    v, s.astype(jnp.float32), dt, 1.0, max_disp_x=mdx))(vel, src16))
got = np.asarray(jax.jit(lambda v, s: ah.advect_pallas_hbm(
    v, f16_pack_planes(s), dt, 1.0, max_disp_x=mdx, f16c=C))(vel, src16))
print("hbm f16 packed vs staged bit-exact:",
      bool((want.view(np.uint32) == got.view(np.uint32)).all()),
      "max|diff|", float(np.abs(want - got).max()))

# dispatch routing at the demo ratio (8x): halo > HALO -> hbm kernel
from tpufluid.ops.pallas import dispatch as K

routed = jax.jit(lambda v, s: K._advect_f16_packed(
    v, s, dt, 1.0, 8.0 * 1000.0 / 60.0, mdx))(vel16, src16)
assert routed is not None, "demo-ratio f16 did not route to the hbm kernel"
print("dispatch routed hbm f16: True, matches:",
      bool((np.asarray(routed).view(np.uint32)
            == want.view(np.uint32)).all()))
