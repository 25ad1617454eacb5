# e03: e02's routing check, corrected — compare the f16 dispatch route
# against the STAGED dispatch route (same span/window planning on both
# sides; e02 compared against a hand-called span=1 kernel, which
# under-covers the 133-texel column bound by design).
import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jnp.ones((8, 128)))

from tpufluid.ops.pallas import dispatch as K

rng = np.random.default_rng(11)
H, W, C = 1024, 1024, 3
vel16 = jnp.clip(jnp.asarray(
    (rng.standard_normal((2, H, W)) * 5000).astype(np.float16)),
    -8000, 8000)
src16 = jnp.asarray(rng.random((C, H, W)).astype(np.float16))
dt = jnp.float32(0.016666)
mdy = 8.0 * 1000.0 / 60.0
mdx = 8.0 * 1000.0 / 60.0
routed = np.asarray(jax.jit(lambda v, s: K._advect_f16_packed(
    v, s, dt, 1.0, mdy, mdx))(vel16, src16))
staged = np.asarray(jax.jit(lambda v, s: K.advect_same_grid(
    v.astype(jnp.float32), s.astype(jnp.float32), dt, 1.0, mdy, mdx))(
        vel16, src16))
print("f16 dispatch route vs staged dispatch route bit-exact:",
      bool((routed.view(np.uint32) == staged.view(np.uint32)).all()),
      "max|diff|", float(np.abs(routed - staged).max()))
