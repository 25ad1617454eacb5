"""Headless execution of the reference's OWN WebGL shaders (Mesa llvmpipe).

This is tpufluid's acceptance oracle against the real thing: the reference
app (/root/reference/script.js) embeds its entire simulation + render
pipeline as 20 GLSL ES 1.00 shaders. This harness extracts those shader
SOURCES at runtime from the read-only reference checkout and executes the
reference's exact pass sequence — step (script.js:1231-1294), render
(script.js:1296-1348), splat (script.js:1441-1455) — on a real OpenGL
implementation (Mesa llvmpipe over surfaceless EGL, GL_ARB_ES2_compatibility
accepts the ES 1.00 sources verbatim) with the same half-float texture
formats (RGBA16F / RG16F / R16F) the WebGL2 demo negotiates
(script.js:140-147).

No reference code ships in this repository: the GLSL text lives only under
/root/reference and is read at runtime; this file is original host-side
dispatch (Python/PyOpenGL) written against the pass sequence documented in
SURVEY.md §3. The harness exists to TEST tpufluid (tools/gl_parity.py,
tests/test_gl_parity.py, docs/PARITY.md "GL acceptance") — it is not a
compute path of the framework.

Precision model: llvmpipe stores textures in true IEEE half (like the WebGL
demo's 16F FBOs) and evaluates shader arithmetic in fp32 (desktop GL ignores
mediump) — exactly the model tpufluid's float16 mode implements (staged f32
compute, results rounded to half at pass boundaries).
"""

from __future__ import annotations

import ctypes
import os
import re
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

# Must be set before any OpenGL import.
os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
os.environ.setdefault("EGL_PLATFORM", "surfaceless")
os.environ.setdefault("LIBGL_ALWAYS_SOFTWARE", "1")

REFERENCE_DIR = os.environ.get("TPUFLUID_REFERENCE", "/root/reference")


def gl_available() -> bool:
    """True if a surfaceless EGL + desktop-GL stack and the reference exist."""
    if not os.path.exists(os.path.join(REFERENCE_DIR, "script.js")):
        return False
    try:
        import OpenGL.EGL  # noqa: F401
        import OpenGL.GL  # noqa: F401
    except Exception:
        return False
    return True


# ---------------------------------------------------------------------------
# Shader extraction (runtime, from the read-only reference checkout)

_SHADER_RE = re.compile(
    r"const (\w+) = compileShader\(gl\.(?:VERTEX|FRAGMENT)_SHADER, `(.*?)`",
    re.S,
)
_DISPLAY_RE = re.compile(r"const displayShaderSource = `(.*?)`;", re.S)


def extract_shader_sources(reference_dir: str = REFERENCE_DIR) -> Dict[str, str]:
    """Pull every embedded GLSL source out of the reference's script.js.

    Returns {const_name: glsl_source} for the 19 compileShader() literals
    (script.js:440-913) plus 'displayShaderSource' (script.js:549-612).
    """
    with open(os.path.join(reference_dir, "script.js"), "r") as f:
        text = f.read()
    sources = {name: src for name, src in _SHADER_RE.findall(text)}
    m = _DISPLAY_RE.search(text)
    if not m:
        raise RuntimeError("displayShaderSource not found in reference script.js")
    sources["displayShaderSource"] = m.group(1)
    expected = {
        "baseVertexShader", "blurVertexShader", "blurShader", "copyShader",
        "clearShader", "colorShader", "checkerboardShader",
        "bloomPrefilterShader", "bloomBlurShader", "bloomFinalShader",
        "sunraysMaskShader", "sunraysShader", "splatShader",
        "advectionShader", "divergenceShader", "curlShader",
        "vorticityShader", "pressureShader", "gradientSubtractShader",
        "displayShaderSource",
    }
    missing = expected - set(sources)
    if missing:
        raise RuntimeError(f"reference shaders not extracted: {sorted(missing)}")
    return sources


# ---------------------------------------------------------------------------
# Minimal GL runtime (context, programs, FBOs, fullscreen-quad dispatch)


class _Context:
    """Surfaceless EGL + desktop-GL-compat context on llvmpipe (singleton)."""

    _instance: Optional["_Context"] = None

    def __init__(self) -> None:
        from OpenGL import EGL

        dpy = EGL.eglGetDisplay(EGL.EGL_DEFAULT_DISPLAY)
        major, minor = ctypes.c_long(), ctypes.c_long()
        if not EGL.eglInitialize(dpy, major, minor):
            raise RuntimeError("eglInitialize failed")
        configs = (EGL.EGLConfig * 1)()
        num = ctypes.c_long()
        EGL.eglChooseConfig(
            dpy,
            [EGL.EGL_SURFACE_TYPE, EGL.EGL_PBUFFER_BIT,
             EGL.EGL_RENDERABLE_TYPE, EGL.EGL_OPENGL_BIT, EGL.EGL_NONE],
            configs, 1, num)
        if num.value < 1:
            raise RuntimeError("no EGL config with OpenGL renderable type")
        EGL.eglBindAPI(EGL.EGL_OPENGL_API)
        ctx = EGL.eglCreateContext(dpy, configs[0], EGL.EGL_NO_CONTEXT,
                                   [EGL.EGL_NONE])
        if not EGL.eglMakeCurrent(dpy, EGL.EGL_NO_SURFACE, EGL.EGL_NO_SURFACE,
                                  ctx):
            raise RuntimeError("eglMakeCurrent failed")

        from OpenGL import GL
        self.GL = GL
        exts = (GL.glGetString(GL.GL_EXTENSIONS) or b"").decode().split()
        if "GL_ARB_ES2_compatibility" not in exts:
            raise RuntimeError("GL_ARB_ES2_compatibility missing — cannot "
                               "compile the reference's ES 1.00 shaders")
        GL.glPixelStorei(GL.GL_UNPACK_ALIGNMENT, 1)
        GL.glPixelStorei(GL.GL_PACK_ALIGNMENT, 1)
        GL.glDisable(GL.GL_DEPTH_TEST)
        GL.glDisable(GL.GL_CULL_FACE)

        # The reference's fullscreen-quad VBO/IBO (blit IIFE,
        # script.js:915-921): clip-space quad, attribute slot 0.
        GL.glBindBuffer(GL.GL_ARRAY_BUFFER, int(GL.glGenBuffers(1)))
        quad = np.array([-1, -1, -1, 1, 1, 1, 1, -1], np.float32)
        GL.glBufferData(GL.GL_ARRAY_BUFFER, quad.nbytes, quad,
                        GL.GL_STATIC_DRAW)
        GL.glBindBuffer(GL.GL_ELEMENT_ARRAY_BUFFER, int(GL.glGenBuffers(1)))
        idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
        GL.glBufferData(GL.GL_ELEMENT_ARRAY_BUFFER, idx.nbytes, idx,
                        GL.GL_STATIC_DRAW)
        GL.glVertexAttribPointer(0, 2, GL.GL_FLOAT, GL.GL_FALSE, 0,
                                 ctypes.c_void_p(0))
        GL.glEnableVertexAttribArray(0)

    @classmethod
    def get(cls) -> "_Context":
        if cls._instance is None:
            cls._instance = _Context()
        return cls._instance


class Program:
    """Compiled reference shader pair with reflected uniforms.

    The '#version 100' line is prepended because WebGL implies GLSL ES 1.00
    for version-less sources; GL_ARB_ES2_compatibility then accepts the
    reference text unchanged. Keywords mirror addKeywords
    (script.js:431-438).
    """

    def __init__(self, vs_src: str, fs_src: str,
                 keywords: Optional[Sequence[str]] = None) -> None:
        GL = _Context.get().GL
        self.GL = GL
        defines = "".join(f"#define {k}\n" for k in (keywords or []))

        def compile_one(src: str, kind) -> int:
            sh = GL.glCreateShader(kind)
            GL.glShaderSource(sh, "#version 100\n" + defines + src)
            GL.glCompileShader(sh)
            if not GL.glGetShaderiv(sh, GL.GL_COMPILE_STATUS):
                raise RuntimeError(GL.glGetShaderInfoLog(sh).decode())
            return sh

        vs = compile_one(vs_src, GL.GL_VERTEX_SHADER)
        fs = compile_one(fs_src, GL.GL_FRAGMENT_SHADER)
        prog = GL.glCreateProgram()
        GL.glAttachShader(prog, vs)
        GL.glAttachShader(prog, fs)
        # WebGL hands aPosition slot 0 implicitly (sole attribute); desktop
        # GL needs it pinned before link for the shared quad VBO.
        GL.glBindAttribLocation(prog, 0, "aPosition")
        GL.glLinkProgram(prog)
        if not GL.glGetProgramiv(prog, GL.GL_LINK_STATUS):
            raise RuntimeError(GL.glGetProgramInfoLog(prog).decode())
        self.handle = prog
        self.uniforms: Dict[str, int] = {}
        n = int(GL.glGetProgramiv(prog, GL.GL_ACTIVE_UNIFORMS))
        for i in range(n):
            name, _size, _type = GL.glGetActiveUniform(prog, i)
            name = name.decode() if isinstance(name, bytes) else name
            self.uniforms[name] = GL.glGetUniformLocation(prog, name)

    def bind(self) -> None:
        self.GL.glUseProgram(self.handle)


class FBO:
    """createFBO (script.js:1045-1077): one half-float texture + framebuffer."""

    def __init__(self, w: int, h: int, internal_format, fmt,
                 filtering) -> None:
        GL = _Context.get().GL
        self.GL = GL
        self.width, self.height = int(w), int(h)
        self.texel_size_x, self.texel_size_y = 1.0 / w, 1.0 / h
        self.fmt = fmt
        GL.glActiveTexture(GL.GL_TEXTURE0)
        self.texture = int(GL.glGenTextures(1))
        GL.glBindTexture(GL.GL_TEXTURE_2D, self.texture)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_MIN_FILTER, filtering)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_MAG_FILTER, filtering)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_WRAP_S, GL.GL_CLAMP_TO_EDGE)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_WRAP_T, GL.GL_CLAMP_TO_EDGE)
        GL.glTexImage2D(GL.GL_TEXTURE_2D, 0, internal_format, w, h, 0, fmt,
                        GL.GL_HALF_FLOAT, None)
        self.fbo = int(GL.glGenFramebuffers(1))
        GL.glBindFramebuffer(GL.GL_FRAMEBUFFER, self.fbo)
        GL.glFramebufferTexture2D(GL.GL_FRAMEBUFFER, GL.GL_COLOR_ATTACHMENT0,
                                  GL.GL_TEXTURE_2D, self.texture, 0)
        if (GL.glCheckFramebufferStatus(GL.GL_FRAMEBUFFER)
                != GL.GL_FRAMEBUFFER_COMPLETE):
            raise RuntimeError(f"FBO incomplete at {w}x{h}")
        GL.glViewport(0, 0, w, h)
        GL.glClearColor(0.0, 0.0, 0.0, 0.0)
        GL.glClear(GL.GL_COLOR_BUFFER_BIT)

    def attach(self, unit: int) -> int:
        GL = self.GL
        GL.glActiveTexture(GL.GL_TEXTURE0 + unit)
        GL.glBindTexture(GL.GL_TEXTURE_2D, self.texture)
        return unit

    def upload(self, data_hwc: np.ndarray) -> None:
        """Replace texture contents; data is (H, W, C) float32, row 0 = v=0."""
        GL = self.GL
        channels = {GL.GL_RGBA: 4, GL.GL_RG: 2, GL.GL_RED: 1}[self.fmt]
        assert data_hwc.shape == (self.height, self.width, channels), \
            (data_hwc.shape, (self.height, self.width, channels))
        GL.glBindTexture(GL.GL_TEXTURE_2D, self.texture)
        GL.glTexSubImage2D(GL.GL_TEXTURE_2D, 0, 0, 0, self.width, self.height,
                           self.fmt, GL.GL_FLOAT,
                           np.ascontiguousarray(data_hwc, np.float32))

    def read(self) -> np.ndarray:
        """Read back as (H, W, 4) float32 (row 0 = v=0)."""
        GL = self.GL
        GL.glBindFramebuffer(GL.GL_FRAMEBUFFER, self.fbo)
        buf = GL.glReadPixels(0, 0, self.width, self.height, GL.GL_RGBA,
                              GL.GL_FLOAT)
        return np.frombuffer(buf, np.float32).reshape(
            self.height, self.width, 4).copy()


class DoubleFBO:
    """createDoubleFBO (script.js:1079-1106): read/write pair with swap()."""

    def __init__(self, w: int, h: int, internal_format, fmt, filtering) -> None:
        self.read = FBO(w, h, internal_format, fmt, filtering)
        self.write = FBO(w, h, internal_format, fmt, filtering)
        self.width, self.height = self.read.width, self.read.height
        self.texel_size_x = self.read.texel_size_x
        self.texel_size_y = self.read.texel_size_y

    def swap(self) -> None:
        self.read, self.write = self.write, self.read


# ---------------------------------------------------------------------------
# The reference app, headless


class GLReference:
    """The reference's sim + render pipeline, executing its real shaders.

    Drives the exact per-frame sequence of script.js with deterministic
    inputs: splat batches in tpufluid's (S, 8) row format
    (x, y, dx, dy, r, g, b, active — dx/dy already SPLAT_FORCE-scaled).
    """

    def __init__(self, config, dither: Optional[np.ndarray] = None) -> None:
        from tpufluid.config import FluidConfig  # noqa: F401 (type only)

        self.config = config
        ctx = _Context.get()
        GL = ctx.GL
        self.GL = GL
        src = extract_shader_sources()

        base_vs = src["baseVertexShader"]
        self.p_blur = Program(src["blurVertexShader"], src["blurShader"])
        self.p_copy = Program(base_vs, src["copyShader"])
        self.p_clear = Program(base_vs, src["clearShader"])
        self.p_color = Program(base_vs, src["colorShader"])
        self.p_checkerboard = Program(base_vs, src["checkerboardShader"])
        self.p_bloom_prefilter = Program(base_vs, src["bloomPrefilterShader"])
        self.p_bloom_blur = Program(base_vs, src["bloomBlurShader"])
        self.p_bloom_final = Program(base_vs, src["bloomFinalShader"])
        self.p_sunrays_mask = Program(base_vs, src["sunraysMaskShader"])
        self.p_sunrays = Program(base_vs, src["sunraysShader"])
        self.p_splat = Program(base_vs, src["splatShader"])
        self.p_advection = Program(base_vs, src["advectionShader"])  # linear filtering path
        self.p_divergence = Program(base_vs, src["divergenceShader"])
        self.p_curl = Program(base_vs, src["curlShader"])
        self.p_vorticity = Program(base_vs, src["vorticityShader"])
        self.p_pressure = Program(base_vs, src["pressureShader"])
        self.p_gradient = Program(base_vs, src["gradientSubtractShader"])
        # displayMaterial with updateKeywords (script.js:1160-1166)
        keywords = []
        if config.SHADING:
            keywords.append("SHADING")
        if config.BLOOM:
            keywords.append("BLOOM")
        if config.SUNRAYS:
            keywords.append("SUNRAYS")
        self.p_display = Program(base_vs, src["displayShaderSource"], keywords)

        # initFramebuffers (script.js:982-1010); sizes shared with tpufluid
        # through the same getResolution law (config.sim_size etc.).
        sw, sh = config.sim_size
        dw, dh = config.dye_size
        F = GL.GL_LINEAR  # llvmpipe supports half-float linear filtering
        self.dye = DoubleFBO(dw, dh, GL.GL_RGBA16F, GL.GL_RGBA, F)
        self.velocity = DoubleFBO(sw, sh, GL.GL_RG16F, GL.GL_RG, F)
        self.divergence = FBO(sw, sh, GL.GL_R16F, GL.GL_RED, GL.GL_NEAREST)
        self.curl = FBO(sw, sh, GL.GL_R16F, GL.GL_RED, GL.GL_NEAREST)
        self.pressure = DoubleFBO(sw, sh, GL.GL_R16F, GL.GL_RED, GL.GL_NEAREST)
        bw, bh = config.bloom_size
        self.bloom = FBO(bw, bh, GL.GL_RGBA16F, GL.GL_RGBA, F)
        self.bloom_mips = [FBO(w, h, GL.GL_RGBA16F, GL.GL_RGBA, F)
                           for (w, h) in config.bloom_mip_sizes()]
        uw, uh = config.sunrays_size
        self.sunrays = FBO(uw, uh, GL.GL_R16F, GL.GL_RED, F)
        self.sunrays_temp = FBO(uw, uh, GL.GL_R16F, GL.GL_RED, F)
        # Offscreen "screen": the canvas-sized render target
        # (captureScreenshot renders the same pipeline offscreen,
        # script.js:287-299).
        self.screen = FBO(config.CANVAS_WIDTH, config.CANVAS_HEIGHT,
                          GL.GL_RGBA16F, GL.GL_RGBA, GL.GL_NEAREST)

        # Dither texture (createTextureAsync + LDR_LLL1_0.png): REPEAT +
        # LINEAR (script.js:1128-1158). Defaults to tpufluid's generated
        # blue noise so both sides of a comparison see identical noise.
        if dither is None:
            from tpufluid.utils.bluenoise import blue_noise_64
            dither = np.asarray(blue_noise_64(), np.float32)
        if dither.ndim == 2:
            dither = np.repeat(dither[:, :, None], 3, axis=2)
        self.dither_h, self.dither_w = dither.shape[:2]
        self.dither_tex = int(GL.glGenTextures(1))
        GL.glActiveTexture(GL.GL_TEXTURE0)
        GL.glBindTexture(GL.GL_TEXTURE_2D, self.dither_tex)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_MIN_FILTER, GL.GL_LINEAR)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_MAG_FILTER, GL.GL_LINEAR)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_WRAP_S, GL.GL_REPEAT)
        GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_WRAP_T, GL.GL_REPEAT)
        # The reference PNG decodes to unorm8 RGB; llvmpipe samples it as
        # float in [0,1] — upload the float noise into an RGB8 texture for
        # the same quantization.
        GL.glTexImage2D(GL.GL_TEXTURE_2D, 0, GL.GL_RGB8, self.dither_w,
                        self.dither_h, 0, GL.GL_RGB, GL.GL_FLOAT,
                        np.ascontiguousarray(dither, np.float32))

    # -- dispatch -----------------------------------------------------------

    def blit(self, target: Optional[FBO], clear: bool = False) -> None:
        GL = self.GL
        t = target if target is not None else self.screen
        GL.glViewport(0, 0, t.width, t.height)
        GL.glBindFramebuffer(GL.GL_FRAMEBUFFER, t.fbo)
        if clear:
            GL.glClearColor(0.0, 0.0, 0.0, 1.0)
            GL.glClear(GL.GL_COLOR_BUFFER_BIT)
        GL.glDrawElements(GL.GL_TRIANGLES, 6, GL.GL_UNSIGNED_SHORT,
                          ctypes.c_void_p(0))

    # -- splats (script.js:1441-1462) ---------------------------------------

    def splat(self, x: float, y: float, dx: float, dy: float,
              color: Tuple[float, float, float]) -> None:
        GL = self.GL
        cfg = self.config
        self.p_splat.bind()
        u = self.p_splat.uniforms
        GL.glUniform1i(u["uTarget"], self.velocity.read.attach(0))
        GL.glUniform1f(u["aspectRatio"], cfg.aspect_ratio)
        GL.glUniform2f(u["point"], x, y)
        GL.glUniform3f(u["color"], dx, dy, 0.0)
        GL.glUniform1f(u["radius"], cfg.splat_radius_uv())
        self.blit(self.velocity.write)
        self.velocity.swap()

        GL.glUniform1i(u["uTarget"], self.dye.read.attach(0))
        GL.glUniform3f(u["color"], color[0], color[1], color[2])
        self.blit(self.dye.write)
        self.dye.swap()

    def apply_splat_batch(self, splats: np.ndarray) -> None:
        """(S, 8) rows of (x, y, dx, dy, r, g, b, active)."""
        for row in np.asarray(splats, np.float32):
            if row[7] > 0:
                self.splat(row[0], row[1], row[2], row[3],
                           (row[4], row[5], row[6]))

    # -- simulation step (script.js:1231-1294) ------------------------------
    # Split into one method per pass so the parity tool (tools/gl_parity.py)
    # can compare each reference shader against its tpufluid op in isolation.

    def run_curl(self) -> None:
        GL, vel = self.GL, self.velocity
        self.p_curl.bind()
        u = self.p_curl.uniforms
        GL.glUniform2f(u["texelSize"], vel.texel_size_x, vel.texel_size_y)
        GL.glUniform1i(u["uVelocity"], vel.read.attach(0))
        self.blit(self.curl)

    def run_vorticity(self, dt: float) -> None:
        GL, vel = self.GL, self.velocity
        self.p_vorticity.bind()
        u = self.p_vorticity.uniforms
        GL.glUniform2f(u["texelSize"], vel.texel_size_x, vel.texel_size_y)
        GL.glUniform1i(u["uVelocity"], vel.read.attach(0))
        GL.glUniform1i(u["uCurl"], self.curl.attach(1))
        GL.glUniform1f(u["curl"], self.config.CURL)
        GL.glUniform1f(u["dt"], dt)
        self.blit(vel.write)
        vel.swap()

    def run_divergence(self) -> None:
        GL, vel = self.GL, self.velocity
        self.p_divergence.bind()
        u = self.p_divergence.uniforms
        GL.glUniform2f(u["texelSize"], vel.texel_size_x, vel.texel_size_y)
        GL.glUniform1i(u["uVelocity"], vel.read.attach(0))
        self.blit(self.divergence)

    def run_clear(self) -> None:
        GL = self.GL
        self.p_clear.bind()
        u = self.p_clear.uniforms
        GL.glUniform1i(u["uTexture"], self.pressure.read.attach(0))
        GL.glUniform1f(u["value"], self.config.PRESSURE)
        self.blit(self.pressure.write)
        self.pressure.swap()

    def run_jacobi(self, iterations: int) -> None:
        GL, vel = self.GL, self.velocity
        self.p_pressure.bind()
        u = self.p_pressure.uniforms
        GL.glUniform2f(u["texelSize"], vel.texel_size_x, vel.texel_size_y)
        GL.glUniform1i(u["uDivergence"], self.divergence.attach(0))
        for _ in range(iterations):
            GL.glUniform1i(u["uPressure"], self.pressure.read.attach(1))
            self.blit(self.pressure.write)
            self.pressure.swap()

    def run_gradient_subtract(self) -> None:
        GL, vel = self.GL, self.velocity
        self.p_gradient.bind()
        u = self.p_gradient.uniforms
        GL.glUniform2f(u["texelSize"], vel.texel_size_x, vel.texel_size_y)
        GL.glUniform1i(u["uPressure"], self.pressure.read.attach(0))
        GL.glUniform1i(u["uVelocity"], vel.read.attach(1))
        self.blit(vel.write)
        vel.swap()

    def run_advect_velocity(self, dt: float) -> None:
        GL, vel = self.GL, self.velocity
        self.p_advection.bind()
        u = self.p_advection.uniforms
        GL.glUniform2f(u["texelSize"], vel.texel_size_x, vel.texel_size_y)
        vel_id = vel.read.attach(0)
        GL.glUniform1i(u["uVelocity"], vel_id)
        GL.glUniform1i(u["uSource"], vel_id)
        GL.glUniform1f(u["dt"], dt)
        GL.glUniform1f(u["dissipation"], self.config.VELOCITY_DISSIPATION)
        self.blit(vel.write)
        vel.swap()

    def run_advect_dye(self, dt: float) -> None:
        # NB the dye pass keeps texelSize = VELOCITY texel size (the
        # reference sets it once for both advections: velocity is stored in
        # sim-grid texels/second, script.js:1276-1293).
        GL, vel = self.GL, self.velocity
        self.p_advection.bind()
        u = self.p_advection.uniforms
        GL.glUniform2f(u["texelSize"], vel.texel_size_x, vel.texel_size_y)
        GL.glUniform1i(u["uVelocity"], vel.read.attach(0))
        GL.glUniform1i(u["uSource"], self.dye.read.attach(1))
        GL.glUniform1f(u["dt"], dt)
        GL.glUniform1f(u["dissipation"], self.config.DENSITY_DISSIPATION)
        self.blit(self.dye.write)
        self.dye.swap()

    def step(self, dt: float) -> None:
        GL = self.GL
        dt = min(float(dt), 0.016666)  # calcDeltaTime clamp, literal (1191)
        GL.glDisable(GL.GL_BLEND)
        self.run_curl()
        self.run_vorticity(dt)
        self.run_divergence()
        self.run_clear()
        self.run_jacobi(self.config.PRESSURE_ITERATIONS)
        self.run_gradient_subtract()
        self.run_advect_velocity(dt)
        self.run_advect_dye(dt)

    # -- render pipeline (script.js:1296-1419) ------------------------------

    def apply_bloom(self, source: FBO, destination: FBO) -> None:
        GL = self.GL
        cfg = self.config
        if len(self.bloom_mips) < 2:
            return
        last: FBO = destination
        GL.glDisable(GL.GL_BLEND)
        self.p_bloom_prefilter.bind()
        u = self.p_bloom_prefilter.uniforms
        knee = cfg.BLOOM_THRESHOLD * cfg.BLOOM_SOFT_KNEE + 1e-4
        GL.glUniform3f(u["curve"], cfg.BLOOM_THRESHOLD - knee, knee * 2.0,
                       0.25 / knee)
        GL.glUniform1f(u["threshold"], cfg.BLOOM_THRESHOLD)
        GL.glUniform1i(u["uTexture"], source.attach(0))
        self.blit(last)

        self.p_bloom_blur.bind()
        u = self.p_bloom_blur.uniforms
        for dest in self.bloom_mips:
            GL.glUniform2f(u["texelSize"], last.texel_size_x, last.texel_size_y)
            GL.glUniform1i(u["uTexture"], last.attach(0))
            self.blit(dest)
            last = dest

        GL.glBlendFunc(GL.GL_ONE, GL.GL_ONE)
        GL.glEnable(GL.GL_BLEND)
        for i in range(len(self.bloom_mips) - 2, -1, -1):
            base_tex = self.bloom_mips[i]
            GL.glUniform2f(u["texelSize"], last.texel_size_x, last.texel_size_y)
            GL.glUniform1i(u["uTexture"], last.attach(0))
            self.blit(base_tex)
            last = base_tex

        GL.glDisable(GL.GL_BLEND)
        self.p_bloom_final.bind()
        u = self.p_bloom_final.uniforms
        GL.glUniform2f(u["texelSize"], last.texel_size_x, last.texel_size_y)
        GL.glUniform1i(u["uTexture"], last.attach(0))
        GL.glUniform1f(u["intensity"], cfg.BLOOM_INTENSITY)
        self.blit(destination)

    def apply_sunrays(self, source: FBO, mask: FBO, destination: FBO) -> None:
        GL = self.GL
        GL.glDisable(GL.GL_BLEND)
        self.p_sunrays_mask.bind()
        GL.glUniform1i(self.p_sunrays_mask.uniforms["uTexture"],
                       source.attach(0))
        self.blit(mask)

        self.p_sunrays.bind()
        u = self.p_sunrays.uniforms
        GL.glUniform1f(u["weight"], self.config.SUNRAYS_WEIGHT)
        GL.glUniform1i(u["uTexture"], mask.attach(0))
        self.blit(destination)

    def blur(self, target: FBO, temp: FBO, iterations: int) -> None:
        GL = self.GL
        self.p_blur.bind()
        u = self.p_blur.uniforms
        for _ in range(iterations):
            GL.glUniform2f(u["texelSize"], target.texel_size_x, 0.0)
            GL.glUniform1i(u["uTexture"], target.attach(0))
            self.blit(temp)
            GL.glUniform2f(u["texelSize"], 0.0, target.texel_size_y)
            GL.glUniform1i(u["uTexture"], temp.attach(0))
            self.blit(target)

    def render(self, to_screen: bool = True) -> np.ndarray:
        """Full render (script.js:1296-1317) into the canvas-size target.

        Returns (H, W, 4) float32, row 0 = v=0 (flip for image files).
        ``to_screen`` is the reference's target==null: the transparent
        screen mode draws the checkerboard backdrop and blends; the
        transparent offscreen capture disables blending and emits raw
        premultiplied RGBA (script.js:1304-1315).
        """
        GL = self.GL
        cfg = self.config
        if cfg.BLOOM:
            self.apply_bloom(self.dye.read, self.bloom)
        if cfg.SUNRAYS:
            # the reference uses dye.write as mask scratch (script.js:1300)
            self.apply_sunrays(self.dye.read, self.dye.write, self.sunrays)
            self.blur(self.sunrays, self.sunrays_temp, 1)

        if to_screen or not cfg.TRANSPARENT:
            GL.glBlendFunc(GL.GL_ONE, GL.GL_ONE_MINUS_SRC_ALPHA)
            GL.glEnable(GL.GL_BLEND)
        else:
            GL.glDisable(GL.GL_BLEND)

        if not cfg.TRANSPARENT:
            # drawColor(normalizeColor(BACK_COLOR)) (script.js:1312-1323)
            self.p_color.bind()
            r, g, b = (c / 255.0 for c in cfg.BACK_COLOR)
            GL.glUniform4f(self.p_color.uniforms["color"], r, g, b, 1.0)
            self.blit(self.screen)
        if to_screen and cfg.TRANSPARENT:
            # drawCheckerboard (script.js:1314-1315, 1325-1329)
            self.p_checkerboard.bind()
            GL.glUniform1f(self.p_checkerboard.uniforms["aspectRatio"],
                           cfg.aspect_ratio)
            self.blit(self.screen)

        # drawDisplay (script.js:1331-1348)
        self.p_display.bind()
        u = self.p_display.uniforms
        if cfg.SHADING:
            GL.glUniform2f(u["texelSize"], 1.0 / self.screen.width,
                           1.0 / self.screen.height)
        GL.glUniform1i(u["uTexture"], self.dye.read.attach(0))
        if cfg.BLOOM:
            GL.glUniform1i(u["uBloom"], self.bloom.attach(1))
            GL.glUniform1i(u["uDithering"], 2)
            GL.glActiveTexture(GL.GL_TEXTURE2)
            GL.glBindTexture(GL.GL_TEXTURE_2D, self.dither_tex)
            GL.glUniform2f(u["ditherScale"],
                           self.screen.width / self.dither_w,
                           self.screen.height / self.dither_h)
        if cfg.SUNRAYS:
            GL.glUniform1i(u["uSunrays"], self.sunrays.attach(3))
        self.blit(self.screen)
        GL.glDisable(GL.GL_BLEND)
        return self.screen.read()

    # -- state IO for cross-checks ------------------------------------------

    def read_state(self) -> Dict[str, np.ndarray]:
        """Fields in tpufluid's (C, H, W) layout, float32."""
        v = self.velocity.read.read()[:, :, :2]
        d = self.dye.read.read()[:, :, :3]
        p = self.pressure.read.read()[:, :, 0]
        return {
            "velocity": np.moveaxis(v, -1, 0),
            "dye": np.moveaxis(d, -1, 0),
            "pressure": p,
        }

    def load_state(self, velocity: np.ndarray, dye: np.ndarray,
                   pressure: np.ndarray) -> None:
        """Upload (2,H,W) / (3,Hd,Wd) / (H,W) fields (quantized to half)."""
        self.velocity.read.upload(
            np.moveaxis(np.asarray(velocity, np.float32), 0, -1))
        d = np.moveaxis(np.asarray(dye, np.float32), 0, -1)
        alpha = np.zeros(d.shape[:2] + (1,), np.float32)
        self.dye.read.upload(np.concatenate([d, alpha], axis=-1))
        self.pressure.read.upload(
            np.asarray(pressure, np.float32)[:, :, None])


def main() -> None:
    import argparse
    import json

    from tpufluid.config import FluidConfig

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--sim-res", type=int, default=128)
    ap.add_argument("--dye-res", type=int, default=512)
    ap.add_argument("--canvas", default="512x512")
    ap.add_argument("--out", default="out/glref")
    args = ap.parse_args()

    w, h = (int(t) for t in args.canvas.split("x"))
    cfg = FluidConfig(SIM_RESOLUTION=args.sim_res, DYE_RESOLUTION=args.dye_res,
                      CANVAS_WIDTH=w, CANVAS_HEIGHT=h).validate()
    ref = GLReference(cfg)
    rng = np.random.default_rng(7)
    os.makedirs(args.out, exist_ok=True)
    for t in range(args.steps):
        if t % 24 == 0:
            x, y = rng.uniform(0.2, 0.8, 2)
            dx, dy = rng.uniform(-500, 500, 2)
            color = rng.uniform(0.05, 0.25, 3)
            ref.splat(float(x), float(y), float(dx), float(dy), tuple(color))
        ref.step(1.0 / 60.0)
    frame = ref.render()
    state = ref.read_state()
    stats = {
        "steps": args.steps,
        "max_speed": float(np.abs(state["velocity"]).max()),
        "dye_max": float(state["dye"].max()),
        "frame_mean": float(frame[:, :, :3].mean()),
        "nonfinite": int((~np.isfinite(state["velocity"])).sum()
                         + (~np.isfinite(state["dye"])).sum()),
    }
    from PIL import Image
    img = np.clip(frame[::-1, :, :3], 0.0, 1.0)
    Image.fromarray((img * 255).astype(np.uint8)).save(
        os.path.join(args.out, "gl_frame.png"))
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
