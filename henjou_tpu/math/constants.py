"""Math constants (reference: include/common/constant.h)."""

import numpy as np

PI = float(np.pi)
PI2 = 2.0 * PI
INV_PI = 1.0 / PI
HALF_PI = 0.5 * PI

# Ray epsilon used by every trace call in the reference integrators
# (reference: include/kernel/rt.h:75-76, 0.001f tmin / 1e16f tmax).
# The reference's 0.001 is ABSOLUTE, which self-shadows mm-scale scenes
# and light-leaks km-scale ones; the integrators therefore use the
# scene-relative `ray_eps` below, calibrated to reproduce 1e-3 at the
# reference's own ~10-unit test scenes (cornelbox spans ~10 units).
EPS_RAY = 1e-3
EPS_RAY_REL = 1e-4  # of the scene AABB diagonal
TMAX_RAY = 1e16


def ray_eps(frame):
    """Scene-relative primary-ray tmin: EPS_RAY_REL x the scene AABB
    diagonal (floor 1e-30 for degenerate scenes). The reduction over
    tri_verts is loop-invariant, so XLA hoists it out of bounce loops."""
    import jax.numpy as jnp

    v = frame.tri_verts.reshape(-1, 3)
    diag = jnp.linalg.norm(jnp.max(v, axis=0) - jnp.min(v, axis=0))
    return jnp.maximum(diag * EPS_RAY_REL, 1e-30)

# Shadow-ray tmax shortening, RELATIVE to the light distance. The
# reference subtracts an absolute 0.001 from tmax (rt.h:356-363), which
# breaks for mm- or km-scale scenes; a relative backoff is scale-free and
# matches the reference at its unit-scale test scenes.
SHADOW_EPS_REL = 1e-3
