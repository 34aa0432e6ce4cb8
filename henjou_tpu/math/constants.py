"""Math constants (reference: include/common/constant.h)."""

import numpy as np

PI = float(np.pi)
PI2 = 2.0 * PI
INV_PI = 1.0 / PI
HALF_PI = 0.5 * PI

# Ray epsilon used by every trace call in the reference integrators
# (reference: include/kernel/rt.h:75-76, 0.001f tmin / 1e16f tmax).
EPS_RAY = 1e-3
TMAX_RAY = 1e16

# Shadow-ray tmax shortening, RELATIVE to the light distance. The
# reference subtracts an absolute 0.001 from tmax (rt.h:356-363), which
# breaks for mm- or km-scale scenes; a relative backoff is scale-free and
# matches the reference at its unit-scale test scenes.
SHADOW_EPS_REL = 1e-3
