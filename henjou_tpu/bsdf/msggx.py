"""Multiple-scattering GGX via a microsurface random walk (Heitz 2016).

Rebuild of the reference EnagyConservationGGX (BSDFs.h:483-852): a
volumetric walk on the microsurface with a uniform height distribution —
conditional height sampling (sampleHeight, BSDFs.h:566-586), VNDF phase
function with Schlick weight (samplePhaseFunction, BSDFs.h:737-746), walk
capped at 5 scattering orders (BSDFs.h:805,842), pdf approximated by
|wi.y| (BSDFs.h:843-851). The facade routes metals (metallic > 0.5) here
(BSDFs.h:1003,1025).

TPU reshaping (SURVEY.md §7 hard part #3): the divergent while-loop
becomes a fixed 6-iteration masked `lax.fori_loop`. Each lane's CMJ state
only advances while that lane is still walking, so the per-lane random
stream is bit-identical to the reference's data-dependent consumption.

Deviation: the reference returns the literal color (0,0,1) when the walk
NaNs (BSDFs.h:813-814) — an energy-injecting quirk; we return 0 instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from henjou_tpu.bsdf.microfacet import sample_visible_normal
from henjou_tpu.math.vec import dot, schlick_fresnel
from henjou_tpu.sampling.cmj import CMJState, cmj_1d, cmj_2d

MAX_SCATTERING_ORDER = 5  # reference: BSDFs.h:842
_INF = jnp.float32(3.4e38)  # FLT_MAX stand-in ("left the microsurface")


def msggx_alpha(roughness):
    """clamp(roughness^2, 1e-4, 1) (BSDFs.h:827-830)."""
    return jnp.clip(roughness * roughness, 1e-4, 1.0)


def _c1(h):
    """Uniform height CDF (BSDFs.h:494-500)."""
    return jnp.clip(0.5 * (h + 1.0), 0.0, 1.0)


def _inv_c1(u):
    """BSDFs.h:502-505."""
    return jnp.clip(2.0 * u - 1.0, -1.0, 1.0)


def _lambda_signed(v, alpha):
    """Signed Smith Lambda (BSDFs.h:525-532): +branch above, -1-ish below,
    clamped at grazing |v.y| ~ 1."""
    y = v[..., 1]
    y2 = jnp.maximum(y * y, 1e-12)
    delta = 1.0 + alpha * alpha * (v[..., 0] ** 2 + v[..., 2] ** 2) / y2
    sign = jnp.where(y > 0.0, 1.0, -1.0)
    lam = (-1.0 + sign * jnp.sqrt(delta)) * 0.5
    lam = jnp.where(y > 0.9999, 0.0, lam)
    lam = jnp.where(y < -0.9999, -1.0, lam)
    return lam


def _g1_height(w, h0, alpha):
    """Directional visibility from height h0 (BSDFs.h:551-563)."""
    c1 = _c1(h0)
    lam = _lambda_signed(w, alpha)
    val = jnp.power(jnp.maximum(c1, 1e-20), lam)
    val = jnp.where(w[..., 1] > 0.9999, 1.0, val)
    val = jnp.where(w[..., 1] <= 0.0, 0.0, val)
    return val


def _sample_height(wr, hr, u, alpha):
    """Conditional height sampling (BSDFs.h:566-586). Returns the next
    height, or _INF when the ray leaves the microsurface."""
    y = wr[..., 1]
    lam = _lambda_signed(wr, alpha)

    # generic branch: leave with prob G1, else climb
    g1 = _g1_height(wr, hr, alpha)
    leave = u > (1.0 - g1)
    pow_term = jnp.power(
        jnp.maximum(1.0 - u, 1e-20), 1.0 / jnp.where(jnp.abs(lam) > 1e-12, lam, 1e-12)
    )
    h_generic = _inv_c1(_c1(hr) / jnp.maximum(pow_term, 1e-20))
    h = jnp.where(leave, _INF, h_generic)

    # special cases, outermost last so they take priority
    h = jnp.where(jnp.abs(y) < 1e-4, hr, h)  # horizontal ray
    h = jnp.where(y < -0.9999, _inv_c1(u * _c1(hr)), h)  # straight down
    h = jnp.where(y > 0.9999, _INF, h)  # straight up: leaves
    return h


def msggx_sample(F0, roughness, wo, state: CMJState):
    """Importance sampling (sample + sampleBSDF, BSDFs.h:784-851).
    Returns (bsdf[R,3], wi[R,3], pdf[R], state). The returned value is the
    walk's Fresnel throughput (weight); pdf = |wi.y| so weight/pdf * cos
    telescopes to `weight` in the integrator — matching the reference's
    estimator exactly."""
    alpha = msggx_alpha(roughness)
    r = wo.shape[0]

    wr = -wo
    # carry inits derived from wo so loop-carry varying types match under
    # shard_map (see accel/traverse.py note)
    vf = wo[..., 0] * 0.0
    # hr0 = 1 + invC1(0.999) = 1.998 (BSDFs.h:788)
    hr = 1.998 + vf
    weight = 1.0 + wo * 0.0
    walking = vf == 0.0  # all True
    exceeded = vf != 0.0  # all False

    def sel_state(mask, new: CMJState, old: CMJState) -> CMJState:
        return CMJState(
            n_spp=old.n_spp,
            scramble=old.scramble,
            depth=jnp.where(mask, new.depth, old.depth),
            image_idx=old.image_idx,
        )

    def body(_, carry):
        wr, hr, weight, walking, exceeded, order, st = carry

        u, st_u = cmj_1d(st)
        st = sel_state(walking, st_u, st)

        h_new = _sample_height(wr, hr, u, alpha)
        leaves = walking & (h_new >= _INF)
        continues = walking & ~leaves

        order = jnp.where(continues, order + 1, order)
        now_exceeded = continues & (order > MAX_SCATTERING_ORDER)
        exceeded = exceeded | now_exceeded
        continues = continues & ~now_exceeded

        # phase-function bounce for lanes still inside the surface
        uv, st_p = cmj_2d(st)
        st = sel_state(continues, st_p, st)
        v = -wr
        wm = sample_visible_normal(uv, v, alpha)
        w_out = -v + 2.0 * wm * dot(v, wm)[..., None]
        w1 = schlick_fresnel(F0, v, wm)

        nan_lane = continues & (
            jnp.isnan(h_new) | jnp.isnan(w_out[..., 2])
        )  # BSDFs.h:813 guard (we zero instead of returning blue)
        exceeded = exceeded | nan_lane
        continues = continues & ~nan_lane

        wr = jnp.where(continues[..., None], w_out, wr)
        weight = jnp.where(continues[..., None], weight * w1, weight)
        hr = jnp.where(continues, h_new, hr)
        walking = continues
        return (wr, hr, weight, walking, exceeded, order, st)

    init = (wr, hr, weight, walking, exceeded, vf.astype(jnp.int32), state)
    wr, hr, weight, walking, exceeded, order, state = jax.lax.fori_loop(
        0, MAX_SCATTERING_ORDER + 1, body, init
    )

    wi = wr  # escape direction
    bad = exceeded | walking | (wi[..., 1] < 0.0)
    # exceeded lanes: reference sets wo=(0,0,1), returns 0, pdf untouched (1)
    wi = jnp.where(exceeded[..., None], jnp.asarray([0.0, 0.0, 1.0]), wi)
    bsdf = jnp.where(bad[..., None], 0.0, weight)
    pdf = jnp.where(bad, 1.0, jnp.maximum(jnp.abs(wi[..., 1]), 1e-12))
    return bsdf, wi, pdf, state
