"""Wavefront path-tracing engine with lane refill (persistent threads).

The reference's megakernel keeps one SIMT thread per pixel alive through
all `spp` samples and up to 10 bounces (rt.h:85-159); on a lockstep
vector machine the masked-depth-loop port of that wastes throughput —
after a few bounces most lanes are dead but still march. This engine is
the TPU-native wavefront scheduler (SURVEY.md §2.5/§7): a fixed pool of
N lanes; every iteration each lane advances its path by ONE bounce;
finished lanes immediately *refill* with the next (pixel, spp) sample
from a global work counter, and their radiance scatter-adds into the
film. Occupancy stays ~100% until the tail.

The CMJ sampler is counter-based, so a refilled lane reproduces exactly
the stream the megakernel would have used for that sample — estimates are
identical in distribution to the masked loop.

This engine implements the `pathtrace` estimator (BSDF sampling only);
NEE/MIS wavefront variants hang their extra shadow/BSDF rays off the same
bounce step.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from henjou_tpu.integrator.pathtrace import MAX_DEPTH
from henjou_tpu.integrator.payload import Sky, closest_hit
from henjou_tpu.math.constants import EPS_RAY, TMAX_RAY
from henjou_tpu.math.vec import dot, local_to_world, orthonormal_basis, world_to_local
from henjou_tpu.runtime.camera import Camera, camera_rays
from henjou_tpu.sampling.cmj import CMJState, cmj_1d, make_cmj_state
from henjou_tpu.scene.scenedata import FrameScene


class WavefrontFilm(NamedTuple):
    color: jnp.ndarray  # [P,3]
    albedo: jnp.ndarray  # [P,3]
    normal: jnp.ndarray  # [P,3]


def wavefront_pathtrace(
    frame: FrameScene,
    sky: Sky,
    cam: Camera,
    width: int,
    height: int,
    spp: int,
    bsdf_sample: Callable,
    seed=0,
    lanes: int = 1 << 16,
    max_depth: int = MAX_DEPTH,
    intersect_fn=None,
    max_iters: Optional[int] = None,
    spp_offset=0,
) -> WavefrontFilm:
    """Render width*height pixels at `spp` samples with a `lanes`-wide
    pool. Returns per-pixel SUMS (divide by spp outside). Jittable; all
    shapes static."""
    n_pixels = width * height
    total_samples = n_pixels * spp
    if max_iters is None:
        # enough bounces to drain everything even if all paths run full depth
        max_iters = (total_samples // lanes + 2) * max_depth + max_depth

    film = WavefrontFilm(
        color=jnp.zeros((n_pixels, 3), jnp.float32),
        albedo=jnp.zeros((n_pixels, 3), jnp.float32),
        normal=jnp.zeros((n_pixels, 3), jnp.float32),
    )

    lane_ids = jnp.arange(lanes, dtype=jnp.uint32)

    def spawn(sample_ids):
        """sample_id -> fresh path state. Pixel-major assignment:
        sample s -> (pixel = s % P, spp_idx = s // P)."""
        pix = (sample_ids % n_pixels).astype(jnp.uint32)
        spp_idx = (sample_ids // n_pixels).astype(jnp.uint32) + jnp.uint32(spp_offset)
        st = make_cmj_state(spp_idx, pix, seed)
        o, d, st = camera_rays(cam, width, height, pix, st)
        return pix, o, d, st

    init_samples = lane_ids
    pix0, o0, d0, st0 = spawn(init_samples)

    def sel(mask, a, b):
        return jnp.where(mask[..., None] if a.ndim == 2 else mask, a, b)

    class Carry(NamedTuple):
        film: WavefrontFilm
        counter: jnp.ndarray  # next unassigned sample id (scalar u32->i64 safe)
        pix: jnp.ndarray
        o: jnp.ndarray
        d: jnp.ndarray
        st: CMJState
        thr: jnp.ndarray
        lte: jnp.ndarray
        depth: jnp.ndarray
        valid: jnp.ndarray  # lane holds a real sample
        it: jnp.ndarray

    carry0 = Carry(
        film=film,
        counter=jnp.asarray(lanes, jnp.int32),
        pix=pix0,
        o=o0,
        d=d0,
        st=st0,
        thr=jnp.ones((lanes, 3), jnp.float32) + (o0 + d0)[:, :1] * 0.0,
        lte=(o0 + d0) * 0.0,
        depth=jnp.zeros((lanes,), jnp.int32) + (o0[:, 0] * 0).astype(jnp.int32),
        # a pool wider than the total work starts partially idle
        valid=(lane_ids < total_samples) & ((o0[:, 0] * 0) == 0),
        it=jnp.zeros((), jnp.int32),
    )

    def cond(c: Carry):
        work_left = (c.counter < total_samples) | jnp.any(c.valid)
        return work_left & (c.it < max_iters)

    def body(c: Carry) -> Carry:
        # ---- one bounce for every valid lane (Pathtrace semantics) ----
        u_rr, st = cmj_1d(c.st)
        russian_p = jnp.max(c.thr, axis=-1)
        survive = russian_p >= u_rr
        thr = c.thr / jnp.maximum(russian_p, 1e-12)[:, None]

        hit = closest_hit(frame, sky, c.o, c.d, EPS_RAY, TMAX_RAY, intersect_fn)

        first = c.depth == 0
        terminal = (~hit.is_hit) | hit.is_light
        lte = c.lte + jnp.where(
            (c.valid & survive & terminal)[:, None], thr * hit.emission, 0.0
        )

        n = hit.normal
        t, b = orthonormal_basis(n)
        local_wo = world_to_local(-c.d, t, n, b)
        bsdf, local_wi, pdf, st = bsdf_sample(hit, local_wo, st)
        wi = local_to_world(local_wi, t, n, b)
        weight = bsdf * (jnp.abs(dot(wi, n)) / jnp.maximum(pdf, 1e-12))[:, None]

        depth = c.depth + 1
        done = c.valid & (
            ~survive | terminal | (depth >= max_depth)
        )
        continuing = c.valid & ~done

        new_thr = jnp.where(continuing[:, None], thr * weight, thr)
        new_o = jnp.where(continuing[:, None], hit.position, c.o)
        new_d = jnp.where(continuing[:, None], wi, c.d)

        # ---- film accumulation for finished lanes + first-hit AOVs ----
        fcolor = c.film.color.at[c.pix].add(
            jnp.where(done[:, None], lte, 0.0), mode="drop"
        )
        aov_gate = (c.valid & first)[:, None]
        falbedo = c.film.albedo.at[c.pix].add(
            jnp.where(aov_gate, hit.basecolor, 0.0), mode="drop"
        )
        fnormal = c.film.normal.at[c.pix].add(
            jnp.where(aov_gate, hit.normal, 0.0), mode="drop"
        )

        # ---- refill finished lanes with fresh samples ----
        rank = jnp.cumsum(done.astype(jnp.int32)) - 1
        new_sample = c.counter + rank
        can_spawn = done & (new_sample < total_samples)
        spawn_ids = jnp.where(can_spawn, new_sample, 0).astype(jnp.uint32)
        s_pix, s_o, s_d, s_st = spawn(spawn_ids)

        pix = jnp.where(can_spawn, s_pix, c.pix)
        o = jnp.where(can_spawn[:, None], s_o, new_o)
        d = jnp.where(can_spawn[:, None], s_d, new_d)
        st2 = CMJState(
            n_spp=jnp.where(can_spawn, s_st.n_spp, st.n_spp),
            scramble=jnp.where(can_spawn, s_st.scramble, st.scramble),
            depth=jnp.where(can_spawn, s_st.depth, st.depth),
            image_idx=jnp.where(can_spawn, s_st.image_idx, st.image_idx),
        )
        thr2 = jnp.where(can_spawn[:, None], jnp.ones_like(new_thr), new_thr)
        lte2 = jnp.where(done[:, None], 0.0, lte)
        depth2 = jnp.where(can_spawn, 0, jnp.where(done, 0, depth))
        valid2 = jnp.where(done, can_spawn, c.valid)
        counter2 = c.counter + jnp.sum(done.astype(jnp.int32))
        counter2 = jnp.minimum(counter2, total_samples)

        return Carry(
            film=WavefrontFilm(color=fcolor, albedo=falbedo, normal=fnormal),
            counter=counter2,
            pix=pix,
            o=o,
            d=d,
            st=st2,
            thr=thr2,
            lte=lte2,
            depth=depth2,
            valid=valid2,
            it=c.it + 1,
        )

    out = jax.lax.while_loop(cond, body, carry0)
    return out.film
