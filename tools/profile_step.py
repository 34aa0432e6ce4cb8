"""Component-level timing on the real TPU: where does the MIS spp-step go?

Measures, each jitted + warmed:
  1. intersector raw throughput (coherent camera rays / incoherent random)
  2. occlusion (any-hit) raw throughput
  3. full MIS step (the bench step)
  4. MIS step with a FAKE constant-time intersector -> shading-side cost
  5. payload fill (closest_hit minus the intersector)
  6. bsdf_sample / msggx / disney in isolation
  7. sort+gather+scatter cost of a would-be per-bounce ray binning pass

Run on the TPU (default platform); ~10 min, compile-dominated.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LANES = 1 << 18  # bench shape (512x512)


def timeit(name, fn, *args, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:48s} {dt*1e3:10.2f} ms", flush=True)
    return dt


def main():
    from henjou_tpu.accel.pallas_cluster_hbm import (
        make_pallas_hbm_intersector,
        pack_clusters_hbm_np,
    )
    from henjou_tpu.bsdf.dispatch import make_bsdf_sampler
    from henjou_tpu.bsdf.disney import disney_params, disney_sample
    from henjou_tpu.bsdf.msggx import msggx_sample
    from henjou_tpu.integrator.mis import mis
    from henjou_tpu.integrator.payload import Sky, closest_hit
    from henjou_tpu.runtime.camera import camera_rays, make_camera
    from henjou_tpu.runtime.renderer import _swizzled_pixel_order
    from henjou_tpu.sampling.cmj import make_cmj_state
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import sphere_gallery_scene

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    dev = build_device_scene(sphere_gallery_scene())
    frame = jax.jit(build_frame_scene)(dev, None, None)
    pc = pack_clusters_hbm_np(np.asarray(frame.tri_verts))
    intersect_fn, occluded_fn = make_pallas_hbm_intersector(pc)
    print(f"tris={frame.tri_verts.shape[0]} clusters={pc.num_clusters} "
          f"super={pc.num_super}", flush=True)
    sky = Sky(constant_color=jnp.asarray([0.3, 0.4, 0.55]), intensity=jnp.asarray(1.0))
    cam = make_camera((0.0, 1.2, -9.0), (0.0, -0.05, 1.0), np.radians(45.0))
    width = height = 512

    pix = jnp.asarray(_swizzled_pixel_order(width, height))
    st0 = make_cmj_state(jnp.zeros((LANES,), jnp.uint32), pix, 7)
    o_cam, d_cam, _ = jax.jit(lambda s: camera_rays(cam, width, height, pix, s))(st0)
    o_cam = jax.block_until_ready(o_cam)

    rng = np.random.default_rng(0)
    o_rand = jnp.asarray(rng.uniform(-4, 4, (LANES, 3)).astype(np.float32))
    d_np = rng.normal(size=(LANES, 3)).astype(np.float32)
    d_rand = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))

    isect = jax.jit(lambda o, d: intersect_fn(None, o, d, 1e-3, 1e16)[0])
    occl = jax.jit(lambda o, d: occluded_fn(None, o, d, 1e-3, 1e16))
    dt = timeit("intersect coherent (camera)", isect, o_cam, d_cam)
    print(f"  -> {LANES/dt/1e6:.1f} Mrays/s", flush=True)
    dt = timeit("intersect incoherent (random)", isect, o_rand, d_rand)
    print(f"  -> {LANES/dt/1e6:.1f} Mrays/s", flush=True)
    dt = timeit("occluded incoherent", occl, o_rand, d_rand)
    print(f"  -> {LANES/dt/1e6:.1f} Mrays/s", flush=True)

    # payload fill: closest_hit with the real intersector, then the
    # difference vs raw intersect is the fill cost
    ch = jax.jit(
        lambda o, d: closest_hit(frame, sky, o, d, 1e-3, 1e16, intersect_fn).position
    )
    timeit("closest_hit (intersect + payload fill)", ch, o_rand, d_rand)

    bsdf_sample = make_bsdf_sampler(None)

    # full MIS step
    def step(spp_idx):
        st = make_cmj_state(
            jnp.broadcast_to(spp_idx.astype(jnp.uint32), (LANES,)), pix, 7
        )
        o, d, st = camera_rays(cam, width, height, pix, st)
        res = mis(frame, sky, o, d, st, bsdf_sample,
                  intersect_fn=intersect_fn, occluded_fn=occluded_fn, max_depth=10)
        return res.lte, res.n_traces

    jstep = jax.jit(step)
    dt = timeit("full MIS step (depth 10)", jstep, jnp.uint32(1), reps=3)
    _, n_tr = jstep(jnp.uint32(1))
    print(f"  -> {float(n_tr)/1e6:.2f} Mtraces/step, "
          f"{float(n_tr)/dt/1e6:.1f} Mrays/s", flush=True)

    # MIS step with a fake O(1) intersector: isolates shading-side cost
    t_half = jnp.full((LANES,), 3.0, jnp.float32)
    prim_fake = jnp.asarray(
        rng.integers(0, int(frame.tri_verts.shape[0]), LANES), jnp.int32
    )
    uv = jnp.full((LANES,), 0.3, jnp.float32)

    def fake_intersect(tv, o, d, tmin, tmax):
        # depends on the ray so nothing folds away; no memory traffic
        t = t_half + 0.0 * (o[:, 0] + d[:, 0])
        hit = jnp.broadcast_to(tmax, t.shape) > 1.0
        return t, jnp.where(hit, prim_fake, -1), uv, uv, hit

    def fake_occluded(tv, o, d, tmin, tmax):
        return (o[:, 0] + d[:, 0]) * jnp.broadcast_to(tmax, (LANES,)) > 0.5

    def step_fake(spp_idx):
        st = make_cmj_state(
            jnp.broadcast_to(spp_idx.astype(jnp.uint32), (LANES,)), pix, 7
        )
        o, d, st = camera_rays(cam, width, height, pix, st)
        res = mis(frame, sky, o, d, st, bsdf_sample,
                  intersect_fn=fake_intersect, occluded_fn=fake_occluded,
                  max_depth=10)
        return res.lte

    timeit("MIS step w/ FAKE intersector (shading cost)", jax.jit(step_fake),
           jnp.uint32(1), reps=3)

    # BSDF pieces in isolation
    wo = d_rand * jnp.asarray([1.0, 1.0, 1.0])
    wo = wo.at[:, 1].set(jnp.abs(wo[:, 1]) + 0.05)
    wo = wo / jnp.linalg.norm(wo, axis=1, keepdims=True)
    f0 = jnp.full((LANES, 3), 0.9, jnp.float32)
    rough = jnp.full((LANES,), 0.4, jnp.float32)

    timeit("msggx_sample (6-iter walk)", jax.jit(
        lambda w, s: msggx_sample(f0, rough, w, s)[0]), wo, st0)

    p = disney_params(f0, rough, rough * 0.0 + 0.2, rough * 0.0, rough * 0.0)
    timeit("disney_sample", jax.jit(
        lambda w, s: disney_sample(p, w, s)[0]), wo, st0)

    hitp = jax.jit(lambda o, d: closest_hit(frame, sky, o, d, 1e-3, 1e16,
                                            fake_intersect))
    hit = jax.block_until_ready(hitp(o_rand, d_rand))
    timeit("bsdf_sample full dispatch (all lobes)", jax.jit(
        lambda h, w, s: bsdf_sample(h, w, s)[0]), hit, wo, st0)
    timeit("payload fill only (fake intersect)", hitp, o_rand, d_rand)

    # would-be ray binning pass: key sort + gather + scatter
    keys = jnp.asarray(rng.integers(0, 1 << 20, LANES).astype(np.uint32))

    def bin_pass(k, o, d):
        perm = jnp.argsort(k)
        o2 = o[perm]
        d2 = d[perm]
        out = jnp.zeros_like(o2).at[perm].set(o2 + d2)
        return out

    timeit("sort+gather+scatter (binning pass)", jax.jit(bin_pass),
           keys, o_rand, d_rand)

    print("done", flush=True)


if __name__ == "__main__":
    main()
