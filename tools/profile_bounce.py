"""Per-component cost of ONE wavefront MIS bounce on the real TPU.

bench.py measures ~2.0 s per 8spp 512^2 pass (~26 engine iterations with
64k lanes) -> ~78 ms/iteration. This isolates where the iteration goes:
the three traces (radiance/shadow/branch), the sort wrapper's argsort +
permutation gathers, payload fill, BSDF work, and spawn/refill.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LANES = 1 << 16


def timeit(name, fn, *args, reps=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt*1e3:10.3f} ms", flush=True)
    return dt


def main():
    from henjou_tpu.accel.pallas_cluster_hbm import (
        intersect_pallas_hbm,
        make_pallas_hbm_intersector,
        pack_clusters_hbm_np,
    )
    from henjou_tpu.accel.sorting import make_sorted_intersector, ray_sort_key
    from henjou_tpu.integrator.payload import Sky, closest_hit
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import sphere_gallery_scene

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    dev = build_device_scene(sphere_gallery_scene())
    frame = jax.jit(build_frame_scene)(dev, None, None)
    pc = pack_clusters_hbm_np(np.asarray(frame.tri_verts))
    print(f"clusters={pc.num_clusters} super={pc.num_super}", flush=True)
    ifn, ofn = make_pallas_hbm_intersector(pc)
    a2 = np.asarray(pc.aabb2)[:, : pc.num_super]
    lo, hi = a2[0:3].min(axis=1), a2[3:6].max(axis=1)
    sifn, sofn = make_sorted_intersector(ifn, ofn, lo, hi)

    rng = np.random.default_rng(0)
    # incoherent bounce-like rays: origins on scene surfaces-ish, dirs random
    o = jnp.asarray(
        rng.uniform(lo - 0.1, hi + 0.1, size=(LANES, 3)).astype(np.float32)
    )
    d = rng.normal(size=(LANES, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmin = jnp.zeros((LANES,), jnp.float32) + 1e-3
    tmax = jnp.full((LANES,), 1e9, jnp.float32)

    timeit("raw intersect (unsorted, incoherent) 64k",
           jax.jit(lambda o, d: intersect_pallas_hbm(pc, o, d, 1e-3)), o, d)
    timeit("sorted intersect (incoherent) 64k",
           jax.jit(lambda o, d: sifn(None, o, d, tmin, tmax)), o, d)
    timeit("sorted occluded (incoherent) 64k",
           jax.jit(lambda o, d: sofn(None, o, d, tmin, tmax)), o, d)

    lo_j = jnp.asarray(lo, jnp.float32)
    inv_e = 1.0 / jnp.maximum(jnp.asarray(hi, jnp.float32) - lo_j, 1e-12)
    timeit("argsort of 24-bit ray keys 64k",
           jax.jit(lambda o, d: jnp.argsort(ray_sort_key(o, d, lo_j, inv_e))),
           o, d)

    def sort_gather_scatter(o, d):
        key = ray_sort_key(o, d, lo_j, inv_e)
        perm = jnp.argsort(key)
        outs = (o[perm], d[perm], tmin[perm], tmax[perm])
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(LANES))
        return tuple(x[inv] for x in outs)

    timeit("sort + 4 fwd gathers + 4 inv gathers 64k",
           jax.jit(sort_gather_scatter), o, d)

    sky = Sky(constant_color=jnp.asarray([0.3, 0.4, 0.55]),
              intensity=jnp.asarray(1.0))
    timeit("closest_hit (sorted intersect + payload fill) 64k",
           jax.jit(lambda o, d: closest_hit(frame, sky, o, d, 1e-3, tmax, sifn)),
           o, d)

    # full bounce: one engine iteration cost via max_iters=1 vs 2
    from henjou_tpu.bsdf.dispatch import bsdf_eval, bsdf_pdf, make_bsdf_sampler
    from henjou_tpu.integrator.wavefront import wavefront_render
    from henjou_tpu.runtime.camera import make_camera

    bs = make_bsdf_sampler(None)
    beval = lambda h, wo, wi: bsdf_eval(h, wo, wi, None)
    cam = make_camera((0.0, 1.2, -9.0), (0.0, -0.05, 1.0), np.radians(45.0))

    def engine(n_it, integ):
        @jax.jit
        def run():
            return wavefront_render(
                frame, sky, cam, 512, 512, 8, bs,
                bsdf_eval=beval, bsdf_pdf=bsdf_pdf, integrator=integ,
                seed=7, lanes=LANES, max_depth=10,
                intersect_fn=sifn, occluded_fn=sofn, max_iters=n_it,
            )
        return run

    d1 = timeit("engine mis 1 iter", engine(1, "mis"), reps=3)
    d3 = timeit("engine mis 3 iters", engine(3, "mis"), reps=3)
    d9 = timeit("engine mis 9 iters", engine(9, "mis"), reps=3)
    print(f"  -> marginal mis iter: {(d9-d3)*1e3/6:.2f} ms", flush=True)
    p1 = timeit("engine pathtrace 1 iter", engine(1, "pathtrace"), reps=3)
    p9 = timeit("engine pathtrace 9 iters", engine(9, "pathtrace"), reps=3)
    print(f"  -> marginal pt iter: {(p9-p1)*1e3/8:.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
