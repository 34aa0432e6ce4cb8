"""Two-phase hit-tightened-tmax oracle (round-5 VERDICT #1a), real TPU.

The pairs analysis (BASELINE.md r4) measured mean per-ray cluster need
16.3 with scene-exit tmax but 7.3 with HIT-tightened tmax: most of the
kernel's MT work tests clusters that lie beyond the ray's eventual hit.
A two-phase walk would (1) cheaply bound each ray's hit t, (2) re-run
the exact walk with tmax clamped to that bound, shrinking both the
prepass unions and the worklists.

This script measures each half against its oracle on the contest scene
(64k production-sorted bounce rays, rt=512/subt=4 = the engine config):

  baseline        full closest walk (today's cost)
  phase2-oracle   full walk with tmax = true hit t * (1+5e-4) — the
                  FLOOR for phase-2 cost under a perfect phase-1 bound
  phase1(W)       truncated walk (nearest W worklist groups only):
                  candidate bound producers — cost + hit coverage
  two-phase(W)    phase1(W) + full walk with tmax from phase 1

Decision: ship if min_W two-phase(W) beats baseline by >~15%.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from henjou_tpu.accel.pallas_binned import intersect_binned, pack_binned_np
    from henjou_tpu.accel.sorting import ray_sort_key
    from henjou_tpu.scene.gltf import load_gltf
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene

    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/rtcamp.gltf"
    rt = 512
    if "--rt" in sys.argv:
        rt = int(sys.argv[sys.argv.index("--rt") + 1])
    n = 65536

    scene = load_gltf(path)
    dev = build_device_scene(scene)
    frame = jax.jit(build_frame_scene)(dev, None, None)
    tv = np.asarray(frame.tri_verts)
    tv = tv[np.isfinite(tv).all(axis=(1, 2))]
    bc = pack_binned_np(tv)
    print(f"tris={tv.shape[0]} clusters={bc.num_clusters} group={bc.group} "
          f"rt={rt}", flush=True)

    # production-sorted incoherent bounce rays (same gen as exp_kernel_split)
    rng = np.random.default_rng(7)
    tri = rng.integers(0, tv.shape[0], n)
    b1 = rng.random(n, dtype=np.float32)
    b2 = rng.random(n, dtype=np.float32)
    flip = b1 + b2 > 1
    b1 = np.where(flip, 1 - b1, b1)
    b2 = np.where(flip, 1 - b2, b2)
    p = (tv[tri, 0] + b1[:, None] * (tv[tri, 1] - tv[tri, 0])
         + b2[:, None] * (tv[tri, 2] - tv[tri, 0]))
    nrm = np.cross(tv[tri, 1] - tv[tri, 0], tv[tri, 2] - tv[tri, 0])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    u1 = rng.random(n, dtype=np.float32)
    u2 = rng.random(n, dtype=np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    loc = np.stack([r * np.cos(phi), np.sqrt(np.maximum(1 - u1, 0)),
                    r * np.sin(phi)], 1).astype(np.float32)
    side = np.where(rng.random(n) < 0.5, 1, -1).astype(np.float32)[:, None]
    nn = nrm * side
    a = np.where(np.abs(nn[:, 1:2]) < 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
    t0v = np.cross(a, nn)
    t0v /= np.linalg.norm(t0v, axis=1, keepdims=True)
    t1v = np.cross(nn, t0v)
    d = (loc[:, 0:1] * t0v + loc[:, 1:2] * nn + loc[:, 2:3] * t1v).astype(
        np.float32)
    o = (p + 1e-3 * nn).astype(np.float32)
    key = np.asarray(ray_sort_key(jnp.asarray(o), jnp.asarray(d),
                                  bc.scene_lo,
                                  1.0 / (bc.scene_hi - bc.scene_lo)))
    order = np.argsort(key, kind="stable")
    o, d = o[order], d[order]
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    def timeit(label, fn, reps=4):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {label:28s} {ms:8.2f} ms", flush=True)
        return ms, out

    base_fn = jax.jit(lambda: intersect_binned(
        bc, oj, dj, 1e-3, ray_tile=rt)[:2])
    ms_base, (t_true, prim_true) = timeit("baseline full", base_fn)
    hit_true = np.asarray(prim_true) >= 0
    t_np = np.asarray(t_true)
    print(f"    hit fraction {hit_true.mean():.3f}")

    # phase-2 oracle: perfect per-ray bound
    tmax_oracle = jnp.asarray(
        np.where(hit_true, t_np * (1 + 5e-4) + 1e-4, np.float32(np.inf))
    ).astype(jnp.float32)
    p2_fn = jax.jit(lambda: intersect_binned(
        bc, oj, dj, 1e-3, tmax=tmax_oracle, ray_tile=rt)[:2])
    ms_p2, (t2, p2) = timeit("phase2 (oracle bound)", p2_fn)
    agree = (np.asarray(p2) == np.asarray(prim_true)).mean()
    print(f"    prim agreement {agree:.4f}")

    for W in (2, 4, 8, 16):
        p1_fn = jax.jit(lambda W=W: intersect_binned(
            bc, oj, dj, 1e-3, ray_tile=rt, max_entries=W)[:2])
        ms_p1, (t1, p1) = timeit(f"phase1 (W={W})", p1_fn)
        cov = float((np.asarray(p1) >= 0).mean())
        # realistic phase-2: bound only where phase 1 found a hit
        t1n = np.asarray(t1)
        tmax1 = jnp.asarray(
            np.where(np.asarray(p1) >= 0, t1n * (1 + 5e-4) + 1e-4,
                     np.float32(np.inf))
        ).astype(jnp.float32)
        p2r_fn = jax.jit(lambda tm=tmax1: intersect_binned(
            bc, oj, dj, 1e-3, tmax=tm, ray_tile=rt)[:2])
        ms_p2r, (t2r, p2r) = timeit(f"phase2 (phase1 W={W} bound)", p2r_fn)
        ok = (np.asarray(p2r) == np.asarray(prim_true)).mean()
        print(f"    W={W}: coverage {cov:.3f}, two-phase total "
              f"{ms_p1 + ms_p2r:.2f} ms vs baseline {ms_base:.2f} "
              f"({(ms_p1 + ms_p2r) / ms_base:.2f}x), prim agree {ok:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
