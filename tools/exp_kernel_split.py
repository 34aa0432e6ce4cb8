"""Decompose the binned kernel's contest-scale cost on the real TPU.

tools/ablate_contest.py attributed the whole 77 ms MIS iteration to the
intersection kernels; tools/exp_sortkey.py showed the 64-ray slab unions
are already within ~5x of the per-ray ideal (85 vs 16 clusters) and
key-insensitive. So where do the ~36 ms radiance / ~20 ms any-hit go?
This script times intersect_binned on a realistic bounce-ray population
under compile-time kernel ablations:

  full        production (bits + per-subtile best-t gate -> MT)
  no-mt       walk + gating only, MT skipped  (NB: best-t never
              tightens, so the walk runs to scene exit — upper bound)
  no-bits     per-subtile best-t gate only (prepass bit benefit)

(Historical: an in-kernel per-subtile slab re-test measured 63.9 ms
no-slab vs 67.1 ms full here and was REMOVED from the kernel.)

Usage: python tools/exp_kernel_split.py [gltf] [--rays 65536]
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

    from henjou_tpu.accel.pallas_binned import (
        intersect_binned,
        pack_binned_np,
    )
    from henjou_tpu.accel.sorting import ray_sort_key
    from henjou_tpu.scene.gltf import load_gltf
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene

    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/rtcamp.gltf"
    n = 65536
    if "--rays" in sys.argv:
        n = int(sys.argv[sys.argv.index("--rays") + 1])
    subt = 0  # 0 = auto
    if "--subt" in sys.argv:
        subt = int(sys.argv[sys.argv.index("--subt") + 1])
    kk = 128  # leaf width (K sweep, round-4 VERDICT #1b)
    if "--k" in sys.argv:
        kk = int(sys.argv[sys.argv.index("--k") + 1])
    rt = 256
    if "--rt" in sys.argv:
        rt = int(sys.argv[sys.argv.index("--rt") + 1])

    scene = load_gltf(path)
    dev = build_device_scene(scene)
    frame = jax.jit(build_frame_scene)(dev, None, None)
    tv = np.asarray(frame.tri_verts)
    tv = tv[np.isfinite(tv).all(axis=(1, 2))]
    bc = pack_binned_np(tv, k=kk)
    print(f"tris={tv.shape[0]} k={kk} clusters={bc.num_clusters} "
          f"group={bc.group} rt={rt}", flush=True)

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
    t0 = np.cross(a, nn)
    t0 /= np.linalg.norm(t0, axis=1, keepdims=True)
    t1 = np.cross(nn, t0)
    d = (loc[:, 0:1] * t0 + loc[:, 1:2] * nn + loc[:, 2:3] * t1).astype(np.float32)
    o = (p + 1e-3 * nn).astype(np.float32)

    # production ordering: sort by the production key
    key = np.asarray(ray_sort_key(jnp.asarray(o), jnp.asarray(d),
                                  bc.scene_lo,
                                  1.0 / (bc.scene_hi - bc.scene_lo)))
    order = np.argsort(key, kind="stable")
    o, d = o[order], d[order]

    oj = jnp.asarray(o)
    dj = jnp.asarray(d)

    defer = "--defer" in sys.argv  # deferred attribute resolution arm

    def timeit(label, any_hit, ablate):
        fn = jax.jit(lambda: intersect_binned(
            bc, oj, dj, 1e-3, any_hit=any_hit, ablate=ablate,
            subtiles=subt, ray_tile=rt, defer=defer)[0])
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn()
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 4 * 1e3
        print(f"  {label:18s} {ms:8.2f} ms", flush=True)
        return ms

    for ah, tag in ((False, "closest"), (True, "anyhit")):
        print(f"[{tag}] {n} bounce rays:", flush=True)
        timeit("full", ah, 0)
        timeit("no-mt", ah, 1)
        timeit("no-bits", ah, 4)


if __name__ == "__main__":
    main()
