"""Component budget of one steady-state MIS iteration at contest scale.

Times, on the real TPU with bounce-like (incoherent, sorted) rays:
  - the exact-union prepass alone (_tile_worklists)
  - the full binned radiance kernel (prepass + pallas)
  - the any-hit kernel
  - the bitonic sort wrapper overhead
at subt in {1, 4, 8}, standalone (adds ~0.5-3 ms dispatch, fine for
relative reads). Marginal-iteration engine numbers live in
tools/perf_matrix.py; this tool answers WHERE the 65 ms/iter goes.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=8, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import rtcamp_scene
    from henjou_tpu.accel.pallas_binned import (
        pack_binned_np,
        intersect_binned,
        _tile_worklists,
    )
    from henjou_tpu.accel.sorting import ray_sort_key

    dev = build_device_scene(rtcamp_scene())
    frame = jax.jit(build_frame_scene)(dev, None, None)
    tv = np.asarray(frame.tri_verts)
    tv = tv[np.isfinite(tv).all(axis=(1, 2))]
    bc = pack_binned_np(tv)
    print(f"tris={tv.shape[0]} clusters={bc.num_clusters} group={bc.group}")

    rng = np.random.default_rng(7)
    n = 65536
    tri = rng.integers(0, tv.shape[0], n)
    b1 = rng.random(n, dtype=np.float32)
    b2 = rng.random(n, dtype=np.float32)
    flip = b1 + b2 > 1
    b1 = np.where(flip, 1 - b1, b1)
    b2 = np.where(flip, 1 - b2, b2)
    o = (tv[tri, 0] + b1[:, None] * (tv[tri, 1] - tv[tri, 0])
         + b2[:, None] * (tv[tri, 2] - tv[tri, 0])).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    key = np.asarray(ray_sort_key(
        jnp.asarray(o), jnp.asarray(d), bc.scene_lo, bc.scene_hi))
    order = np.argsort(key, kind="stable")
    o = jnp.asarray(o[order])
    d = jnp.asarray(d[order])
    tmin = jnp.full((n,), 1e-3, jnp.float32)
    tmax = jnp.full((n,), 1e9, jnp.float32)

    @functools.partial(jax.jit, static_argnums=(4,))
    def prepass(o, d, tmin, tmax, subt):
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        return _tile_worklists(bc, ox, oy, oz, dx, dy, dz, tmin, tmax,
                               256, subt)

    for subt in (1, 4, 8):
        ms_p = timeit(prepass, o, d, tmin, tmax, subt)
        ms_k = timeit(intersect_binned, bc, o, d, tmin, tmax,
                      subtiles=subt)
        ms_a = timeit(intersect_binned, bc, o, d, tmin, tmax,
                      any_hit=True, subtiles=subt)
        print(f"subt={subt}: prepass {ms_p:6.2f} ms  closest {ms_k:6.2f} ms"
              f"  anyhit {ms_a:6.2f} ms  (kernel-only ~ closest-prepass)")


if __name__ == "__main__":
    main()
