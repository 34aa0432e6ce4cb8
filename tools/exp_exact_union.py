"""Experiment: exact per-ray slab culling, OR-reduced over ray tiles.

The interval-arithmetic tile prepass (_tile_worklists) is catastrophically
conservative for incoherent directions: at the contest scene, 8-ray bounce
tiles take 1,500/1,991 clusters while each RAY needs only ~16 (see
tools/cull_efficiency.py). This measures the alternative: a dense
[R, C] per-ray slab test (exact, ~25 flops per pair), OR-reduced over
rows of the sorted ray pool — the TRUE tile union, at dense-VPU cost.

Prints clusters-taken per tile for rt in {8,32,64,256} for camera and
bounce populations, plus the sort-key sensitivity (direction bits).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def per_ray_need(tv_aabb_lo, tv_aabb_hi, o, d, chunk=8192):
    """[R, C] bool: ray enters cluster AABB (t-window (0, inf))."""
    r = o.shape[0]
    c = tv_aabb_lo.shape[0]
    out = np.zeros((r, c), bool)
    tent = np.full((r, c), np.float32(1e9))
    for s in range(0, r, chunk):
        e = min(s + chunk, r)
        oo = o[s:e, None, :]
        dd = d[s:e, None, :]
        inv = 1.0 / np.where(np.abs(dd) < 1e-12,
                             np.where(dd >= 0, 1e-12, -1e-12), dd)
        t1 = (tv_aabb_lo[None] - oo) * inv
        t2 = (tv_aabb_hi[None] - oo) * inv
        lo = np.minimum(t1, t2).max(axis=2)
        hi = np.maximum(t1, t2).min(axis=2)
        ok = (lo <= hi) & (hi > 1e-3)
        out[s:e] = ok
        tent[s:e] = np.where(ok, np.maximum(lo, 0.0), 1e9)
    return out, tent


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from henjou_tpu.scene.gltf import load_gltf
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.accel.pallas_binned import pack_binned_np
    from henjou_tpu.accel.sorting import ray_sort_key
    import jax.numpy as jnp

    scene = load_gltf(sys.argv[1] if len(sys.argv) > 1 else "scenes/rtcamp.gltf")
    dev = build_device_scene(scene)
    frame = jax.jit(build_frame_scene)(dev, None, None)
    tv = np.asarray(frame.tri_verts)
    tv = tv[np.isfinite(tv).all(axis=(1, 2))]
    bc = pack_binned_np(tv)
    c = bc.num_clusters
    lo = np.asarray(bc.aabb[0:3]).T[:c]
    hi = np.asarray(bc.aabb[3:6]).T[:c]

    rng = np.random.default_rng(7)
    n = 65536
    slo = tv.reshape(-1, 3).min(axis=0)
    shi = tv.reshape(-1, 3).max(axis=0)
    span = shi - slo

    cam_o = np.tile((slo + span * [0.5, 0.6, -0.4]).astype(np.float32), (n, 1))
    target = slo + span * (0.2 + 0.6 * rng.random((n, 3), dtype=np.float32))
    cam_d = (target - cam_o).astype(np.float32)
    cam_d /= np.linalg.norm(cam_d, axis=1, keepdims=True)

    tri = rng.integers(0, tv.shape[0], n)
    b1 = rng.random(n, dtype=np.float32)
    b2 = rng.random(n, dtype=np.float32)
    flip = b1 + b2 > 1
    b1 = np.where(flip, 1 - b1, b1)
    b2 = np.where(flip, 1 - b2, b2)
    p = (tv[tri, 0] + b1[:, None] * (tv[tri, 1] - tv[tri, 0])
         + b2[:, None] * (tv[tri, 2] - tv[tri, 0])).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    for label, o_, d_ in (("camera", cam_o, cam_d), ("bounce", p, d)):
        key = np.asarray(ray_sort_key(
            jnp.asarray(o_), jnp.asarray(d_), bc.scene_lo, bc.scene_hi))
        order = np.argsort(key, kind="stable")
        o_s, d_s = o_[order], d_[order]
        need, _ = per_ray_need(lo, hi, o_s, d_s)
        print(f"[{label}] per-ray clusters: mean {need.sum(1).mean():.1f} "
              f"p90 {np.percentile(need.sum(1), 90):.0f}")
        for rt in (8, 32, 64, 256):
            t = n // rt
            u = need.reshape(t, rt, c).any(axis=1)
            cnt = u.sum(axis=1)
            print(f"  exact-union rt={rt:4d}: clusters/tile mean "
                  f"{cnt.mean():7.1f}  p90 {np.percentile(cnt, 90):6.0f} "
                  f" max {cnt.max()}")


if __name__ == "__main__":
    main()
