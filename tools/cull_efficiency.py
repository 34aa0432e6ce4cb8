"""Offline (CPU/numpy) culling-efficiency analysis of the binned kernel.

For a scene + a ray population, replays the prepass culling logic
(`_tile_worklists` interval-slab math) in numpy and reports the average
number of TRIANGLE TESTS each ray pays — the kernel is ALU-bound on MT
blocks, so tests/ray directly bounds Mrays/s. An RT core pays ~50
node+tri tests per ray; the gap to that is the perf headroom of finer
culling, measured here without touching the TPU.

Usage: python tools/cull_efficiency.py [gltf_path] [--rays camera|bounce]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def tile_stats(tv, rays_o, rays_d, rt=256, sort_key=True, label=""):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from henjou_tpu.accel.pallas_binned import (
        pack_binned_np,
        _tile_worklists,
        K,
    )
    from henjou_tpu.accel.sorting import ray_sort_key
    import jax.numpy as jnp

    bc = pack_binned_np(tv)
    n = rays_o.shape[0]
    tmin = np.full(n, 1e-3, np.float32)
    tmax = np.full(n, 1e9, np.float32)

    if sort_key:
        key = np.asarray(
            ray_sort_key(
                jnp.asarray(rays_o), jnp.asarray(rays_d), bc.scene_lo, bc.scene_hi
            )
        )
        order = np.argsort(key, kind="stable")
        rays_o = rays_o[order]
        rays_d = rays_d[order]

    ox, oy, oz = rays_o[:, 0], rays_o[:, 1], rays_o[:, 2]
    dx, dy, dz = rays_d[:, 0], rays_d[:, 1], rays_d[:, 2]
    worklist, tent, count, bits = jax.jit(
        _tile_worklists, static_argnames=("rt",)
    )(bc, ox, oy, oz, dx, dy, dz, tmin, tmax, rt)
    count = np.asarray(count)
    t = n // rt

    # group-level: every group in the worklist costs group*K tri tests
    # (gated in-kernel by cluster bits when group > 1)
    if bc.group > 1:
        w32 = (bc.num_groups * bc.group + 31) // 32
        words = np.asarray(bits).view(np.uint32).reshape(t, w32)
        cl_taken = np.unpackbits(
            words.view(np.uint8), bitorder="little", axis=1
        )[:, : bc.num_groups * bc.group].sum(axis=1)
    else:
        cl_taken = count  # group == 1: worklist IS cluster-granular

    tests_per_ray = cl_taken * K  # every lane of the tile pays every block
    print(
        f"[{label}] tris={tv.shape[0]} clusters={bc.num_clusters} "
        f"group={bc.group} groups={bc.num_groups} tiles={t} rt={rt}"
    )
    print(
        f"  worklist groups/tile: mean {count.mean():.1f}  p50 "
        f"{np.percentile(count, 50):.0f}  p90 {np.percentile(count, 90):.0f} "
        f" max {count.max()}"
    )
    print(
        f"  clusters taken/tile (bit-gated): mean {cl_taken.mean():.1f} "
        f"p90 {np.percentile(cl_taken, 90):.0f}"
    )
    print(
        f"  => tri TESTS per ray: mean {tests_per_ray.mean():.0f}  "
        f"p90 {np.percentile(tests_per_ray, 90):.0f}  (RT-core ~50)"
    )
    # how much of that is geometrically necessary? lower bound: clusters
    # whose AABB the RAY ITSELF (not the tile) enters
    sub = np.random.default_rng(0).choice(n, size=min(n, 2048), replace=False)
    amin = np.asarray(bc.aabb[0:3]).T[: bc.num_clusters * 0 + bc.num_groups * bc.group]
    amax = np.asarray(bc.aabb[3:6]).T[: bc.num_groups * bc.group]
    amin = np.asarray(bc.aabb[0:3]).T[: bc.num_groups * bc.group]
    o = rays_o[sub][:, None, :]
    d = rays_d[sub][:, None, :]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d >= 0, 1e-12, -1e-12), d)
    t1 = (amin[None] - o) * inv
    t2 = (amax[None] - o) * inv
    lo = np.minimum(t1, t2).max(axis=2)
    hi = np.maximum(t1, t2).min(axis=2)
    per_ray = ((lo <= hi) & (hi > 0)).sum(axis=1)
    print(
        f"  per-RAY needed clusters: mean {per_ray.mean():.1f} "
        f"p90 {np.percentile(per_ray, 90):.0f} "
        f"=> per-ray-ideal tests {per_ray.mean() * K:.0f}"
    )
    return tests_per_ray.mean(), per_ray.mean() * K


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from henjou_tpu.scene.gltf import load_gltf
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import sphere_gallery_scene
    import jax.numpy as jnp

    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/rtcamp.gltf"
    if path == "gallery":
        scene = sphere_gallery_scene()
    else:
        scene = load_gltf(path)
    dev = build_device_scene(scene)
    frame = jax.jit(build_frame_scene)(dev, None, None)
    tv = np.asarray(frame.tri_verts)
    ok = np.isfinite(tv).all(axis=(1, 2))
    tv = tv[ok]

    rng = np.random.default_rng(7)
    n = 65536
    lo = tv.reshape(-1, 3).min(axis=0)
    hi = tv.reshape(-1, 3).max(axis=0)
    span = hi - lo

    # camera-like coherent rays: one origin, jittered directions at scene
    cam_o = np.tile((lo + span * [0.5, 0.6, -0.4]).astype(np.float32), (n, 1))
    target = lo + span * (0.2 + 0.6 * rng.random((n, 3), dtype=np.float32))
    cam_d = target - cam_o
    cam_d /= np.linalg.norm(cam_d, axis=1, keepdims=True)

    # bounce-like incoherent rays: origins ON surfaces, random cosine dirs
    tri = rng.integers(0, tv.shape[0], n)
    b1 = rng.random(n, dtype=np.float32)
    b2 = rng.random(n, dtype=np.float32)
    flip = b1 + b2 > 1
    b1 = np.where(flip, 1 - b1, b1)
    b2 = np.where(flip, 1 - b2, b2)
    p = (
        tv[tri, 0]
        + b1[:, None] * (tv[tri, 1] - tv[tri, 0])
        + b2[:, None] * (tv[tri, 2] - tv[tri, 0])
    )
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    rts = (
        [int(x) for x in sys.argv[sys.argv.index("--rt") + 1].split(",")]
        if "--rt" in sys.argv
        else [256]
    )
    for rt in rts:
        r1 = tile_stats(tv, cam_o.astype(np.float32), cam_d.astype(np.float32),
                        rt=rt, label=f"camera rt={rt}")
        r2 = tile_stats(tv, p.astype(np.float32), d, rt=rt,
                        label=f"bounce rt={rt}")
        print(
            f"headroom @rt={rt}: camera {r1[0] / max(r1[1], 1):.1f}x  "
            f"bounce {r2[0] / max(r2[1], 1):.1f}x vs per-ray-ideal clustering\n"
        )


if __name__ == "__main__":
    main()
