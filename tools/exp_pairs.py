"""Oracle + TPU prototypes for the PAIR-COMPACTED intersector.

The binned kernel's contest-scale cost is MT blocks serving few rays:
per-RAY slab need is ~7-14 clusters, but the kernel MTs every cluster
in a 64-ray subtile union (~270) because in-kernel gating below 64-ray
granularity is scalar-bound (BASELINE.md round-3 subtile sweep).

The pair idea: compact (8-ray unit, cluster) pairs in the XLA prepass
(dense vector work, no scalar unit), then intersect pairs DENSELY —
every [8, 128] MT block is a pair some ray actually needs. This file
measures, in order:

  A. (CPU) pair-count statistics per granularity: how many (unit,
     cluster) pairs exist at 8/16/64-ray units, with the scene-exit
     tmax only — sizes the caps and the theoretical MT reduction.
  B. (TPU) costs of the candidate compaction primitives at
     [8k units, ~2k clusters]: lax.top_k, row bitonic, argsort.
  C. (TPU) end-to-end XLA-only pair trace vs intersect_binned.

Usage:
  python tools/exp_pairs.py oracle [gltf]        # stage A (CPU)
  python tools/exp_pairs.py compact              # stage B (TPU)
  python tools/exp_pairs.py trace [gltf]         # stage C (TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_scene_tris(path):
    import jax

    from henjou_tpu.scene.gltf import load_gltf
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import sphere_gallery_scene

    if path == "gallery":
        scene = sphere_gallery_scene()
    else:
        scene = load_gltf(path)
    dev = build_device_scene(scene)
    frame = jax.jit(build_frame_scene)(dev, None, None)
    tv = np.asarray(frame.tri_verts)
    ok = np.isfinite(tv).all(axis=(1, 2))
    return tv[ok]


def bounce_rays(tv, n, seed=7):
    rng = np.random.default_rng(seed)
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
    return p.astype(np.float32), d


def sort_rays(o, d, lo, hi):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp

    from henjou_tpu.accel.sorting import ray_sort_key

    key = np.asarray(ray_sort_key(jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(lo),
                                  jnp.asarray(1.0 / (hi - lo))))
    order = np.argsort(key, kind="stable")
    return o[order], d[order]


def oracle(path):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from henjou_tpu.accel.pallas_binned import pack_binned_np, K

    tv = load_scene_tris(path)
    bc = pack_binned_np(tv)
    c = bc.num_clusters
    amin = np.asarray(bc.aabb[0:3]).T[:c]  # [C, 3]
    amax = np.asarray(bc.aabb[3:6]).T[:c]
    lo = np.asarray(bc.scene_lo)
    hi = np.asarray(bc.scene_hi)

    n = 65536
    o, d = bounce_rays(tv, n)
    o, d = sort_rays(o, d, lo, hi)

    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.where(d >= 0, 1e-12, -1e-12), d)
    # scene-exit tmax (same clamp the kernel applies)
    t1 = (lo[None] - o) * inv
    t2 = (hi[None] - o) * inv
    texit = np.minimum(np.maximum(t1, t2).min(axis=1) * (1 + 1e-4) + 1e-5, 1e9)
    tenter = np.maximum(np.minimum(t1, t2).max(axis=1), 0.0)
    texit = np.where(texit >= tenter, texit, 0.0)

    # per-ray need, chunked over clusters
    tmin = 1e-3
    need = np.zeros((n, c), bool)
    tent = np.full((n, c), np.inf, np.float32)
    ch = 256
    for s in range(0, c, ch):
        e = min(s + ch, c)
        t1 = (amin[None, s:e] - o[:, None, :]) * inv[:, None, :]
        t2 = (amax[None, s:e] - o[:, None, :]) * inv[:, None, :]
        te = np.maximum(np.minimum(t1, t2).max(axis=2), tmin)
        tx = np.minimum(np.maximum(t1, t2).min(axis=2), texit[:, None])
        need[:, s:e] = te <= tx
        tent[:, s:e] = np.where(need[:, s:e], te, np.inf)

    per_ray = need.sum(axis=1)
    print(f"scene {path}: tris={tv.shape[0]} clusters={c} group={bc.group}")
    print(f"per-RAY need (scene-exit tmax): mean {per_ray.mean():.1f} "
          f"p50 {np.percentile(per_ray,50):.0f} p90 {np.percentile(per_ray,90):.0f} "
          f"p99 {np.percentile(per_ray,99):.0f} max {per_ray.max()}")

    # now tighten tmax by the ACTUAL nearest hit (perfect-early-exit floor):
    # walk each ray's needed clusters near-to-far with numpy MT, chunked.
    verts = np.zeros((((tv.shape[0] + K - 1) // K) * K, 3, 3), np.float32)
    # reuse the median-split order implied by bc: rows plane 12 has ids
    rows = np.asarray(bc.rows).reshape(-1, 16, K)
    ids = rows[:c, 12].view(np.int32)  # [C, K]
    v0c = np.zeros((c, K, 3), np.float32)
    e1c = np.zeros((c, K, 3), np.float32)
    e2c = np.zeros((c, K, 3), np.float32)
    valid = ids >= 0
    safe = np.maximum(ids, 0)
    v = tv[safe]  # [C, K, 3, 3]
    v0c = v[:, :, 0]
    e1c = v[:, :, 1] - v[:, :, 0]
    e2c = v[:, :, 2] - v[:, :, 0]

    best = np.full(n, np.inf, np.float32)
    # process cluster-major over rays that need each cluster (fast enough
    # in numpy since pairs ~ n * 15)
    t0 = time.time()
    for ci in range(c):
        r = np.nonzero(need[:, ci])[0]
        if r.size == 0:
            continue
        ro, rd = o[r], d[r]
        # MT (vectorized): [R, K]
        pv = np.cross(rd[:, None, :], e2c[ci][None])  # [R, K, 3]
        det = (pv * e1c[ci][None]).sum(-1)
        inv_det = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = ro[:, None, :] - v0c[ci][None]
        u = (tvec * pv).sum(-1) * inv_det
        qv = np.cross(tvec, e1c[ci][None])
        vv = (qv * rd[:, None, :]).sum(-1) * inv_det
        tt = (qv * e2c[ci][None]).sum(-1) * inv_det
        ok = (u >= 0) & (vv >= 0) & (u + vv <= 1) & (tt > tmin) & valid[ci][None]
        tt = np.where(ok, tt, np.inf)
        np.minimum.at(best, r, tt.min(axis=1))
    print(f"  (numpy MT pass {time.time()-t0:.1f}s, hit rate "
          f"{np.isfinite(best).mean():.2f})")

    tcap = np.minimum(best * (1 + 1e-4), texit)
    need_f = need & (tent <= tcap[:, None])
    per_ray_f = need_f.sum(axis=1)
    print(f"per-RAY need (hit-tightened = perfect early exit): mean "
          f"{per_ray_f.mean():.1f} p90 {np.percentile(per_ray_f,90):.0f} "
          f"p99 {np.percentile(per_ray_f,99):.0f} max {per_ray_f.max()}")

    for gran in (8, 16, 32, 64):
        u = n // gran
        nu = need.reshape(u, gran, c).any(axis=1)
        nuf = need_f.reshape(u, gran, c).any(axis=1)
        pu = nu.sum(axis=1)
        puf = nuf.sum(axis=1)
        print(f"unit={gran:3d}: union mean {pu.mean():7.1f} p90 "
              f"{np.percentile(pu,90):5.0f} p99 {np.percentile(pu,99):5.0f} "
              f"max {pu.max():5d} | tightened mean {puf.mean():7.1f} "
              f"p99 {np.percentile(puf,99):5.0f} max {puf.max():5d} | "
              f"pairs {pu.sum()/1e3:.0f}k  MT row-evals "
              f"{pu.sum()*gran/1e6:.1f}M")
    # current kernel comparison: subt=4 of rt=256 => 64-ray unions
    print("(current kernel = unit-64 union row-evals; per-ray ideal = "
          f"{per_ray.sum()/1e6:.1f}M untightened / {per_ray_f.sum()/1e6:.1f}M tightened)")


def _timed(f, *a, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def compact_bench():
    """Stage B: costs of candidate primitives at pair-pipeline shapes."""
    import jax
    import jax.numpy as jnp

    from henjou_tpu.accel.bitonic import bitonic_sort
    from henjou_tpu.accel.pallas_binned import _bitonic_rows

    rng = np.random.default_rng(0)
    U, C = 8192, 2048
    keys = jnp.asarray(rng.random((U, C), np.float32))
    # vary the input each call (seed arg) so nothing can be cached, and
    # reduce outputs to scalars so transfer cost is excluded
    seeds = jnp.arange(64, dtype=jnp.float32)

    # 1. lax.top_k rows (compaction + sort in one)
    for k in (64, 128):
        f = jax.jit(
            lambda x, s, k=k: sum(
                y.sum() for y in jax.lax.top_k(-(x + s), k)
            )
        )
        ms = min(_timed(f, keys, seeds[i]) for i in range(3))
        print(f"top_k[{U},{C}] k={k}: {ms:.2f} ms")

    # 2. row bitonic (full sort of each row)
    f = jax.jit(lambda x, s: sum(y.sum() for y in _bitonic_rows(x + s)))
    print(f"_bitonic_rows[{U},{C}]: {_timed(f, keys, seeds[1]):.2f} ms")

    # 3. argsort rows
    f = jax.jit(lambda x, s: jnp.argsort(x + s, axis=1).sum())
    print(f"argsort[{U},{C}] axis1: {_timed(f, keys, seeds[2]):.2f} ms")

    # 4. cumsum along rows (compaction positions)
    f = jax.jit(lambda x, s: jnp.cumsum((x + s) < 1.02, axis=1).sum())
    print(f"cumsum[{U},{C}] axis1: {_timed(f, keys, seeds[3]):.2f} ms")

    # 5. global bitonic pair sort, 256k/512k x (key + 1 payload plane)
    for P in (1 << 18, 1 << 19):
        pk = jnp.asarray(rng.integers(0, 2048, P).astype(np.int32))
        pv = jnp.asarray(rng.integers(0, U, P).astype(np.int32))
        f = jax.jit(lambda a, b, s: bitonic_sort(a + s, b)[0].sum())
        si = jnp.arange(4, dtype=jnp.int32)
        try:
            print(f"bitonic_sort[{P}] +1 plane: {_timed(f, pk, pv, si[0]):.2f} ms")
        except Exception as e:
            print(f"bitonic_sort[{P}]: FAILED {str(e)[:120]}")

    # 6. XLA row-gather rates (the stage-C feasibility question)
    rows = jnp.asarray(rng.random((2048 * 16, 128), np.float32))
    idx = jnp.asarray(rng.integers(0, 2048 * 16, P).astype(np.int32))
    f = jax.jit(lambda r, i: r[i].sum())  # fused consumer
    ms = _timed(f, rows, idx)
    print(f"row-gather [{P}]x128 from [32k,128]: {ms:.2f} ms "
          f"({P * 128 * 4 / ms / 1e6:.0f} GB/s, {P / ms / 1e3:.0f} Mrows/s)")

    # 6b. cluster-slice gather: [P/8, 13, 128] from [2048, 16, 128]
    rows3 = rows.reshape(2048, 16, 128)
    cidx = jnp.asarray(rng.integers(0, 2048, P // 8).astype(np.int32))
    f = jax.jit(lambda r, i: r[i, :13].sum())
    ms = _timed(f, rows3, cidx)
    print(f"slice-gather [{P//8}]x(13,128) from [2k,16,128]: {ms:.2f} ms "
          f"({P // 8 * 13 * 128 * 4 / ms / 1e6:.0f} GB/s)")

    # 6c. small-row gather: [P, 8] from [64k, 8] (ray expansion)
    rays8 = jnp.asarray(rng.random((U * 8, 8), np.float32))
    uidx = jnp.asarray(rng.integers(0, U * 8, P).astype(np.int32))
    f = jax.jit(lambda r, i: r[i].sum())
    ms = _timed(f, rays8, uidx)
    print(f"row-gather [{P}]x8 from [64k,8]: {ms:.2f} ms "
          f"({P / ms / 1e3:.0f} Mrows/s)")

    # 7. one-hot MXU gather, exactness + rate: [P, U] @ [U, 8]
    Pm = 1 << 17
    uid = jnp.asarray(rng.integers(0, U, Pm).astype(np.int32))
    tbl = jnp.asarray(rng.random((U, 8), np.float32))

    def oh(i, t):
        o = (i[:, None] == jnp.arange(U, dtype=jnp.int32)[None, :]).astype(
            jnp.float32
        )
        return jnp.matmul(o, t, precision=jax.lax.Precision.HIGHEST)

    f = jax.jit(oh)
    ms = _timed(f, uid, tbl)
    exact = bool(jnp.all(oh(uid, tbl) == tbl[uid]))
    print(f"one-hot gather [{Pm}]x8 via MXU: {ms:.2f} ms exact={exact}")


def trace(path, n=65536):
    """Stage C: end-to-end pair trace vs intersect_binned (same rays)."""
    import jax
    import jax.numpy as jnp

    from henjou_tpu.accel.pairs import intersect_pairs
    from henjou_tpu.accel.pallas_binned import intersect_binned, pack_binned_np

    tv = load_scene_tris(path)
    bc = pack_binned_np(tv)
    print(f"scene {path}: tris={tv.shape[0]} clusters={bc.num_clusters} "
          f"group={bc.group}")
    o, d = bounce_rays(tv, n)
    lo, hi = np.asarray(bc.scene_lo), np.asarray(bc.scene_hi)
    o, d = sort_rays(o, d, lo, hi)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmin = jnp.full((n,), 1e-3, jnp.float32)
    # shadow-style tmax for the anyhit comparison (finite segment)
    tsh = jnp.full((n,), float(np.linalg.norm(hi - lo) * 0.3), jnp.float32)

    fb = jax.jit(lambda o, d, t: intersect_binned(bc, o, d, t))
    fbo = jax.jit(
        lambda o, d, t: intersect_binned(bc, o, d, t, tmax=tsh, any_hit=True)[4]
    )
    fp = jax.jit(lambda o, d, t: intersect_pairs(bc, o, d, t))
    fpo = jax.jit(
        lambda o, d, t: intersect_pairs(bc, o, d, t, tmax=tsh, any_hit=True)[4]
    )

    rb = fb(o, d, tmin)
    rp = fp(o, d, tmin)
    hb = np.asarray(fbo(o, d, tmin))
    hp = np.asarray(fpo(o, d, tmin))
    tb, pb = np.asarray(rb[0]), np.asarray(rb[1])
    tp, pp = np.asarray(rp[0]), np.asarray(rp[1])
    hit_match = (np.isfinite(tb) == np.isfinite(tp)).mean()
    both = np.isfinite(tb) & np.isfinite(tp)
    t_close = np.isclose(tb[both], tp[both], rtol=1e-5).mean()
    prim_match = (pb[both] == pp[both]).mean()
    occl_match = (hb == hp).mean()
    print(f"closest: hit-match {hit_match:.6f} t-close {t_close:.6f} "
          f"prim-match {prim_match:.6f} (hit rate {np.isfinite(tb).mean():.3f})")
    print(f"anyhit:  match {occl_match:.6f} (occl rate {hb.mean():.3f})")

    for name, f, args in (
        ("binned closest", fb, (o, d, tmin)),
        ("binned anyhit ", fbo, (o, d, tmin)),
        ("pairs  closest", fp, (o, d, tmin)),
        ("pairs  anyhit ", fpo, (o, d, tmin)),
    ):
        ms = _timed(f, *args, n=10)
        print(f"{name}: {ms:7.2f} ms  ({n / ms / 1e3:.1f} Mrays/s)")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "oracle"
    path = sys.argv[2] if len(sys.argv) > 2 else "scenes/rtcamp.gltf"
    if mode == "oracle":
        os.environ["JAX_PLATFORMS"] = "cpu"
        oracle(path)
    elif mode == "compact":
        compact_bench()
    elif mode == "trace":
        trace(path)


if __name__ == "__main__":
    main()
