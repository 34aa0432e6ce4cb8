"""Hardware experiments: cheaper ray grouping for the cluster kernel.

The sort wrapper costs ~8.3 ms per trace (argsort 4.8 + 9 gathers) while
the kernel itself runs ~8.6 ms on grouped incoherent rays — grouping
machinery is ~half of every trace. The kernel only needs rays GROUPED
into coherent tiles, not totally ordered, so a counting partition over a
small key space should beat lax.sort. This sweeps:
  1. argsort vs counting-partition (B buckets) cost
  2. separate-field gathers vs one packed [N,8] row gather
  3. key layouts: octant3+morton18, octa-dir6+morton12, octa-dir8+morton9
  4. end-to-end grouped intersect time per variant
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 16


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt*1e3:10.3f} ms", flush=True)
    return dt


def _part1by2(x):
    x = x & 0xFF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _part1by1(x):
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def octa_uv(d):
    """Octahedral direction map -> (u, v) in [0,1]^2."""
    ax = jnp.abs(d)
    s = ax[:, 0] + ax[:, 1] + ax[:, 2]
    x = d[:, 0] / s
    y = d[:, 1] / s
    # fold lower hemisphere
    xf = jnp.where(d[:, 2] >= 0, x, (1 - jnp.abs(y)) * jnp.sign(x))
    yf = jnp.where(d[:, 2] >= 0, y, (1 - jnp.abs(x)) * jnp.sign(y))
    return xf * 0.5 + 0.5, yf * 0.5 + 0.5


def key_oct3_m18(o, d, lo, inv_e):
    octant = (
        (d[:, 0] >= 0).astype(jnp.int32)
        | ((d[:, 1] >= 0).astype(jnp.int32) << 1)
        | ((d[:, 2] >= 0).astype(jnp.int32) << 2)
    )
    q = jnp.clip((o - lo) * inv_e, 0.0, 1.0 - 1e-7)
    qi = (q * 64.0).astype(jnp.int32)
    m = (_part1by2(qi[:, 0]) << 2) | (_part1by2(qi[:, 1]) << 1) | _part1by2(qi[:, 2])
    return (octant << 18) | m


def key_dir_morton(o, d, lo, inv_e, dir_bits, org_bits_per_axis):
    """octa-mapped direction morton (dir_bits total, even) over origin
    morton (org_bits_per_axis per axis)."""
    u, v = octa_uv(d)
    db = dir_bits // 2
    ui = jnp.clip((u * (1 << db)).astype(jnp.int32), 0, (1 << db) - 1)
    vi = jnp.clip((v * (1 << db)).astype(jnp.int32), 0, (1 << db) - 1)
    dkey = (_part1by1(ui) << 1) | _part1by1(vi)
    q = jnp.clip((o - lo) * inv_e, 0.0, 1.0 - 1e-7)
    qi = (q * (1 << org_bits_per_axis)).astype(jnp.int32)
    m = (_part1by2(qi[:, 0]) << 2) | (_part1by2(qi[:, 1]) << 1) | _part1by2(qi[:, 2])
    return (dkey << (3 * org_bits_per_axis)) | m


def counting_partition(key, n_buckets):
    """Positions that group equal keys (stable). key in [0, n_buckets)."""
    onehot = (key[:, None] == jnp.arange(n_buckets, dtype=key.dtype)[None, :])
    ranks_f = jnp.cumsum(onehot.astype(jnp.float32), axis=0)  # inclusive
    hist = ranks_f[-1]
    offs = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(hist)[:-1]])
    pos = jnp.sum(onehot * (ranks_f - 1.0 + offs[None, :]), axis=1)
    return pos.astype(jnp.int32)


def main():
    from henjou_tpu.accel.pallas_cluster_hbm import (
        intersect_pallas_hbm,
        pack_clusters_hbm_np,
    )
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import sphere_gallery_scene

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    dev = build_device_scene(sphere_gallery_scene())
    frame = jax.jit(build_frame_scene)(dev, None, None)
    pc = pack_clusters_hbm_np(np.asarray(frame.tri_verts))
    a2 = np.asarray(pc.aabb2)[:, : pc.num_super]
    lo = jnp.asarray(a2[0:3].min(axis=1))
    hi = jnp.asarray(a2[3:6].max(axis=1))
    inv_e = 1.0 / jnp.maximum(hi - lo, 1e-12)

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(np.asarray(lo) - 0.1, np.asarray(hi) + 0.1,
                                size=(N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmin = jnp.full((N,), 1e-3, jnp.float32)
    tmax = jnp.full((N,), 1e9, jnp.float32)
    packed = jnp.concatenate([o, d, tmin[:, None], tmax[:, None]], axis=1)

    # --- grouping machinery costs ---
    k24 = jax.jit(lambda o, d: key_oct3_m18(o, d, lo, inv_e))(o, d)
    timeit("argsort 24-bit key", jax.jit(jnp.argsort), k24)
    for bits, nb in ((6, 64), (8, 256), (10, 1024)):
        kb = jax.jit(lambda o, d: key_dir_morton(
            o, d, lo, inv_e, 6, (bits - 6) // 3 if bits > 6 else 0))(o, d)
        kb = kb % nb
        timeit(f"counting_partition B={nb}",
               jax.jit(lambda k: counting_partition(k, nb)), kb)

    perm = jnp.argsort(k24)
    timeit("8 separate field gathers", jax.jit(
        lambda p: (o[p, 0], o[p, 1], o[p, 2], d[p, 0], d[p, 1], d[p, 2],
                   tmin[p], tmax[p])), perm)
    timeit("1 packed [N,8] row gather", jax.jit(lambda p: packed[p]), perm)
    pos = jnp.zeros_like(perm).at[perm].set(jnp.arange(N))
    timeit("1 packed [N,8] row scatter", jax.jit(
        lambda x, q: jnp.zeros_like(packed).at[q].set(x)), packed, pos)

    # --- end-to-end grouped intersect per key layout ---
    def e2e(keyfn, name):
        def run(o, d):
            key = keyfn(o, d)
            perm = jnp.argsort(key)
            pk = packed[perm]
            t, prim, u, v, h = intersect_pallas_hbm(
                pc, pk[:, 0:3], pk[:, 3:6], pk[:, 6], pk[:, 7])
            inv = jnp.zeros_like(perm).at[perm].set(
                jnp.arange(N, dtype=perm.dtype))
            return t[inv], prim[inv], u[inv], v[inv], h[inv]
        return timeit(f"e2e argsort+intersect [{name}]", jax.jit(run), o, d)

    e2e(lambda o, d: key_oct3_m18(o, d, lo, inv_e), "oct3+m18")
    e2e(lambda o, d: key_dir_morton(o, d, lo, inv_e, 6, 4), "dir6+m12")
    e2e(lambda o, d: key_dir_morton(o, d, lo, inv_e, 8, 3), "dir8+m9")
    e2e(lambda o, d: key_dir_morton(o, d, lo, inv_e, 10, 2), "dir10+m6")
    e2e(lambda o, d: key_dir_morton(o, d, lo, inv_e, 8, 0), "dir8")

    # counting-partition end-to-end (B=256, dir6+m6(2/axis))
    def run_cp(o, d):
        key = key_dir_morton(o, d, lo, inv_e, 6, 0)
        key = (key << 2) | 0  # 6 dir bits only -> 64 buckets
        pos = counting_partition(key % 256, 256)
        pk = jnp.zeros_like(packed).at[pos].set(packed)
        t, prim, u, v, h = intersect_pallas_hbm(
            pc, pk[:, 0:3], pk[:, 3:6], pk[:, 6], pk[:, 7])
        return t[pos], prim[pos], u[pos], v[pos], h[pos]

    timeit("e2e counting B=64(dir6)+intersect", jax.jit(run_cp), o, d)

    def run_cp2(o, d):
        key = key_dir_morton(o, d, lo, inv_e, 6, 1)  # dir6 + m3 = 512
        pos = counting_partition(key, 512)
        pk = jnp.zeros_like(packed).at[pos].set(packed)
        t, prim, u, v, h = intersect_pallas_hbm(
            pc, pk[:, 0:3], pk[:, 3:6], pk[:, 6], pk[:, 7])
        return t[pos], prim[pos], u[pos], v[pos], h[pos]

    timeit("e2e counting B=512(dir6+m3)+intersect", jax.jit(run_cp2), o, d)

    print("done", flush=True)


if __name__ == "__main__":
    main()
