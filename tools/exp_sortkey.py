"""Offline sort-key ablation for the binned kernel (numpy, no TPU).

The contest-scale ablation (tools/ablate_contest.py) shows the MIS
iteration is ~100% intersection, and the kernel's MT-block count per
64-ray subtile is gated by the exact slab UNION of the subtile's rays
(~270 clusters under the current key vs a per-ray need of 7-14). This
script ranks candidate sort keys by that union, on realistic bounce and
shadow ray populations, without touching the TPU.

Key family: origin morton18 (6b/axis) + 3-bit direction octant, with the
octant inserted at bit position p from the top (p=0: octant-major =
current production key; p=18: octant-minor). Plus a pure morton24
(8b/axis, no direction) variant.

Usage: python tools/exp_sortkey.py [gltf_path] [--rays N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def part1by2(x):
    x = x.astype(np.uint32) & 0xFF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton(q, bits):
    qi = np.clip((q * (1 << bits)).astype(np.int64), 0, (1 << bits) - 1)
    m = (
        (part1by2(qi[:, 0]) << 2)
        | (part1by2(qi[:, 1]) << 1)
        | part1by2(qi[:, 2])
    ).astype(np.int64)
    return m >> (24 - 3 * bits) if bits < 8 else m


def octant(d):
    return (
        (d[:, 0] >= 0).astype(np.int64)
        | ((d[:, 1] >= 0).astype(np.int64) << 1)
        | ((d[:, 2] >= 0).astype(np.int64) << 2)
    )


def make_key(o, d, lo, inv_ext, kind, cid=None):
    q = np.clip((o - lo) * inv_ext, 0.0, 1.0 - 1e-7)
    if kind == "morton24":
        return morton(q, 8)
    if kind.startswith("oct@"):
        p = int(kind[4:])  # octant inserted p bits from the TOP of m18
        m18 = morton(q, 6)
        hi = m18 >> (18 - p) if p > 0 else np.zeros_like(m18)
        lo_bits = m18 & ((1 << (18 - p)) - 1)
        return (hi << (3 + 18 - p)) | (octant(d) << (18 - p)) | lo_bits
    if kind == "m24oct":  # morton24 major, octant minor
        return (morton(q, 8) << 3) | octant(d)
    # origin-CLUSTER keys: the median-split cluster id of the surface the
    # ray leaves — a far tighter origin bucket than any scene-grid morton
    # cell, and available for free in the wavefront engine (the closest
    # trace's winning cluster id)
    if kind == "cid":
        return cid.astype(np.int64)
    if kind == "cidoct":  # cluster major, octant minor
        return (cid.astype(np.int64) << 3) | octant(d)
    if kind == "octcid":  # octant major, cluster minor
        return (octant(d) << 14) | cid.astype(np.int64)
    if kind == "cid_dm6":  # cluster major, 2b/axis direction morton minor
        dq = np.clip((d + 1.0) * 0.5, 0.0, 1.0 - 1e-7)
        return (cid.astype(np.int64) << 6) | morton(dq, 2)
    raise ValueError(kind)


def scene_exit_t(lo, hi, o, d, tmin):
    tiny = np.where(d >= 0, 1e-12, -1e-12)
    iv = 1.0 / np.where(np.abs(d) < 1e-12, tiny, d)
    t1 = (lo[None] - o) * iv
    t2 = (hi[None] - o) * iv
    t_exit = np.minimum.reduce(np.maximum(t1, t2), axis=1)
    t_ent = np.maximum.reduce(np.minimum(t1, t2), axis=1)
    t_exit = t_exit * 1.0001 + 1e-5
    return np.where((t_exit >= t_ent) & (t_exit > tmin), t_exit, tmin)


def union_stats(amin, amax, o, d, tmin, tmax, gran):
    """Mean clusters per `gran`-ray group under exact slab unions."""
    n = o.shape[0]
    g = n // gran
    tiny = np.where(d >= 0, 1e-12, -1e-12)
    iv = 1.0 / np.where(np.abs(d) < 1e-12, tiny, d)
    c = amin.shape[0]
    taken = np.zeros((g, c), bool)
    ch = 256
    for s in range(0, c, ch):
        e = min(s + ch, c)
        te = np.broadcast_to(tmin[:, None], (n, e - s)).copy()
        tx = np.broadcast_to(tmax[:, None], (n, e - s)).copy()
        for ax in range(3):
            t1 = (amin[None, s:e, ax] - o[:, None, ax]) * iv[:, None, ax]
            t2 = (amax[None, s:e, ax] - o[:, None, ax]) * iv[:, None, ax]
            np.maximum(te, np.minimum(t1, t2), out=te)
            np.minimum(tx, np.maximum(t1, t2), out=tx)
        ok = (te <= tx) & (tmax > tmin)[:, None]
        taken[:, s:e] = ok.reshape(g, gran, e - s).any(axis=1)
    per_group = taken.sum(axis=1)
    return per_group.mean(), np.percentile(per_group, 90)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from henjou_tpu.accel.pallas_binned import pack_binned_np, K
    from henjou_tpu.scene.gltf import load_gltf
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene

    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/rtcamp.gltf"
    n = 65536
    scene = load_gltf(path)
    dev = build_device_scene(scene)
    frame = jax.jit(build_frame_scene)(dev, None, None)
    tv = np.asarray(frame.tri_verts)
    tv = tv[np.isfinite(tv).all(axis=(1, 2))]
    emis = np.asarray(dev.light_prim_ids)
    emis = emis if emis.size > 0 else None

    bc = pack_binned_np(tv)
    ctot = bc.num_groups * bc.group
    amin = np.asarray(bc.aabb[0:3]).T[:ctot]
    amax = np.asarray(bc.aabb[3:6]).T[:ctot]
    lo = np.asarray(bc.scene_lo)
    hi = np.asarray(bc.scene_hi)
    inv_ext = 1.0 / np.maximum(hi - lo, 1e-12)
    print(f"tris={tv.shape[0]} clusters={bc.num_clusters} ctot={ctot}")

    rng = np.random.default_rng(7)

    def surface_points(m):
        tri = rng.integers(0, tv.shape[0], m)
        b1 = rng.random(m, dtype=np.float32)
        b2 = rng.random(m, dtype=np.float32)
        flip = b1 + b2 > 1
        b1 = np.where(flip, 1 - b1, b1)
        b2 = np.where(flip, 1 - b2, b2)
        p = (
            tv[tri, 0]
            + b1[:, None] * (tv[tri, 1] - tv[tri, 0])
            + b2[:, None] * (tv[tri, 2] - tv[tri, 0])
        )
        nrm = np.cross(tv[tri, 1] - tv[tri, 0], tv[tri, 2] - tv[tri, 0])
        nl = np.linalg.norm(nrm, axis=1, keepdims=True)
        nrm = nrm / np.maximum(nl, 1e-12)
        return p.astype(np.float32), nrm.astype(np.float32), tri

    # bounce rays: cosine hemisphere around the surface normal
    p, nrm, otri = surface_points(n)
    # tri -> median-split cluster id (same ordering pack_binned_np uses)
    from henjou_tpu.accel.pallas_binned import _median_split_order

    order = _median_split_order(tv.mean(axis=1))
    cluster_of = np.empty(tv.shape[0], np.int64)
    cluster_of[order] = np.arange(len(order)) // K
    ocid = cluster_of[otri]
    u1 = rng.random(n, dtype=np.float32)
    u2 = rng.random(n, dtype=np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    loc = np.stack(
        [r * np.cos(phi), np.sqrt(np.maximum(1 - u1, 0.0)), r * np.sin(phi)],
        axis=1,
    ).astype(np.float32)
    # ONB around nrm (sign flip to face either side like real two-sided hits)
    side = np.where(rng.random(n) < 0.5, 1.0, -1.0).astype(np.float32)[:, None]
    nn = nrm * side
    a = np.where(np.abs(nn[:, 1:2]) < 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
    t0 = np.cross(a, nn)
    t0 /= np.linalg.norm(t0, axis=1, keepdims=True)
    t1 = np.cross(nn, t0)
    bounce_d = (loc[:, 0:1] * t0 + loc[:, 1:2] * nn + loc[:, 2:3] * t1).astype(
        np.float32
    )
    bounce_o = (p + 1e-3 * nn).astype(np.float32)

    # shadow rays: surface origin -> random point on a random emissive tri
    if emis is not None and emis.size > 0:
        lt = emis[rng.integers(0, emis.size, n)]
        lb1 = rng.random(n, dtype=np.float32)
        lb2 = rng.random(n, dtype=np.float32)
        flip = lb1 + lb2 > 1
        lb1 = np.where(flip, 1 - lb1, lb1)
        lb2 = np.where(flip, 1 - lb2, lb2)
        lp = (
            tv[lt, 0]
            + lb1[:, None] * (tv[lt, 1] - tv[lt, 0])
            + lb2[:, None] * (tv[lt, 2] - tv[lt, 0])
        )
        sd = lp - bounce_o
        dist = np.linalg.norm(sd, axis=1, keepdims=True)
        shadow_d = (sd / np.maximum(dist, 1e-12)).astype(np.float32)
        shadow_tmax = (dist[:, 0] * (1 - 1e-3)).astype(np.float32)
    else:
        shadow_d = None

    tmin = np.full(n, 1e-3, np.float32)

    kinds = [
        "oct@0", "oct@6", "oct@9", "oct@12", "oct@18", "morton24", "m24oct",
        "cid", "cidoct", "octcid", "cid_dm6",
    ]
    names = {"oct@0": "oct@0  (= current)", "oct@18": "oct@18 (octant-minor)"}

    for label, o, d, tx in [
        ("bounce", bounce_o, bounce_d,
         scene_exit_t(lo, hi, bounce_o, bounce_d, tmin)),
    ] + (
        [("shadow", bounce_o, shadow_d, shadow_tmax)]
        if shadow_d is not None
        else []
    ):
        print(f"\n== {label} rays ==  (clusters per group; per-ray ideal:", end=" ")
        m1, _ = union_stats(amin, amax, o, d, tmin, tx, 1)
        print(f"{m1:.1f} -> tests/ray {m1 * K:.0f})")
        for kind in kinds:
            key = make_key(o, d, lo, inv_ext, kind, cid=ocid)
            order = np.argsort(key, kind="stable")
            os_, ds_, tx_ = o[order], d[order], tx[order]
            m64, p64 = union_stats(amin, amax, os_, ds_, tmin[order], tx_, 64)
            m256, _ = union_stats(amin, amax, os_, ds_, tmin[order], tx_, 256)
            print(
                f"  {names.get(kind, kind):22s} union64 mean {m64:7.1f} "
                f"p90 {p64:6.0f}   union256 {m256:7.1f}"
            )


if __name__ == "__main__":
    main()
