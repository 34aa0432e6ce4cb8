"""BASELINE config #4 scale probe: ~200k-tri mesh at 1080p on the TPU.

Exercises the rtcamp9-class regime (renderer.h:1241 envelope): cluster
count ~1.5k, supercluster count ~96, so the sorted-intersector wrapper and
the per-tile culling carry the load. Renders a few spp of MIS via the
wavefront engine, reports honest Mrays/s and the projected wall-clock to
256 spp, with and without ray sorting.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def big_scene(lat=232, lon=420):
    """~195k-triangle UV sphere over a ground plane, 3 materials."""
    from henjou_tpu.scene.scenedata import SceneData, make_material

    verts = []
    for i in range(lat + 1):
        th = np.pi * i / lat
        for j in range(lon):
            ph = 2 * np.pi * j / lon
            verts.append(
                [np.sin(th) * np.cos(ph), np.cos(th) + 1.2, np.sin(th) * np.sin(ph)]
            )
    verts = np.asarray(verts, np.float32)

    def vid(i, j):
        return i * lon + (j % lon)

    faces = []
    for i in range(lat):
        for j in range(lon):
            a, b, c, d = vid(i, j), vid(i, j + 1), vid(i + 1, j), vid(i + 1, j + 1)
            if i != 0:
                faces.append((a, b, c))
            if i != lat - 1:
                faces.append((b, d, c))
    faces = np.asarray(faces, np.uint32)

    # ground plane + area light
    base = len(verts)
    plane = np.asarray(
        [[-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8]], np.float32
    )
    light = np.asarray(
        [[-2, 6, -2], [2, 6, -2], [2, 6, 2], [-2, 6, 2]], np.float32
    )
    verts = np.concatenate([verts, plane, light])
    extra = np.asarray(
        [
            (base, base + 1, base + 2), (base, base + 2, base + 3),
            (base + 4, base + 6, base + 5), (base + 4, base + 7, base + 6),
        ],
        np.uint32,
    )
    tri = np.concatenate([faces, extra])
    n_mesh = len(faces)

    flat = verts[tri.reshape(-1)]
    e1 = flat.reshape(-1, 3, 3)
    fn = np.cross(e1[:, 1] - e1[:, 0], e1[:, 2] - e1[:, 0])
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
    normals = np.repeat(fn[:, None, :], 3, axis=1).reshape(-1, 3)

    mats = [
        make_material("metal", base_color=(0.9, 0.7, 0.4), metallic=1.0,
                      roughness=0.25),
        make_material("floor", base_color=(0.6, 0.6, 0.65), roughness=0.8),
        make_material("light", emission=(12.0, 12.0, 12.0), is_light=True),
    ]
    mat_ids = np.concatenate(
        [
            np.zeros(n_mesh, np.uint32),
            np.ones(2, np.uint32),
            np.full(2, 2, np.uint32),
        ]
    )
    return SceneData(
        vertices=flat,
        indices=np.arange(len(flat), dtype=np.uint32),
        material_ids=mat_ids,
        normals=normals,
        texcoords=None,
        colors=None,
        materials=mats,
    )


def main():
    from henjou_tpu.accel.pallas_cluster_hbm import (
        make_pallas_hbm_intersector,
        pack_clusters_hbm_np,
    )
    from henjou_tpu.accel.sorting import make_sorted_intersector
    from henjou_tpu.bsdf.dispatch import bsdf_eval, bsdf_pdf, make_bsdf_sampler
    from henjou_tpu.integrator.wavefront import wavefront_render
    from henjou_tpu.integrator.payload import Sky
    from henjou_tpu.runtime.camera import make_camera
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    t0 = time.perf_counter()
    scene = big_scene()
    dev = build_device_scene(scene)
    frame = jax.jit(build_frame_scene)(dev, None, None)
    pc = pack_clusters_hbm_np(np.asarray(frame.tri_verts))
    print(
        f"scene: {len(scene.material_ids)} tris, clusters={pc.num_clusters}, "
        f"super={pc.num_super}, build {time.perf_counter()-t0:.1f}s",
        flush=True,
    )
    ifn_raw, ofn_raw = make_pallas_hbm_intersector(pc)
    a2 = np.asarray(pc.aabb2)[:, : pc.num_super]
    lo, hi = a2[0:3].min(axis=1), a2[3:6].max(axis=1)
    ifn_s, ofn_s = make_sorted_intersector(ifn_raw, ofn_raw, lo, hi)

    from henjou_tpu.accel.pallas_binned import (
        make_binned_intersector,
        pack_binned_np,
    )
    from henjou_tpu.accel.sorting import make_bitonic_sorted_intersector

    t0 = time.perf_counter()
    bc = pack_binned_np(np.asarray(frame.tri_verts))
    print(
        f"binned build: clusters={bc.num_clusters} group={bc.group} "
        f"groups={bc.num_groups} in {time.perf_counter()-t0:.1f}s",
        flush=True,
    )
    ifn_b, ofn_b = make_binned_intersector(bc)
    ifn_bs, ofn_bs = make_bitonic_sorted_intersector(
        ifn_b, ofn_b, np.asarray(bc.scene_lo), np.asarray(bc.scene_hi)
    )

    sky = Sky(constant_color=jnp.asarray([0.4, 0.5, 0.7]), intensity=jnp.asarray(1.0))
    cam = make_camera((0.0, 2.2, -6.5), (0.0, -0.12, 1.0), np.radians(50.0))
    W, H = 1920, 1080
    SPP = 2
    bs = make_bsdf_sampler(None, has_specular=False, has_sheen=False,
                           has_clearcoat=False)
    beval = lambda h, wo, wi: bsdf_eval(h, wo, wi, None, False, False)

    for name, ifn, ofn in (
        ("binned+bitonic", ifn_bs, ofn_bs),
        ("hbm sorted", ifn_s, ofn_s),
    ):
        @jax.jit
        def run(ifn=ifn, ofn=ofn):
            return wavefront_render(
                frame, sky, cam, W, H, SPP, bs,
                bsdf_eval=beval, bsdf_pdf=bsdf_pdf, integrator="mis",
                seed=3, lanes=1 << 16,
                intersect_fn=ifn, occluded_fn=ofn,
            )

        film = run()
        jax.block_until_ready(film.color)
        t0 = time.perf_counter()
        film = run()
        jax.block_until_ready(film.color)
        dt = time.perf_counter() - t0
        tr = float(film.n_traces)
        mrays = tr / dt / 1e6
        per_spp = dt / SPP
        print(
            f"{name:9s}: {dt:.2f}s for {SPP}spp @1080p, {tr/1e6:.1f} Mtraces, "
            f"{mrays:.2f} Mrays/s, projected 256spp = {per_spp*256/60:.1f} min",
            flush=True,
        )

    print("done", flush=True)


if __name__ == "__main__":
    main()
