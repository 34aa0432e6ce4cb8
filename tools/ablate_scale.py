"""Decompose the scale-scene (rtcamp, 255k tris, group=16) MIS iteration.

Swaps fake O(1) intersectors into the radiance / occlusion slots of the
wavefront engine and measures the marginal iteration cost of each
configuration ((9 iters - 3 iters)/6, the methodology from BASELINE.md).
Fake hits return a fixed plausible surface so downstream shading stays
fully populated; occupancy differs slightly from the real run, so read
the splits as indicative, not exact.

Usage: python tools/ablate_scale.py [gallery|scale]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tools.perf_matrix import build_scene

    from henjou_tpu.accel.pallas_binned import (
        make_binned_intersector,
        pack_binned_np,
    )
    from henjou_tpu.accel.sorting import make_bitonic_sorted_intersector
    from henjou_tpu.bsdf.dispatch import bsdf_eval, bsdf_pdf, make_bsdf_sampler
    from henjou_tpu.integrator.payload import Sky
    from henjou_tpu.integrator.wavefront import wavefront_render
    from henjou_tpu.runtime.camera import make_camera

    which = sys.argv[1] if len(sys.argv) > 1 else "scale"
    frame, width, height = build_scene(which)
    pc = pack_binned_np(np.asarray(frame.tri_verts))
    print(
        f"scene={which} tris={frame.tri_verts.shape[0]} "
        f"clusters={pc.num_clusters} group={pc.group}", flush=True,
    )
    sky = Sky(constant_color=jnp.asarray([0.3, 0.4, 0.55]),
              intensity=jnp.asarray(1.0))
    cam = (
        make_camera((0.0, 1.2, -9.0), (0.0, -0.05, 1.0), np.radians(45.0))
        if which == "gallery"
        else make_camera((0.0, 6.0, -16.5), (0.0, -0.28, 1.0), np.radians(40.0))
    )
    bs = make_bsdf_sampler(None)
    beval = lambda h, wo, wi: bsdf_eval(h, wo, wi, None)

    ifn_r, ofn_r = make_binned_intersector(pc)
    ifn, ofn = make_bitonic_sorted_intersector(
        ifn_r, ofn_r, pc.scene_lo, pc.scene_hi
    )

    def fake_isect(tri, o, d, tn, tx):
        r = o.shape[0]
        alive = tx > tn
        return (
            jnp.where(alive, 1.0, jnp.inf),
            jnp.where(alive, 7, -1),  # prim 7: some non-light triangle
            jnp.full((r,), 0.3, jnp.float32),
            jnp.full((r,), 0.3, jnp.float32),
            alive,
        )

    def fake_occl(tri, o, d, tn, tx):
        return jnp.zeros((o.shape[0],), bool)

    def run_cfg(name, i_fn, o_fn, w=None, h=None):
        w = w or width
        h = h or height
        t = {}
        for iters in (3, 9):
            @jax.jit
            def run():
                return wavefront_render(
                    frame, sky, cam, w, h, 16, bs,
                    bsdf_eval=beval, bsdf_pdf=bsdf_pdf, integrator="mis",
                    seed=7, lanes=1 << 16, max_depth=10,
                    intersect_fn=i_fn, occluded_fn=o_fn, max_iters=iters,
                )
            film = run()
            jax.block_until_ready(film.color)
            t0 = time.perf_counter()
            for _ in range(3):
                film = run()
            jax.block_until_ready(film.color)
            t[iters] = (time.perf_counter() - t0) / 3
        ms = (t[9] - t[3]) / 6 * 1e3
        print(f"{name:44s} {ms:8.2f} ms/iter", flush=True)
        return ms

    full = run_cfg("full (sorted radiance + sorted occl)", ifn, ofn)
    no_occ = run_cfg("fake occlusion (radiance kernel + rest)", ifn, fake_occl)
    floor = run_cfg("fake both (shading/sorts-on-fakes floor)", fake_isect, fake_occl)
    floor_small = run_cfg(
        "fake both @512x512 film", fake_isect, fake_occl, 512, 512
    )
    print(f"=> radiance+rsorts ~= {no_occ - floor:.2f} ms, "
          f"occl+osorts ~= {full - no_occ:.2f} ms, floor ~= {floor:.2f} ms "
          f"(of which film-size {floor - floor_small:.2f})", flush=True)


if __name__ == "__main__":
    main()
