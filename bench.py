"""Benchmark: Mrays/s on the flagship path-tracing step (real TPU).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

Baseline target: >= 150 Mrays/s on one v5e chip (BASELINE.md). Rays are
counted like the reference's operating envelope (SURVEY.md §6): every
closest-hit or shadow trace is one ray; MIS issues 3 traces/bounce.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MRAYS = 150.0


def main():
    from henjou_tpu.accel.pallas_cluster_hbm import (
        make_pallas_hbm_intersector as make_pallas_intersector,
        pack_clusters_hbm as pack_clusters,
    )
    from henjou_tpu.integrator.mis import mis
    from henjou_tpu.integrator.payload import Sky
    from henjou_tpu.runtime.camera import camera_rays, make_camera
    from henjou_tpu.sampling.cmj import make_cmj_state
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import sphere_gallery_scene

    dev = build_device_scene(sphere_gallery_scene())
    frame = jax.jit(build_frame_scene)(dev, None, None)
    pc = pack_clusters(frame.tri_verts)  # eager: jitted build miscompiles on axon
    intersect_fn, occluded_fn = make_pallas_intersector(pc)
    sky = Sky(
        constant_color=jnp.asarray([0.3, 0.4, 0.55]), intensity=jnp.asarray(1.0)
    )
    cam = make_camera((0.0, 1.2, -9.0), (0.0, -0.05, 1.0), np.radians(45.0))

    width = height = 512
    lanes = width * height
    max_depth = 10

    from henjou_tpu.runtime.renderer import _swizzled_pixel_order

    pix_order = jnp.asarray(_swizzled_pixel_order(width, height))

    @jax.jit
    def step(spp_idx):
        pix = pix_order
        st = make_cmj_state(
            jnp.broadcast_to(spp_idx.astype(jnp.uint32), (lanes,)), pix, 7
        )
        o, d, st = camera_rays(cam, width, height, pix, st)
        res = mis(
            frame, sky, o, d, st,
            intersect_fn=intersect_fn, occluded_fn=occluded_fn,
            max_depth=max_depth,
        )
        return res.lte, res.n_traces

    # Ray accounting: the integrators COUNT their traces (radiance per live
    # lane, +shadow +bsdf-branch per shaded bounce — rt.h:304,356,396); the
    # reported Mrays/s is measured work, not an assumed average depth.

    # warmup/compile
    out, n_traces = step(jnp.uint32(0))
    out.block_until_ready()
    t0 = time.perf_counter()
    reps = 4
    total_traces = 0.0
    for k in range(reps):
        out, n_traces = step(jnp.uint32(k + 1))
    out.block_until_ready()
    dt_total = time.perf_counter() - t0
    dt = dt_total / reps
    # trace count is per-spp-step; steps differ only in RR draws, so one
    # step's count stands in for each (verified stable to <1% across spp)
    total_traces = float(n_traces) * reps

    mrays = total_traces / dt_total / 1e6
    spp_per_s = reps / dt_total
    print(
        json.dumps(
            {
                "metric": "mis_gallery_512px_mrays_per_s_per_chip",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
            }
        )
    )
    print(
        f"# config#2 detail: {spp_per_s:.3f} spp/s at 512x512, "
        f"{float(n_traces)/1e6:.2f} Mtraces/spp, {dt:.3f} s/spp-step",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
