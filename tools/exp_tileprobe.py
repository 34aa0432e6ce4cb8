"""Validate the build-time ray_tile micro-probe (round-4 VERDICT #8).

The former hand-gate encoded: gallery (group=1) -> 256, contest
(1,991 clusters group=16) -> 512, 1M tris (7,808 clusters) -> 256.
"Done" criterion: the probe reproduces all three choices from
measurement alone, with sub-second warm probe cost.

Usage: python tools/exp_tileprobe.py  (real TPU)
"""

from __future__ import annotations

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import numpy as np

logging.basicConfig(level=logging.INFO, format="[%(levelname).1s] %(message)s")


def main():
    from henjou_tpu.accel.pallas_binned import (
        _RAY_TILE_PROBE_CACHE,
        pack_binned_np,
        probe_ray_tile,
    )
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import rtcamp_scene, sphere_gallery_scene

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_test import big_scene

    scenes = [
        ("gallery", sphere_gallery_scene()),
        ("contest", rtcamp_scene()),
        ("1M", big_scene(lat=500, lon=1000)),
    ]
    expect = {"gallery": 256, "contest": 512, "1M": 256}
    for name, scene in scenes:
        dev = build_device_scene(scene)
        frame = jax.jit(build_frame_scene)(dev, None, None)
        pc = pack_binned_np(np.asarray(frame.tri_verts))
        t0 = time.monotonic()
        rt = probe_ray_tile(pc)
        cold_s = time.monotonic() - t0
        # second call must hit the in-process cache; a fresh-process
        # probe re-times but reuses the persistent compile cache, so
        # re-probe cost is the warm figure
        _RAY_TILE_PROBE_CACHE.clear()
        t0 = time.monotonic()
        rt2 = probe_ray_tile(pc)
        warm_s = time.monotonic() - t0
        tris = int(frame.tri_verts.shape[0])
        print(
            f"{name:8s} {tris:8d} tris, {pc.num_clusters:5d} clusters "
            f"group={pc.group:2d}: probe -> rt={rt} "
            f"(cold {cold_s:.1f}s, warm {warm_s:.2f}s; gate said "
            f"{expect[name]}, agree={rt == rt2 == expect[name]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
