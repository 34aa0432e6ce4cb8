"""Roofline ingredients for BASELINE.md round-4: engine-iteration cost
decomposition on the GALLERY bench workload (the headline metric's
scene), marginal iters 60->120 like bench.py's steady state.

Variants:
  full         production (ref two-sample estimator, like bench.py)
  single       production one-sample MIS (the product default)
  fake-isect   O(1) closest hit + O(1) occlusion  = engine+shading+film
               +sorts floor -> the INTERSECTION-FREE engine ceiling
  fake-occl    real radiance walks, O(1) occlusion

The fake-isect number bounds what ANY intersection speedup can buy the
bench: Mrays/s_ceiling = traces/iter / fake_isect_ms.
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
    from henjou_tpu.accel.pallas_binned import (
        make_binned_intersector,
        pack_binned_np,
    )
    from henjou_tpu.accel.sorting import make_bitonic_sorted_intersector
    from henjou_tpu.bsdf.dispatch import bsdf_eval, bsdf_pdf, make_bsdf_sampler
    from henjou_tpu.integrator.payload import Sky
    from henjou_tpu.integrator.wavefront import wavefront_render
    from henjou_tpu.runtime.camera import make_camera
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import sphere_gallery_scene

    kk = 128
    if "--k" in sys.argv:
        kk = int(sys.argv[sys.argv.index("--k") + 1])
    dev = build_device_scene(sphere_gallery_scene())
    frame = jax.jit(build_frame_scene)(dev, None, None)
    pc = pack_binned_np(np.asarray(frame.tri_verts), k=kk)
    print(f"gallery: tris={frame.tri_verts.shape[0]} k={kk} "
          f"clusters={pc.num_clusters}", flush=True)
    sky = Sky(constant_color=jnp.asarray([0.3, 0.4, 0.55]),
              intensity=jnp.asarray(1.0))
    cam = make_camera((0.0, 1.2, -9.0), (0.0, -0.05, 1.0), np.radians(45.0))
    bs = make_bsdf_sampler(None)
    beval = lambda h, wo, wi: bsdf_eval(h, wo, wi, None)

    def fake_ifn(tri_verts, o, d, tmin, tmax=1e9):
        n = o.shape[0]
        t = jnp.full((n,), jnp.inf, jnp.float32) + 0.0 * o[:, 0]
        return t, jnp.full((n,), -1, jnp.int32), t * 0, t * 0, t < 0

    def fake_ofn(tri_verts, o, d, tmin, tmax):
        return jnp.zeros((o.shape[0],), bool) | (o[:, 0] < -1e30)

    def marginal(name, kind, mis_single=False):
        ifn, ofn = make_binned_intersector(pc)
        sifn, sofn = make_bitonic_sorted_intersector(
            ifn, ofn, pc.scene_lo, pc.scene_hi
        )
        if kind == "fake-isect":
            sifn, sofn = fake_ifn, fake_ofn
        elif kind == "fake-occl":
            sofn = fake_ofn

        def mk(n_it):
            @jax.jit
            def r():
                return wavefront_render(
                    frame, sky, cam, 512, 512, 16, bs, bsdf_eval=beval,
                    bsdf_pdf=bsdf_pdf, integrator="mis", seed=7,
                    lanes=1 << 16, max_depth=10, intersect_fn=sifn,
                    occluded_fn=sofn, max_iters=n_it,
                    mis_single=mis_single,
                )
            return r

        t, tr = {}, {}
        for it in (60, 120):
            r = mk(it)
            out = r()
            jax.block_until_ready(out.color)
            tr[it] = float(out.n_traces)
            t0 = time.perf_counter()
            for _ in range(3):
                out = r()
            jax.block_until_ready(out.color)
            t[it] = (time.perf_counter() - t0) / 3
        ms = (t[120] - t[60]) / 60 * 1e3
        ktr = (tr[120] - tr[60]) / 60 / 1e3
        print(f"{name:18s} {ms:8.2f} ms/iter  {ktr:6.1f} ktraces/iter "
              f"({ktr / ms:5.2f} Mrays/s)", flush=True)
        return ms, ktr

    only = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else None
    todo = {
        "full": lambda: marginal("full (ref)", "full"),
        "single": lambda: marginal("single", "full", mis_single=True),
        "fake-isect": lambda: marginal("fake-isect", "fake-isect"),
        "fake-occl": lambda: marginal("fake-occl", "fake-occl"),
    }
    for name, fn in todo.items():
        if only is None or only == name:
            fn()


if __name__ == "__main__":
    main()
