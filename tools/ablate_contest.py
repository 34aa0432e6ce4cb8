"""Steady-state iteration decomposition at contest scale (real TPU).

Marginal cost of iterations 60->120 of the real MIS wavefront engine on
the rtcamp scene (64k lanes, chunked 262k-px film like the renderer),
under component swaps:

  full        sorted per-trace wrappers, subt=auto(4)    <- production
  subt1/8     subtile-bit granularity ablation
  fake-isect  O(1) intersector everywhere  = engine + shading + film
  fake-occl   real radiance, O(1) occlusion = radiance-kernel share

Prints one line each; differences attribute the budget.
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
    from henjou_tpu.scene.testscenes import rtcamp_scene

    dev = build_device_scene(rtcamp_scene())
    frame = jax.jit(build_frame_scene)(dev, None, None)
    pc = pack_binned_np(np.asarray(frame.tri_verts))
    print(f"tris={frame.tri_verts.shape[0]} clusters={pc.num_clusters}",
          flush=True)
    sky = Sky(constant_color=jnp.asarray([0.3, 0.4, 0.55]),
              intensity=jnp.asarray(1.0))
    cam = make_camera((0.0, 6.0, -16.5), (0.0, -0.28, 1.0), np.radians(40.0))
    bs = make_bsdf_sampler(None)
    beval = lambda h, wo, wi: bsdf_eval(h, wo, wi, None)

    def fake_ifn(tri_verts, o, d, tmin, tmax=1e9):
        n = o.shape[0]
        t = jnp.full((n,), jnp.inf, jnp.float32) + 0.0 * o[:, 0]
        return t, jnp.full((n,), -1, jnp.int32), t * 0, t * 0, t < 0

    def fake_ofn(tri_verts, o, d, tmin, tmax):
        return jnp.zeros((o.shape[0],), bool) | (o[:, 0] < -1e30)

    def make(kind, subtiles=0, mis_single=False, rt=256):
        ifn, ofn = make_binned_intersector(pc, subtiles=subtiles, ray_tile=rt)
        sifn, sofn = make_bitonic_sorted_intersector(
            ifn, ofn, pc.scene_lo, pc.scene_hi
        )
        if kind == "fake-isect":
            sifn, sofn = fake_ifn, fake_ofn
        elif kind == "fake-occl":
            sofn = fake_ofn

        def run(n_it):
            @jax.jit
            def r():
                return wavefront_render(
                    frame, sky, cam, 1920, 1080, 16, bs, bsdf_eval=beval,
                    bsdf_pdf=bsdf_pdf, integrator="mis", seed=7,
                    lanes=1 << 16, max_depth=10, intersect_fn=sifn,
                    occluded_fn=sofn, max_iters=n_it,
                    mis_single=mis_single,
                    # mid-image chunk: base=0 is the sky-only top band
                    # (paths die at depth 1 -> 1.8 ms/iter, useless)
                    pixel_base=jnp.uint32(4 * 262144),
                    pixel_count=262144,
                )
            return r

        return run

    def marginal(name, kind, subtiles=0, mis_single=False, rt=256):
        mk = make(kind, subtiles, mis_single, rt)
        t, tr = {}, {}
        for it in (60, 120):
            r = mk(it)
            out = r()
            jax.block_until_ready(out.color)
            tr[it] = float(out.n_traces)
            t0 = time.perf_counter()
            for _ in range(2):
                out = r()
            jax.block_until_ready(out.color)
            t[it] = (time.perf_counter() - t0) / 2
        ms = (t[120] - t[60]) / 60 * 1e3
        ktr = (tr[120] - tr[60]) / 60 / 1e3
        print(f"{name:24s} {ms:8.2f} ms/iter  {ktr:6.1f} ktraces/iter "
              f"({ktr / ms:5.2f} Mrays/s)", flush=True)
        return ms

    only = sys.argv[1] if len(sys.argv) > 1 else None
    todo = {
        "full": lambda: marginal("full (subt=auto4)", "full"),
        "mis-single": lambda: marginal("mis-single", "full", mis_single=True),
        "subt1": lambda: marginal("subt=1", "full", subtiles=1),
        "subt8": lambda: marginal("subt=8", "full", subtiles=8),
        "fake-isect": lambda: marginal("fake-isect", "fake-isect"),
        "fake-occl": lambda: marginal("fake-occl", "fake-occl"),
        "single-fake-occl": lambda: marginal(
            "single-fake-occl", "fake-occl", mis_single=True
        ),
        "single-rt512": lambda: marginal(
            "single-rt512", "full", mis_single=True, rt=512
        ),
    }
    if only:
        for k in only.split(","):
            todo[k]()
    else:
        for f in todo.values():
            f()


if __name__ == "__main__":
    main()
