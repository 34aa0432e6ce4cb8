"""Round-3 perf experiment matrix on the real TPU.

Measures the MARGINAL MIS iteration cost inside the real wavefront
engine ((engine @ max_iters=9) - (engine @ max_iters=3)) / 6 — the only
timing methodology that survived round 2 (standalone jit calls carry
0.5-3 ms of tunnel dispatch; see BASELINE.md profiling lesson) — across
the round-3 candidate configurations:

  variant:  pertrace (bitonic sort+unsort around each trace; r2 default)
            pool     (one whole-pool bitonic per bounce, raw kernels)
  ray_tile: 256 (r2 default) / 128 / 64  — finer tiles = shorter
            per-tile worklists (culling quality) at more scalar overhead
  lanes:    64k / 128k / 256k — pool width amortization (VERDICT #10)

Usage: python tools/perf_matrix.py [gallery|scale] [quick]
Writes one line per config: name, marginal iter ms, derived Mrays/s.
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


def build_scene(which: str):
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import sphere_gallery_scene

    if which == "gallery":
        dev = build_device_scene(sphere_gallery_scene())
        width = height = 512
    elif which == "million":  # VERDICT r2 #7: the >512-cluster regime at 1M tris
        from tools.scale_test import big_scene

        dev = build_device_scene(big_scene(lat=527, lon=950))
        width, height = 1920, 1080
    else:  # scale: the config-#5 contest scene (~255k tris)
        from henjou_tpu.scene.testscenes import rtcamp_scene

        dev = build_device_scene(rtcamp_scene())
        width, height = 1920, 1080
    frame = jax.jit(build_frame_scene)(dev, None, None)
    return frame, width, height


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "gallery"
    quick = "quick" in sys.argv[2:]

    from henjou_tpu.accel.pallas_binned import (
        make_binned_intersector,
        pack_binned_np,
    )
    from henjou_tpu.accel.sorting import (
        make_bitonic_sorted_intersector,
        ray_sort_key,
    )
    from henjou_tpu.bsdf.dispatch import bsdf_eval, bsdf_pdf, make_bsdf_sampler
    from henjou_tpu.integrator.payload import Sky
    from henjou_tpu.integrator.wavefront import wavefront_render
    from henjou_tpu.runtime.camera import make_camera

    frame, width, height = build_scene(which)
    pc = pack_binned_np(np.asarray(frame.tri_verts))
    print(
        f"scene={which} tris={frame.tri_verts.shape[0]} "
        f"clusters={pc.num_clusters} group={pc.group}",
        flush=True,
    )
    sky = Sky(
        constant_color=jnp.asarray([0.3, 0.4, 0.55]), intensity=jnp.asarray(1.0)
    )
    if which == "gallery":
        cam = make_camera((0.0, 1.2, -9.0), (0.0, -0.05, 1.0), np.radians(45.0))
    elif which == "million":
        cam = make_camera((0.0, 2.0, -6.0), (0.0, -0.1, 1.0), np.radians(45.0))
    else:
        cam = make_camera((0.0, 6.0, -16.5), (0.0, -0.28, 1.0), np.radians(40.0))
    bs = make_bsdf_sampler(None)
    beval = lambda h, wo, wi: bsdf_eval(h, wo, wi, None)

    lo = pc.scene_lo
    inv_extent = 1.0 / jnp.maximum(pc.scene_hi - lo, 1e-12)

    def pool_key(o, d):
        return ray_sort_key(o, d, lo, inv_extent)

    def make_run(variant, ray_tile, lanes, max_iters, pixel_count=None,
                 subtiles=0):
        ifn, ofn = make_binned_intersector(
            pc, ray_tile=ray_tile, subtiles=subtiles
        )
        pk = None
        if variant == "pertrace":
            ifn, ofn = make_bitonic_sorted_intersector(
                ifn, ofn, pc.scene_lo, pc.scene_hi
            )
        elif variant == "occlraw":
            # per-trace sort on the radiance trace only; occlusion
            # queries go in engine order (costs kernel time, saves 4 of
            # 6 bitonic sorts)
            ifn, _ = make_bitonic_sorted_intersector(
                ifn, ofn, pc.scene_lo, pc.scene_hi
            )
        elif variant == "hybrid":
            # pool sort makes the RADIANCE trace coherent for free (no
            # inverse permutation); the occlusion queries keep their own
            # per-trace sort (their directions — toward lights — differ
            # from the pool order, which is why full-pool regressed in r2)
            _, ofn = make_bitonic_sorted_intersector(
                ifn, ofn, pc.scene_lo, pc.scene_hi
            )
            pk = pool_key
        else:
            pk = pool_key

        @jax.jit
        def run():
            return wavefront_render(
                frame, sky, cam, width, height, 16, bs,
                bsdf_eval=beval, bsdf_pdf=bsdf_pdf, integrator="mis",
                seed=7, lanes=lanes, max_depth=10,
                intersect_fn=ifn, occluded_fn=ofn, pool_key_fn=pk,
                max_iters=max_iters, pixel_count=pixel_count,
            )

        return run

    def marginal(variant, ray_tile, lanes, pixel_count=None, subtiles=0):
        t = {}
        tr = {}
        # "steady": marginal cost of LATE iterations (pool dominated by
        # incoherent bounce rays + refilled mixtures) — the early 3->9
        # window is all-coherent camera rays and understated the contest
        # scene 10x (15 ms/iter early vs ~149 ms/iter measured over a
        # full 16-spp render, BASELINE round-3)
        spans = (60, 120) if "steady" in sys.argv[2:] else (3, 9)
        for iters in spans:
            run = make_run(variant, ray_tile, lanes, iters, pixel_count,
                           subtiles)
            film = run()
            jax.block_until_ready(film.color)  # compile
            reps = 2 if quick else 4
            t0 = time.perf_counter()
            for _ in range(reps):
                film = run()
            jax.block_until_ready(film.color)
            t[iters] = (time.perf_counter() - t0) / reps
            tr[iters] = float(film.n_traces)
        lo_i, hi_i = spans
        iter_ms = (t[hi_i] - t[lo_i]) / (hi_i - lo_i) * 1e3
        # traces per marginal iteration -> honest Mrays/s at this cost
        tr_per_iter = (tr[hi_i] - tr[lo_i]) / (hi_i - lo_i)
        mrays = tr_per_iter / (iter_ms * 1e-3) / 1e6 if iter_ms > 0 else 0
        print(
            f"{variant:9s} rt={ray_tile:4d} st={subtiles} lanes={lanes >> 10:4d}k : "
            f"{iter_ms:7.2f} ms/iter  {tr_per_iter/1e3:7.0f} ktraces/iter "
            f"-> {mrays:6.2f} Mrays/s",
            flush=True,
        )
        return iter_ms, mrays

    configs = [
        ("pertrace", 256, 1 << 16),  # round-2 baseline
        ("pool", 256, 1 << 16),
        ("hybrid", 256, 1 << 16),
        ("pertrace", 128, 1 << 16),
        ("pertrace", 64, 1 << 16),
        ("pertrace", 256, 1 << 17),
        ("pertrace", 256, 1 << 18),
    ]
    if "occlraw" in sys.argv[2:]:
        configs = [("occlraw", 256, 1 << 16)]
    if "subt1" in sys.argv[2:]:
        # disable subtile bits/gating entirely (the pre-exact-union
        # small-scene path): is the nibble machinery pure overhead at
        # tiny cluster counts?
        configs = [("pertrace", 256, 1 << 16, None, 1)]
    if "subtsweep" in sys.argv[2:]:
        # subtile-granular cluster bits at fixed rt=256. CPU culling
        # oracle (exp_sortkey): vs subt=4, subt=8 cuts MT work ~31% and
        # subt=16 ~50% — measure the engine-level marginal iteration.
        configs = [
            ("pertrace", 256, 1 << 16, None, 8),
            ("pertrace", 256, 1 << 16, None, 16),
        ]
    if "rtsweep" in sys.argv[2:]:
        # culling quality vs program overhead, post-exact-union prepass:
        # smaller tiles now BUY something at contest scale (exact 8-ray
        # union needs 46 clusters vs 820 at 256; tools/exp_exact_union)
        configs = [
            ("pertrace", 256, 1 << 16),
            ("pertrace", 128, 1 << 16),
            ("pertrace", 64, 1 << 16),
        ]
    if "chunked" in sys.argv[2:]:
        # film-size-cliff fix: same engine, film = 1/8 of 1080p
        configs = [("pertrace", 256, 1 << 16, width * height // 8)]
    if "big" in sys.argv[2:]:
        # measured 2026-08-17: rt<256 loses to per-program overhead; test
        # the other direction (fewer, fatter programs)
        configs = [
            ("pertrace", 512, 1 << 16),
            ("pertrace", 1024, 1 << 16),
        ]
    if quick:
        configs = configs[:1]
    for cfg in configs:
        try:
            marginal(*cfg)
        except Exception as e:  # keep the matrix going past one bad config
            print(f"{cfg}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
