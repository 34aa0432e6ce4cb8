"""Minimal repro hunt for axon miscompile #1.

Round-1 bisection: a jitted program whose multi-iteration loop consumes
scene arrays passed as JIT ARGUMENTS computes wrong results on the 'axon'
TPU backend; identical code with the arrays closed over is correct
(renderer.py closure_mode workaround). This script tries progressively
closer approximations of the renderer's step to find the smallest program
where arg-mode != closure-mode, comparing both against CPU.

Run on the TPU. Prints PASS/FAIL per candidate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 4096  # lanes
T = 2000  # "triangles"


def check(name, make_fn, args):
    """make_fn(closure: bool) -> fn; compare arg-mode vs closure-mode."""
    f_arg = jax.jit(make_fn(False))
    f_clo = jax.jit(make_fn(True))
    a = np.asarray(f_arg(*args))
    c = np.asarray(f_clo(*[a for a in args[:0]]))  # closure takes no args
    ok = np.allclose(a, c, rtol=1e-5, atol=1e-6)
    status = "PASS (agree)" if ok else "FAIL (ARG-MODE DIVERGES)"
    print(f"{name:58s} {status}", flush=True)
    if not ok:
        bad = ~np.isclose(a, c, rtol=1e-5, atol=1e-6)
        print(f"  mismatch frac={bad.mean():.4f} "
              f"max|d|={np.abs(a - c).max():.3e}", flush=True)
    return ok


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    tri = jnp.asarray(rng.normal(size=(T, 3, 3)).astype(np.float32))
    rows = jnp.asarray(rng.normal(size=(T, 24)).astype(np.float32))
    o0 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    d0 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))

    # 1. gather-in-loop: indices derived from carried state
    def mk_gather(closure):
        arr = rows

        def f_c():
            def body(i, carry):
                o, acc = carry
                idx = (jnp.abs(o[:, 0]) * 100).astype(jnp.int32) % T
                r = arr[idx]
                o = o * 0.9 + r[:, :3] * 0.01
                return (o, acc + r[:, 3])

            o, acc = jax.lax.fori_loop(0, 4, body, (o0, jnp.zeros(N)))
            return acc

        def f_a(arr_in):
            def body(i, carry):
                o, acc = carry
                idx = (jnp.abs(o[:, 0]) * 100).astype(jnp.int32) % T
                r = arr_in[idx]
                o = o * 0.9 + r[:, :3] * 0.01
                return (o, acc + r[:, 3])

            o, acc = jax.lax.fori_loop(0, 4, body, (o0, jnp.zeros(N)))
            return acc

        return f_c if closure else f_a

    check("gather rows by carried idx, fori x4", mk_gather, (rows,))

    # 2. bruteforce-intersect-like: full [N,T] reduction each iteration
    def mk_reduce(closure):
        arr = tri

        def step(a, o, d):
            v0 = a[:, 0]
            # [N, T] distances, argmin -> data-dependent gather
            dist = jnp.sum(
                (o[:, None, :] - v0[None, :, :]) * d[:, None, :], axis=-1
            )
            best = jnp.argmin(jnp.abs(dist), axis=1)
            hitp = a[best, 1]
            return o * 0.95 + hitp * 0.01, jnp.min(jnp.abs(dist), axis=1)

        def f_c():
            def body(i, carry):
                o, acc = carry
                o, t = step(arr, o, d0)
                return (o, acc + t)

            return jax.lax.fori_loop(0, 3, body, (o0, jnp.zeros(N)))[1]

        def f_a(a_in):
            def body(i, carry):
                o, acc = carry
                o, t = step(a_in, o, d0)
                return (o, acc + t)

            return jax.lax.fori_loop(0, 3, body, (o0, jnp.zeros(N)))[1]

        return f_c if closure else f_a

    check("argmin-gather [N,T] reduce, fori x3", mk_reduce, (tri,))

    # 3. the real thing at small scale: MIS step on the cornell scene,
    # frame scene as argument vs closed over
    from henjou_tpu.bsdf.dispatch import make_bsdf_sampler, bsdf_eval, bsdf_pdf
    from henjou_tpu.integrator.mis import mis
    from henjou_tpu.integrator.payload import Sky
    from henjou_tpu.runtime.camera import camera_rays, make_camera
    from henjou_tpu.sampling.cmj import make_cmj_state
    from henjou_tpu.scene.scenedata import build_device_scene, build_frame_scene
    from henjou_tpu.scene.testscenes import cornell_box_scene

    dev = build_device_scene(cornell_box_scene())
    frame = jax.jit(build_frame_scene)(dev, None, None)
    sky = Sky(constant_color=jnp.zeros(3), intensity=jnp.asarray(1.0))
    cam = make_camera((0, 0, -4.5), (0, 0, 1), np.radians(45.0))
    bsdf_sample = make_bsdf_sampler(None)
    beval = lambda h, wo, wi: bsdf_eval(h, wo, wi, None)
    pixn = 32 * 32
    pix = jnp.arange(pixn, dtype=jnp.uint32)

    def mis_step(fr, spp_i):
        st = make_cmj_state(jnp.full(pixn, spp_i, jnp.uint32), pix, 0)
        o, d, st = camera_rays(cam, 32, 32, pix, st)
        return mis(fr, sky, o, d, st, bsdf_sample, beval, bsdf_pdf).lte

    def mk_mis(closure):
        if closure:
            return lambda: mis_step(frame, 1)
        return lambda fr: mis_step(fr, 1)

    f_arg = jax.jit(mk_mis(False))
    f_clo = jax.jit(mk_mis(True))
    a = np.asarray(f_arg(frame))
    c = np.asarray(f_clo())
    ok = np.allclose(a, c, rtol=1e-5, atol=1e-6)
    print(f"{'full MIS step, frame_scene arg vs closure':58s} "
          f"{'PASS (agree)' if ok else 'FAIL (ARG-MODE DIVERGES)'}", flush=True)
    if not ok:
        bad = ~np.isclose(a, c, rtol=1e-5, atol=1e-6)
        print(f"  mismatch frac={bad.mean():.4f} "
              f"max|d|={np.abs(a - c).max():.3e}", flush=True)
        # bisect which leaves matter: pass SOME leaves as args
        leaves, treedef = jax.tree_util.tree_flatten(frame)
        for li in range(len(leaves)):
            def mk(li=li):
                def f(leaf):
                    ls = list(leaves)
                    ls[li] = leaf
                    return mis_step(jax.tree_util.tree_unflatten(treedef, ls), 1)
                return f
            av = np.asarray(jax.jit(mk())(leaves[li]))
            okl = np.allclose(av, c, rtol=1e-5, atol=1e-6)
            if not okl:
                print(f"  leaf {li} as arg -> DIVERGES "
                      f"shape={leaves[li].shape}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
