"""Wavefront-engine component costs on the real TPU.

Round 1 measured the refill wavefront at 207 ms/iteration vs the masked
loop's ~36 ms per bounce — 6x worse per lane. This isolates the suspects:
film scatter-add (duplicate-index scatter can serialize on TPU), the
refill cumsum, the spawn path, and raw while_loop overhead.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LANES = 1 << 16
PIXELS = 512 * 288


def timeit(name, fn, *args, reps=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:10.3f} ms", flush=True)
    return dt


def main():
    from henjou_tpu.runtime.camera import camera_rays, make_camera
    from henjou_tpu.sampling.cmj import make_cmj_state

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.integers(0, PIXELS, LANES).astype(np.uint32))
    vals = jnp.asarray(rng.normal(size=(LANES, 3)).astype(np.float32))
    film = jnp.zeros((PIXELS, 3), jnp.float32)
    done = jnp.asarray(rng.random(LANES) < 0.3)

    timeit("scatter-add dup idx mode=drop [64k->147k]", jax.jit(
        lambda f, p, v: f.at[p].add(v, mode="drop")), film, pix, vals)
    timeit("scatter-add x3 (color+albedo+normal)", jax.jit(
        lambda f, p, v: (f.at[p].add(v, mode="drop"),
                         f.at[p].add(v * 2, mode="drop"),
                         f.at[p].add(v * 3, mode="drop"))), film, pix, vals)
    timeit("sorted segment-sum equivalent", jax.jit(
        lambda f, p, v: f.at[jnp.sort(p)].add(v, mode="drop")), film, pix, vals)
    timeit("cumsum 64k bool", jax.jit(
        lambda d: jnp.cumsum(d.astype(jnp.int32))), done)

    cam = make_camera((0.0, 1.2, -9.0), (0.0, -0.05, 1.0), np.radians(45.0))

    def spawn(ids):
        p = (ids % PIXELS).astype(jnp.uint32)
        st = make_cmj_state((ids // PIXELS).astype(jnp.uint32), p, 7)
        o, d, st = camera_rays(cam, 512, 288, p, st)
        return o, d

    ids = jnp.arange(LANES, dtype=jnp.uint32)
    timeit("spawn (cmj init + camera rays) 64k", jax.jit(spawn), ids)

    # while_loop fixed-iteration overhead with a big carry
    carry = (vals, vals * 2, pix, done, jnp.zeros((), jnp.int32))

    def wl(c):
        def body(c):
            a, b, p, d, i = c
            return (a + 1.0, b * 0.999, p, d, i + 1)
        return jax.lax.while_loop(lambda c: c[4] < 100, body, c)

    dt = timeit("while_loop 100 trivial iters (64k carry)", jax.jit(wl), carry)
    print(f"  -> {dt*1e3/100:.3f} ms/iter", flush=True)

    def fl(c):
        def body(i, c):
            a, b, p, d, _ = c
            return (a + 1.0, b * 0.999, p, d, i)
        return jax.lax.fori_loop(0, 100, body, c)

    dt = timeit("fori_loop 100 trivial iters (64k carry)", jax.jit(fl), carry)
    print(f"  -> {dt*1e3/100:.3f} ms/iter", flush=True)

    # while_loop whose body includes ONE scatter-add: the suspected killer
    def wl_scatter(c):
        def body(c):
            a, b, p, d, i = c
            f = film.at[p].add(a, mode="drop")
            return (a + f[:LANES % PIXELS or 1].mean(), b, p, d, i + 1)
        return jax.lax.while_loop(lambda c: c[4] < 20, body, c)

    dt = timeit("while_loop 20 iters w/ scatter-add", jax.jit(wl_scatter), carry,
                reps=3)
    print(f"  -> {dt*1e3/20:.3f} ms/iter", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
