"""Why does the film scatter-add scale with FILM size, not update count?

Ablation (tools/ablate_scale.py, 2026-08-17) showed the wavefront
iteration pays ~6 ms/iter extra when the film is [2.07M, 9] vs
[262k, 9], with an identical 64k-lane update. This isolates the
scatter-add inside a while_loop (the engine's shape) and tests
candidate mechanisms/mitigations:

  - plain .at[pix].add(vals, mode="drop")      (engine today)
  - indices_are_sorted hint with presorted pix
  - accumulate into a [lanes*8, 10] staging ring, flush every 8 iters
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

LANES = 1 << 16


def timeit(name, fn, reps=4):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:56s} {dt*1e3:10.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    for pixels in (512 * 512, 1920 * 1080):
        pix = jnp.asarray(rng.integers(0, pixels, LANES).astype(np.uint32))
        pix_sorted = jnp.sort(pix)
        vals = jnp.asarray(rng.normal(size=(LANES, 9)).astype(np.float32))

        def loop(body):
            @jax.jit
            def run():
                film = jnp.zeros((pixels, 9), jnp.float32)

                def b(i, f):
                    return body(f, i)

                return jax.lax.fori_loop(0, 12, b, film)

            return run

        t1 = timeit(
            f"[{pixels:8d}] .at[pix].add drop x12",
            loop(lambda f, i: f.at[pix].add(vals + i, mode="drop")),
        )
        t2 = timeit(
            f"[{pixels:8d}] sorted pix + indices_are_sorted x12",
            loop(
                lambda f, i: f.at[pix_sorted].add(
                    vals + i, mode="drop", indices_are_sorted=True
                )
            ),
        )

        @jax.jit
        def staged():
            film = jnp.zeros((pixels, 9), jnp.float32)

            def outer(o, f):
                stage_v = jnp.zeros((8, LANES, 9), jnp.float32)
                stage_p = jnp.zeros((8, LANES), jnp.uint32)

                def inner(i, c):
                    sv, sp = c
                    sv = jax.lax.dynamic_update_index_in_dim(
                        sv, vals + i, i, 0
                    )
                    sp = jax.lax.dynamic_update_index_in_dim(sp, pix, i, 0)
                    return sv, sp

                sv, sp = jax.lax.fori_loop(0, 8, inner, (stage_v, stage_p))
                return f.at[sp.reshape(-1)].add(
                    sv.reshape(-1, 9), mode="drop"
                )

            # 12 iters ~= 1.5 flushes of 8: run 2 outers of 6 for shape
            def outer6(o, f):
                stage_v = jnp.zeros((6, LANES, 9), jnp.float32)
                stage_p = jnp.zeros((6, LANES), jnp.uint32)

                def inner(i, c):
                    sv, sp = c
                    sv = jax.lax.dynamic_update_index_in_dim(sv, vals + i, i, 0)
                    sp = jax.lax.dynamic_update_index_in_dim(sp, pix, i, 0)
                    return sv, sp

                sv, sp = jax.lax.fori_loop(0, 6, inner, (stage_v, stage_p))
                return f.at[sp.reshape(-1)].add(sv.reshape(-1, 9), mode="drop")

            return jax.lax.fori_loop(0, 2, outer6, film)

        t3 = timeit(f"[{pixels:8d}] stage 6 iters -> 1 flush, x2", staged)


if __name__ == "__main__":
    main()
