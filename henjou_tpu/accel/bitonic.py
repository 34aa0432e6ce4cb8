"""Pallas TPU bitonic sort that carries the ray payload through the network.

The sorted-intersector wrapper needs rays GROUPED into coherent kernel
tiles and results restored to lane order. Doing that with XLA primitives
costs ~8 ms per trace on a v5e (argsort ~4.8 ms + permutation gathers
~1 ms per field): TPU gathers are latency-bound row walks. A bitonic
network, by contrast, is pure dense vector work — every exchange at
XOR-distance d is two `pltpu.roll`s and a select — so the payload (ray
fields, lane ids) rides the network as [P, S, 128] i32 planes and no
inverse-permutation gathers are ever needed (carry lane ids and re-sort,
or — for the wavefront pool — don't restore order at all).

Layout: flat index i = sublane*128 + lane. Exchanges with d < 128 are
lane rolls; d >= 128 are sublane rolls by d/128. The select picks the
+d / -d neighbour per slot; the slot that selects the wrapped side of the
circular roll never exists (bit_d(i)=0 implies i+d stays in range), so
rolls implement the XOR pairing exactly. The substage schedule (j, k)
lives in SMEM, padded to a multiple of 4, and a `fori_loop` walks it 4
substages per step (static double-buffer parity; see _sort_kernel) with
dynamic-shift rolls — measured 0.19 us/substage on a v5e
(tools/exp_bitonic4.py), ~190x faster than the argsort+gather wrapper,
while a fully unrolled network takes >9 min of Mosaic compile time.

Reference counterpart: none — RT cores hide ray incoherence in hardware;
this is TPU-native scheduling machinery (SURVEY.md §7 hard part #1/#2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _substages(n: int):
    """Bitonic sort substage list [(k, j), ...] for power-of-two n."""
    out = []
    k = 2
    while k <= n:
        j = k >> 1
        while j >= 1:
            out.append((k, j))
            j >>= 1
        k <<= 1
    return out


def _sort_kernel(jk_ref, stack_ref, out_ref, buf_ref, *, n_sub: int, interpret: bool):
    """Double-buffered substage walk, unrolled 4 substages per fori_loop
    step so the ping-pong parity is STATIC (substage 4s+u reads out_ref
    when u is even, buf_ref when odd; n_sub % 4 == 0 is guaranteed by the
    caller's schedule padding, so the final state always lands in
    out_ref). j and k are traced scalars from SMEM; rolls use dynamic
    shifts (lane rolls for j < 128, sublane rolls for j >= 128)."""
    p, s, _ = stack_ref.shape
    i_mat = (
        jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 1)
    )

    out_ref[:] = stack_ref[:]

    def substage(j, k, src, dst, partner):
        low = (i_mat & j) == 0
        up = (i_mat & k) == 0
        take_min = (low & up) | (~low & ~up)

        key = src[0]
        pkey = partner(low, key)
        swap = (take_min & (key > pkey)) | (~take_min & (key < pkey))
        dst[0] = jnp.where(swap, pkey, key)
        for pi in range(1, p):
            v = src[pi]
            dst[pi] = jnp.where(swap, partner(low, v), v)

    def partner_lane(j):
        def f(low, x):
            return jnp.where(
                low,
                pltpu.roll(x, LANES - j, axis=1),
                pltpu.roll(x, j, axis=1),
            )

        return f

    def partner_sub(j):
        ds = j // LANES

        def f(low, x):
            return jnp.where(
                low,
                pltpu.roll(x, s - ds, axis=0),
                pltpu.roll(x, ds, axis=0),
            )

        return f

    # 4-substage unroll: the loop's scalar bookkeeping is a large cost
    # slice at ~0.2 us/substage, and with a fixed even unroll the
    # double-buffer parity becomes STATIC (sub = 4s+u, parity = parity
    # of u) so the even/odd pl.when guards disappear entirely
    assert n_sub % 4 == 0, n_sub

    def body(s4, _):
        for u in range(4):
            sub = s4 * 4 + u
            j = jk_ref[0, sub]
            k = jk_ref[1, sub]
            src, dst = (out_ref, buf_ref) if u % 2 == 0 else (buf_ref, out_ref)
            lane = j < LANES

            @pl.when(lane)
            def _(j=j, k=k, src=src, dst=dst):
                substage(j, k, src, dst, partner_lane(j))

            @pl.when(~lane)
            def _(j=j, k=k, src=src, dst=dst):
                substage(j, k, src, dst, partner_sub(j))

        return 0

    jax.lax.fori_loop(0, n_sub // 4, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort(key: jnp.ndarray, *planes: jnp.ndarray, interpret: bool = False):
    """Sort i32 `key` ascending, carrying `planes` (any 4-byte dtype)
    through the same permutation. All inputs are flat [n] with n a
    power-of-two multiple of 1024. Returns (sorted_key, *sorted_planes).

    Not stable; ties keep an arbitrary (but deterministic) order — the
    grouped-tile consumers only need equal keys adjacent. Keys must not
    have the sign bit set (sort on the i32 ordering).
    """
    n = key.shape[0]
    assert n % (8 * LANES) == 0 and (n & (n - 1)) == 0, n
    s = n // LANES
    subs = _substages(n)
    # pad the schedule to a multiple of 4 (the kernel unrolls 4 substages
    # per loop step with static ping-pong parity); a (k=n, j=1) pass is
    # an ascending compare-exchange on an already-sorted array = no-op
    while len(subs) % 4:
        subs.append((n, 1))
    # jk rows: [0]=j, [1]=k
    jk = jnp.asarray(
        np.asarray([[jj for _, jj in subs], [kk for kk, _ in subs]], np.int32)
    )

    def to_i32(x):
        if x.dtype == jnp.int32:
            return x
        assert x.dtype.itemsize == 4, x.dtype
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    stack = jnp.stack(
        [key.astype(jnp.int32).reshape(s, LANES)]
        + [to_i32(p).reshape(s, LANES) for p in planes]
    )
    kernel = functools.partial(
        _sort_kernel, n_sub=len(subs), interpret=interpret
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(stack.shape, jnp.int32),
        scratch_shapes=[pltpu.VMEM(stack.shape, jnp.int32)],
        interpret=interpret,
    )(jk, stack)

    def from_i32(x, dtype):
        if dtype == jnp.int32:
            return x
        return jax.lax.bitcast_convert_type(x, dtype)

    outs = [out[0].reshape(n)] + [
        from_i32(out[i + 1], p.dtype).reshape(n) for i, p in enumerate(planes)
    ]
    return tuple(outs)
