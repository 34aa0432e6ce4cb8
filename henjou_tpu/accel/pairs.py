"""Pair-compacted intersector: exact (ray, cluster) pairs, traced densely.

ARCHIVE — measured dead on this platform, not routed in production
(BASELINE.md round-3: contest closest 506 ms vs binned 47.4 ms; the
per-pair row re-gather and the compaction primitives each rival the
whole binned kernel). Kept as a tested ledger receipt; the production
kernel is accel/pallas_binned.py.

The binned kernel (pallas_binned.py) culls at 64-ray-subtile granularity:
on contest-scale bounce rays each 64-ray union needs ~294 of 1,991
clusters while each individual RAY's slab test passes only ~7.3
(tools/exp_pairs.py oracle) — a ~40x gap the kernel pays in dense MT
blocks, because gating below 64-ray granularity is scalar-bound on the
TPU (BASELINE.md round-3 subtile sweep: subt=8/16 regressed or OOMed).

This module moves the whole problem into XLA's dense domain instead:

  1. per-RAY slab test against every cluster AABB (pure VPU, chunked);
  2. `lax.top_k` per ray -> the exact list of needed cluster ids,
     t_enter-ascending;
  3. flat (ray, cluster) PAIR list via cumsum + searchsorted — no
     scatter, no scalar unit, static `pair_cap` bound;
  4. one fused dense Baldwin-Weber pass over the pairs: gather the
     cluster's 12 geometry planes ([P, 12, K] fused gather from a
     VMEM-resident table), evaluate K=128 triangles per pair,
     min-reduce to a per-pair best t;
  5. segment-min over pairs -> per-ray best t; the winning pair is the
     one whose per-pair t EQUALS the segment min (exact f32 equality —
     same values), recovered by a segment-max, and only the R winning
     pairs are re-evaluated to extract prim/u/v — the hot pass never
     materializes per-lane attributes.

Every MT block evaluated is one some ray actually needs: the dense-work
volume is sum(per-ray need) ~ 7.3*R at contest scale, vs ~294*R for the
64-ray-union kernel.

Exactness: rays whose slab-need count exceeds `kmax` (the top_k window)
or whose pairs were clipped by `pair_cap` are finished by residual
sweeps that re-run the pipeline on clusters with t_enter beyond the
processed window and below the current best t — the same near-to-far
window argument that makes the binned kernel's early exit exact.
Residual sweeps are bounded by `max_sweeps` (a window that keeps
overflowing degrades toward missing hits FARTHER than the best already
found; tests assert real scenes finish in one sweep).

Reference counterpart: OptiX GAS traversal (hardware per-ray BVH walks,
include/renderer/renderer.h:319-396) — per-ray-exact culling restored
on a lockstep vector machine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from henjou_tpu.accel.pallas_binned import BinnedClusters, K, _BIG, _scene_exit_t
from henjou_tpu.math.constants import TMAX_RAY

# ray-chunk for the [RB, C] slab/top_k stage (bounds the dense lattice)
RB = 8192


def _slab_chunk(amin, amax, o, d, tmin, tmax):
    """Exact per-ray slab intervals vs every cluster: (t_enter [rb, Cp],
    need [rb, Cp]). Axis-by-axis keeps intermediates 2-D."""
    tn = jnp.broadcast_to(tmin[:, None], (o.shape[0], amin.shape[1]))
    tf = jnp.broadcast_to(tmax[:, None], (o.shape[0], amin.shape[1]))
    for ax in range(3):
        da = d[:, ax : ax + 1]
        tiny = jnp.where(da >= 0.0, 1e-12, -1e-12)
        iv = 1.0 / jnp.where(jnp.abs(da) < 1e-12, tiny, da)
        t1 = (amin[ax][None, :] - o[:, ax : ax + 1]) * iv
        t2 = (amax[ax][None, :] - o[:, ax : ax + 1]) * iv
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
    return tn, tn <= tf


def _compact_pairs(bc, o, d, tmin, tmax, kmax, pair_cap, lo_t, lo_cid):
    """Stages 1-3: per-ray top-k needed clusters -> flat pair arrays.

    `(lo_t, lo_cid)` [R]: the processed window's far-edge CURSOR — only
    clusters LEXICOGRAPHICALLY beyond (t_enter, cid) count. The cid
    tiebreak matters: t_enter ties are pervasive (every cluster AABB
    containing the ray origin enters at exactly tmin), and a t-only
    strict threshold would skip unprocessed ties forever. lax.top_k
    breaks value ties toward the lower index, so the processed prefix
    is exactly the lexicographic window.
    Returns (pair_ray [P], pair_cid [P], pair_valid [P], cnt [R],
    kth [R], kc [R], clipped [R]): cnt is the remaining per-ray need
    count (cnt > kmax <=> top_k overflow), (kth, kc) the window's
    far-edge cursor (inf when unfilled), clipped marks rays whose pairs
    fell beyond pair_cap (their window was NOT evaluated)."""
    r = o.shape[0]
    ctot = bc.num_groups * bc.group
    amin, amax = bc.aabb[0:3], bc.aabb[3:6]
    ids_l, cnt_l, kth_l = [], [], []
    for s in range(0, r, RB):
        e = min(s + RB, r)
        tn, need = _slab_chunk(amin, amax, o[s:e], d[s:e], tmin[s:e], tmax[s:e])
        cid_row = jnp.arange(tn.shape[1], dtype=jnp.int32)[None, :]
        # pad AABB columns (inverted boxes min=_BIG/max=-_BIG) slab-test
        # as INFINITE boxes because the per-axis min/max re-sorts the
        # slabs — mask them explicitly so correctness doesn't ride on
        # out-of-bounds gather clamping and phantom clusters don't crowd
        # the top_k window / pair cap
        need = need & (cid_row < ctot)
        need = need & (
            (tn > lo_t[s:e, None])
            | ((tn == lo_t[s:e, None]) & (cid_row > lo_cid[s:e, None]))
        )
        val = jnp.where(need, tn, jnp.inf)
        neg, ids = jax.lax.top_k(-val, kmax)  # (t_enter, cid) ascending
        ids_l.append(jnp.where(jnp.isfinite(neg), ids, -1))
        cnt_l.append(jnp.sum(need, axis=1, dtype=jnp.int32))
        kth_l.append(-neg[:, -1])  # inf if the window wasn't filled
    ids = jnp.concatenate(ids_l) if len(ids_l) > 1 else ids_l[0]
    cnt = jnp.concatenate(cnt_l) if len(cnt_l) > 1 else cnt_l[0]
    kth = jnp.concatenate(kth_l) if len(kth_l) > 1 else kth_l[0]
    kc = ids[:, -1]  # -1 when the window wasn't filled

    cc = jnp.minimum(cnt, kmax)
    off = jnp.cumsum(cc) - cc  # exclusive
    clipped = off + cc > pair_cap
    p = jnp.arange(pair_cap, dtype=jnp.int32)
    pr = (
        jnp.searchsorted(off, p, side="right", method="scan_unrolled").astype(
            jnp.int32
        )
        - 1
    )
    pr = jnp.clip(pr, 0, r - 1)
    slot = p - off[pr]
    pvalid = (p < off[-1] + cc[-1]) & (slot < cc[pr])
    cid = ids[pr, jnp.clip(slot, 0, kmax - 1)]
    pvalid = pvalid & (cid >= 0)
    return pr, jnp.maximum(cid, 0), pvalid, cnt, kth, kc, clipped


def _pair_pass_a(rows3, pr, cid, pvalid, o, d, tmin, tmax, any_hit):
    """Stage 4: fused dense Baldwin-Weber over the pairs -> per-pair
    best t ([P] f32, _BIG when none), or per-pair hit flag for any_hit.
    Mirrors pallas_binned._kernel's mt_eval masks exactly (all-zero pad
    rows -> tt == 0 -> culled by tt > tmin with tmin clamped >= 0)."""
    rw = rows3[cid, :12]  # [P, 12, K] — fused gather (table is VMEM-size)
    ro, rd = o[pr], d[pr]
    tmn = tmin[pr][:, None]
    tmx = jnp.where(pvalid, tmax[pr], 0.0)[:, None]
    nd = rw[:, 0] * rd[:, 0:1] + rw[:, 1] * rd[:, 1:2] + rw[:, 2] * rd[:, 2:3]
    no = rw[:, 0] * ro[:, 0:1] + rw[:, 1] * ro[:, 1:2] + rw[:, 2] * ro[:, 2:3]
    inv_nd = jnp.where(jnp.abs(nd) > 1e-12, 1.0 / nd, 0.0)
    tt = (rw[:, 3] - no) * inv_nd
    px = ro[:, 0:1] + tt * rd[:, 0:1]
    py = ro[:, 1:2] + tt * rd[:, 1:2]
    pz = ro[:, 2:3] + tt * rd[:, 2:3]
    uu = rw[:, 7] + rw[:, 4] * px + rw[:, 5] * py + rw[:, 6] * pz
    vv = rw[:, 11] + rw[:, 8] * px + rw[:, 9] * py + rw[:, 10] * pz
    ok = (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > tmn) & (tt < tmx)
    if any_hit:
        return jnp.any(ok, axis=1)
    return jnp.min(jnp.where(ok, tt, _BIG), axis=1)


def _pair_pass_b(rows3, cid, o, d, tmin, bt):
    """Stage 5b: re-evaluate ONLY the winning pair per ray and extract
    (prim, u, v) at the lane that achieved the segment-min t `bt`."""
    rw = rows3[cid]  # [R, 16, K]
    tmn = tmin[:, None]
    nd = rw[:, 0] * d[:, 0:1] + rw[:, 1] * d[:, 1:2] + rw[:, 2] * d[:, 2:3]
    no = rw[:, 0] * o[:, 0:1] + rw[:, 1] * o[:, 1:2] + rw[:, 2] * o[:, 2:3]
    inv_nd = jnp.where(jnp.abs(nd) > 1e-12, 1.0 / nd, 0.0)
    tt = (rw[:, 3] - no) * inv_nd
    px = o[:, 0:1] + tt * d[:, 0:1]
    py = o[:, 1:2] + tt * d[:, 1:2]
    pz = o[:, 2:3] + tt * d[:, 2:3]
    uu = rw[:, 7] + rw[:, 4] * px + rw[:, 5] * py + rw[:, 6] * pz
    vv = rw[:, 11] + rw[:, 8] * px + rw[:, 9] * py + rw[:, 10] * pz
    ok = (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > tmn)
    tt = jnp.where(ok, tt, _BIG)
    lane = jnp.argmin(jnp.abs(tt - bt[:, None]), axis=1)
    ordr = jax.lax.bitcast_convert_type(rw[:, 12], jnp.int32)
    prim = jnp.take_along_axis(ordr, lane[:, None], axis=1)[:, 0]
    u = jnp.take_along_axis(uu, lane[:, None], axis=1)[:, 0]
    v = jnp.take_along_axis(vv, lane[:, None], axis=1)[:, 0]
    return prim, u, v


def intersect_pairs(
    bc: BinnedClusters,
    ray_o,
    ray_d,
    tmin,
    tmax=TMAX_RAY,
    any_hit: bool = False,
    kmax: int = 128,
    pair_mult: int = 12,
    max_sweeps: int = 4,
    with_residual: bool = False,
):
    """Same contract as intersect_binned (unit-length directions).

    kmax: top_k window width (clusters per ray per sweep).
    pair_mult: pair_cap = R * pair_mult — the static dense-work bound
      per sweep. Rays clipped by it are finished on later sweeps.
    max_sweeps: residual-sweep bound (first sweep + up to max_sweeps-1
      residuals).
    with_residual: append a scalar bool to the return tuple — True when
      max_sweeps was exhausted with over/clipped rays remaining, i.e.
      the result may be missing hits beyond the processed window.
      Callers that care about exact completion should check it instead
      of relying on per-scene kmax/pair_mult tuning."""
    r = ray_o.shape[0]
    ctot = bc.num_groups * bc.group
    kmax = min(kmax, ctot)
    pair_cap = min(r * pair_mult, r * kmax)
    tmin = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,)), 0.0
    )
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    tmax = jnp.minimum(tmax, _scene_exit_t(bc, ray_o, ray_d, tmin))
    rows3 = bc.rows.reshape(ctot, 16, K)
    oob = jnp.full((r,), _BIG)  # scatter target for dropped lanes

    def sweep(bt, lo_t, lo_cid, wcid):
        pr, cid, pvalid, cnt, kth, kc, clipped = _compact_pairs(
            bc, ray_o, ray_d, tmin, jnp.minimum(tmax, bt), kmax, pair_cap,
            lo_t, lo_cid,
        )
        tgt = jnp.where(pvalid, pr, r)
        if any_hit:
            ph = _pair_pass_a(
                rows3, pr, cid, pvalid, ray_o, ray_d, tmin, tmax, True
            )
            hit = (
                jnp.zeros((r,), jnp.bool_).at[tgt].max(ph, mode="drop")
            )
            new_bt = jnp.where(hit, tmin, bt)  # occluded: zero-width window
        else:
            pt = _pair_pass_a(
                rows3, pr, cid, pvalid, ray_o, ray_d, tmin, tmax, False
            )
            sm = oob.at[tgt].min(pt, mode="drop")
            new_bt = jnp.minimum(bt, sm)
            # winning pair: its per-pair t EQUALS the fresh segment min
            win = pvalid & (pt == new_bt[pr]) & (pt < _BIG)
            cand = (
                jnp.full((r,), -1, jnp.int32)
                .at[jnp.where(win, pr, r)]
                .max(cid, mode="drop")
            )
            wcid = jnp.where(cand >= 0, cand, wcid)
        # residual work: top_k overflow with a window edge that can
        # still beat the best t, or pairs clipped by pair_cap. A
        # CLIPPED ray's window was never evaluated, so it must re-run
        # from its OLD cursor (clip takes precedence over overflow);
        # progress is global — completed rays drop to zero need next
        # sweep, freeing cap budget for the clipped tail.
        over = (cnt > kmax) & (kth < new_bt) & ~clipped
        new_lo_t = jnp.where(clipped, lo_t, jnp.where(over, kth, jnp.inf))
        new_lo_c = jnp.where(
            clipped, lo_cid, jnp.where(over, kc, jnp.int32(1 << 30))
        )
        return new_bt, new_lo_t, new_lo_c, wcid, jnp.any(over | clipped)

    bt0 = jnp.where(tmax > tmin, tmax, tmin)  # dead rays: zero-width
    wcid0 = jnp.full((r,), -1, jnp.int32)
    bt, lo_t, lo_c, wcid, more = sweep(
        bt0, jnp.full((r,), -jnp.inf), jnp.full((r,), -1, jnp.int32), wcid0
    )

    def cond(st):
        return st[4] & (st[5] < max_sweeps)

    def body(st):
        bt, lo_t, lo_c, wcid, _, i = st
        return sweep(bt, lo_t, lo_c, wcid) + (i + 1,)

    bt, _, _, wcid, more_f, _ = jax.lax.while_loop(
        cond, body, (bt, lo_t, lo_c, wcid, more, jnp.int32(1))
    )

    if any_hit:
        # bt==tmin marks occlusion, but dead rays (tmax<=tmin) START there
        hit = (bt <= tmin) & (bt0 > tmin)
        out = (
            jnp.where(hit, tmin, jnp.inf),
            jnp.where(hit, 1, -1),
            jnp.zeros((r,)),
            jnp.zeros((r,)),
            hit,
        )
        return out + (more_f,) if with_residual else out

    is_hit = (bt < bt0) & (wcid >= 0)
    prim, u, v = _pair_pass_b(
        rows3, jnp.maximum(wcid, 0), ray_o, ray_d, tmin, bt
    )
    out = (
        jnp.where(is_hit, bt, jnp.inf),
        jnp.where(is_hit, prim, -1),
        jnp.where(is_hit, u, 0.0),
        jnp.where(is_hit, v, 0.0),
        is_hit,
    )
    return out + (more_f,) if with_residual else out


def make_pairs_intersector(bc: BinnedClusters, kmax: int = 128,
                           pair_mult: int = 12):
    """Drop-in for make_binned_intersector (same closure contract)."""

    def intersect_fn(tri_verts, ray_o, ray_d, tmin, tmax=TMAX_RAY):
        return intersect_pairs(
            bc, ray_o, ray_d, tmin, tmax, kmax=kmax, pair_mult=pair_mult
        )

    def occluded_fn(tri_verts, ray_o, ray_d, tmin, tmax):
        _, _, _, _, hit = intersect_pairs(
            bc, ray_o, ray_d, tmin, tmax, any_hit=True, kmax=kmax,
            pair_mult=pair_mult,
        )
        return hit

    return intersect_fn, occluded_fn
