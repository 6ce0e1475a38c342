"""Vectorized projection onto the lower-bounded probability simplex.

The reference projects parameter rows onto {x : x_m >= lb, sum_m x_m = 1}
with Michelot's finite iterative algorithm (michelot_project,
simplex.c:109-143), one row at a time, with heap allocation per call
(simplex_project_pklm, simplex.c:47-69).  Michelot's algorithm computes the
exact Euclidean projection x_m = max(lb, v_m - tau) with tau chosen so the
sum constraint holds.

``project_rows`` is the reference's iterative algorithm batched over every
row at once (lax.while_loop over passes, masked per-row "done" lanes) -
EM inputs are near-feasible so it terminates in 1-2 VPU passes, far cheaper
on TPU than the closed-form per-row sort (XLA sorts + gathers cost ~1 ms on
[16k, K] tensors; kept as ``project_rows_sorted`` for certification).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def project_rows(v: Array, mask: Array, n_valid: Array,
                 lower_bound: float, total: float = 1.0) -> Array:
    """Project rows of ``v`` onto {x >= lb on valid lanes, sum = total}.

    Batched Michelot iteration (michelot_project, simplex.c:109-143): on
    each pass subtract the uniform surplus from the free lanes, clamp any
    lane that falls below lb and fix it; a row is done after a pass that
    clamps nothing.  Exact projection in at most M passes.

    Args:
      v: [..., M] rows to project.
      mask: [..., M] bool, valid lanes (broadcastable to v's shape).
      n_valid: [...] number of valid lanes per row (broadcastable).
      lower_bound: lb >= 0.
      total: the required sum (1.0 for probability rows).

    Returns: projected rows; invalid lanes are zeroed.
    """
    dtype = v.dtype
    mask = jnp.broadcast_to(mask, v.shape)
    lb = jnp.asarray(lower_bound, dtype)
    tot = jnp.asarray(total, dtype)

    if v.shape[-1] == 2 and dtype == jnp.float32:
        # closed form for the biallelic case (the hot shape: SNP panels):
        # one Michelot pass lands on the line x0+x1=tot; if one lane fell
        # below lb the (at most one) second pass pins it at lb and the
        # other at tot-lb.  Equivalent to the loop below (same op order,
        # pass for pass) but single-pass and free of the [.., 2]-lane
        # while-loop (2 of 128 lanes useful) that dominates the p-update
        # epilogue on TPU.  f32 ONLY: f64 is the reference-parity path,
        # and even a value-identical formulation shifts XLA's fusion/FMA
        # choices by an ulp, which the fp-chaotic accelerated
        # accept/backtrack amplifies into a different converged plateau -
        # the warm-start goldens then drift off the reference binary
        # (observed: same fit, same projections bitwise, logL 0.15 apart).
        #
        # The clamped pair must be written as (lb, survivor) EXACTLY,
        # never derived as tot - clip(..): when lb is below the dtype's
        # ulp at tot (f32 with the reference's 1e-8 bound), tot-lb rounds
        # to tot and a derived complement becomes an exact 0 - a zero
        # probability the E-step's masked logs turn into a wildly
        # non-monotone logL (chains then oscillate forever; caught by
        # test_impute_outfile_cli hanging).  Michelot's loop never emits
        # a lane below lb, and neither does this.
        v0, v1 = v[..., 0], v[..., 1]
        m0, m1 = mask[..., 0], mask[..., 1]
        both = m0 & m1
        # identical op order to the loop's first pass (csum, offset,
        # subtract) so rows are bitwise the loop's output
        offset = ((v0 + v1) - tot) * 0.5
        r0 = v0 - offset
        r1 = v1 - offset
        c0 = r0 < lb                 # lane 0 clamped at lb
        c1 = r1 < lb                 # lane 1 clamped at lb
        # the loop's second pass computes the surviving lane as
        # r - ((r + lb) - tot), not tot - lb; keep that op order too
        # (summation visits lane 0 then lane 1)
        p0 = jnp.where(c0, lb, jnp.where(c1, r0 - ((r0 + lb) - tot), r0))
        p1 = jnp.where(c1, lb, jnp.where(c0, r1 - ((lb + r1) - tot), r1))
        p0 = jnp.where(both, p0, jnp.where(m0, tot, jnp.zeros((), dtype)))
        p1 = jnp.where(both, p1, jnp.where(m1, tot, jnp.zeros((), dtype)))
        return jnp.stack([p0, p1], axis=-1)

    w0 = jnp.where(mask, v, 0.0)
    free0 = mask
    done0 = jnp.zeros(v.shape[:-1], bool)

    def cond(state):
        _, _, done = state
        return ~jnp.all(done)

    def body(state):
        w, free, done = state
        n_free = jnp.sum(free, axis=-1).astype(dtype)           # [...]
        csum = jnp.sum(w, axis=-1)                               # [...]
        offset = (csum - tot) / jnp.maximum(n_free, 1.0)
        upd = free & ~done[..., None]
        w2 = jnp.where(upd, w - offset[..., None], w)
        newly = upd & (w2 < lb)
        w3 = jnp.where(newly, lb, w2)
        clamped = jnp.any(newly, axis=-1)
        free2 = free & ~newly
        done2 = done | ~clamped | (jnp.sum(free2, axis=-1) == 0)
        return w3, free2, done2

    # NOTE (round 4, measured): a statically unrolled M-pass chain was
    # tried to kill lax.while_loop's per-trip latency, and REGRESSED the
    # multi-allelic fullstep -22% (195 -> 151 Gcells/s at BENCH_M=4):
    # real EM inputs are near-feasible, so the loop exits after 1-2
    # passes while the unroll always pays all M.  The epilogue's
    # remaining ~150 us/launch is small-op dispatch latency, not loop
    # trips - fixing it needs the p update fused into the kernel, not a
    # different host-side loop shape.
    w, _, _ = jax.lax.while_loop(cond, body, (w0, free0, done0))
    return jnp.where(mask, w, jnp.zeros((), dtype))


def project_rows_sorted(v: Array, mask: Array, n_valid: Array,
                        lower_bound: float, total: float = 1.0) -> Array:
    """Closed-form sort-based exact projection (Held/Wolfe/Crowder).

    Same output as ``project_rows``; kept as an independent formulation for
    cross-certification in tests (slow on TPU: sort + gather).
    """
    dtype = v.dtype
    mask = jnp.broadcast_to(mask, v.shape)
    n_valid = jnp.broadcast_to(jnp.asarray(n_valid, dtype),
                               v.shape[:-1])[..., None]
    lb = jnp.asarray(lower_bound, dtype)

    # Shift so the constraint set becomes the plain simplex of size s_prime.
    w = jnp.where(mask, v - lb, -jnp.inf)
    s_prime = total - n_valid * lb  # [...,1]

    ws = jnp.sort(w, axis=-1)[..., ::-1]          # descending; -inf last
    ws_clean = jnp.where(jnp.isfinite(ws), ws, 0.0)
    css = jnp.cumsum(ws_clean, axis=-1)
    j = jnp.arange(1, v.shape[-1] + 1, dtype=dtype)
    tau_j = (css - s_prime) / j
    cond = (ws > tau_j) & (j <= n_valid)
    rho = jnp.maximum(jnp.sum(cond, axis=-1, keepdims=True), 1)
    tau = jnp.take_along_axis(tau_j, rho - 1, axis=-1)

    out = jnp.maximum(w - tau, 0.0) + lb
    return jnp.where(mask, out, jnp.zeros((), dtype))


def michelot_reference(params, lower_bound: float, total: float = 1.0):
    """Direct numpy port of michelot_project (simplex.c:109-143).

    Kept as a test oracle to certify project_rows() output parity; not used
    in the compute path.
    """
    import numpy as np
    params = np.array(params, dtype=np.float64)
    length = params.shape[0]
    fixed = np.zeros(length, dtype=bool)
    n = length
    while n:
        csum = params.sum()
        offset = (csum - total) / n
        can_terminate = True
        for i in range(length):
            if not fixed[i]:
                params[i] -= offset
                if params[i] < lower_bound:
                    params[i] = lower_bound
                    fixed[i] = True
                    n -= 1
                    can_terminate = False
        if can_terminate:
            break
    return params
