"""Pallas TPU kernels: fused admixture E+M sweep.

The XLA formulation (model/admixture.py) materializes denom = eta @ p and
w = x / denom as [I, LM] HBM tensors, each written once and read twice -
the EM step is HBM-bandwidth bound.  These kernels stream x through VMEM
and recompute denom on the MXU inside each tile.

Preferred path - ONE kernel, x read once, denom computed once per tile
(``admixture_sweep_fused``): grid (i-outer, l-inner); A[i,k] and t[i]
accumulate per i-block (revisited consecutively along the inner grid
dimension), while B[k,lm] is a full-array output block with a CONSTANT
index map, so it stays resident in VMEM for the entire grid and is written
back to HBM exactly once.  Requires Kp*LMp*4 bytes of VMEM for B - gated
by ``fused_fits`` (biobank-scale LM falls back to the two-pass kernels).

Fallback - two kernels, each streaming x once:

  kernel A (grid i-outer, l-inner):  per-individual statistics
      A[i, k]  = sum_lm w_ilm p_klm          (-> eta update)
      t[i]     = sum_lm x_ilm log denom_ilm  (-> log likelihood)
  kernel B (grid l-outer, i-inner):  per-locus statistics
      B[k, lm] = sum_i eta_ik w_ilm          (-> p update)

Accumulator outputs are revisited only along the LAST grid dimension
(consecutive visits), which is the Pallas TPU requirement for in-place
block accumulation.  K is padded to a multiple of 32 lanes by the caller
(the MXU is output-area bound, not contraction bound, at K <= 128 - see
BASELINE.md small-K analysis - so 32-lane padding shrinks the A/B
accumulator outputs and their VMEM residency at zero matmul-time cost);
zero-padded clusters contribute nothing.  This realizes the reference's own
"combined E+M" analysis (em_alg.c:435-483: never materialize d_iklm) at
tile granularity.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# VMEM budget for the fused kernel's resident B accumulator (bytes).  The
# core has ~16 MB; tiles + double buffering take ~4 MB at the default
# (ti, tl), so 8 MB for B is safe and covers LM up to 16k lanes at Kp=128.
FUSED_B_VMEM_LIMIT = 8 * 1024 * 1024


def fused_fits(Kp: int, LMp: int) -> bool:
    """True when the single-pass kernel's B accumulator fits in VMEM."""
    return Kp * LMp * 4 <= FUSED_B_VMEM_LIMIT


def pick_tile(n: int, prefs=(256, 128, 64, 32, 16, 8)) -> int:
    """Largest preferred tile dividing n, or 0 if none does."""
    for t in prefs:
        if n % t == 0:
            return t
    return 0


# (ti, tl, max B bytes) combos for the fullstep kernel, fastest first, all
# VMEM-fit verified on v5e (larger combos blow the 16 MB scoped-vmem stack:
# e.g. 1024x1024 needs 17.3 MB at B=2MB, 1024x512 fails at B=8MB).
# Measured on the bench shape (I=16k, LM=4k, Kp=128): 1024x512 125.5,
# 512x1024 121.3, 512x512 117.7, 256x512 90.5 Gcells/s.
_FULLSTEP_TILES = (
    (1024, 512, 5 * 1024 * 1024),
    (512, 1024, 5 * 1024 * 1024),
    (512, 512, FUSED_B_VMEM_LIMIT),
    (256, 512, FUSED_B_VMEM_LIMIT),
    (128, 512, FUSED_B_VMEM_LIMIT),
    (64, 512, FUSED_B_VMEM_LIMIT),
    (32, 512, FUSED_B_VMEM_LIMIT),
    (16, 512, FUSED_B_VMEM_LIMIT),
    (8, 512, FUSED_B_VMEM_LIMIT),
)


# K-lane granularities the generic fullstep/sweep kernels are
# compile-verified at on real TPU (scripts/tpu_compile_sweep.py); the
# production layout is k_padded_size(K, 32)
GENERIC_K_LANES = (32, 128)


def _fullstep_k_fits(ti: int, tl: int, Kp: int) -> bool:
    """Large-K tile admission for the generic fullstep, probe-calibrated
    on real TPU: all ladder entries compile at Kp <= 128 (swept at 32
    and 128); at Kp=256 the (512,1024) tile OOMs the scoped vmem while
    (512,512)/(256,512) pass; at Kp=512 only (256,512)-and-smaller pass
    (the eta/etan [ti, Kp] blocks and the [Kp, tl] p tiles grow with
    Kp).  Round 5 closes the ladder's top: Kp=768 and Kp=1024 probed at
    each tile's largest admissible LMp - (256,512) compile-OOMs, and
    (128,512) down pass at both.  Beyond 1024 nothing is verified:
    admission is REFUSED and the engine falls back to the XLA
    formulation with a one-time notice (reference -k is unbounded,
    multiclust.c:1447-1453)."""
    if Kp <= 128:
        return True
    if Kp <= 256:
        return ti * tl <= 512 * 512
    if Kp <= 512:
        return ti * tl <= 256 * 512
    if Kp <= 768:
        return ti * tl <= 128 * 512
    if Kp <= 1024:
        # (128,512) passes PLAIN at 1024 but its jagged-CHAIN binding
        # (emit_a + a0) compile-OOMs; one table serves both bindings
        return ti * tl <= 64 * 512
    return False


def pick_tiles(I: int, Kp: int, LMp: int):
    """Fastest verified (ti, tl) for the fullstep kernel, or (0, 0) if no
    combo divides the shapes within the VMEM budget."""
    b_bytes = Kp * LMp * 4
    for ti, tl, b_max in _FULLSTEP_TILES:
        if (I % ti == 0 and LMp % tl == 0 and b_bytes <= b_max
                and _fullstep_k_fits(ti, tl, Kp)):
            return ti, tl
    return 0, 0


def pick_layout(I: int, Kp: int, LM: int):
    """Fastest verified (ti, tl, LMp) for the fullstep kernel, choosing the
    LM zero-padding that unlocks the largest tile (the pad lanes cost at
    most tl-1 dead columns, far less than the tile-size win).  Returns
    (0, 0, 0) if nothing fits."""
    for ti, tl, b_max in _FULLSTEP_TILES:
        LMp = _round_up(LM, tl)
        if (I % ti == 0 and Kp * LMp * 4 <= b_max
                and _fullstep_k_fits(ti, tl, Kp)):
            return ti, tl, LMp
    return 0, 0, 0


def _recip(d):
    """Newton-refined approximate reciprocal: the VPU's approx-mode rsqrt-
    style reciprocal (~12 bits) plus one Newton step (~f32, error O(1 ulp)).
    ~13% faster than the divide at the EM sweep's operational intensity,
    and well below the bf16 MXU noise floor of the surrounding matmuls."""
    r = pl.reciprocal(d, approx=True)
    return r * (2.0 - d * r)


def _michelot_tile(v, k_true: int, lb: float, maskf=None):
    """In-kernel batched Michelot projection of [ti, Kp] rows onto
    {x >= lb on lanes < k_true, sum = 1}; pad lanes forced to zero.
    Same algorithm as ops/simplex.project_rows (michelot_project,
    simplex.c:109-143).  The loop carries float 0/1 masks instead of bools:
    Mosaic cannot legalize i1 vectors through scf.while.

    ``maskf`` (dynamic-K kernels): a RUNTIME [.., Kp] 1.0/0.0 true-lane
    mask read from a kernel input overrides the static k_true lane set -
    one compiled kernel then serves every K of a sweep with the
    projection staying on-chip (round 5; the XLA-relocation alternative
    measured +43% per EM segment)."""
    f32 = v.dtype
    if maskf is None:
        lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        maskf = jnp.where(lanes < k_true, jnp.asarray(1.0, f32),
                          jnp.asarray(0.0, f32))
    else:
        maskf = jnp.broadcast_to(maskf.astype(f32), v.shape)
    w0 = v * maskf
    done0 = jnp.zeros((v.shape[0], 1), f32)

    def cond(st):
        return jnp.min(st[2]) < 0.5

    def body(st):
        w, free, done = st
        nf = jnp.sum(free, axis=1, keepdims=True)
        cs = jnp.sum(w, axis=1, keepdims=True)
        off = (cs - 1.0) / jnp.maximum(nf, 1.0)
        upd = free * (1.0 - done)
        w2 = w - off * upd
        newly = upd * jnp.where(w2 < lb, jnp.asarray(1.0, f32),
                                jnp.asarray(0.0, f32))
        w3 = jnp.where(newly > 0.5, jnp.asarray(lb, f32), w2)
        clamped = jnp.max(newly, axis=1, keepdims=True)
        free2 = free * (1.0 - newly)
        empty = jnp.where(jnp.sum(free2, axis=1, keepdims=True) < 0.5,
                          jnp.asarray(1.0, f32), jnp.asarray(0.0, f32))
        done2 = jnp.maximum(done, jnp.maximum(1.0 - clamped, empty))
        return w3, free2, done2

    w, _, _ = jax.lax.while_loop(cond, body, (w0, maskf, done0))
    return w * maskf


def _fullstep_kernel(eta_ref, p_ref, x_ref, c_ref, *rest, tl: int,
                     n_l: int, k_true: int, lb: float,
                     project: bool, compute_t: bool,
                     with_a0: bool = False, emit_a: bool = False,
                     with_kmask: bool = False):
    rest = list(rest)
    a0_ref = rest.pop(0) if with_a0 else None
    kmask_ref = rest.pop(0) if with_kmask else None
    etan_ref, t_ref, b_ref, a_scr = rest
    i_idx = pl.program_id(0)
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _():
        # a0 seeds the accumulator with a previous launch's A (jagged-M
        # bucket chaining, model/bucketed.py): the per-individual
        # statistics are additive across locus groups
        a_scr[:] = a0_ref[:] if with_a0 else jnp.zeros_like(a_scr)
        t_ref[:] = jnp.zeros_like(t_ref)

    @pl.when(jnp.logical_and(i_idx == 0, l_idx == 0))
    def _():
        b_ref[:] = jnp.zeros_like(b_ref)

    eta = eta_ref[:]
    denom = jnp.dot(eta, p_ref[:], preferred_element_type=jnp.float32)
    xb = x_ref[:].astype(jnp.float32)
    pos = xb > 0
    safe_d = jnp.where(denom > 0, denom, 1.0)
    w = jnp.where(pos, xb * _recip(safe_d), 0.0)
    if compute_t:
        t = jnp.where(pos, xb * jnp.log(safe_d), 0.0)
        t_ref[:] += jnp.sum(t, axis=1, keepdims=True)
    a_scr[:] += jnp.dot(w, p_ref[:].T, preferred_element_type=jnp.float32)
    col = pl.multiple_of(l_idx * tl, tl)
    b_ref[:, pl.ds(col, tl)] += jnp.dot(
        eta.T, w, preferred_element_type=jnp.float32)

    # the i-block's A is complete at the last l step: finish the eta update
    # (m_step_admixture_orig eta normalization, em_alg.c:611-637, plus the
    # projection) entirely on-chip and emit eta_new
    @pl.when(l_idx == n_l - 1)
    def _():
        if emit_a:
            # non-final bucket of a jagged chain: emit the raw accumulated
            # A for the next launch's a0 (c is added once, at the end)
            etan_ref[:] = a_scr[:]
        else:
            A = a_scr[:] + c_ref[:]
            num = eta_ref[:] * A
            tot = jnp.sum(num, axis=1, keepdims=True)
            e2 = jnp.where(tot > 0, num / jnp.where(tot > 0, tot, 1.0),
                           eta_ref[:])
            if project:
                e2 = _michelot_tile(
                    e2, k_true, lb,
                    kmask_ref[:] if with_kmask else None)
            etan_ref[:] = e2


@functools.partial(jax.jit, static_argnames=(
    "ti", "tl", "k_true", "lb", "project", "compute_t", "emit_a",
    "interpret"))
def admixture_fullstep(eta, p2, x2, c, a0=None, kmask=None, *, ti: int,
                       tl: int,
                       k_true: int, lb: float, project: bool,
                       compute_t: bool = True, emit_a: bool = False,
                       interpret: bool = False):
    """Fused sweep + complete eta update in ONE kernel.

    Args: eta [I, Kp] (K-padded layout, pads zero), p2 [Kp, LMp],
    x2 [I, LMp] (any count dtype), c [I, 1] per-individual missing-copy
    totals (zeros when the dataset has none).
    Returns: eta_new [I, Kp] (normalized + projected, pads zero; buffer
    ALIASED onto the eta input so the EM loop carry is in-place),
    t [I] per-individual logL terms, B [Kp, LMp] p-update numerators.
    With ``compute_t=False`` the logL accumulation (the per-cell logs) is
    skipped and t is returned as zeros - used by the check-interval EM
    driver (opt/em.blind_plain_steps) between convergence checks.

    Jagged-M bucket chaining (model/bucketed.py): ``a0`` [I, Kp] seeds
    the A accumulator with a previous launch's output; ``emit_a=True``
    returns the raw accumulated A (c NOT added, no eta finish, no
    aliasing) in the first slot instead of eta_new - the per-individual
    statistics are additive across locus groups, so a chain of launches
    with A threaded through computes the exact multi-bucket step.
    """
    I, Kp = eta.shape
    LMp = p2.shape[1]
    assert I % ti == 0 and LMp % tl == 0 and Kp % 32 == 0, (I, ti, LMp, tl)
    assert fused_fits(Kp, LMp), (Kp, LMp)
    n_i, n_l = I // ti, LMp // tl
    f32 = jnp.float32
    with_a0 = a0 is not None
    with_kmask = kmask is not None

    ik_spec = pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        ik_spec,
        pl.BlockSpec((Kp, tl), lambda i, l: (0, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tl), lambda i, l: (i, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, 1), lambda i, l: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [eta, p2, x2, c]
    if with_a0:
        in_specs.append(ik_spec)
        args.append(a0)
    if with_kmask:
        in_specs.append(pl.BlockSpec((1, Kp), lambda i, l: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(kmask.reshape(1, Kp).astype(f32))

    etan, t_out, b_out = pl.pallas_call(
        functools.partial(_fullstep_kernel, tl=tl, n_l=n_l, k_true=k_true,
                          lb=lb, project=project, compute_t=compute_t,
                          with_a0=with_a0, emit_a=emit_a,
                          with_kmask=with_kmask),
        grid=(n_i, n_l),
        in_specs=in_specs,
        out_specs=[
            ik_spec,
            pl.BlockSpec((ti, 1), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, LMp), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((I, Kp), f32),
            jax.ShapeDtypeStruct((I, 1), f32),
            jax.ShapeDtypeStruct((Kp, LMp), f32),
        ],
        # emit_a's first output is A, not eta': no aliasing (eta must
        # survive for the chain's later launches and XLA epilogues)
        input_output_aliases={} if emit_a else {0: 0},
        scratch_shapes=[pltpu.VMEM((ti, Kp), f32)],
        interpret=interpret,
    )(*args)
    return etan, t_out[:, 0], b_out


def _fullstep_bi_kernel(eta_ref, p0_ref, x0_ref, x1_ref, c_ref, *rest,
                        tl: int, n_i: int, n_l: int, k_true: int,
                        lb: float, plb: float, project: bool,
                        compute_t: bool, with_miss: bool, emit_b: bool,
                        emit_a: bool = False, with_a0: bool = False,
                        project_eta: bool = None,
                        with_kmask: bool = False):
    """Biallelic full EM step: see ``admixture_fullstep_biallelic``."""
    rest = list(rest)
    miss_ref = rest.pop(0) if with_miss else None
    a0_ref = rest.pop(0) if with_a0 else None
    kmask_ref = rest.pop(0) if with_kmask else None
    etan_ref = rest.pop(0)
    t_ref = rest.pop(0)
    if emit_b:
        # b0/b1 are constant-index-map OUTPUTS (VMEM resident for the
        # whole grid, like the generic fullstep's B): the caller merges
        # them across data shards before the p update (mesh path)
        p0n_ref = None
        b0_scr, b1_scr, a_scr, r_scr = rest
    else:
        p0n_ref = rest.pop(0)
        a_scr, r_scr, b0_scr, b1_scr = rest
    i_idx = pl.program_id(0)
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _():
        # a0 seeds the accumulator with a previous launch's raw A+r
        # (column-chunk chaining, admixture_fullstep_biallelic_chunked):
        # the per-individual statistics are additive across locus chunks
        a_scr[:] = a0_ref[:] if with_a0 else jnp.zeros_like(a_scr)
        r_scr[:] = jnp.zeros_like(r_scr)
        t_ref[:] = jnp.zeros_like(t_ref)

    @pl.when(jnp.logical_and(i_idx == 0, l_idx == 0))
    def _():
        b0_scr[:] = jnp.zeros_like(b0_scr)
        b1_scr[:] = jnp.zeros_like(b1_scr)

    eta = eta_ref[:]
    col = pl.multiple_of(l_idx * tl, tl)
    p0 = p0_ref[:, pl.ds(col, tl)]                    # [Kp, tl]
    d0 = jnp.dot(eta, p0, preferred_element_type=jnp.float32)
    s = jnp.sum(eta, axis=1, keepdims=True)           # ~1; exact complement
    d1 = s - d0
    # padded / degenerate columns have d = 0 with x = 0: clamp the
    # denominator so 0 * recip stays 0 (no NaNs), log(d) * 0 stays 0
    d0 = jnp.maximum(d0, 1e-30)
    d1 = jnp.maximum(d1, 1e-30)
    x0 = x0_ref[:].astype(jnp.float32)
    x1 = x1_ref[:].astype(jnp.float32)
    w0 = x0 * _recip(d0)
    w1 = x1 * _recip(d1)
    if compute_t:
        t_ref[:] += jnp.sum(x0 * jnp.log(d0) + x1 * jnp.log(d1), axis=1,
                            keepdims=True)
    # A_ik = sum_l [w0 p0 + w1 (1 - p0)]_k = (w0 - w1) @ p0^T + sum_l w1
    a_scr[:] += jnp.dot(w0 - w1, p0.T, preferred_element_type=jnp.float32)
    r_scr[:] += jnp.sum(w1, axis=1, keepdims=True)
    if with_miss:
        # missing-mass p-update term (em_alg.c:727-746): B_klm += C_kl with
        # C = eta^T @ miss, for BOTH alleles - folded into the B matmuls as
        # eta^T @ (w + miss), costing zero extra MXU passes
        mi = miss_ref[:].astype(jnp.float32)
        w0 = w0 + mi
        w1 = w1 + mi
    b0_scr[:, pl.ds(col, tl)] += jnp.dot(
        eta.T, w0, preferred_element_type=jnp.float32)
    b1_scr[:, pl.ds(col, tl)] += jnp.dot(
        eta.T, w1, preferred_element_type=jnp.float32)

    @pl.when(l_idx == n_l - 1)
    def _():
        if emit_a:
            # loci-sharded mesh: the shard's A covers only ITS loci, so
            # the eta update cannot finish here - emit the raw A+r
            # accumulator for the caller's psum over the model axis (c
            # is a GLOBAL missing total: adding it per shard would count
            # it model_shards times, so the caller adds it post-psum)
            etan_ref[:] = a_scr[:] + r_scr[:]
        else:
            A = a_scr[:] + r_scr[:] + c_ref[:]
            num = eta_ref[:] * A
            tot = jnp.sum(num, axis=1, keepdims=True)
            e2 = jnp.where(tot > 0, num / jnp.where(tot > 0, tot, 1.0),
                           eta_ref[:])
            # dynamic-K callers either supply the RUNTIME kmask (the
            # Michelot stays on-chip with the data-carried lane set) or
            # disable only the eta Michelot via project_eta and project
            # in XLA; the p clip below stays governed by `project`
            if project if project_eta is None else project_eta:
                e2 = _michelot_tile(
                    e2, k_true, lb,
                    kmask_ref[:] if with_kmask else None)
            etan_ref[:] = e2

    # B complete at the very last grid step: the whole p update (M-step
    # normalization + biallelic closed-form projection) happens on-chip
    if not emit_b:
        @pl.when(jnp.logical_and(i_idx == n_i - 1, l_idx == n_l - 1))
        def _():
            p0f = p0_ref[:]
            pc0 = p0f * b0_scr[:]
            pc1 = (1.0 - p0f) * b1_scr[:]
            tot = pc0 + pc1
            q0 = jnp.where(tot > 0,
                           pc0 * _recip(jnp.where(tot > 0, tot, 1.0)), 0.0)
            if project:
                # upper bound must stay strictly below 1 in f32: with the
                # reference's 1e-8 bound, 1-plb rounds to exactly 1.0 and
                # the implicit complement 1-q0 would become an exact zero
                # probability (ops/simplex.project_rows has the full
                # story); clamp against the largest representable
                # 1-max(plb, ulp)
                ub = float(
                    np.float32(1.0)
                    - np.float32(max(plb, float(np.finfo(np.float32).eps))))
                q0 = jnp.where(tot > 0, jnp.clip(q0, plb, ub), 0.0)
            p0n_ref[:] = q0


@functools.partial(jax.jit, static_argnames=(
    "ti", "tl", "k_true", "lb", "plb", "project", "compute_t", "emit_b",
    "emit_a", "chunk_idx", "n_chunks", "interpret", "project_eta"))
def admixture_fullstep_biallelic(eta, p0, x0, x1, c, miss=None, a0=None,
                                 kmask=None, *,
                                 ti: int,
                                 tl: int, k_true: int, lb: float, plb: float,
                                 project: bool, compute_t: bool = True,
                                 emit_b: bool = False,
                                 emit_a: bool = False,
                                 chunk_idx: int = 0, n_chunks: int = 1,
                                 interpret: bool = False,
                                 project_eta: bool = None):
    """Fully fused biallelic (M=2, every locus 2 valid alleles) EM step.

    Exploits p1 = 1 - p0 and d1 = sum_k eta - d0: the denominator and A
    matmuls shrink to L columns (half the generic kernel's LM = 2L), the
    B0/B1 accumulators stay in VMEM scratch and the COMPLETE p update
    (normalization + the closed-form 2-simplex projection,
    ops/simplex.project_rows M=2 branch) runs on-chip at the last grid
    step - B never touches HBM and the XLA epilogue disappears.
    Math: m_step_admixture_orig, em_alg.c:592-754 restricted to M=2.

    Missing data is handled IN-KERNEL (em_alg.c:400-431): pass ``miss``
    [I, Lp] per-(i,l) missing-copy counts (any count dtype; padded cols
    zero) plus the real per-individual totals in ``c``; the p-update term
    C = eta^T @ miss folds into the B matmuls as eta^T @ (w + miss).

    Args: eta [I, Kp] (K-padded, pads zero), p0 [Kp, Lp] allele-0
    frequencies (pad rows/cols zero), x0/x1 [I, Lp] allele counts (any
    int dtype, pad cols zero), c [I, 1] per-individual missing totals
    (zeros for missing-free data), miss [I, Lp] or None.
    Returns: (eta_new [I, Kp] aliased onto eta, t [I] logL terms,
    p0_new [Kp, Lp] aliased onto p0).  With ``emit_b=True`` (mesh path)
    the in-kernel p update is skipped and the raw accumulators are
    returned instead: (eta_new, t, B0 [Kp, Lp], B1 [Kp, Lp]) - the caller
    psums B across data shards and runs the p epilogue itself.  With
    ``emit_a=True`` (loci-sharded mesh; requires emit_b) the eta update
    is ALSO skipped: the first output is the raw per-individual A+r
    accumulator over this shard's loci (c NOT added), psummed over the
    model axis and finished by the caller.

    Column-chunk chaining (``admixture_fullstep_biallelic_chunked``):
    with ``n_chunks > 1`` the launch covers ONLY chunk ``chunk_idx`` of
    the p0/x columns (chunk width Lc = Lp // n_chunks, a tl multiple) -
    the block index maps carry a static column offset, so the full-width
    arrays are passed unsliced and HBM sees only the chunk's bytes.  The
    B accumulators and the in-kernel p update are chunk-local ([Kp, Lc]
    resident - the VMEM budget is per CHUNK, not per Lp); ``a0`` [I, Kp]
    seeds the per-individual A accumulator with the previous chunks' raw
    output (additive across locus chunks), and ``emit_a`` on non-final
    chunks returns raw A+r instead of finishing the eta update.
    """
    I, Kp = eta.shape
    Lp = p0.shape[1]
    # Kp needs only 32-lane granularity here: the denominator contraction
    # is time-flat in Kp <= 128 while the A/B outputs scale with it
    assert I % ti == 0 and Lp % tl == 0 and Kp % 32 == 0, (I, ti, Lp, tl)
    assert not emit_a or emit_b or n_chunks > 1, \
        "emit_a without emit_b only in chunk mode"
    assert Lp % n_chunks == 0 and 0 <= chunk_idx < n_chunks, \
        (Lp, n_chunks, chunk_idx)
    Lc = Lp // n_chunks
    assert Lc % tl == 0, (Lc, tl)
    n_i, n_l = I // ti, Lc // tl
    l_off = chunk_idx * n_l  # static column offset, in tl blocks
    f32 = jnp.float32
    with_miss = miss is not None
    with_a0 = a0 is not None
    with_kmask = kmask is not None

    in_specs = [
        pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, Lc), lambda i, l: (0, chunk_idx),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tl), lambda i, l: (i, l + l_off),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tl), lambda i, l: (i, l + l_off),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, 1), lambda i, l: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [eta, p0, x0, x1, c]
    if with_miss:
        in_specs.append(pl.BlockSpec((ti, tl), lambda i, l: (i, l + l_off),
                                     memory_space=pltpu.VMEM))
        args.append(miss)
    if with_a0:
        in_specs.append(pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(a0)
    if with_kmask:
        # runtime true-lane mask [1, Kp], replicated per tile (dynamic-K
        # sweeps: one compiled kernel serves every K)
        in_specs.append(pl.BlockSpec((1, Kp), lambda i, l: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(kmask.reshape(1, Kp).astype(f32))

    out_specs = [
        pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, 1), lambda i, l: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((I, Kp), f32),
        jax.ShapeDtypeStruct((I, 1), f32),
    ]
    kl_spec = pl.BlockSpec((Kp, Lc), lambda i, l: (0, 0),
                           memory_space=pltpu.VMEM)
    kl_shape = jax.ShapeDtypeStruct((Kp, Lc), f32)
    scratch = [pltpu.VMEM((ti, Kp), f32), pltpu.VMEM((ti, 1), f32)]
    chunked = n_chunks > 1
    if emit_b:
        out_specs += [kl_spec, kl_spec]
        out_shape += [kl_shape, kl_shape]
        # emit_a's first output is A, not eta': the eta buffer must
        # survive for the caller's XLA epilogue, so no aliasing; in chunk
        # mode eta feeds every launch of the chain, so never alias it
        aliases = {} if (emit_a or chunked) else {0: 0}
    else:
        out_specs.append(kl_spec)
        out_shape.append(kl_shape)
        # chunk mode: p0n is [Kp, Lc] vs the full-width p0 input (no
        # aliasing possible), and eta must survive the chain
        aliases = {} if chunked else {0: 0, 1: 2}
        # kernel unpack order: a_scr, r_scr, b0_scr, b1_scr
        scratch = scratch + [pltpu.VMEM((Kp, Lc), f32),
                             pltpu.VMEM((Kp, Lc), f32)]

    outs = pl.pallas_call(
        functools.partial(_fullstep_bi_kernel, tl=tl, n_i=n_i, n_l=n_l,
                          k_true=k_true, lb=lb, plb=plb, project=project,
                          compute_t=compute_t, with_miss=with_miss,
                          emit_b=emit_b, emit_a=emit_a, with_a0=with_a0,
                          project_eta=project_eta, with_kmask=with_kmask),
        grid=(n_i, n_l),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    if emit_b:
        etan, t_out, b0, b1 = outs
        return etan, t_out[:, 0], b0, b1
    etan, t_out, p0n = outs
    return etan, t_out[:, 0], p0n


# (ti, tl, max PER-COPY resident bytes Kp*Lp*4) ladder for the biallelic
# kernel.  The kernel keeps FOUR [Kp, Lp] f32 arrays resident in VMEM
# (p0 input, p0n output, B0/B1 scratch) on top of the per-tile elementwise
# temporaries, against the compiler's 16 MB scoped-vmem stack - so the
# admissible Lp SHRINKS as the tile grows.  Budgets are TPU-verified
# (v5e, compute_t=True, Kp=32, scripts in round-2 logs):
#   (512,1024): fits at 512K/copy (Lp<=4096); OOMs at 2M/copy (20.9 MB)
#   (512, 512): fits at 1M/copy (Lp<=8192); OOMs at 2M/copy
#   (256, 512): fits at 2M/copy (Lp<=16384) - the biobank config, where
#               it runs 117 Gcells/s vs 80 for the two-pass fallback
#   (128, 512): OOMs at 3M/copy -> 2M is the ladder-wide ceiling
# Beyond 2M/copy nothing tiles and callers fall back to the two-pass
# sweep kernels.  Speed at the bench shape (I=16k, L=2k, Kp=32):
# (512,1024) 184.6, (512,512) 179.0 Gcells/s; (1024,1024) blows the
# stack (17.4 M) even there.
_FULLSTEP_BI_TILES = (
    # (256,2048) measured fastest at the 16k x 2k bench shape (157 vs
    # 148.8 raw-kernel for (512,1024), +5.5%); TPU-verified to 1M/copy
    # but capped at 512K so Lp > 4096 keeps the layouts verified fast at
    # scale ((256,512) at the biobank shape)
    (256, 2048, 512 * 1024),
    (512, 1024, 512 * 1024),
    (512, 512, 1024 * 1024),
    (256, 512, 2 * 1024 * 1024),
    (128, 512, 2 * 1024 * 1024),
    (64, 512, 2 * 1024 * 1024),
    (1024, 256, 512 * 1024),
    (512, 256, 1024 * 1024),
    (256, 256, 2 * 1024 * 1024),
    (128, 256, 2 * 1024 * 1024),
    (64, 256, 2 * 1024 * 1024),
    (64, 128, 2 * 1024 * 1024),
)


def _bi_k_fits(ti: int, tl: int, Kp: int, emit_b: bool = False) -> bool:
    """Large-K admission for the RESIDENT biallelic tiles (round-5
    real-TPU probe + full-sweep calibration at each tile's largest
    per-copy Lp): at Kp in {512, 768, 1024} everything compiles EXCEPT
    (1024, 256) (eta blocks blow the stack from Kp=512), the dynamic-K
    project_eta binding of (256, 512) at Kp=1024, and - with emit_b
    (mesh: b0/b1 leave scratch for resident outputs) - ti >= 512 at
    Kp=1024.  The project_eta exclusion is folded into the plain rule
    (one table serves static and dynamic callers).  Beyond 1024 nothing
    is verified - admission refused; the engine's XLA fallback covers
    unbounded -k (multiclust.c:1447-1453)."""
    if Kp > 1024:
        return False
    if Kp > 256 and (ti, tl) == (1024, 256):
        return False
    if Kp > 768 and (ti, tl) == (256, 512):
        return False  # project_eta binding compile-OOMs at 1024
    if emit_b and Kp > 768 and ti > 256:
        return False  # resident b0/b1 outputs tip (512, 256) over
    return True


def pick_layout_biallelic(I: int, Kp: int, L: int, emit_b: bool = False):
    """(ti, tl, Lp) for the biallelic fullstep kernel, or (0, 0, 0).

    Among admissible tiles, prefer the one minimizing Lp (padded-loci work
    is proportional to Lp; a large tl can pad an odd L by up to 2x), then
    break ties by ladder order (= measured speed).  E.g. L=2560 picks
    (512, 512) -> Lp=2560 over (256, 2048) -> Lp=4096."""
    best = None
    for rank, (ti, tl, b_max) in enumerate(_FULLSTEP_BI_TILES):
        Lp = _round_up(L, tl)
        if (I % ti == 0 and Kp * Lp * 4 <= b_max
                and _bi_k_fits(ti, tl, Kp, emit_b)):
            if best is None or Lp < best[0]:
                best = (Lp, rank, ti, tl)
    if best is None:
        return 0, 0, 0
    return best[2], best[3], best[0]


# (ti, tl) ladder for the STREAMED biallelic two-pass kernels: p0 and the
# B0/B1 accumulators are [Kp, tl] blocks (nothing [Kp, Lp] is VMEM
# resident), so there is NO Lp ceiling - this is the biobank-L path
# (BASELINE.md config 5, single-chip leg).  Large ti amortizes the p0
# re-stream (read n_i times per pass), but the per-tile f32 elementwise
# temporaries cost ~4 live copies x ti x tl x 4 bytes of scoped vmem -
# (1024, 2048) needs 34 MB against the 16 MB stack (measured round 3), so
# the ladder caps ti*tl at 512K.  All entries compile-verified by
# scripts/tpu_compile_sweep.py.
_FULLSTEP_BI_STREAM_TILES = (
    (256, 2048), (512, 1024), (256, 1024), (512, 512), (256, 512),
    (128, 512), (64, 512), (64, 256), (64, 128),
)


def _stream_vmem_fits(ti: int, tl: int, Kp: int,
                      emit_b: bool = False) -> bool:
    """Scoped-vmem budget model for the streamed kernels, calibrated
    against the measured (1024, 2048, Kp=32) = 34.2 MB failure and the
    compile-swept passes: ~4 live f32 elementwise temporaries [ti, tl],
    the (double-buffered) int8 x tiles, the p0 block + two B scratches
    [Kp, tl], and the eta/etan blocks [ti, Kp] - Kp GROWS the [Kp, tl]
    terms, so large-K fits must take smaller tiles (or fall back).

    The emit_b (mesh) variant additionally carries the b0/b1 OUTPUT
    blocks [Kp, tl] (double-buffered) on top of the scratches (advisor
    r3 - the previous model admitted tiles whose emit_b variant was
    tighter than modeled); callers that will run emit_b=True must pass
    it here so the layout choice budgets the larger variant.

    Round-5 large-K clamps, probe-calibrated on real TPU (the analytic
    estimate under-counts Kp-scaled buffers beyond 256 lanes):
    Kp=512 compile-OOMs (256,1024) while everything tl<=512 passes;
    Kp=768 passes only ti<=64 (tl<=512); Kp=1024 only (64,<=256);
    beyond 1024 nothing is verified - admission refused."""
    if Kp > 1024:
        return False
    if Kp > 512 and (ti > 64 or tl > 256):
        # (64,512) passed at Kp=768 in one session and compile-OOMed in
        # another - the boundary is FLAKY at the stack edge; stay under
        return False
    if Kp > 256 and (tl > 512 or ti * tl > 256 * 512):
        # (512,512)@512 is the same flaky-edge class (passed twice,
        # OOMed once); (256,512)@512 has never failed
        return False
    est = (16 * ti * tl            # 4 f32 temps
           + 6 * ti * tl           # x0/x1/miss int8 tiles, dbl-buffered
           + 12 * Kp * tl          # p0 block + B0/B1 scratch, f32
           + 8 * ti * Kp)          # eta + etan blocks, f32
    if emit_b:
        est += 16 * Kp * tl        # b0/b1 output blocks, dbl-buffered
    # 13 MB calibrated against the real-TPU sweep: (256,2048) passes at
    # Kp=32 (est 12.4M) and compile-OOMs at Kp=128 (est 14.8M)
    return est <= 13 * 1024 * 1024


def pick_layout_biallelic_streamed(I: int, Kp: int, L: int,
                                   emit_b: bool = False):
    """(ti, tl, Lp) for the streamed biallelic two-pass kernels (any L),
    or (0, 0, 0) when no admissible tile divides I (callers fall back to
    the generic sweep kernels).  ``emit_b`` budgets the mesh variant's
    extra output blocks (see _stream_vmem_fits)."""
    for ti, tl in _FULLSTEP_BI_STREAM_TILES:
        if I % ti == 0 and _stream_vmem_fits(ti, tl, Kp, emit_b):
            return ti, tl, _round_up(L, tl)
    return 0, 0, 0


def pick_layout_biallelic_chunked(I: int, Kp: int, L: int):
    """(ti, tl, Lc, n_chunks) for the CHAINED one-pass biallelic path
    (admixture_fullstep_biallelic_chunked), or zeros when no resident
    tile divides I.  Picks the tile with the largest admissible per-copy
    budget (fewest launches; ties broken by ladder order = measured
    speed).

    Budget: 3/4 of the resident ladder's TPU-verified cap - chunk mode
    cannot alias p0 onto p0n (full-width input vs chunk-width output),
    so Mosaic keeps FOUR resident [Kp, Lc] VMEM windows where the
    aliased resident kernel shares one (measured round 4: the unshared
    layout at the full 2M cap overflows the 16 MB stack by 232K; at
    3/4 cap it compiles with ~1.8M headroom).

    Chunk width prefers an EXACT divisor of the padded width (>= half
    the budget cap): a non-divisor Lc forces tail x pads that sit
    INSIDE the EM while-loop (XLA does not hoist them - CLAUDE.md);
    only when no such divisor exists is the padding spread evenly."""
    if Kp > 128:
        # the chunk bindings (unaliased p0 windows + a0 threading) are
        # compile-verified only to Kp=128; the round-5 full sweep caught
        # tile-irregular OOMs from Kp=256 up - larger-K biobank fits
        # take the calibrated streamed path instead
        return 0, 0, 0, 0
    best = None
    for rank, (ti, tl, b_max) in enumerate(_FULLSTEP_BI_TILES):
        if I % ti or not _bi_k_fits(ti, tl, Kp):
            continue
        cap = b_max - b_max // 4
        Lc = (cap // (Kp * 4)) // tl * tl
        if Lc <= 0:
            continue
        if best is None or Lc > best[0] or (Lc == best[0]
                                            and rank < best[1]):
            best = (Lc, rank, ti, tl)
    if best is None:
        return 0, 0, 0, 0
    Lc_max, _, ti, tl = best
    Lp_min = _round_up(L, tl)
    for cand in range(Lc_max, max(Lc_max // 2, tl) - 1, -tl):
        if Lp_min % cand == 0:
            return ti, tl, cand, Lp_min // cand
    n_chunks = -(-Lp_min // Lc_max)
    Lc = _round_up(-(-Lp_min // n_chunks), tl)
    return ti, tl, Lc, n_chunks


def pick_layout_biallelic_any(I: int, Kp: int, L: int,
                              emit_b: bool = False):
    """(ti, tl, Lp, mode) with mode 'resident' (single fused kernel, B in
    VMEM) when the ladder admits it, else 'chunked' (chained one-pass
    launches over resident-budget column chunks; Lp = Lc * n_chunks),
    else 'streamed' (two-pass, no Lp ceiling); ('', 0 tiles) when none
    applies.  ``emit_b`` = the caller will run the kernels with
    emit_b=True (mesh path)."""
    ti, tl, Lp = pick_layout_biallelic(I, Kp, L, emit_b)
    if ti:
        return ti, tl, Lp, "resident"
    ti, tl, Lc, n_chunks = pick_layout_biallelic_chunked(I, Kp, L)
    if ti:
        return ti, tl, Lc * n_chunks, "chunked"
    ti, tl, Lp = pick_layout_biallelic_streamed(I, Kp, L, emit_b)
    if ti:
        return ti, tl, Lp, "streamed"
    return 0, 0, 0, ""


def admixture_fullstep_biallelic_chunked(eta, p0, x0, x1, c, miss=None, *,
                                         ti: int, tl: int, n_chunks: int,
                                         k_true: int, lb: float, plb: float,
                                         project: bool,
                                         compute_t: bool = True,
                                         emit_b: bool = False,
                                         emit_a: bool = False,
                                         interpret: bool = False,
                                         project_eta: bool = None,
                                         kmask=None):
    """ONE-PASS biallelic full step for L beyond the resident-B budget: a
    chain of ``n_chunks`` resident fullstep launches over tl-aligned
    column chunks (static block-spec offsets - no HBM slicing), with the
    per-individual A accumulator threaded through the chain via the a0
    input.  Each chunk streams its x columns ONCE and runs the
    denominator matmuls once (vs twice for the two-pass streamed
    kernels); B0/B1 and the complete p update stay chunk-local in VMEM.
    The final launch adds the global missing totals ``c`` and finishes
    the eta update on-chip (em_alg.c:435-445's memory/time trade taken
    chunk-wise instead of pass-wise).

    Same contract as ``admixture_fullstep_biallelic``: returns
    (eta_new, t [I], p0_new [Kp, Lp]); with ``emit_b`` the raw
    (eta_new, t, B0, B1) for the caller's data-axis psum; with
    ``emit_a`` (+ emit_b) the first output is the raw A+r total for the
    caller's model-axis psum."""
    Lp = p0.shape[1]
    assert Lp % n_chunks == 0, (Lp, n_chunks)
    a0 = None
    t_sum = None
    p0n_chunks, b0_chunks, b1_chunks = [], [], []
    for j in range(n_chunks):
        last = j == n_chunks - 1
        out = admixture_fullstep_biallelic(
            eta, p0, x0, x1, c, miss, a0, kmask,
            ti=ti, tl=tl, k_true=k_true,
            lb=lb, plb=plb, project=project, compute_t=compute_t,
            emit_b=emit_b, emit_a=emit_a if last else True,
            chunk_idx=j, n_chunks=n_chunks, interpret=interpret,
            project_eta=project_eta)
        if emit_b:
            aout, t_j, b0, b1 = out
            b0_chunks.append(b0)
            b1_chunks.append(b1)
        else:
            aout, t_j, p0n = out
            p0n_chunks.append(p0n)
        if compute_t:
            t_sum = t_j if t_sum is None else t_sum + t_j
        a0 = aout  # raw A+r for the next launch; finished eta on the last
    if t_sum is None:
        t_sum = jnp.zeros((eta.shape[0],), jnp.float32)
    if emit_b:
        return a0, t_sum, jnp.concatenate(b0_chunks, axis=1), \
            jnp.concatenate(b1_chunks, axis=1)
    return a0, t_sum, jnp.concatenate(p0n_chunks, axis=1)


def _bi_istats_kernel(eta_ref, p0_ref, x0_ref, x1_ref, c_ref, *rest,
                      n_l: int, k_true: int, lb: float, project: bool,
                      compute_t: bool, emit_a: bool = False,
                      project_eta: bool = None,
                      with_kmask: bool = False):
    rest = list(rest)
    kmask_ref = rest.pop(0) if with_kmask else None
    etan_ref, t_ref, a_scr, r_scr = rest
    """Streamed pass A (grid i-outer, l-inner): per-individual statistics
    and the COMPLETE eta update; p0 streams through VMEM as [Kp, tl]
    blocks.  Same math as _fullstep_bi_kernel's A/t/eta side."""
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _():
        a_scr[:] = jnp.zeros_like(a_scr)
        r_scr[:] = jnp.zeros_like(r_scr)
        t_ref[:] = jnp.zeros_like(t_ref)

    eta = eta_ref[:]
    p0 = p0_ref[:]                                     # [Kp, tl] block
    d0 = jnp.dot(eta, p0, preferred_element_type=jnp.float32)
    s = jnp.sum(eta, axis=1, keepdims=True)
    d1 = s - d0
    d0 = jnp.maximum(d0, 1e-30)
    d1 = jnp.maximum(d1, 1e-30)
    x0 = x0_ref[:].astype(jnp.float32)
    x1 = x1_ref[:].astype(jnp.float32)
    w0 = x0 * _recip(d0)
    w1 = x1 * _recip(d1)
    if compute_t:
        t_ref[:] += jnp.sum(x0 * jnp.log(d0) + x1 * jnp.log(d1), axis=1,
                            keepdims=True)
    a_scr[:] += jnp.dot(w0 - w1, p0.T, preferred_element_type=jnp.float32)
    r_scr[:] += jnp.sum(w1, axis=1, keepdims=True)

    @pl.when(l_idx == n_l - 1)
    def _():
        if emit_a:
            # loci-sharded mesh: raw A+r for the caller's model-axis
            # psum (c is global - added post-psum by the caller)
            etan_ref[:] = a_scr[:] + r_scr[:]
        else:
            A = a_scr[:] + r_scr[:] + c_ref[:]
            num = eta_ref[:] * A
            tot = jnp.sum(num, axis=1, keepdims=True)
            e2 = jnp.where(tot > 0, num / jnp.where(tot > 0, tot, 1.0),
                           eta_ref[:])
            # dynamic-K: runtime kmask keeps the Michelot on-chip
            # (see _fullstep_bi_kernel)
            if project if project_eta is None else project_eta:
                e2 = _michelot_tile(
                    e2, k_true, lb,
                    kmask_ref[:] if with_kmask else None)
            etan_ref[:] = e2


def _bi_lstats_kernel(eta_ref, p0_ref, x0_ref, x1_ref, *rest,
                      n_i: int, plb: float, project: bool, with_miss: bool,
                      emit_b: bool):
    """Streamed pass B (grid l-outer, i-inner): per-locus B0/B1 merges in
    [Kp, tl] scratch and the COMPLETE p update for the l block at the last
    i step (or, with ``emit_b``, the raw B0/B1 blocks for the caller's
    cross-shard merge).  Missing mass folds in as eta^T @ (w + miss)
    (em_alg.c:400-431, :727-746)."""
    rest = list(rest)
    miss_ref = rest.pop(0) if with_miss else None
    if emit_b:
        p0n_ref = None
        b0_out, b1_out, b0_scr, b1_scr = rest
    else:
        p0n_ref, b0_scr, b1_scr = rest
    i_idx = pl.program_id(1)

    @pl.when(i_idx == 0)
    def _():
        b0_scr[:] = jnp.zeros_like(b0_scr)
        b1_scr[:] = jnp.zeros_like(b1_scr)

    eta = eta_ref[:]
    p0 = p0_ref[:]                                     # [Kp, tl] block
    d0 = jnp.dot(eta, p0, preferred_element_type=jnp.float32)
    s = jnp.sum(eta, axis=1, keepdims=True)
    d1 = s - d0
    d0 = jnp.maximum(d0, 1e-30)
    d1 = jnp.maximum(d1, 1e-30)
    w0 = x0_ref[:].astype(jnp.float32) * _recip(d0)
    w1 = x1_ref[:].astype(jnp.float32) * _recip(d1)
    if with_miss:
        mi = miss_ref[:].astype(jnp.float32)
        w0 = w0 + mi
        w1 = w1 + mi
    b0_scr[:] += jnp.dot(eta.T, w0, preferred_element_type=jnp.float32)
    b1_scr[:] += jnp.dot(eta.T, w1, preferred_element_type=jnp.float32)

    if emit_b:
        @pl.when(i_idx == n_i - 1)
        def _():
            b0_out[:] = b0_scr[:]
            b1_out[:] = b1_scr[:]
    else:
        @pl.when(i_idx == n_i - 1)
        def _():
            p0f = p0_ref[:]
            pc0 = p0f * b0_scr[:]
            pc1 = (1.0 - p0f) * b1_scr[:]
            tot = pc0 + pc1
            q0 = jnp.where(tot > 0,
                           pc0 * _recip(jnp.where(tot > 0, tot, 1.0)), 0.0)
            if project:
                ub = float(
                    np.float32(1.0)
                    - np.float32(max(plb, float(np.finfo(np.float32).eps))))
                q0 = jnp.where(tot > 0, jnp.clip(q0, plb, ub), 0.0)
            p0n_ref[:] = q0


@functools.partial(jax.jit, static_argnames=(
    "ti", "tl", "k_true", "lb", "plb", "project", "compute_t", "emit_b",
    "emit_a", "interpret", "project_eta"))
def admixture_fullstep_biallelic_streamed(eta, p0, x0, x1, c, miss=None,
                                          kmask=None, *,
                                          ti: int, tl: int, k_true: int,
                                          lb: float, plb: float,
                                          project: bool,
                                          compute_t: bool = True,
                                          emit_b: bool = False,
                                          emit_a: bool = False,
                                          interpret: bool = False,
                                          project_eta: bool = None):
    """Biallelic full EM step for UNBOUNDED L: two passes, each streaming
    x once and p0 as [Kp, tl] blocks, with the eta update finished in pass
    A and the p update finished per l-block in pass B - B0/B1 never leave
    VMEM scratch and nothing [Kp, Lp]-sized is VMEM resident.  Covers the
    biobank-L leg (Lp beyond _FULLSTEP_BI_TILES' resident-copy ceiling);
    same contract and math as ``admixture_fullstep_biallelic`` (no buffer
    aliasing: both passes read the original eta/p0).  Cost vs the resident
    kernel: x/eta stream twice and the denominator matmul runs twice
    (em_alg.c:435-445's memory/time trade, taken the opposite way).
    ``emit_a`` (requires emit_b): pass A emits the raw A+r accumulator
    instead of finishing the eta update (loci-sharded mesh - see
    ``admixture_fullstep_biallelic``)."""
    I, Kp = eta.shape
    Lp = p0.shape[1]
    assert I % ti == 0 and Lp % tl == 0 and Kp % 32 == 0, (I, ti, Lp, tl)
    assert not emit_a or emit_b, "emit_a requires emit_b"
    n_i, n_l = I // ti, Lp // tl
    f32 = jnp.float32
    with_miss = miss is not None
    with_kmask = kmask is not None

    a_in_specs = [
        pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, tl), lambda i, l: (0, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tl), lambda i, l: (i, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tl), lambda i, l: (i, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, 1), lambda i, l: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    a_args = [eta, p0, x0, x1, c]
    if with_kmask:
        a_in_specs.append(pl.BlockSpec((1, Kp), lambda i, l: (0, 0),
                                       memory_space=pltpu.VMEM))
        a_args.append(kmask.reshape(1, Kp).astype(f32))

    etan, t_out = pl.pallas_call(
        functools.partial(_bi_istats_kernel, n_l=n_l, k_true=k_true, lb=lb,
                          project=project, compute_t=compute_t,
                          project_eta=project_eta, with_kmask=with_kmask,
                          emit_a=emit_a),
        grid=(n_i, n_l),
        in_specs=a_in_specs,
        out_specs=[
            pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((I, Kp), f32),
            jax.ShapeDtypeStruct((I, 1), f32),
        ],
        scratch_shapes=[pltpu.VMEM((ti, Kp), f32),
                        pltpu.VMEM((ti, 1), f32)],
        interpret=interpret,
    )(*a_args)

    in_specs = [
        pl.BlockSpec((ti, Kp), lambda l, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, tl), lambda l, i: (0, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tl), lambda l, i: (i, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tl), lambda l, i: (i, l),
                     memory_space=pltpu.VMEM),
    ]
    args = [eta, p0, x0, x1]
    if with_miss:
        in_specs.append(pl.BlockSpec((ti, tl), lambda l, i: (i, l),
                                     memory_space=pltpu.VMEM))
        args.append(miss)

    kl_spec = pl.BlockSpec((Kp, tl), lambda l, i: (0, l),
                           memory_space=pltpu.VMEM)
    kl_shape = jax.ShapeDtypeStruct((Kp, Lp), f32)
    outs = pl.pallas_call(
        functools.partial(_bi_lstats_kernel, n_i=n_i, plb=plb,
                          project=project, with_miss=with_miss,
                          emit_b=emit_b),
        grid=(n_l, n_i),
        in_specs=in_specs,
        out_specs=[kl_spec, kl_spec] if emit_b else kl_spec,
        out_shape=[kl_shape, kl_shape] if emit_b else kl_shape,
        scratch_shapes=[pltpu.VMEM((Kp, tl), f32),
                        pltpu.VMEM((Kp, tl), f32)],
        interpret=interpret,
    )(*args)
    if emit_b:
        return etan, t_out[:, 0], outs[0], outs[1]
    return etan, t_out[:, 0], outs


# ---------------------------------------------------------------------------
# mixture model (C7): fused biallelic full step
#
# The XLA mixture step (model/mixture.py) is two large matmuls plus glue,
# but at small K it is HBM-bound on the genotype stream and the f32
# materializations around it (BASELINE.md round-3: 124.5 Gcells/s vs the
# admixture kernels' 233).  These kernels mirror the admixture two-pass
# split (e_step_mixture em_alg.c:763-897 / m_step_mixture :907-1011):
#
#   pass A (grid i-outer, l-inner): scores s_ik accumulate in a [ti, Kp]
#     VMEM block over l tiles (one int8 x tile -> MXU matmul each), then
#     the row softmax, posterior v and per-individual logL (logsumexp)
#     finish ON-CHIP at the last l step - nothing [I, LM]-sized exists.
#   pass B (grid l-outer, i-inner): B0 = v^T @ x0 merges in [Kp, tl]
#     scratch; the COMPLETE p update (p_lower_bound added BEFORE
#     normalization - the reference's mixture/admixture asymmetry,
#     em_alg.c:972 vs :713 - then the closed-form 2-simplex projection)
#     runs at the last i step per l block.
#
# Missing-free panels (x1 = ploidy - x0 identically) stream x0 alone with
# d = log p0 - log p1 folded scores and pc1 = ploidy*vtot - pc0 counts
# (model/mixture._scores_bi math); with_x1=True streams both alleles and
# covers missing data (the mixture model simply skips missing slots,
# read_file.c:438 sort + m_start idiom).

def _mix_scores_kernel(lp0_ref, x0_ref, *rest, n_l: int, with_x1: bool):
    """Pass A: scores -> softmax -> (v, t).  lp0 is d = logp0 - logp1
    (missing-free) or log p0 (with_x1); bias carries base + log eta with
    K-pad lanes at -1e30 so their posterior mass is exactly zero."""
    rest = list(rest)
    if with_x1:
        lp1_ref = rest.pop(0)
        x1_ref = rest.pop(0)
    bias_ref, v_ref, t_ref, s_scr = rest
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)

    x0 = x0_ref[:].astype(jnp.float32)
    acc = jnp.dot(x0, lp0_ref[:].T, preferred_element_type=jnp.float32)
    if with_x1:
        x1 = x1_ref[:].astype(jnp.float32)
        acc = acc + jnp.dot(x1, lp1_ref[:].T,
                            preferred_element_type=jnp.float32)
    s_scr[:] += acc

    @pl.when(l_idx == n_l - 1)
    def _():
        s = s_scr[:] + bias_ref[:]
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        tot = jnp.sum(e, axis=1, keepdims=True)
        v_ref[:] = e * _recip(tot)
        t_ref[:] = jnp.log(tot) + m


def _mix_counts_kernel(v_ref, x0_ref, *rest, n_i: int, plb: float,
                       ploidy: int, project: bool, with_x1: bool):
    """Pass B: expected counts + complete p update per l block."""
    rest = list(rest)
    x1_ref = rest.pop(0) if with_x1 else None
    vtot_ref = None if with_x1 else rest.pop(0)
    p0n_ref = rest.pop(0)
    b0_scr = rest.pop(0)
    b1_scr = rest.pop(0) if with_x1 else None
    i_idx = pl.program_id(1)

    @pl.when(i_idx == 0)
    def _():
        b0_scr[:] = jnp.zeros_like(b0_scr)
        if with_x1:
            b1_scr[:] = jnp.zeros_like(b1_scr)

    v = v_ref[:]
    b0_scr[:] += jnp.dot(v.T, x0_ref[:].astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    if with_x1:
        b1_scr[:] += jnp.dot(v.T, x1_ref[:].astype(jnp.float32),
                             preferred_element_type=jnp.float32)

    @pl.when(i_idx == n_i - 1)
    def _():
        pc0 = b0_scr[:] + plb
        if with_x1:
            pc1 = b1_scr[:] + plb
        else:
            # sum_i v_ik x1_il = ploidy * vtot_k - B0_kl (x1 = ploidy-x0)
            pc1 = ploidy * vtot_ref[:] - b0_scr[:] + plb
        q0 = pc0 * _recip(pc0 + pc1)
        if project:
            ub = float(
                np.float32(1.0)
                - np.float32(max(plb, float(np.finfo(np.float32).eps))))
            q0 = jnp.clip(q0, plb, ub)
        p0n_ref[:] = q0


@functools.partial(jax.jit, static_argnames=(
    "ti", "tl", "plb", "ploidy", "project", "interpret"))
def mixture_fullstep_biallelic(lp0, x0, bias, lp1=None, x1=None,
                               row_valid=None, *, ti: int, tl: int,
                               plb: float, ploidy: int, project: bool,
                               interpret: bool = False):
    """Fused biallelic mixture EM step (see the pass A/B comment above).

    Args: lp0 [Kp, Lp] (d = logp0 - logp1, or log p0 when x1 given),
    x0 [I, Lp] allele-0 counts (any int dtype, pad rows/cols zero),
    bias [1, Kp] = base + log eta (K-pads -1e30), optional lp1/x1 for the
    two-stream (missing-data) variant, optional row_valid [I] bool
    marking real individuals (kernel-pad AND mesh-pad rows False).
    Returns (v [I, Kp] posteriors - pad rows zeroed, t [I] per-individual
    logL terms - pad rows zeroed, p0_new [Kp, Lp]).  The eta update
    (sum_i v / I + projection, m_step_mixture em_alg.c:930-944) is left
    to the caller: it needs the masked global v sum anyway.
    """
    I, Lp = x0.shape
    Kp = lp0.shape[0]
    assert I % ti == 0 and Lp % tl == 0 and Kp % 32 == 0, (I, ti, Lp, tl)
    n_i, n_l = I // ti, Lp // tl
    f32 = jnp.float32
    with_x1 = x1 is not None
    assert (lp1 is not None) == with_x1

    in_specs = [
        pl.BlockSpec((Kp, tl), lambda i, l: (0, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tl), lambda i, l: (i, l),
                     memory_space=pltpu.VMEM),
    ]
    args = [lp0, x0]
    if with_x1:
        in_specs += [
            pl.BlockSpec((Kp, tl), lambda i, l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, tl), lambda i, l: (i, l),
                         memory_space=pltpu.VMEM),
        ]
        args += [lp1, x1]
    in_specs.append(pl.BlockSpec((1, Kp), lambda i, l: (0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(bias)

    v, t = pl.pallas_call(
        functools.partial(_mix_scores_kernel, n_l=n_l, with_x1=with_x1),
        grid=(n_i, n_l),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((I, Kp), f32),
            jax.ShapeDtypeStruct((I, 1), f32),
        ],
        scratch_shapes=[pltpu.VMEM((ti, Kp), f32)],
        interpret=interpret,
    )(*args)

    # pad rows carry softmax(bias) posteriors and garbage t: zero them
    # before anything reduces over i (their x0 rows are zero, so pass B's
    # count matmuls never see them either way, but vtot/eta/logL do)
    if row_valid is not None:
        v = jnp.where(row_valid[:, None], v, 0.0)
        t = jnp.where(row_valid[:, None], t, 0.0)

    in_specs = [
        pl.BlockSpec((ti, Kp), lambda l, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, tl), lambda l, i: (i, l),
                     memory_space=pltpu.VMEM),
    ]
    args = [v, x0]
    scratch = [pltpu.VMEM((Kp, tl), f32)]
    if with_x1:
        in_specs.append(pl.BlockSpec((ti, tl), lambda l, i: (i, l),
                                     memory_space=pltpu.VMEM))
        args.append(x1)
        scratch.append(pltpu.VMEM((Kp, tl), f32))
    else:
        vtot = jnp.sum(v, axis=0)[:, None]            # [Kp, 1]
        in_specs.append(pl.BlockSpec((Kp, 1), lambda l, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(vtot)

    p0n = pl.pallas_call(
        functools.partial(_mix_counts_kernel, n_i=n_i, plb=plb,
                          ploidy=ploidy, project=project, with_x1=with_x1),
        grid=(n_l, n_i),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Kp, tl), lambda l, i: (0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, Lp), f32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return v, t[:, 0], p0n


def _mix_resident_kernel(lp0_ref, x0_ref, *rest, n_i: int,
                         with_x1: bool):
    """SINGLE-PASS mixture step: x is read from HBM exactly once.

    The mixture posterior is row-local (softmax over the [ti, Kp] score
    block), so with the whole [ti, Lp] x row-block in VMEM both the
    E-step contraction s = x @ d^T and the M-step merge B += v^T @ x run
    on the same resident tile - half the genotype traffic of any
    two-pass split (and of the XLA formulation's two matmuls).  B stays
    VMEM-resident across the grid (constant index map) like the
    admixture fullstep's accumulator; vtot/eta/p epilogues are O(Kp Lp)
    XLA glue."""
    rest = list(rest)
    if with_x1:
        lp1_ref = rest.pop(0)
        x1_ref = rest.pop(0)
    bias_ref, v_ref, t_ref, b0_ref = rest[:4]
    b1_ref = rest[4] if with_x1 else None
    i_idx = pl.program_id(0)

    @pl.when(i_idx == 0)
    def _():
        b0_ref[:] = jnp.zeros_like(b0_ref)
        if with_x1:
            b1_ref[:] = jnp.zeros_like(b1_ref)

    x0 = x0_ref[:].astype(jnp.float32)
    s = jnp.dot(x0, lp0_ref[:].T, preferred_element_type=jnp.float32)
    if with_x1:
        x1 = x1_ref[:].astype(jnp.float32)
        s = s + jnp.dot(x1, lp1_ref[:].T,
                        preferred_element_type=jnp.float32)
    s = s + bias_ref[:]
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    tot = jnp.sum(e, axis=1, keepdims=True)
    v = e * _recip(tot)
    v_ref[:] = v
    t_ref[:] = jnp.log(tot) + m
    b0_ref[:] += jnp.dot(v.T, x0, preferred_element_type=jnp.float32)
    if with_x1:
        b1_ref[:] += jnp.dot(v.T, x1, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("ti", "interpret"))
def mixture_sweep_resident(lp0, x0, bias, lp1=None, x1=None, *, ti: int,
                           interpret: bool = False):
    """Single-pass mixture sweep (see _mix_resident_kernel).  Same input
    contract as ``mixture_fullstep_biallelic`` but returns the RAW
    statistics (v [I, Kp], t [I], B0 [Kp, Lp] = v^T x0 and, two-stream,
    B1) - the caller masks pad rows out of v/t before reducing and runs
    the O(Kp Lp) eta/p epilogues in XLA."""
    I, Lp = x0.shape
    Kp = lp0.shape[0]
    assert I % ti == 0 and Kp % 32 == 0, (I, ti, Kp)
    n_i = I // ti
    f32 = jnp.float32
    with_x1 = x1 is not None

    kl_spec = pl.BlockSpec((Kp, Lp), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [kl_spec,
                pl.BlockSpec((ti, Lp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [lp0, x0]
    if with_x1:
        in_specs += [kl_spec,
                     pl.BlockSpec((ti, Lp), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        args += [lp1, x1]
    in_specs.append(pl.BlockSpec((1, Kp), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(bias)

    out_specs = [
        pl.BlockSpec((ti, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ti, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        kl_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct((I, Kp), f32),
        jax.ShapeDtypeStruct((I, 1), f32),
        jax.ShapeDtypeStruct((Kp, Lp), f32),
    ]
    if with_x1:
        out_specs.append(kl_spec)
        out_shape.append(jax.ShapeDtypeStruct((Kp, Lp), f32))

    outs = pl.pallas_call(
        functools.partial(_mix_resident_kernel, n_i=n_i, with_x1=with_x1),
        grid=(n_i,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    v, t = outs[0], outs[1][:, 0]
    if with_x1:
        return v, t, outs[2], outs[3]
    return v, t, outs[2], None


def _mix_resident_fits(ti: int, Lp: int, Kp: int, with_x1: bool) -> bool:
    """Scoped-vmem model for the single-pass kernel: the dominant terms
    are the f32 cast of the resident x block (~2 live copies), the
    double-buffered int8 x tiles, and the resident d/B [Kp, Lp] arrays;
    the two-stream variant doubles all of them.  Threshold shared with
    the calibrated streamed model (13 MB)."""
    streams = 2 if with_x1 else 1
    est = streams * (8 * ti * Lp     # f32 cast, ~2 live copies
                     + 2 * ti * Lp   # int8 x tile, double-buffered
                     + 8 * Kp * Lp)  # d + B accumulator, f32
    return est <= 13 * 1024 * 1024


# (ti,) ladder for the single-pass kernel; larger row blocks amortize
# the resident d/B re-reads.  TPU-compile-verified by
# scripts/tpu_compile_sweep.py.
_MIX_RESIDENT_TI = (512, 256, 128, 64)


def pick_layout_mixture_resident(I: int, Kp: int, L: int, with_x1: bool):
    """(ti, Ip, Lp) for the single-pass mixture kernel, or (0, 0, 0)
    when the x row-block does not fit VMEM at any ti (large L falls back
    to the two-pass kernels / XLA).  Prefers the minimum row padding,
    ties broken by the larger (faster) row block."""
    Lp = _round_up(L, 128)
    best = None
    for ti in _MIX_RESIDENT_TI:
        if _mix_resident_fits(ti, Lp, Kp, with_x1):
            Ip = _round_up(I, ti)
            if best is None or Ip < best[0]:
                best = (Ip, ti)
    if best is None:
        return 0, 0, 0
    return best[1], best[0], Lp


# (ti, tl) ladder for the two-pass mixture kernels: nothing [Kp, Lp]-
# sized is VMEM resident (scores/v are [ti, Kp], B0/B1 are [Kp, tl]
# scratch), so the streamed-kernel vmem model applies with slightly
# lighter elementwise pressure (one f32 cast chain, no reciprocals/logs
# per cell).  Entries TPU-compile-verified by
# scripts/tpu_compile_sweep.py.
_MIX_TILES = (
    (256, 2048), (512, 1024), (256, 1024), (512, 512), (256, 512),
    (128, 512), (64, 512), (64, 256), (64, 128),
)


def pick_layout_mixture(I: int, Kp: int, L: int, with_x1: bool):
    """(ti, tl, Ip, Lp) for the mixture biallelic kernels - rows pad to
    ti (pad rows are masked out via row_valid), loci to tl; (0,)*4 when
    the vmem model admits nothing."""
    for ti, tl in _MIX_TILES:
        # the two-stream variant doubles the x/lp streams: reuse the
        # streamed-kernel budget with emit_b standing in for the extra
        # resident [Kp, tl]/[ti, tl] blocks
        if _stream_vmem_fits(ti, tl, Kp, emit_b=with_x1):
            return ti, tl, _round_up(I, ti), _round_up(L, tl)
    return 0, 0, 0, 0


def _fused_kernel(eta_ref, p_ref, x_ref, a_ref, t_ref, b_ref, *, tl: int,
                  compute_t: bool):
    i_idx = pl.program_id(0)
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)
        t_ref[:] = jnp.zeros_like(t_ref)

    @pl.when(jnp.logical_and(i_idx == 0, l_idx == 0))
    def _():
        b_ref[:] = jnp.zeros_like(b_ref)

    denom = jnp.dot(eta_ref[:], p_ref[:],
                    preferred_element_type=jnp.float32)        # [TI, TL]
    xb = x_ref[:].astype(jnp.float32)
    pos = xb > 0
    safe_d = jnp.where(denom > 0, denom, 1.0)
    w = jnp.where(pos, xb * _recip(safe_d), 0.0)
    if compute_t:
        t = jnp.where(pos, xb * jnp.log(safe_d), 0.0)
        t_ref[:] += jnp.sum(t, axis=1, keepdims=True)
    a_ref[:] += jnp.dot(w, p_ref[:].T, preferred_element_type=jnp.float32)
    col = pl.multiple_of(l_idx * tl, tl)
    b_ref[:, pl.ds(col, tl)] += jnp.dot(
        eta_ref[:].T, w, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("ti", "tl", "compute_t",
                                             "interpret"))
def admixture_sweep_fused(eta, p2, x2, *, ti: int = 256, tl: int = 512,
                          compute_t: bool = True, interpret: bool = False):
    """Single-pass fused sweep statistics (see module docstring).

    Same contract as ``admixture_sweep_stats`` but reads x once and runs
    the denominator matmul once per tile; caller must check
    ``fused_fits(Kp, LMp)`` first.  ``compute_t=False`` skips the logL
    accumulation (t returned as zeros; check-interval mode).
    """
    I, Kp = eta.shape
    LMp = p2.shape[1]
    assert I % ti == 0 and LMp % tl == 0, (I, ti, LMp, tl)
    assert fused_fits(Kp, LMp), (Kp, LMp)
    n_i, n_l = I // ti, LMp // tl
    f32 = jnp.float32

    a_out, t_out, b_out = pl.pallas_call(
        functools.partial(_fused_kernel, tl=tl, compute_t=compute_t),
        grid=(n_i, n_l),
        in_specs=[
            pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tl), lambda i, l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, tl), lambda i, l: (i, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, LMp), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((I, Kp), f32),
            jax.ShapeDtypeStruct((I, 1), f32),
            jax.ShapeDtypeStruct((Kp, LMp), f32),
        ],
        interpret=interpret,
    )(eta, p2, x2)
    return a_out, t_out[:, 0], b_out


def _istats_kernel(eta_ref, p_ref, x_ref, a_ref, t_ref, *, compute_t: bool):
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)
        t_ref[:] = jnp.zeros_like(t_ref)

    denom = jnp.dot(eta_ref[:], p_ref[:],
                    preferred_element_type=jnp.float32)       # [TI, TL]
    xb = x_ref[:].astype(jnp.float32)
    pos = xb > 0
    safe_d = jnp.where(denom > 0, denom, 1.0)
    w = jnp.where(pos, xb * _recip(safe_d), 0.0)
    if compute_t:
        t = jnp.where(pos, xb * jnp.log(safe_d), 0.0)
        t_ref[:] += jnp.sum(t, axis=1, keepdims=True)
    a_ref[:] += jnp.dot(w, p_ref[:].T, preferred_element_type=jnp.float32)


def _lstats_kernel(eta_ref, p_ref, x_ref, b_ref):
    i_idx = pl.program_id(1)

    @pl.when(i_idx == 0)
    def _():
        b_ref[:] = jnp.zeros_like(b_ref)

    denom = jnp.dot(eta_ref[:], p_ref[:],
                    preferred_element_type=jnp.float32)       # [TI, TL]
    xb = x_ref[:].astype(jnp.float32)
    w = jnp.where(xb > 0, xb * _recip(jnp.where(denom > 0, denom, 1.0)),
                  0.0)
    b_ref[:] += jnp.dot(eta_ref[:].T, w,
                        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("ti", "tl", "compute_t",
                                             "interpret"))
def admixture_sweep_stats(eta, p2, x2, *, ti: int = 256, tl: int = 512,
                          compute_t: bool = True, interpret: bool = False):
    """Fused sweep statistics.

    Args:
      eta: [I, Kp] admixture proportions, Kp a multiple of 128 (zero pad).
      p2:  [Kp, LMp] allele frequencies, LMp a multiple of ``tl``.
      x2:  [I, LMp] allele counts (padding columns zero).
    Returns:
      A [I, Kp], t [I] (per-individual logL terms), B [Kp, LMp].
    """
    I, Kp = eta.shape
    LMp = p2.shape[1]
    assert I % ti == 0 and LMp % tl == 0, (I, ti, LMp, tl)
    n_i, n_l = I // ti, LMp // tl
    f32 = jnp.float32

    a_out, t_out = pl.pallas_call(
        functools.partial(_istats_kernel, compute_t=compute_t),
        grid=(n_i, n_l),
        in_specs=[
            pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tl), lambda i, l: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, tl), lambda i, l: (i, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ti, Kp), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((I, Kp), f32),
            jax.ShapeDtypeStruct((I, 1), f32),
        ],
        interpret=interpret,
    )(eta, p2, x2)

    b_out = pl.pallas_call(
        _lstats_kernel,
        grid=(n_l, n_i),
        in_specs=[
            pl.BlockSpec((ti, Kp), lambda l, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, tl), lambda l, i: (0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, tl), lambda l, i: (i, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Kp, tl), lambda l, i: (0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, LMp), f32),
        interpret=interpret,
    )(eta, p2, x2)

    return a_out, t_out[:, 0], b_out


def pad_for_kernel(eta, p2, x2, ti: int = 256, tl: int = 512,
                   k_mult: int = 32):
    """Zero-pad (I, K, LM) to kernel tile multiples; returns padded arrays
    and the original sizes for slicing back.  K pads to 32 lanes (see
    module docstring: output-area bound, not contraction bound)."""
    I, K = eta.shape
    LM = p2.shape[1]
    Ip, Kp, LMp = _round_up(I, ti), _round_up(K, k_mult), _round_up(LM, tl)
    # pad each tensor only if it actually grows (a zero-width jnp.pad can
    # still materialize a copy of the big count tensor)
    if (Ip, Kp) != (I, K):
        eta = jnp.pad(eta, ((0, Ip - I), (0, Kp - K)))
    if (Kp, LMp) != (K, LM):
        p2 = jnp.pad(p2, ((0, Kp - K), (0, LMp - LM)))
    if (Ip, LMp) != (I, LM):
        x2 = jnp.pad(x2, ((0, Ip - I), (0, LMp - LM)))
    return eta, p2, x2, (I, K, LM)
