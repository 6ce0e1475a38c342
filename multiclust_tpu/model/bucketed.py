"""Jagged-M locus bucketing (C8 at heterogeneous allele counts).

The dense representation pads every locus to the panel-wide M_max
(`x[I, L, M_max]`, SURVEY.md section 7 "hard parts" /
`dat->uniquealleles`, read_file.c:443-600).  Real mixed panels -
microsatellites with M_l anywhere in 2..40 next to SNP blocks - then
waste FLOPs and HBM proportional to sum_l(M_max - M_l) / sum_l M_l,
several-fold on realistic mixes.

Bucketing groups loci by allele count: loci are permuted into ascending-
M_l order (a one-time gather), split into a handful of contiguous
buckets, and each bucket is padded only to ITS OWN allele ceiling.  The
admixture EM step (model/admixture.em_step_bucketed) then runs one
launch per bucket: the per-individual statistics A[i,k] and the logL
terms t[i] ACCUMULATE across launches while the B/p updates are
locus-local to each bucket - exactly the additive structure recorded in
BASELINE.md (round 2 decision).  The eta update runs once on the merged
A.  Parameters carry p as a TUPLE of per-bucket arrays; the whole
EM/acceleration machinery (opt/em.py ring buffers, SQUAREM/QN points,
vmapped chains) is pytree-shape-agnostic, so only the model functions
and the projections branch on the representation.

Restrictions (documented in PARITY.md): admixture unconstrained fits,
single-mesh (no loci sharding - each bucket is small by construction),
mixture/constrained fits keep the dense layout.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from multiclust_tpu.model.common import Array, ModelData, Params


@dataclasses.dataclass(frozen=True)
class JaggedPlan:
    """Host-side bucketing plan (static at trace time)."""

    order: np.ndarray          # [L] original locus index at sorted pos j
    inv_order: np.ndarray      # [L] sorted pos of original locus l
    ranges: Tuple[Tuple[int, int], ...]  # per-bucket [lo, hi) sorted pos
    Ms: Tuple[int, ...]        # per-bucket allele ceiling
    M_full: int                # original dense M_max
    # per-bucket PADDED locus count: L_b rounds up so L_pad * M_b is a
    # multiple of 1024 - every kernel tile lane count divides it, so the
    # chained fullstep launches need NO per-iteration lane pads (a
    # non-hoisted x pad measured ~300 us/iter, round-4 probes).  Padded
    # loci are fully masked, hence inert.
    pad_Ls: Tuple[int, ...] = ()

    @property
    def n_buckets(self) -> int:
        return len(self.ranges)


def _pad_L(L_real: int, M_b: int) -> int:
    import math
    step = 1024 // math.gcd(M_b, 1024)
    return -(-L_real // step) * step


def lane_pad(I: int, LM: int) -> int:
    """Tail-padded width of the concatenated TIGHT lane matrix: a
    multiple of the fullstep ladder's tile lane counts so the fused
    kernel admits without per-iteration pads.  512 suffices whenever I
    divides the (1024, 512) first-ladder tile; otherwise 1024 covers the
    (512, 1024) entry too (ops/kernels._FULLSTEP_TILES)."""
    m = 512 if I % 1024 == 0 else 1024
    return -(-LM // m) * m


class BucketedData(NamedTuple):
    """Tuple-of-ModelData pytree consumed by em_step_bucketed; loci are
    in plan-sorted order, each bucket trimmed to its own M ceiling and
    padded to its tile-aligned locus count (pads masked/inert)."""

    buckets: Tuple[ModelData, ...]
    # [sum of padded L_b] original locus index at each padded-sorted
    # position (pad positions point at locus 0; their columns are zeroed
    # through the bucket masks on split)
    perm: Array
    # [L_original] padded-sorted position of original locus l (harvest)
    inv: Array
    # [I, sum_b L_b*M_b] storage-dtype concatenation of every bucket's
    # flattened count matrix: the admixture kernel treats each (l, m)
    # LANE independently (locus structure only matters in the p
    # epilogue), so the whole jagged panel runs as ONE fullstep launch
    # over this matrix at uniform-kernel efficiency
    # (model/admixture._bucketed_fullstep_fused).  Built by
    # prepare_for_em, BEFORE the EM loop - XLA does not reliably hoist
    # large concats/pads out of loop bodies (measured ~300 us/iter,
    # round-4 probes).
    x_lanes: Optional[Array] = None

    @property
    def I(self) -> int:  # noqa: E743
        return self.buckets[0].I

    @property
    def L(self) -> int:
        return sum(b.L for b in self.buckets)

    @property
    def M(self) -> int:
        return max(b.M for b in self.buckets)

    def prepare_for_em(self, bi: bool = False) -> "BucketedData":
        buckets = tuple(b.prepare_for_em(bi=False)
                        for b in self.buckets)
        x = jnp.concatenate([b.x_flat for b in buckets], axis=1)
        # TIGHT plans (plan_buckets(tight=True)): the concatenated lane
        # count is padded here, ONCE, to the fused kernel's tile multiple
        # - the kernel treats lanes independently, so only the TOTAL
        # needs alignment, not each bucket (round-4 probe: per-bucket
        # 1024-lane alignment was 20% of the lane space on the bench mix
        # and the entire gap to the uniform rate)
        W = lane_pad(self.I, x.shape[1])
        if W != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, W - x.shape[1])))
        return self._replace(buckets=buckets, x_lanes=x)


def plan_buckets(n_alleles: np.ndarray, M_full: int,
                 min_bucket: int = 64,
                 max_buckets: int = 8,
                 tight: bool = False) -> Optional[JaggedPlan]:
    """Group loci by allele count into at most ``max_buckets`` buckets of
    at least ``min_bucket`` loci (tiny groups merge UPWARD into the next
    larger-M bucket, which only adds padding, never drops lanes).
    Returns None for degenerate inputs (single group).

    ``tight`` drops the per-bucket tile alignment (pad_Ls = real L_b):
    correct for the single-launch FUSED path and the XLA loop, where
    only the concatenated lane total needs alignment
    (BucketedData.prepare_for_em pads the tail once).  The CHAINED
    per-bucket-launch fallback needs the aligned plan - callers pick
    tight only when the fused kernel admits the tight lane width
    (runtime/multistart.maximize_likelihood)."""
    n_alleles = np.asarray(n_alleles)
    L = n_alleles.shape[0]
    order = np.argsort(n_alleles, kind="stable")
    sorted_m = n_alleles[order]
    # distinct-M run boundaries in sorted order
    cuts = [0] + list(np.nonzero(np.diff(sorted_m))[0] + 1) + [L]
    if len(cuts) <= 2:
        return None
    # merge small runs upward (into the larger-M neighbor)
    ranges = []
    lo = 0
    for hi in cuts[1:]:
        if hi - lo >= min_bucket or hi == L:
            ranges.append((lo, hi))
            lo = hi
    if lo < L:
        ranges.append((lo, L))
    # cap the launch count: merge the smallest-gain boundaries upward
    while len(ranges) > max_buckets:
        sizes = [hi - lo for lo, hi in ranges]
        j = int(np.argmin(sizes[:-1]))
        ranges[j] = (ranges[j][0], ranges[j + 1][1])
        del ranges[j + 1]
    if len(ranges) <= 1:
        return None
    Ms = tuple(int(sorted_m[hi - 1]) for lo, hi in ranges)
    inv = np.empty(L, np.int64)
    inv[order] = np.arange(L)
    pad_Ls = tuple((hi - lo) if tight else _pad_L(hi - lo, M_b)
                   for (lo, hi), M_b in zip(ranges, Ms))
    return JaggedPlan(order=order, inv_order=inv,
                      ranges=tuple((int(a), int(b)) for a, b in ranges),
                      Ms=Ms, M_full=M_full, pad_Ls=pad_Ls)


def jagged_savings(n_alleles: np.ndarray) -> float:
    """Fraction of dense-layout genotype cells that are padding:
    sum_l(M_max - M_l) / (L * M_max)."""
    n_alleles = np.asarray(n_alleles, np.int64)
    if n_alleles.size == 0:
        return 0.0
    M = int(n_alleles.max())
    return float(np.sum(M - n_alleles) / (n_alleles.size * M))


def worth_bucketing(n_alleles: np.ndarray, threshold: float = 0.25
                    ) -> bool:
    """Bucketing pays when the dense padding waste crosses ``threshold``
    (per-launch overheads eat smaller gains)."""
    return jagged_savings(n_alleles) >= threshold


def bucketize_model_data(md: ModelData, plan: JaggedPlan) -> BucketedData:
    """Permute loci into plan order and slice per-bucket ModelDatas,
    each padded to its tile-aligned locus count (one-time device
    gathers; pads zero/masked; derived aliases reset)."""
    order = jnp.asarray(plan.order)
    x = jnp.take(md.x, order, axis=1)
    miss = jnp.take(md.miss, order, axis=1)
    mask = jnp.take(md.mask, order, axis=0)
    n_all = jnp.take(md.n_alleles, order, axis=0)
    buckets = []
    perm_parts = []
    inv = np.empty(plan.order.shape[0], np.int64)
    pos = 0
    for (lo, hi), M_b, Lp in zip(plan.ranges, plan.Ms, plan.pad_Ls):
        d = Lp - (hi - lo)
        buckets.append(ModelData(
            x=jnp.pad(x[:, lo:hi, :M_b], ((0, 0), (0, d), (0, 0))),
            miss=jnp.pad(miss[:, lo:hi], ((0, 0), (0, d))),
            mask=jnp.pad(mask[lo:hi, :M_b], ((0, d), (0, 0))),
            n_alleles=jnp.pad(n_all[lo:hi], (0, d)),
            row_valid=md.row_valid))
        perm_parts.append(np.concatenate(
            [plan.order[lo:hi], np.zeros(d, np.int64)]))
        inv[plan.order[lo:hi]] = pos + np.arange(hi - lo)
        pos += Lp
    return BucketedData(buckets=tuple(buckets),
                        perm=jnp.asarray(np.concatenate(perm_parts)),
                        inv=jnp.asarray(inv))


def split_params_like(params: Params, bd: BucketedData) -> Params:
    """Dense p [.., K, L, M] -> per-bucket tuple, using the bucket
    shapes/permutation carried BY the BucketedData (no plan object
    needed inside jitted engine functions).  Pad positions (perm -> 0)
    are zeroed through the bucket masks.  No-op when already split."""
    if isinstance(params.p, tuple):
        return params
    p = jnp.take(params.p, bd.perm, axis=-2)
    parts = []
    lo = 0
    for b in bd.buckets:
        part = p[..., lo:lo + b.L, :b.M]
        parts.append(jnp.where(b.mask, part, 0.0))
        lo += b.L
    return params._replace(p=tuple(parts))


def merge_params_like(params: Params, bd: BucketedData,
                      M_full: int) -> Params:
    """Inverse of split_params_like: per-bucket tuple -> dense
    [.., K, L, M_full] in ORIGINAL locus order (harvest time; bd.inv
    maps original loci to their padded-sorted positions, so bucket pad
    columns drop out)."""
    if not isinstance(params.p, tuple):
        return params
    parts = [jnp.pad(pb, [(0, 0)] * (pb.ndim - 1)
                     + [(0, M_full - pb.shape[-1])])
             for pb in params.p]
    p_sorted = jnp.concatenate(parts, axis=-2)
    p = jnp.take(p_sorted, bd.inv, axis=-2)
    return params._replace(p=p)
