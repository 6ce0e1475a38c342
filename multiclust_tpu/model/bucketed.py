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

    @property
    def n_buckets(self) -> int:
        return len(self.ranges)


class BucketedData(NamedTuple):
    """Tuple-of-ModelData pytree consumed by em_step_bucketed; loci are
    in plan-sorted order, each bucket trimmed to its own M ceiling."""

    buckets: Tuple[ModelData, ...]
    perm: Array                # [L] device copy of plan.order (harvest)

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
        return self._replace(
            buckets=tuple(b.prepare_for_em(bi=False)
                          for b in self.buckets))


def plan_buckets(n_alleles: np.ndarray, M_full: int,
                 min_bucket: int = 64,
                 max_buckets: int = 8) -> Optional[JaggedPlan]:
    """Group loci by allele count into at most ``max_buckets`` buckets of
    at least ``min_bucket`` loci (tiny groups merge UPWARD into the next
    larger-M bucket, which only adds padding, never drops lanes).
    Returns None for degenerate inputs (single group)."""
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
    return JaggedPlan(order=order, inv_order=inv,
                      ranges=tuple((int(a), int(b)) for a, b in ranges),
                      Ms=Ms, M_full=M_full)


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
    """Permute loci into plan order and slice per-bucket ModelDatas
    (one-time device gathers; derived aliases reset)."""
    perm = jnp.asarray(plan.order)
    x = jnp.take(md.x, perm, axis=1)
    miss = jnp.take(md.miss, perm, axis=1)
    mask = jnp.take(md.mask, perm, axis=0)
    n_all = jnp.take(md.n_alleles, perm, axis=0)
    buckets = []
    for (lo, hi), M_b in zip(plan.ranges, plan.Ms):
        buckets.append(ModelData(
            x=x[:, lo:hi, :M_b],
            miss=miss[:, lo:hi],
            mask=mask[lo:hi, :M_b],
            n_alleles=n_all[lo:hi],
            row_valid=md.row_valid))
    return BucketedData(buckets=tuple(buckets), perm=perm)


def split_params(params: Params, plan: JaggedPlan) -> Params:
    """Dense p [.., K, L, M_full] -> tuple of per-bucket
    [.., K, L_b, M_b] (plan-sorted loci).  Batched OK."""
    if isinstance(params.p, tuple):
        return params
    p = jnp.take(params.p, jnp.asarray(plan.order), axis=-2)
    parts = tuple(p[..., lo:hi, :M_b]
                  for (lo, hi), M_b in zip(plan.ranges, plan.Ms))
    return params._replace(p=parts)


def split_params_like(params: Params, bd: BucketedData) -> Params:
    """Dense p [.., K, L, M] -> per-bucket tuple, using the bucket
    shapes/permutation carried BY the BucketedData (no plan object
    needed inside jitted engine functions).  No-op when already split."""
    if isinstance(params.p, tuple):
        return params
    p = jnp.take(params.p, bd.perm, axis=-2)
    parts = []
    lo = 0
    for b in bd.buckets:
        parts.append(p[..., lo:lo + b.L, :b.M])
        lo += b.L
    return params._replace(p=tuple(parts))


def merge_params_like(params: Params, bd: BucketedData,
                      M_full: int) -> Params:
    """Inverse of split_params_like: per-bucket tuple -> dense
    [.., K, L, M_full] in ORIGINAL locus order (harvest time)."""
    if not isinstance(params.p, tuple):
        return params
    parts = [jnp.pad(pb, [(0, 0)] * (pb.ndim - 1)
                     + [(0, M_full - pb.shape[-1])])
             for pb in params.p]
    p_sorted = jnp.concatenate(parts, axis=-2)
    inv = jnp.argsort(bd.perm)
    p = jnp.take(p_sorted, inv, axis=-2)
    return params._replace(p=p)


def merge_params(params: Params, plan: JaggedPlan) -> Params:
    """Inverse of split_params: per-bucket tuple -> dense
    [.., K, L, M_full] in ORIGINAL locus order.  Batched OK."""
    if not isinstance(params.p, tuple):
        return params
    parts = [jnp.pad(pb, [(0, 0)] * (pb.ndim - 1)
                     + [(0, plan.M_full - pb.shape[-1])])
             for pb in params.p]
    p_sorted = jnp.concatenate(parts, axis=-2)
    p = jnp.take(p_sorted, jnp.asarray(plan.inv_order), axis=-2)
    return params._replace(p=p)
