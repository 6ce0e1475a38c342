"""Device mesh and sharding layout.

The scaling axes of this model family (SURVEY.md section 2.3) are:

* ``data``  - individuals (I).  The E-step is embarrassingly parallel over
  i; M-step expected-count merges are sum-reductions over i that XLA lowers
  to psum over this axis.
* ``model`` - loci (L), the tensor-parallel analog for biobank-scale L.
  Per-locus normalizations and projections are local to an L shard; the
  per-individual reductions over loci psum over this axis.

Parameters: allele frequencies p[K, L, M] are sharded over loci and
replicated over data; mixture/constrained eta [K] is replicated; admixture
eta [I, K] is sharded over data.  All collectives are inserted by XLA/GSPMD
from these placements - no hand-written psums (the "pick a mesh, annotate
shardings, let XLA insert collectives" recipe).

There is no pipeline, sequence, or expert axis: loci are i.i.d. (no
sequence dimension) and the model has no layered structure - the honest
mapping is 2D dp x tp.  Multi-start chains and bootstrap replicates batch
along a vmapped leading axis within each data shard.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multiclust_tpu.model.common import ModelData, Params

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (SURVEY.md section 5: the reference has
    no distributed backend; ours is jax.distributed + XLA collectives over
    ICI/DCN).  No-op when already initialized or single-process."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def sync_host_flag(flag) -> bool:
    """Make a host-side decision derived from NON-replicated state (wall
    clocks) identical on every process: process 0's value wins.

    Loop decisions gate collective-participating jit calls, so a
    divergent per-process clock (-t / n_seconds / -w budgets) could let
    one process exit a segment loop while another launches a psum - a
    mesh hang.  Replicated-scalar decisions (logL, stopped flags) don't
    need this: every process computes the identical value.  No-op
    single-process."""
    import jax

    if jax.process_count() == 1:
        return bool(flag)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    return bool(np.asarray(multihost_utils.broadcast_one_to_all(
        jnp.asarray(bool(flag)))))


import functools


@functools.lru_cache(maxsize=8)
def cached_mesh(shape: Tuple[int, int]) -> Mesh:
    """Process-wide mesh cache so equal shapes share one Mesh object (the
    EMConfig carrying it is an lru_cache/jit static key)."""
    return make_mesh(shape)


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """Create a (data, model) mesh; default puts every device on data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_specs(has_row_valid: bool = False) -> ModelData:
    """PartitionSpecs for ModelData leaves."""
    return ModelData(
        x=P(DATA_AXIS, MODEL_AXIS, None),
        miss=P(DATA_AXIS, MODEL_AXIS),
        mask=P(MODEL_AXIS, None),
        n_alleles=P(MODEL_AXIS),
        row_valid=P(DATA_AXIS) if has_row_valid else None,
    )


def param_specs(per_individual_eta: bool) -> Params:
    return Params(
        eta=P(DATA_AXIS, None) if per_individual_eta else P(),
        p=P(None, MODEL_AXIS, None),
    )


def _feasible_spec(x, spec: P, mesh: Mesh) -> P:
    """Drop spec axes that do not evenly divide the array (e.g. the 1-row
    collapsed constrained-eta dataset can't shard its data axis)."""
    out = []
    for d, ax in enumerate(spec):
        n = mesh.shape[ax] if ax is not None else 1
        out.append(ax if (ax is not None and x.shape[d] % n == 0
                          and x.shape[d] >= n) else None)
    return P(*out)


def shard_model_data(md: ModelData, mesh: Mesh) -> ModelData:
    from multiclust_tpu.model.bucketed import BucketedData
    if isinstance(md, BucketedData):
        # per-bucket data shards over the data axis; the (tiny) locus
        # permutation tables stay replicated
        def rep(x):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return md._replace(
            buckets=tuple(shard_model_data(b, mesh) for b in md.buckets),
            perm=rep(md.perm), inv=rep(md.inv), x_lanes=None)
    # x_flat is derived data (prepare_for_em re-derives it inside jit with
    # the sharding propagated from x); don't ship it across the mesh
    md = md._replace(x_flat=None, x_bi=None, miss_st=None)
    specs = data_specs(md.row_valid is not None)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _feasible_spec(x, s, mesh))), md, specs)


def shard_params(params: Params, mesh: Mesh) -> Params:
    specs = param_specs(params.eta.ndim == 2)
    if params.kmask is not None:
        specs = specs._replace(kmask=P())
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def chain_data_specs(has_row_valid: bool = False) -> ModelData:
    """PartitionSpecs for ModelData consumed by the BATCHED chain engine
    (identical to data_specs - the chain batch axis lives on the params,
    not the data)."""
    return data_specs(has_row_valid)


def chain_param_specs() -> Params:
    """PartitionSpecs for a [B, ...] batch of admixture chain parameters:
    eta [B, I, K] sharded over individuals, p [B, K, L, M] over loci."""
    return Params(eta=P(None, DATA_AXIS, None),
                  p=P(None, None, MODEL_AXIS, None))


def shard_chain_params(params_b: Params, mesh: Mesh) -> Params:
    """Place a chain-batch parameter pytree onto the mesh.  Mixture /
    constrained chains carry a [B, K] eta - replicated.  The biallelic
    p0-representation ([B, Kp, Lp] p, same ndim as eta) puts loci on the
    model axis (live when model_shards > 1: the emit_a kernels +
    model-axis psums consume per-shard p0 blocks,
    model/admixture._em_step_bi_repr_meshed)."""
    if isinstance(params_b.p, tuple):
        # jagged buckets compose with data-axis meshes only: p leaves
        # replicated, per-individual eta on the data axis
        p_specs = tuple(P() for _ in params_b.p)
        specs = Params(eta=(P(None, DATA_AXIS, None)
                            if params_b.eta.ndim >= 3 else P()),
                       p=p_specs)
    elif params_b.eta.ndim < 3:
        specs = Params(eta=P(), p=P(None, None, MODEL_AXIS, None))
    elif params_b.p.ndim == params_b.eta.ndim:
        specs = Params(eta=P(None, DATA_AXIS, None),
                       p=P(None, None, MODEL_AXIS))
    else:
        specs = chain_param_specs()
    if params_b.kmask is not None:  # dynamic-K lane mask: replicated
        specs = specs._replace(kmask=P())
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _feasible_spec(x, s, mesh))),
        params_b, specs)


def constrain_chain_state(state, mesh: Mesh):
    """with_sharding_constraint on the hot leaves of a batched EMState so
    the compiled segment carries stable shardings through its while/fori
    loop instead of re-deriving (and possibly resharding) every call.

    eta-like leaves [B, ..., I, K] pin I to the data axis; p-like leaves
    [B, ..., K, L, M] pin L to the model axis; scalars-per-chain stay
    replicated."""
    per_individual = state.params.eta.ndim >= 3
    p_leaf = state.params.p
    bucketed = isinstance(p_leaf, tuple)
    bi_repr = (not bucketed
               and p_leaf.ndim == state.params.eta.ndim)

    def c(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    def eta_spec(x):
        if not per_individual:
            return x
        return c(x, P(*([None] * (x.ndim - 2) + [DATA_AXIS, None])))

    def p_spec(x):
        if isinstance(x, tuple):
            # jagged buckets: p replicated (bucketed fits compose only
            # with data-axis meshes, where p carries no sharded axis)
            return x
        if bi_repr:
            # p0-representation [.., Kp, Lp]: loci (last axis) on the
            # model axis (runtime/mesh.shard_chain_params)
            return c(x, P(*([None] * (x.ndim - 1) + [MODEL_AXIS])))
        return c(x, P(*([None] * (x.ndim - 3) + [None, MODEL_AXIS, None])))

    params = state.params._replace(eta=eta_spec(state.params.eta),
                                   p=p_spec(state.params.p))
    ring = state.ring
    if ring is not None:
        ring = ring._replace(
            u=ring.u._replace(eta=eta_spec(ring.u.eta), p=p_spec(ring.u.p)),
            v=ring.v._replace(eta=eta_spec(ring.v.eta), p=p_spec(ring.v.p)))
    return state._replace(params=params, ring=ring)


def pad_md_rows_loci(md: ModelData, I_pad: int, L_pad: int) -> ModelData:
    """Zero-pad device-side ModelData to (I_pad, L_pad); padded loci carry
    n_alleles=0 / mask False so they are inert (test_sharding
    test_padded_rows_are_inert).  BucketedData pads rows per bucket
    (bucketed fits compose only with DATA-axis meshes, so L never
    pads)."""
    import jax.numpy as jnp

    from multiclust_tpu.model.bucketed import BucketedData
    if isinstance(md, BucketedData):
        assert L_pad == md.L, (L_pad, md.L)
        return md._replace(
            buckets=tuple(pad_md_rows_loci(b, I_pad, b.L)
                          for b in md.buckets),
            x_lanes=None)
    dI, dL = I_pad - md.I, L_pad - md.L
    if dI <= 0 and dL <= 0:
        return md
    return md._replace(
        x=jnp.pad(md.x, ((0, dI), (0, dL), (0, 0))),
        miss=jnp.pad(md.miss, ((0, dI), (0, dL))),
        mask=jnp.pad(md.mask, ((0, dL), (0, 0))),
        n_alleles=jnp.pad(md.n_alleles, (0, dL)),
        row_valid=(jnp.pad(md.row_valid, (0, dI))
                   if md.row_valid is not None else
                   (jnp.arange(I_pad) < md.I if dI > 0 else None)),
        x_flat=None, x_bi=None, miss_st=None)


def shardable_sizes(I: int, L: int, mesh: Mesh) -> Tuple[int, int]:
    """Round (I, L) up to multiples of the mesh axes (padding individuals
    with zero-count rows and loci with fully-masked columns is loss-free:
    zero rows contribute nothing to reductions, masked loci carry no
    probability mass)."""
    dd = mesh.shape[DATA_AXIS]
    mm = mesh.shape[MODEL_AXIS]
    return (-(-I // dd) * dd, -(-L // mm) * mm)


def pad_dataset_arrays(counts, miss, n_alleles, I_pad: int, L_pad: int):
    """Zero-pad host arrays to shardable sizes; padded loci get
    n_alleles=0 so every mask lane is off."""
    I, L, M = counts.shape
    if I_pad == I and L_pad == L:
        return counts, miss, n_alleles
    c = np.zeros((I_pad, L_pad, M), counts.dtype)
    c[:I, :L] = counts
    m = np.zeros((I_pad, L_pad), miss.dtype)
    m[:I, :L] = miss
    na = np.zeros((L_pad,), n_alleles.dtype)
    na[:L] = n_alleles
    return c, m, na
