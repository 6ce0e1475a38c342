"""Model initialization (rnd_init.c).

All initializers are pure functions of a PRNG key, so multi-start batches
run as vmapped chains with split keys (the reference serially reuses libc
``rand()``; draw-for-draw parity is impossible and validation is
statistical - SURVEY.md section 7).

Deliberate deviations from reference quirks (documented; init-only, they
affect starting points, not fitted optima):

* ``initialize_parameters_mixture`` (rnd_init.c:296-318) re-zeroes cluster
  k's accumulator inside the k loop while adding counts for ALL clusters
  each pass, so cluster j ends up with 1 + (K-j) x counts.  We use plain
  add-one smoothing: (1 + counts) normalized.
* ``random_individual_center`` corrects the L1 distance for missing data
  against center 0's missing counts regardless of k (rnd_init.c:247-249);
  we correct against center k's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multiclust_tpu.config import InitMethod, InitProcedure
from multiclust_tpu.model.common import Array, EMConfig, ModelData, Params

tree_map = jax.tree_util.tree_map


# ---------------------------------------------------------------------------
# mixture model

def random_individual_partition(key, md: ModelData, K: int) -> Array:
    """I_K[i] ~ Uniform{0..K-1} (rnd_init.c:173-179)."""
    return jax.random.randint(key, (md.I,), 0, K)


def random_individual_center(key, md: ModelData, K: int) -> Array:
    """K unique random centers; assign by L1 distance on counts with a
    missing-data correction (rnd_init.c:192-259)."""
    if K == 1:
        return jnp.zeros((md.I,), jnp.int32)
    centers = jax.random.choice(key, md.I, (K,), replace=False)
    x = md.x.astype(md.dtype)
    missf = md.miss.astype(md.dtype)        # miss may be int8 storage
    xc = x[centers]                         # [K, L, M]
    missc = missf[centers]                  # [K, L]
    # dist[i,k] = sum_lm |x_i - x_c|  - sum_l |miss_i - miss_c| / n_alleles
    # chunked over K to bound the broadcast
    denom = jnp.maximum(md.n_alleles.astype(md.dtype), 1.0)
    has_miss = missf.max(axis=0) > 0        # [L] locus has missing slot

    def dist_k(k):
        d = jnp.abs(x - xc[k][None]).sum(axis=(1, 2))
        corr = jnp.where(has_miss[None],
                         jnp.abs(missf - missc[k][None]) / denom[None],
                         0.0).sum(axis=1)
        return d - corr

    dists = jax.lax.map(dist_k, jnp.arange(K)).T      # [I, K]
    assign = jnp.argmin(dists, axis=1).astype(jnp.int32)
    # centers belong to their own cluster
    assign = assign.at[centers].set(jnp.arange(K, dtype=jnp.int32))
    return assign


def parameters_from_partition_mixture(I_K: Array, md: ModelData,
                                      K: int) -> Params:
    """Add-one-smoothed counts given a hard partition
    (initialize_parameters_mixture, rnd_init.c:268-339)."""
    dtype = md.dtype
    onehot = jax.nn.one_hot(I_K, K, dtype=dtype)      # [I, K]
    eta = (1.0 + onehot.sum(axis=0)) / (md.I + K)
    pc = jnp.einsum("ik,ilm->klm", onehot, md.x.astype(dtype))
    pc = jnp.where(md.mask[None], pc + 1.0, 0.0)
    p = pc / pc.sum(axis=2, keepdims=True)
    return Params(eta=eta, p=p)


# ---------------------------------------------------------------------------
# admixture model

def random_allele_partition(key, md: ModelData, codes: Array,
                            K: int) -> Array:
    """Assign every observed allele copy to a random cluster
    (random_allele_partition, rnd_init.c:456-482).  Returns [I, L, P]
    cluster labels (-1 for missing copies)."""
    lab = jax.random.randint(key, codes.shape, 0, K)
    return jnp.where(codes >= 0, lab, -1)


def random_allele_center(key, md: ModelData, codes: Array, K: int) -> Array:
    """Per-locus random center alleles; copies matching a center join its
    cluster, others are assigned randomly (random_allele_center,
    rnd_init.c:496-580).

    Degeneracy fix (deviation, documented): when a locus has fewer alleles
    than K the reference maps allele m to cluster m deterministically
    (rnd_init.c:519-522).  For SNP panels with K > 2 EVERY locus is like
    that, so all the reference's "random" multi-starts are identical and
    its multi-start budget is wasted.  When no locus can supply K centers
    we fall back to the random allele partition, restoring start
    diversity.
    """
    if K == 1:
        return jnp.where(codes >= 0, 0, -1)
    degenerate = jnp.max(md.n_alleles) < K
    return jax.lax.cond(
        degenerate,
        lambda k: random_allele_partition(k, md, codes, K),
        lambda k: _allele_center_impl(k, md, codes, K),
        key)


def _allele_center_impl(key, md: ModelData, codes: Array, K: int) -> Array:
    kperm, krand = jax.random.split(key)
    M = md.M
    # random permutation of slots per locus; invalid slots sink to the end
    noise = jax.random.uniform(kperm, (md.L, M))
    noise = jnp.where(md.mask, noise, 2.0)
    order = jnp.argsort(noise, axis=1)                # [L, M] slots by rank
    # rank[l, m] = position of slot m in the random order
    rank = jnp.argsort(order, axis=1)
    few = md.n_alleles < K                            # fewer alleles than K
    # inv[l, m] = cluster of slot m, or -1 when slot m is not a center
    rank_based = jnp.where(rank < K, rank, -1)
    ident = jnp.where(jnp.arange(M)[None, :] < md.n_alleles[:, None],
                      jnp.arange(M)[None, :], -1)
    inv = jnp.where(few[:, None], ident, rank_based)  # [L, M]
    inv = jnp.where(md.mask, inv, -1)

    matched = jnp.take_along_axis(
        inv[None, :, :].repeat(md.I, axis=0), jnp.maximum(codes, 0),
        axis=2)                                       # [I, L, P]
    rnd = jax.random.randint(krand, codes.shape, 0, K)
    lab = jnp.where(matched >= 0, matched, rnd)
    return jnp.where(codes >= 0, lab, -1)


def parameters_from_allele_partition(labels: Array, codes: Array,
                                     md: ModelData, K: int,
                                     eta_constrained: bool) -> Params:
    """Smoothed counts given per-copy cluster labels
    (initialize_parameters_admixture, rnd_init.c:590-705)."""
    dtype = md.dtype
    valid = codes >= 0
    onehot_k = jax.nn.one_hot(jnp.where(valid, labels, K), K,
                              dtype=dtype)            # [I, L, P, K]
    copies_ik = onehot_k.sum(axis=(1, 2))             # [I, K]
    if eta_constrained:
        eta = (1.0 + copies_ik.sum(axis=0)) / (
            md.I * md.L * codes.shape[2] + K)
    else:
        eta = (1.0 + copies_ik) / (md.L * codes.shape[2] + K)

    onehot_m = jax.nn.one_hot(jnp.where(valid, codes, md.M), md.M,
                              dtype=dtype)            # [I, L, P, M]
    pc = jnp.einsum("ilpk,ilpm->klm", onehot_k, onehot_m)
    pc = jnp.where(md.mask[None], pc + 1.0, 0.0)
    p = pc / pc.sum(axis=2, keepdims=True)
    return Params(eta=eta, p=p)


# ---------------------------------------------------------------------------
# top-level initialization (initialize_model, rnd_init.c:54-89)

def random_initialize(key, md: ModelData, K: int, cfg: EMConfig,
                      method: InitMethod, codes: Array = None) -> Params:
    if cfg.admixture:
        if method == InitMethod.RANDOM_PARTITION:
            labels = random_allele_partition(key, md, codes, K)
        else:
            labels = random_allele_center(key, md, codes, K)
        return parameters_from_allele_partition(labels, codes, md, K,
                                                cfg.eta_constrained)
    if method == InitMethod.RANDOM_PARTITION:
        part = random_individual_partition(key, md, K)
    else:
        part = random_individual_center(key, md, K)
    return parameters_from_partition_mixture(part, md, K)


def rand_em_chunk(md: ModelData, n: int, batch_width: int = 1,
                  hbm_budget: float = 2e9) -> int:
    """Candidates to score concurrently: the scoring EM step materializes
    ~3 [I, L*M] tensors per candidate on the XLA path, so bound the vmap
    width by an HBM estimate (times the multi-start vmap width the caller
    runs this under)."""
    itemsize = jnp.dtype(md.dtype).itemsize
    per_cand = 3 * md.I * md.L * md.M * itemsize
    c = int(hbm_budget // max(per_cand * max(batch_width, 1), 1))
    return max(1, min(n, c))


def rand_em_initialize(key, md: ModelData, K: int, cfg: EMConfig,
                       method: InitMethod, n_rand_em_init: int,
                       codes: Array = None,
                       md_score: ModelData = None,
                       chunk: int = 0) -> Params:
    """Rand-EM: run n starts through one EM step + E step, keep the start
    whose refined logL is best (randem_initialize_mixture rnd_init.c:123-161;
    randem_initialize_admixture :412-444).  The winning START (not its
    refined parameters) seeds the real fit, as in the reference.

    Unlike the reference's serial loop, candidates are scored as a VMAPPED
    batch (SURVEY.md section 2.3 multi-start row), in chunks of ``chunk``
    (0 = auto from an HBM estimate, rand_em_chunk) scanned by lax.map so a
    big dataset times 50 candidates cannot blow HBM.

    ``md_score`` lets constrained-eta sweeps score candidates on the
    collapsed column-sum dataset (bitwise-identical logL at O(K L M)
    instead of O(I K L M) per candidate); partition construction still
    uses the full ``md``."""
    from multiclust_tpu.opt.em import model_em_step, model_log_likelihood

    if md_score is None:
        md_score = md
    n = n_rand_em_init if K > 1 else 1
    c = chunk or rand_em_chunk(md_score, n)

    def score_shape(params: Params) -> Params:
        """Pad a candidate to md_score's (possibly mesh-padded) shape:
        pad rows carry uniform eta, pad loci zero p - both contribute
        zero logL (zero counts / masked loci), so the candidate ranking
        is unchanged."""
        dI = md_score.I - md.I
        if dI > 0 and params.eta.ndim == 2:
            pad = jnp.full((dI, K), 1.0 / K, params.eta.dtype)
            params = params._replace(
                eta=jnp.concatenate([params.eta, pad], axis=0))
        dL = md_score.L - md.L
        if dL > 0:
            params = params._replace(
                p=jnp.pad(params.p, ((0, 0), (0, dL), (0, 0))))
        return params

    def one(k):
        params = random_initialize(k, md, K, cfg, method, codes)
        scored = score_shape(params)
        stepped, _, _ = model_em_step(scored, md_score, cfg)
        ll, _ = model_log_likelihood(stepped, md_score, cfg)
        return params, ll[0] + ll[1]

    n_pad = -(-n // c) * c
    keys = jax.random.split(key, n_pad).reshape(n_pad // c, c, -1)
    params_all, lls = jax.lax.map(jax.vmap(one), keys)
    params_all = tree_map(lambda t: t.reshape((n_pad,) + t.shape[2:]),
                          params_all)
    lls = lls.reshape(n_pad)
    if n_pad != n:  # surplus candidates only pad the chunk; never win
        lls = jnp.where(jnp.arange(n_pad) < n, lls, -jnp.inf)
    best = jnp.argmax(lls)
    return tree_map(lambda t: t[best], params_all)


def initialize(key, md: ModelData, K: int, cfg: EMConfig,
               method: InitMethod = InitMethod.RANDOM_CENTERS,
               procedure: InitProcedure = InitProcedure.NOTHING,
               n_rand_em_init: int = 50, codes: Array = None,
               md_score: ModelData = None) -> Params:
    if procedure == InitProcedure.RAND_EM:
        return rand_em_initialize(key, md, K, cfg, method, n_rand_em_init,
                                  codes, md_score=md_score)
    return random_initialize(key, md, K, cfg, method, codes)


# ---------------------------------------------------------------------------
# dynamic-K initialization (mixed-K swept lattices, runtime/ksweep.py)
#
# Same math as the static initializers with the TRUE cluster count ``kdyn``
# a TRACED scalar and all arrays padded to the static lane width ``Kp`` -
# one compiled init program then serves every K of a K-sweep (the static
# versions recompile per K; measured ~90 s per K through the TPU tunnel).
# Draw-for-draw parity with the static path is exact: jax.random.randint
# yields identical values for traced vs static bounds, and
# choice(..., replace=False) has the prefix property (first k of a
# Kp-draw == a k-draw), both verified in tests/test_ksweep.py.

def _lane_lt(kdyn, Kp: int):
    return jnp.arange(Kp) < kdyn


def random_allele_center_dyn(key, md: ModelData, codes: Array, kdyn,
                             Kp: int) -> Array:
    """random_allele_center (rnd_init.c:496-580) with a traced K >= 2."""
    degenerate = jnp.max(md.n_alleles) < kdyn
    return jax.lax.cond(
        degenerate,
        lambda k: random_allele_partition(k, md, codes, kdyn),
        lambda k: _allele_center_impl(k, md, codes, kdyn),
        key)


def parameters_from_allele_partition_dyn(labels: Array, codes: Array,
                                         md: ModelData, kdyn, Kp: int,
                                         eta_constrained: bool) -> Params:
    """parameters_from_allele_partition on the Kp-padded lane space:
    smoothing (+1) and normalization touch only lanes < kdyn, so true
    lanes match the static-K output exactly and pad lanes are zero."""
    dtype = md.dtype
    valid = codes >= 0
    lane = _lane_lt(kdyn, Kp)
    onehot_k = jax.nn.one_hot(jnp.where(valid, labels, Kp), Kp,
                              dtype=dtype)            # [I, L, P, Kp]
    copies_ik = onehot_k.sum(axis=(1, 2))             # [I, Kp]
    kf = kdyn.astype(dtype) if hasattr(kdyn, "astype") \
        else jnp.asarray(kdyn, dtype)
    if eta_constrained:
        eta = (1.0 + copies_ik.sum(axis=0)) / (
            md.I * md.L * codes.shape[2] + kf)
        eta = jnp.where(lane, eta, 0.0)
    else:
        eta = (1.0 + copies_ik) / (md.L * codes.shape[2] + kf)
        eta = jnp.where(lane[None], eta, 0.0)

    onehot_m = jax.nn.one_hot(jnp.where(valid, codes, md.M), md.M,
                              dtype=dtype)            # [I, L, P, M]
    pc = jnp.einsum("ilpk,ilpm->klm", onehot_k, onehot_m)
    pc = jnp.where(md.mask[None] & lane[:, None, None], pc + 1.0, 0.0)
    tot = pc.sum(axis=2, keepdims=True)
    p = jnp.where(tot > 0, pc / jnp.where(tot > 0, tot, 1.0), 0.0)
    return Params(eta=eta, p=p)


def random_individual_center_dyn(key, md: ModelData, kdyn,
                                 Kp: int) -> Array:
    """random_individual_center (rnd_init.c:192-259) with a traced K:
    draws Kp candidate centers (the first kdyn equal a static-K draw by
    the choice prefix property) and masks lanes >= kdyn out of the
    argmin."""
    centers = jax.random.choice(key, md.I, (Kp,), replace=False)
    x = md.x.astype(md.dtype)
    missf = md.miss.astype(md.dtype)
    xc = x[centers]
    missc = missf[centers]
    denom = jnp.maximum(md.n_alleles.astype(md.dtype), 1.0)
    has_miss = missf.max(axis=0) > 0

    def dist_k(k):
        d = jnp.abs(x - xc[k][None]).sum(axis=(1, 2))
        corr = jnp.where(has_miss[None],
                         jnp.abs(missf - missc[k][None]) / denom[None],
                         0.0).sum(axis=1)
        return d - corr

    dists = jax.lax.map(dist_k, jnp.arange(Kp)).T     # [I, Kp]
    dists = jnp.where(_lane_lt(kdyn, Kp)[None], dists, jnp.inf)
    assign = jnp.argmin(dists, axis=1).astype(jnp.int32)
    # the first kdyn centers belong to their own cluster; later centers
    # keep whatever the argmin gave them
    cur = assign[centers]
    upd = jnp.where(_lane_lt(kdyn, Kp),
                    jnp.arange(Kp, dtype=jnp.int32), cur)
    return assign.at[centers].set(upd)


def parameters_from_partition_mixture_dyn(I_K: Array, md: ModelData,
                                          kdyn, Kp: int) -> Params:
    dtype = md.dtype
    lane = _lane_lt(kdyn, Kp)
    onehot = jax.nn.one_hot(I_K, Kp, dtype=dtype)
    kf = jnp.asarray(kdyn, dtype)
    eta = jnp.where(lane, (1.0 + onehot.sum(axis=0)) / (md.I + kf), 0.0)
    pc = jnp.einsum("ik,ilm->klm", onehot, md.x.astype(dtype))
    pc = jnp.where(md.mask[None] & lane[:, None, None], pc + 1.0, 0.0)
    tot = pc.sum(axis=2, keepdims=True)
    p = jnp.where(tot > 0, pc / jnp.where(tot > 0, tot, 1.0), 0.0)
    return Params(eta=eta, p=p)


def random_initialize_dyn(key, md: ModelData, kdyn, Kp: int,
                          cfg: EMConfig, method: InitMethod,
                          codes: Array = None) -> Params:
    from multiclust_tpu.model.common import make_kmask
    if cfg.admixture:
        if method == InitMethod.RANDOM_PARTITION:
            labels = random_allele_partition(key, md, codes, kdyn)
        else:
            labels = random_allele_center_dyn(key, md, codes, kdyn, Kp)
        params = parameters_from_allele_partition_dyn(
            labels, codes, md, kdyn, Kp, cfg.eta_constrained)
    elif method == InitMethod.RANDOM_PARTITION:
        part = random_individual_partition(key, md, kdyn)
        params = parameters_from_partition_mixture_dyn(part, md, kdyn, Kp)
    else:
        part = random_individual_center_dyn(key, md, kdyn, Kp)
        params = parameters_from_partition_mixture_dyn(part, md, kdyn, Kp)
    km = (_lane_lt(kdyn, Kp)).astype(md.dtype)
    return params._replace(kmask=km)


def initialize_dyn(key, md: ModelData, kdyn, Kp: int, cfg: EMConfig,
                   method: InitMethod = InitMethod.RANDOM_CENTERS,
                   procedure: InitProcedure = InitProcedure.NOTHING,
                   n_rand_em_init: int = 50, codes: Array = None,
                   md_score: ModelData = None) -> Params:
    """Dynamic-K initialize(): returns Kp-PADDED params carrying their
    kmask.  ``cfg`` must be the swept lattice's shared config (static
    lane width Kp); candidate scoring masks projections through the
    kmask, so its fixed points match the static-K scoring on the true
    lanes."""
    if procedure != InitProcedure.RAND_EM:
        return random_initialize_dyn(key, md, kdyn, Kp, cfg, method,
                                     codes)
    from multiclust_tpu.opt.em import model_em_step, model_log_likelihood

    if md_score is None:
        md_score = md
    n = n_rand_em_init
    c = rand_em_chunk(md_score, n)

    def score_shape(params: Params) -> Params:
        dI = md_score.I - md.I
        if dI > 0 and params.eta.ndim == 2:
            pad = jnp.broadcast_to(
                (params.kmask / jnp.sum(params.kmask))[None],
                (dI, Kp)).astype(params.eta.dtype)
            params = params._replace(
                eta=jnp.concatenate([params.eta, pad], axis=0))
        dL = md_score.L - md.L
        if dL > 0:
            params = params._replace(
                p=jnp.pad(params.p, ((0, 0), (0, dL), (0, 0))))
        return params

    def one(k):
        params = random_initialize_dyn(k, md, kdyn, Kp, cfg, method,
                                       codes)
        stepped, _, _ = model_em_step(score_shape(params), md_score, cfg)
        ll, _ = model_log_likelihood(stepped, md_score, cfg)
        return params, ll[0] + ll[1]

    n_pad = -(-n // c) * c
    keys = jax.random.split(key, n_pad).reshape(n_pad // c, c, -1)
    params_all, lls = jax.lax.map(jax.vmap(one), keys)
    params_all = tree_map(lambda t: t.reshape((n_pad,) + t.shape[2:]),
                          params_all)
    lls = lls.reshape(n_pad)
    if n_pad != n:
        lls = jnp.where(jnp.arange(n_pad) < n, lls, -jnp.inf)
    best = jnp.argmax(lls)
    return tree_map(lambda t: t[best], params_all)


def codes_from_counts(counts, miss, ploidy: int):
    """[I, L, P] allele-slot index per copy (-1 for missing copies).

    Copy order within (i,l) is arbitrary - allele copies are exchangeable -
    so expand the count vector in slot order.  Host-side numpy.
    """
    import numpy as np
    I, L, M = counts.shape
    cum = np.cumsum(counts, axis=2)                   # [I, L, M]
    a = np.arange(ploidy)
    # codes[i,l,a] = number of slots m with cum[i,l,m] <= a
    codes = (cum[:, :, :, None] <= a[None, None, None, :]).sum(
        axis=2).astype(np.int32)                      # [I, L, P]
    observed = ploidy - miss                          # [I, L]
    codes = np.where(a[None, None, :] < observed[:, :, None], codes, -1)
    return codes


def codes_from_counts_jax(counts: Array, miss: Array, ploidy: int) -> Array:
    """Device-side codes_from_counts (same math, jnp) - used by the
    batched bootstrap where replicate count tensors live on device."""
    cum = jnp.cumsum(counts.astype(jnp.int32), axis=2)
    a = jnp.arange(ploidy)
    codes = jnp.sum(cum[:, :, :, None] <= a[None, None, None, :],
                    axis=2).astype(jnp.int32)
    observed = ploidy - miss.astype(jnp.int32)
    return jnp.where(a[None, None, :] < observed[:, :, None], codes, -1)
