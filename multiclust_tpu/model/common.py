"""Shared model-side containers and helpers.

The parameterization follows the reference (multiclust.h:259-306):
``eta`` are mixing proportions - a [K] vector for the mixture model and for
the eta-constrained admixture model (-c), or an [I, K] matrix of
per-individual admixture proportions otherwise - and ``p[K, L, M]`` are
per-cluster allele frequencies on the padded dense allele axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class Params(NamedTuple):
    """Model parameters; a pytree so EM/acceleration treat it uniformly."""

    eta: Array  # [K] or [I, K]
    p: Array    # [K, L, M]
    # Optional [.., Kp] 1.0/0.0 mask of TRUE cluster lanes for mixed-K
    # swept lattices (runtime/ksweep.py): carried as DATA so ONE compiled
    # program serves every K in a K-sweep (estimate_model,
    # multiclust.c:365-452, recompiled per K in the reference-shaped
    # serial loop).  None = the static cfg.k_true governs, which is the
    # single-K production path.  Float, not bool, so the pytree
    # vector-space ops (opt/em.tree_sub & co) treat it as inert numerics:
    # secant differences are exactly zero and affine accelerated points
    # reproduce the base mask.
    kmask: Optional[Array] = None

    @property
    def K(self) -> int:
        return self.p.shape[0]


class ModelData(NamedTuple):
    """Device-side genotype tensors consumed by E/M steps.

    ``row_valid`` marks real individuals (None = all); padding rows added
    for mesh shardability are excluded from mixture posterior mass and
    per-individual logL (admixture padding rows are inert by construction:
    zero counts and zero missing contribute nothing to any reduction).
    """

    x: Array          # [I, L, M] observed counts (compute dtype, or int8
                      # storage on accelerators)
    miss: Array       # [I, L] missing-copy counts (same dtype options)
    mask: Array       # [L, M] bool valid allele lanes
    n_alleles: Array  # [L] int32 valid lanes per locus
    row_valid: Optional[Array] = None  # [I] bool or None
    # optional [I, L*M] alias of x in storage dtype, row-major.  XLA lays
    # the 3-D int8 parameter out column-ish and then re-runs the
    # reshape-relayout copy on EVERY while-loop iteration; hoisting the
    # flatten to once per jitted segment (prepare_for_em) removes a
    # 1 byte/cell copy from the EM hot loop.  Derived data: any _replace
    # that touches x must reset it (or call prepare_for_em again).
    x_flat: Optional[Array] = None
    # optional (x0, x1) pair of [I, L] per-allele aliases of biallelic x
    # (storage dtype) for the biallelic kernel.  A TUPLE of two separate
    # arrays, not a stacked [2, I, L]: slicing a stacked tensor inside the
    # EM loop is NOT hoisted by XLA (~100us/iter extra on the bench
    # shape); tuple leaves cost zero ops in the loop.  Same derived-data
    # contract as x_flat.
    x_bi: Optional[tuple] = None
    # optional [I, L] alias of miss in the STORAGE dtype (int8 when x is):
    # the biallelic kernel streams miss per tile for the in-kernel
    # missing-mass p-update term; casting once here keeps HBM traffic at
    # 1 byte/cell instead of 4 (counts never exceed ploidy, so the cast is
    # exact).  Same derived-data contract as x_flat.
    miss_st: Optional[Array] = None

    @property
    def I(self) -> int:  # noqa: E743
        return self.x.shape[0]

    @property
    def L(self) -> int:
        return self.x.shape[1]

    @property
    def M(self) -> int:
        return self.x.shape[2]

    @property
    def dtype(self):
        """Compute dtype.  miss carries it on the CPU/f64 paths; in the
        accelerator storage mode BOTH x and miss may be int8 (a compute-
        dtype miss is 200 GB at 100k x 500k), and the compute dtype is
        f32 - the only configuration that stores int8.  Consumers must
        cast miss before any reduction (int8 sums overflow at counts
        > 127); casts fused into matmuls/reductions never materialize."""
        if jnp.issubdtype(self.miss.dtype, jnp.floating):
            return self.miss.dtype
        if jnp.issubdtype(self.x.dtype, jnp.floating):
            return self.x.dtype
        return jnp.float32

    @property
    def x2d(self) -> Array:
        """[I, LM] counts in the compute dtype.

        ``x`` may be stored as int8 (4x less HBM - counts never exceed
        ploidy); the cast happens here and XLA fuses or materializes it
        per consumer.
        """
        x = self.x_flat
        if x is None:
            x = self.x.reshape(self.I, self.L * self.M)
        if x.dtype != self.dtype:
            x = x.astype(self.dtype)
        return x

    @property
    def x_storage_2d(self) -> Array:
        """[I, LM] counts in the STORAGE dtype (no cast; Pallas kernels
        cast tiles in VMEM)."""
        if self.x_flat is not None:
            return self.x_flat
        return self.x.reshape(self.I, self.L * self.M)

    def prepare_for_em(self, bi: bool = False) -> "ModelData":
        """Populate ``x_flat`` (and ``x_bi``/``miss_st`` when the biallelic
        kernel will run) - call once per jitted segment, BEFORE the EM
        while-loop, so the flatten/relayout/cast happens once, not per
        iteration."""
        x_bi = self.x_bi
        miss_st = self.miss_st
        if bi and x_bi is None and self.M == 2:
            x_bi = (self.x[:, :, 0], self.x[:, :, 1])
        if bi and miss_st is None:
            miss_st = self.miss.astype(self.x.dtype)
        return self._replace(
            x_flat=self.x.reshape(self.I, self.L * self.M), x_bi=x_bi,
            miss_st=miss_st)


class EMConfig(NamedTuple):
    """Static (hashable) EM configuration; a jit static argument."""

    admixture: bool = False
    eta_constrained: bool = False
    do_projection: bool = True
    eta_lower_bound: float = 1e-8
    p_lower_bound: float = 1e-8
    abs_error: float = 1e-4
    rel_error: float = 0.0
    max_iter: int = 0
    accel_scheme: int = 0
    q: int = 1
    n_init_iter: int = 0
    adjust_step: int = 0
    monotonicity: str = "warn"
    # multiplier on the f32 elementwise-rounding noise floor used to clamp
    # the convergence tolerance; see opt/em.py.
    noise_factor: float = 8.0
    # fused Pallas sweep kernels for the admixture E+M (f32 only);
    # "off", "on" (compiled), or "interpret" (CPU testing)
    use_pallas: str = "off"
    # False lets the admixture step skip the missing-mass reductions
    # (c_i = sum_l miss_il and C = eta^T miss, em_alg.c:400-431) entirely -
    # a static, trace-time decision made from the dataset by the caller.
    has_missing: bool = True
    # True when every locus is strictly biallelic (M == 2, n_alleles == 2
    # everywhere): unlocks the specialized Pallas full step that exploits
    # p1 = 1 - p0 (half the denominator/A work, p update fully on-chip).
    # Static, derived from the dataset by the caller like has_missing.
    biallelic: bool = False
    # dataset ploidy (allele copies per (i, l)); static so the biallelic
    # missing-free mixture fast path can fold the complement-allele matmul
    # into a per-cluster constant (model/mixture.py)
    ploidy: int = 2
    # True number of clusters when the parameters carry K-padded rows/lanes
    # (pad entries zero, kept zero by masked projections).  The Pallas path
    # wants eta [I, 128k] and p [128k, L, M] so no per-iteration lane
    # pad/relayout is needed; 0 = parameters are unpadded (K = p.shape[0]).
    k_true: int = 0
    # Evaluate logL/convergence only every N-th plain-EM iteration; the
    # N-1 steps between checks skip the logL accumulation entirely
    # (config.Options.check_interval has the semantics discussion).
    # 0 = adaptive (the blind-run length lives in EMState.interval).  Only
    # consulted by the plain-EM drivers (opt/em.plain_macro_step).
    check_interval: int = 1
    # Device mesh for multi-chip fits (None = single device).  A
    # jax.sharding.Mesh is hashable, so the config stays a valid static jit
    # argument.  The XLA E/M path needs no code change under a mesh (GSPMD
    # inserts the psum merges from the input shardings, SURVEY.md section
    # 2.3 DP row); the Pallas path wraps its kernels in jax.shard_map over
    # the data axis (model/admixture.py).
    mesh: object = None

    @property
    def data_shards(self) -> int:
        from multiclust_tpu.runtime.mesh import DATA_AXIS
        return self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1

    @property
    def model_shards(self) -> int:
        from multiclust_tpu.runtime.mesh import MODEL_AXIS
        return self.mesh.shape[MODEL_AXIS] if self.mesh is not None else 1

    @property
    def eta_is_vector(self) -> bool:
        return (not self.admixture) or self.eta_constrained

    @property
    def bi_repr_active(self) -> bool:
        """True when chains should carry the biallelic p0-representation:
        params.p holds ONLY the allele-0 frequencies [.., Kp, Lp] (p1 is
        the implicit complement).  Avoids the per-iteration [K, L, 2]
        relayout glue around the biallelic kernel - the EM/acceleration
        machinery is pytree-shape-agnostic, so only the model functions
        branch on it.  Affine parameter combinations (SQUAREM/QN points)
        preserve the complement structure exactly.  Missing data is
        handled in-kernel (the miss stream + c totals, em_alg.c:400-431),
        so it does not gate the representation.  Under a mesh the kernels
        run per shard (model/admixture._em_step_bi_repr_meshed): B0/B1
        psum over the data axis; with loci ALSO sharded the raw A/t
        accumulators psum over the model axis (emit_a kernels) and the
        eta epilogue finishes in XLA - since round 4 no mesh shape
        disables the representation."""
        return (self.use_pallas != "off" and self.admixture
                and not self.eta_constrained and self.biallelic
                and bool(self.k_true))


def is_bi_repr(params: "Params") -> bool:
    """p0-representation marker: unbatched p is 2-D ([Kp, Lp]) instead of
    the full [K, L, M]."""
    return params.p.ndim == params.eta.ndim


def model_data_from_dataset(ds, dtype=jnp.float32, device=None,
                            storage_dtype=None) -> ModelData:
    """Lift a host Dataset into device tensors of the compute dtype.

    ``storage_dtype=jnp.int8`` keeps the count tensor 4x smaller in HBM
    (counts never exceed ploidy); ``ModelData.x2d`` casts on use.
    """
    # miss joins the int8 storage mode only when the compute dtype is
    # f32 (the accelerator configuration - see ModelData.dtype); for any
    # other compute dtype miss stays its carrier
    miss_dtype = (storage_dtype if (storage_dtype is not None
                                    and jnp.dtype(dtype) == jnp.float32)
                  else dtype)
    md = ModelData(
        x=jnp.asarray(ds.counts, dtype=storage_dtype or dtype),
        miss=jnp.asarray(ds.miss, dtype=miss_dtype),
        mask=jnp.asarray(ds.mask),
        n_alleles=jnp.asarray(ds.n_alleles, dtype=jnp.int32),
    )
    if device is not None:
        md = jax.device_put(md, device)
    return md


def collapse_for_constrained(md: ModelData) -> ModelData:
    """Constrained-eta admixture sufficient statistics.

    With shared mixing proportions the per-iteration math depends on the
    data only through the column sums sum_i x_ilm and sum_i miss_il
    (model/admixture.py constrained path), so the fit can run on a
    collapsed 1-row dataset - O(K L M) per EM step regardless of I.
    """
    return md._replace(
        x=jnp.sum(md.x.astype(md.dtype), axis=0, keepdims=True),
        miss=jnp.sum(md.miss.astype(md.dtype), axis=0, keepdims=True),
        row_valid=None,
        x_flat=None, x_bi=None, miss_st=None,
    )


def k_padded_size(K: int, multiple: int = 128) -> int:
    """Lane-aligned padded cluster count for the K-padded layout."""
    return -(-K // multiple) * multiple


def pad_params_k(params: Params, k_pad: int) -> Params:
    """Zero-pad admixture params to ``k_pad`` clusters (batched OK):
    eta [..., I, K] -> [..., I, k_pad]; p [..., K, L, M] -> [..., k_pad, L, M].

    Pad entries are zero and contribute nothing to denominators, updates or
    likelihoods; the masked projections (cfg.k_true or params.kmask) keep
    them zero."""
    K = params.p.shape[-3]
    if k_pad <= K:
        return params
    d = k_pad - K
    pw_eta = [(0, 0)] * (params.eta.ndim - 1) + [(0, d)]
    pw_p = [(0, 0)] * (params.p.ndim - 3) + [(0, d), (0, 0), (0, 0)]
    return params._replace(eta=jnp.pad(params.eta, pw_eta),
                           p=jnp.pad(params.p, pw_p))


def unpad_params_k(params: Params, k_true: int) -> Params:
    """Inverse of pad_params_k (batched OK); drops any kmask."""
    K = params.p.shape[-3]
    if k_true >= K:
        return params
    return Params(eta=params.eta[..., :k_true],
                  p=params.p[..., :k_true, :, :])


def make_kmask(K: int, Kp: int, dtype=jnp.float32) -> Array:
    """[Kp] 1.0/0.0 true-lane mask for the mixed-K dynamic layout
    (Params.kmask)."""
    return (jnp.arange(Kp) < K).astype(dtype)


def safe_log(x: Array, valid: Optional[Array] = None) -> Array:
    """log with zeros (and masked lanes) mapped to 0 contribution.

    Mirrors the reference's skip of zero-probability terms in the mixture
    E-step (e_step_mixture, em_alg.c:797-804).
    """
    ok = x > 0
    if valid is not None:
        ok = ok & valid
    return jnp.where(ok, jnp.log(jnp.where(ok, x, 1.0)), 0.0)
