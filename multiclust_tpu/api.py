"""One-call library API.

`fit_file` / `fit_dataset` wrap the full pipeline (read -> synchronize ->
K-sweep multi-start -> optional bootstrap) for programmatic use; the CLI is
the flag-compatible shell around the same pieces.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from multiclust_tpu.config import Options
from multiclust_tpu.io.dataset import Dataset


@dataclasses.dataclass
class FitOutput:
    dataset: Dataset
    estimate: "EstimateResult"          # noqa: F821 - runtime import
    bootstrap: Optional["BootstrapResult"] = None  # noqa: F821

    @property
    def best(self):
        """MaximizeResult of the best (AIC-selected) K."""
        return self.estimate.per_K[self.estimate.aic_K]

    @property
    def Q(self) -> np.ndarray:
        """Fitted mixing proportions of the selected K."""
        return np.asarray(self.best.best_params.eta)

    @property
    def P(self) -> np.ndarray:
        """Fitted allele frequencies of the selected K."""
        return np.asarray(self.best.best_params.p)


def fit_dataset(ds: Dataset, opt: Optional[Options] = None,
                **kw) -> FitOutput:
    """Fit a Dataset under the given options (kw override Options fields)."""
    import jax
    import jax.numpy as jnp

    from multiclust_tpu.init.random import codes_from_counts
    from multiclust_tpu.model.common import model_data_from_dataset
    from multiclust_tpu.runtime.ksweep import estimate_model

    opt = opt or Options()
    if kw:
        opt = dataclasses.replace(opt, **kw)
    opt = opt.synchronize(ds.I, ds.ploidy)
    dtype = jnp.dtype(opt.dtype)
    _, storage = opt.device_policy()
    md = model_data_from_dataset(ds, dtype=dtype, storage_dtype=storage)
    codes = None
    if opt.admixture:
        codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, ds.ploidy))

    key = jax.random.PRNGKey(opt.seed)

    def n_parameters(K):
        return ds.n_parameters(K, opt.admixture, opt.eta_constrained)

    est = estimate_model(key, md, opt, n_parameters, codes=codes,
                         checkpoint_dir=opt.checkpoint_dir)

    boot = None
    if opt.n_bootstrap:
        from multiclust_tpu.stats.bootstrap import run_bootstrap
        key, sub = jax.random.split(key)
        boot = run_bootstrap(sub, md, opt, n_parameters, est.ts,
                             est.h0_params, ds.ploidy)
    return FitOutput(dataset=ds, estimate=est, bootstrap=boot)


def fit_file(path: str, opt: Optional[Options] = None, **kw) -> FitOutput:
    """Read a STRUCTURE file and fit it."""
    from multiclust_tpu.io.structure import read_structure

    opt = opt or Options()
    if kw:
        opt = dataclasses.replace(opt, **kw)
    ds = read_structure(path, opt)
    return fit_dataset(ds, opt)
