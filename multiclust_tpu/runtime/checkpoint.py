"""Checkpoint / resume for the multi-start sweep.

The reference's only persistence is the warm start (-Q/-P files,
rnd_init.c:74-76) plus the per-K output files rewritten on every
improvement (multiclust.c:584-600).  Here the sweep state proper is
checkpointed: per-K best parameters, accumulated counters, and the PRNG key,
so an interrupted K-sweep resumes where it left off (BASELINE.md aux
requirements).  Plain .npz + JSON sidecar - no orbax dependency needed for
pytrees this small; the format is human-recoverable.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from multiclust_tpu.model.common import Params
from multiclust_tpu.runtime.multistart import MaximizeResult


_COUNTER_FIELDS = [
    "max_logL", "first_max_logL", "aic", "bic", "n_init", "n_launched",
    "n_total_iter", "n_max_iter", "n_maxll_init", "n_maxll_times",
    "n_targetll_times", "n_targetll_init", "time_stop", "ever_converged",
    "any_failed", "mono_viol", "arand", "seconds",
]


def checkpoint_file(directory: str, K: int) -> str:
    return os.path.join(directory, f"multiclust_ckpt.K={K}.npz")


def save(directory: str, K: int, res: MaximizeResult, key=None) -> str:
    os.makedirs(directory, exist_ok=True)
    path = checkpoint_file(directory, K)
    meta = {f: getattr(res, f) for f in _COUNTER_FIELDS}
    meta["K"] = K
    arrays = {"meta": np.frombuffer(
        json.dumps(meta, default=float).encode(), dtype=np.uint8)}
    if res.best_params is not None:
        arrays["eta"] = np.asarray(res.best_params.eta)
        arrays["p"] = np.asarray(res.best_params.p)
    if key is not None:
        arrays["key"] = np.asarray(key)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    return path


def bootstrap_file(directory: str, null_K: int, alt_K: int) -> str:
    return os.path.join(
        directory, f"multiclust_ckpt.bootstrap.K={null_K}v{alt_K}.npz")


def save_bootstrap(directory: str, null_K: int, alt_K: int,
                   n_bootstrap: int, ts, next_rep: int, key) -> str:
    """Persist bootstrap progress after a replicate chunk: the test
    statistics computed so far, the index of the next replicate to fit,
    and the PRNG key that will drive it - enough to resume a killed
    ``-b`` run with an IDENTICAL ts list and p-value (the reference's
    run_bootstrap, multiclust.c:675-708, loses everything)."""
    os.makedirs(directory, exist_ok=True)
    path = bootstrap_file(directory, null_K, alt_K)
    meta = {"null_K": null_K, "alt_K": alt_K, "n_bootstrap": n_bootstrap,
            "next_rep": int(next_rep)}
    tmp = path + ".tmp"
    np.savez(tmp,
             meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
             ts=np.asarray(ts, np.float64),
             key=np.asarray(key))
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    return path


def load_bootstrap(directory: str, null_K: int, alt_K: int,
                   n_bootstrap: int) -> Optional[tuple]:
    """Returns (ts array, next_rep, key) or None when absent/mismatched
    (a checkpoint from a different -b/-k configuration is ignored)."""
    import jax.numpy as jnp

    path = bootstrap_file(directory, null_K, alt_K)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if (meta["null_K"] != null_K or meta["alt_K"] != alt_K
                or meta["n_bootstrap"] != n_bootstrap):
            return None
        return (np.asarray(z["ts"], np.float64), int(meta["next_rep"]),
                jnp.asarray(z["key"]))


def load(directory: str, K: int,
         dtype=None) -> Optional[tuple]:
    """Returns (MaximizeResult, key or None) or None when absent."""
    import jax.numpy as jnp

    path = checkpoint_file(directory, K)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        res = MaximizeResult(K=int(meta["K"]))
        for f in _COUNTER_FIELDS:
            cur = getattr(res, f)
            val = meta[f]
            if isinstance(cur, bool):
                val = bool(val)
            elif isinstance(cur, int):
                val = int(val)
            setattr(res, f, val)
        if "eta" in z:
            dt = dtype or z["p"].dtype
            res.best_params = Params(eta=jnp.asarray(z["eta"], dt),
                                     p=jnp.asarray(z["p"], dt))
        key = jnp.asarray(z["key"]) if "key" in z else None
    return res, key
