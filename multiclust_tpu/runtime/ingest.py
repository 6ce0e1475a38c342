"""Multi-host data ingestion: per-process shard parsing -> global arrays.

The reference reads the whole file on one host (read_file.c:38-300);
at the biobank north star (100k x 500k SNPs, ~200 GB of text / ~100 GB
of int8 counts) no single host can materialize that.  Here every process
parses ONLY its own contiguous block of individuals with the streaming
row-range reader (io/structure.read_structure_shard, backed by
native/structure_reader.cpp) and the global device arrays are assembled
shard-by-shard with ``jax.make_array_from_process_local_data`` - host
memory and parse time are O(I/n_processes), never O(I).

Layout contract: the (data, model) mesh is built over ``jax.devices()``
(process-major order), so process p's addressable data-axis positions
cover the contiguous global rows [p*Ip/P, (p+1)*Ip/P) - exactly the rows
p parsed.  Rows past the true I (padding to a data-shard multiple) carry
zero counts/missing and row_valid=False, the engine's standard inert
padding (runtime/mesh.pad_md_rows_loci semantics).

Cross-process allele vocabulary: multi-host reads require position-coded
alleles (-I), so only the per-locus allele-count MAXIMUM needs syncing -
one tiny process_allgather of the [L] n_alleles vector (PARITY.md
documents the label-coded restriction).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from multiclust_tpu.runtime.mesh import DATA_AXIS, MODEL_AXIS


class IngestInfo(NamedTuple):
    """Process-local side information from a distributed load."""

    ds_local: object          # this process's Dataset shard
    lo: int                   # first global individual owned
    hi: int                   # one past the last REAL individual owned
    I_total: int              # true global individual count
    # [L] bool, GLOBAL any-missing per locus (allgathered): the
    # reference's has_missing_slot for output-format parity
    miss_any: np.ndarray = None
    # [L] int64, GLOBAL per-locus allele counts (allgathered max)
    n_alleles: np.ndarray = None


def process_partition(I_padded: int, n_proc: int, pid: int
                      ) -> Tuple[int, int]:
    """Contiguous per-process row block; I_padded must divide evenly."""
    assert I_padded % n_proc == 0, (I_padded, n_proc)
    size = I_padded // n_proc
    return pid * size, (pid + 1) * size


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def load_structure_distributed(path: str, opt, mesh, dtype=None,
                               storage_dtype=None):
    """Parse ``path`` cooperatively across jax processes onto ``mesh``.

    Returns (md, info): ``md`` is a global ModelData with
    runtime/mesh.data_specs placements (x/miss row-sharded over the data
    axis and loci over the model axis, mask/n_alleles replicated,
    row_valid marking real individuals), ready for
    runtime/multistart.maximize_likelihood; ``info`` carries
    (ds_local, i_lo, i_hi, I_total) for process-local output needs.

    Single-process calls work too (the degenerate partition), so the CLI
    can use one code path whenever a mesh is configured.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multiclust_tpu.io.structure import read_structure_shard
    from multiclust_tpu.model.common import ModelData

    n_proc = jax.process_count()
    pid = jax.process_index()
    dd = mesh.shape[DATA_AXIS]
    if dd % n_proc:
        raise ValueError(
            f"data axis ({dd}) must be a multiple of process count "
            f"({n_proc}) for contiguous per-process row blocks")

    # one streaming metadata scan per process fixes the global row count;
    # rows pad to a data-shard multiple so every shard is even
    from multiclust_tpu.io.structure import scan_structure
    n_rows, _, n0, n1 = scan_structure(path)
    interleaved = n_rows < 2 or n0 != n1
    I_total = n_rows if interleaved else n_rows // opt.ploidy
    Ip = _round_up(I_total, dd)
    lo, hi = process_partition(Ip, n_proc, pid)
    real_hi = min(hi, I_total)
    ds_local, I_check = read_structure_shard(path, min(lo, I_total),
                                             real_hi, opt)
    assert I_check == I_total, (I_check, I_total)

    # allele-count sync: global per-locus max (position-coded alleles
    # guarantee slot agreement; only the lane COUNT can differ per shard)
    n_all_local = np.asarray(ds_local.n_alleles, np.int64)
    miss_any_loc = np.asarray(ds_local.miss, np.int64).any(axis=0)
    L = n_all_local.shape[0]
    if n_proc > 1:
        from jax.experimental import multihost_utils
        gathered = np.asarray(
            multihost_utils.process_allgather(jnp.asarray(n_all_local)))
        n_alleles = gathered.max(axis=0)
        miss_any = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(miss_any_loc))).any(axis=0)
    else:
        n_alleles = n_all_local
        miss_any = miss_any_loc
    M = int(n_alleles.max()) if L else 0

    # local block, padded to the process's row quota and the global M
    n_loc = hi - lo
    st = storage_dtype or dtype or np.float32
    counts_loc = np.zeros((n_loc, L, M), np.dtype(st))
    counts_loc[:real_hi - lo, :, :ds_local.M] = ds_local.counts
    miss_dt = (storage_dtype
               if (storage_dtype is not None
                   and np.dtype(dtype or np.float32) == np.float32)
               else (dtype or np.float32))
    miss_loc = np.zeros((n_loc, L), np.dtype(miss_dt))
    miss_loc[:real_hi - lo] = ds_local.miss
    rv_loc = np.zeros((n_loc,), bool)
    rv_loc[:real_hi - lo] = True

    def sharded(local, spec):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local)

    def replicated(host):
        arr = np.asarray(host)
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, P()), lambda idx: arr[idx])

    mask = np.arange(M)[None, :] < n_alleles[:, None]
    n_all32 = np.asarray(n_alleles, np.int32)
    mm = mesh.shape[MODEL_AXIS]
    l_ax = MODEL_AXIS if L % mm == 0 else None
    md = ModelData(
        x=sharded(counts_loc, P(DATA_AXIS, l_ax, None)),
        miss=sharded(miss_loc, P(DATA_AXIS, l_ax)),
        mask=jax.make_array_from_callback(
            mask.shape, NamedSharding(mesh, P(l_ax, None)),
            lambda idx: mask[idx]),
        n_alleles=jax.make_array_from_callback(
            n_all32.shape, NamedSharding(mesh, P(l_ax)),
            lambda idx: n_all32[idx]),
        row_valid=(None if Ip == I_total
                   else sharded(rv_loc, P(DATA_AXIS))),
    )
    return md, IngestInfo(ds_local, lo, real_hi, I_total, miss_any,
                          n_alleles)


def _local_rows(arr, lo: int, n_real: int) -> np.ndarray:
    """Rows [lo, lo+n_real) of a data-sharded global array, assembled
    from THIS process's addressable shards (deduplicating model-axis
    replicas).  Works because each process owns a contiguous global row
    block (the module's layout contract)."""
    rows = {}
    for s in arr.addressable_shards:
        sl = s.index[0]
        start = 0 if sl.start is None else int(sl.start)
        if start not in rows:
            rows[start] = np.asarray(s.data)
    blocks = [rows[k] for k in sorted(rows)]
    full = np.concatenate(blocks, axis=0)
    return full[:n_real]


def write_outputs_distributed(opt, ds_local, info, K: int, mres) -> None:
    """Multi-host per-K output files (write_file_detail,
    write_file.c:203-335, sharded): every process writes ITS row block
    of the per-individual .etaik table as ``.etaik.part<p>.txt`` (names
    and global i indices are process-local knowledge), while process 0
    writes the replicated .out and .pklm tables.  ``cat`` the parts in
    process order for the single-host layout.  The CLUMPP .popq/.indivq
    outputs need host-global posteriors and stay single-host
    (PARITY.md)."""
    import jax

    from multiclust_tpu.io import writers

    lo, real_hi = info.lo, info.hi
    pid = jax.process_index()
    base = f"{writers._base(opt)}.{writers._model_tag(opt)}.K={K}"
    params = mres.best_params

    eta = params.eta
    if eta.ndim == 2:
        eta_loc = _local_rows(eta, lo, real_hi - lo)
        Kk = eta_loc.shape[1]
        n_loc = eta_loc.shape[0]
        i_col = lo + np.repeat(np.arange(n_loc, dtype=np.int64), Kk)
        ik = np.stack([i_col, np.tile(np.arange(Kk, dtype=np.int64),
                                      n_loc)], axis=1)
        writers._write_big_table(
            f"{base}.etaik.part{pid}.txt", "i\tk\tetaik\n" if pid == 0
            else "", ik, np.asarray(eta_loc, np.float64).reshape(-1, 1))

    if pid != 0:
        return
    # p is replicated across the data axis and every process's devices
    # cover the whole model axis (processes split data only), so the
    # full table is addressable here
    p = np.asarray(params.p)
    with open(base + ".out.txt", "w") as fp:
        fp.write("logL = %f (%s)\n" % (
            mres.max_logL,
            "converged" if mres.ever_converged else "not converged"))
        fp.write("AIC = %f\n" % mres.aic)
        fp.write("BIC = %f\n\n" % mres.bic)
    if eta.ndim == 1:
        with open(base + ".etak.txt", "w") as fp:
            fp.write("i\tk\tetak\n")
            for k in range(K):
                fp.write("%d\t%f\n" % (k, np.asarray(eta)[k]))
            fp.write("\n")
    # same jagged missing-slot row format as the single-host writer
    writers.write_pklm(base, K, p, info.n_alleles, info.miss_any)


def codes_distributed(md, info, opt, mesh):
    """Global [Ip, L, ploidy] per-copy allele-slot codes for the
    admixture initializers (init/random.codes_from_counts), assembled
    from each process's local shard; padded rows are all-missing (-1),
    which the initializers already treat as carrying no allele mass."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multiclust_tpu.init.random import codes_from_counts

    ds_local, lo, real_hi = info.ds_local, info.lo, info.hi
    n_loc = int(md.x.shape[0]) // jax.process_count()
    L = int(md.x.shape[1])
    codes_real = codes_from_counts(
        np.asarray(ds_local.counts, np.int64),
        np.asarray(ds_local.miss, np.int64), opt.ploidy)
    codes_loc = np.full((n_loc, L, opt.ploidy), -1, np.int32)
    codes_loc[:real_hi - lo, :codes_real.shape[1]] = codes_real
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS, None, None)), codes_loc)
