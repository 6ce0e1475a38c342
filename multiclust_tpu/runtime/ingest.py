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

Cross-process allele vocabulary: position-coded alleles (-I) need only
the per-locus allele-count MAXIMUM synced (one [L] allgather).
Label-coded panels (microsatellite fragment lengths etc.) get a GLOBAL
per-locus label vocabulary: each process summarizes its shard's distinct
labels (io/structure.local_label_summary), the [L, U] tables allgather
and union per locus in sorted order - the reference's summarize_alleles
ordering (read_file.c:443-600) - and every shard maps its labels through
the shared table (codes_from_labels).  One parse per shard either way.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

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


def _global_label_vocab(vloc: np.ndarray, sloc: np.ndarray, n_proc: int):
    """Union the per-process per-locus label tables into the GLOBAL
    sorted vocabulary (the single-host reader's np.unique order =
    summarize_alleles' ascending sort, read_file.c:443-600).

    ``vloc`` is this process's [L, U_loc] LABEL_PAD-padded table
    (io/structure.local_label_summary).  The allgather ships
    O(P * L * U) ints - tiny for real label-coded panels (microsatellite
    L is small; SNP labels have U <= 4)."""
    from multiclust_tpu.io.structure import LABEL_PAD

    if n_proc == 1:
        return vloc, np.asarray(sloc, np.int64)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    U_loc = vloc.shape[1]
    U = int(np.asarray(multihost_utils.process_allgather(
        jnp.asarray(np.array([U_loc], np.int64)))).max())
    if U_loc < U:
        vloc = np.pad(vloc, ((0, 0), (0, U - U_loc)),
                      constant_values=LABEL_PAD)
    g = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(vloc)))                            # [P, L, U]
    L = vloc.shape[0]
    uniques = []
    for l in range(L):
        vals = g[:, l, :].ravel()
        uniques.append(np.unique(vals[vals != LABEL_PAD]))
    Ug = max((u.size for u in uniques), default=0)
    vocab = np.full((L, max(Ug, 1)), LABEL_PAD, np.int64)
    sizes = np.zeros(L, np.int64)
    for l, u in enumerate(uniques):
        vocab[l, :u.size] = u
        sizes[l] = u.size
    return vocab, sizes


def _impute_global_mode(ds_local, n_proc: int):
    """-m/--impute under sharded ingestion: the imputation mode must be
    the GLOBAL per-locus modal allele (summarize_alleles imputation,
    read_file.c:487-509, :545-554) - a shard-local mode would silently
    diverge between processes.  Per-process count histograms
    allgather-sum into the global [L, M] table; missing copies then move
    to the argmax slot (ties -> smallest, as the reference) and the
    shard is missing-free.  Single-process this equals the single-host
    reader's imputation exactly."""
    counts = np.asarray(ds_local.counts, np.int64)
    miss = np.asarray(ds_local.miss, np.int64)
    M_loc = counts.shape[2]
    if n_proc > 1:
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        M = int(np.asarray(multihost_utils.process_allgather(
            jnp.asarray(np.array([M_loc], np.int64)))).max())
    else:
        M = M_loc
    if M > M_loc:
        counts = np.pad(counts, ((0, 0), (0, 0), (0, M - M_loc)))
    hist = _allgather_sum(counts.sum(axis=0))          # [L, M] global
    mode = hist.argmax(axis=1)                         # ties -> smallest
    counts[:, np.arange(counts.shape[1]), mode] += miss
    IL = ds_local.IL
    if IL is not None:
        IL = np.where(IL == -9, mode[None, :], IL)
    ds_local.counts = counts.astype(ds_local.counts.dtype)
    ds_local.miss = np.zeros_like(miss, dtype=ds_local.miss.dtype)
    ds_local.IL = IL
    # the mode is a globally observed allele, so n_alleles cannot grow;
    # a shard may gain a locally-unseen slot - the global n_alleles
    # union/max downstream already covers it
    ds_local.n_alleles = np.maximum(
        np.asarray(ds_local.n_alleles, np.int64), mode + 1)
    return ds_local


def write_data_distributed(opt, ds_local, info, outfile: str) -> None:
    """Sharded --impute/--format data writer (write_data,
    write_file.c:22-130): every process writes ITS row block as
    ``<outfile>.part<p>`` (process 0's part carries the header); ``cat``
    the parts in process order for the single-host file."""
    import jax

    from multiclust_tpu.io import writers

    pid = jax.process_index()
    writers.write_data(opt, ds_local, f"{outfile}.part{pid}",
                       header=(pid == 0))


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
    label_sizes = None
    # imputation must use the GLOBAL mode (the _impute_global_mode pass
    # below); shard-local imputation inside the readers is suppressed
    import dataclasses as _dc
    opt_read = (_dc.replace(opt, imputation_method=0)
                if opt.imputation_method else opt)
    if opt.alleles_are_indices:
        ds_local, I_check = read_structure_shard(path, min(lo, I_total),
                                                 real_hi, opt_read)
    else:
        # label-coded panel: parse the shard ONCE, union the per-locus
        # label sets across processes (sorted - summarize_alleles order,
        # read_file.c:443-600), then map the shard through the table
        from multiclust_tpu.io.dataset import from_haplotypes
        from multiclust_tpu.io.structure import codes_from_labels, \
            local_label_summary, read_structure_shard_raw
        IL, names, locales, pops, I_check, _ = read_structure_shard_raw(
            path, min(lo, I_total), real_hi, ploidy=opt.ploidy,
            R_format=opt.R_format, one_plus=opt.one_plus,
            missing_value=opt.missing_value)
        vloc, sloc = local_label_summary(IL)
        vocab, label_sizes = _global_label_vocab(vloc, sloc, n_proc)
        codes = codes_from_labels(IL, vocab, label_sizes)
        ds_local = from_haplotypes(
            codes, ploidy=opt.ploidy, alleles_are_indices=True,
            imputation_method=0,  # global-mode imputation runs below
            names=names, locales=locales, pops=pops)
        ds_local.L_alleles = [vocab[l, :label_sizes[l]]
                              for l in range(vocab.shape[0])]
    assert I_check == I_total, (I_check, I_total)

    if opt.imputation_method:
        ds_local = _impute_global_mode(ds_local, n_proc)
    if not opt.alleles_are_indices:
        # restore label-space IL (the writers emit LABELS, as the
        # single-host reader's IL does; the code-space IL from the
        # global-vocabulary mapping is an internal representation)
        IL_codes = np.asarray(ds_local.IL)
        Lv = vocab.shape[0]
        lab = vocab[np.arange(Lv)[None, :], np.maximum(IL_codes, 0)]
        from multiclust_tpu.config import MISSING as _MISS
        ds_local.IL = np.where(IL_codes == _MISS, _MISS, lab)

    # allele-count sync: global per-locus max (position-coded alleles
    # guarantee slot agreement; only the lane COUNT can differ per
    # shard).  Label-coded panels know the exact global counts from the
    # vocabulary union.
    n_all_local = np.asarray(ds_local.n_alleles, np.int64)
    miss_any_loc = np.asarray(ds_local.miss, np.int64).any(axis=0)
    L = n_all_local.shape[0]
    if label_sizes is not None:
        n_alleles = np.asarray(label_sizes, np.int64)
        miss_any = (np.asarray(_allgather_sum(
            miss_any_loc.astype(np.int64))) > 0)
    elif n_proc > 1:
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


def _allgather_sum(arr) -> np.ndarray:
    """Sum a same-shaped per-process host array over all processes
    (identity single-process); used for the tiny global reductions -
    contingency tables, count.K, per-locale popq sums."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        jnp.asarray(arr))).sum(axis=0)


def _gather_name_lists(names):
    """Every process's list of strings (utf-8, newline-joined, padded
    uint8 allgather) in process order; tiny - used for the global
    sampling-locale vocabulary in the multi-host .popq writer."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return [list(names)]
    from jax.experimental import multihost_utils
    data = np.frombuffer("\n".join(names).encode(), np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(np.array([data.size], np.int32)))).reshape(-1)
    buf = np.zeros((int(lens.max()),), np.uint8)
    buf[:data.size] = data
    bufs = np.asarray(multihost_utils.process_allgather(jnp.asarray(buf)))
    out = []
    for b, ln in zip(np.atleast_2d(bufs), lens):
        s = bytes(b[:int(ln)].tobytes()).decode()
        out.append(s.split("\n") if s else [])
    return out


def mass_global(opt, params, md):
    """Global per-individual cluster-mass matrix [Ip, K], computed
    SHARDED: the admixture posterior allele mass dik (partition_admixture
    write_file.c:350-382) or the mixture posterior v (partition_mixture
    :582-600).  Padding rows carry zero counts and contribute
    zeros/uniform rows; callers slice the real rows."""
    import jax

    if opt.admixture:
        from multiclust_tpu.model.admixture import posterior_allele_mass
        return jax.jit(posterior_allele_mass)(params, md)
    from multiclust_tpu.model.mixture import e_step

    return jax.jit(lambda pp, mm: e_step(pp, mm)[0])(params, md)


def score_arand_distributed(opt, md, info, mres, truth) -> float:
    """Adjusted Rand vs a true partition under multi-process (-A,
    adj_rand multiclust.c:1903-1985): the hard partition is the sharded
    argmax of the global mass matrix; each process builds the
    contingency table of ITS real rows and the tables allgather-sum
    (k1 x K - tiny) before the closed-form index."""
    from multiclust_tpu.stats.rand_index import ADJUSTED_RAND_INDEX, \
        agreement_from_contingency

    truth = np.asarray(truth)
    mass = mass_global(opt, mres.best_params, md)
    n_loc = info.hi - info.lo
    assign_loc = _local_rows(mass, info.lo, n_loc).argmax(axis=1)
    truth_loc = truth[info.lo:info.hi]
    k1 = int(truth.max()) + 1
    K = int(mass.shape[1])
    nmat_loc = np.zeros((k1, K))
    np.add.at(nmat_loc, (truth_loc, assign_loc), 1.0)
    nmat = _allgather_sum(nmat_loc)
    return float(agreement_from_contingency(nmat, info.I_total,
                                            ADJUSTED_RAND_INDEX))


def write_clumpp_distributed(opt, ds_local, info, K: int, mres,
                             md) -> np.ndarray:
    """Multi-host CLUMPP/DISTRUCT outputs (popq_admix write_file.c:
    398-475, indivq_admix :492-569, mixture variants :616-732): every
    process writes its row block of the per-individual .indivq table as
    ``.part<p>`` (names are process-local knowledge), and the per-locale
    .popq aggregates globally - per-process partial per-locale sums and
    sizes allgather-sum over a locale vocabulary unioned across
    processes in first-appearance order (= the single-host reader's
    order, since processes own contiguous row blocks).  Returns the
    global count.K vector (hard-assignment bincount) for the .out
    writer."""
    import jax

    from multiclust_tpu.io import writers

    pid = jax.process_index()
    lo, real_hi = info.lo, info.hi
    n_loc = real_hi - lo
    params = mres.best_params
    mass_loc = _local_rows(mass_global(opt, params, md), lo, n_loc)
    assign_loc = mass_loc.argmax(axis=1)
    count_K = _allgather_sum(
        np.bincount(assign_loc, minlength=K).astype(np.int64))

    ploidy, L = opt.ploidy, int(md.x.shape[1])
    if opt.admixture:
        frac = mass_loc / (ploidy * L)
        # indivq source selection (admixture_indivq_mass,
        # write_file.c:525-550) on the GLOBAL missing flag - a local one
        # could diverge between processes
        if (opt.eta_constrained or bool(np.asarray(info.miss_any).any())
                or params.eta.ndim == 1):
            ind_mass = frac
        else:
            ind_mass = _local_rows(params.eta, lo, n_loc)
        pop_mass = frac
    else:
        ind_mass = pop_mass = mass_loc

    base = writers._base(opt)
    if opt.admixture:
        iq_name = f"{base}_admix_indivq_{K}.indivq.part{pid}"
        pq_name = f"{base}_admix_popq_{K}.popq"
    else:
        iq_name = f"{base}.mix.K={K}.indivq.part{pid}"
        pq_name = f"{base}_mix_popq.popq"
    names = ds_local.names or [str(lo + i) for i in range(n_loc)]
    pops_loc = ds_local.pops or ["pop0"]
    loc_loc = (np.asarray(ds_local.locales, np.int64)
               if ds_local.locales is not None
               else np.zeros(n_loc, np.int64))
    with open(iq_name, "w") as fp:
        for j in range(n_loc):
            fp.write("%d\t%s\t(x)\t%s\t:" % (lo + j, names[j],
                                             pops_loc[loc_loc[j]]))
            fp.write("".join("\t%f" % v for v in ind_mass[j]))
            fp.write("\n")

    pops_g, index = [], {}
    for plist in _gather_name_lists(pops_loc):
        for nm in plist:
            if nm not in index:
                index[nm] = len(pops_g)
                pops_g.append(nm)
    g_loc = np.array([index[nm] for nm in pops_loc], np.int64)[loc_loc]
    agg_loc = np.zeros((len(pops_g), K))
    np.add.at(agg_loc, g_loc, pop_mass)
    agg = _allgather_sum(agg_loc)
    sizes = _allgather_sum(np.bincount(g_loc, minlength=len(pops_g))
                           .astype(np.int64))
    if pid == 0:
        with open(pq_name, "w") as fp:
            for n_, pop in enumerate(pops_g):
                fp.write("%s:\t" % pop)
                fp.write("".join("%f\t" % v
                                 for v in agg[n_] / max(sizes[n_], 1)))
                fp.write("%d\n" % sizes[n_])
    return count_K


def warm_start_distributed(opt, info, mesh, dtype):
    """-Q/-P warm start under multi-process (read_qfile/read_pfile,
    read_file.c:880-959): the parameter files are O(I*K) / O(L*K) - tiny
    next to the genotype matrix - so every process reads them fully and
    the arrays are lifted to mesh-replicated GLOBAL arrays (the engine's
    padding/representation/sharding machinery then treats them exactly
    like any other global params; jnp ops on process-local host arrays
    would produce committed single-device arrays that cannot be resharded
    onto a multi-process mesh)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multiclust_tpu.io.warm_start import read_pfile, read_qfile
    from multiclust_tpu.model.common import Params

    M = int(np.asarray(info.n_alleles).max())
    if M != 2:
        from multiclust_tpu.cli import UsageError
        raise UsageError(
            f"-P warm start assumes biallelic data; dataset has up to "
            f"{M} alleles per locus")
    per_individual = opt.admixture and not opt.eta_constrained
    eta = read_qfile(opt.qfile, info.I_total, opt.max_K,
                     per_individual=per_individual)
    L = int(np.asarray(info.n_alleles).shape[0])
    p = read_pfile(opt.pfile, L, opt.max_K)

    def rep(arr):
        arr = np.ascontiguousarray(np.asarray(arr, dtype))
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, P()), lambda idx: arr[idx])

    return Params(eta=rep(eta), p=rep(p))


def write_outputs_distributed(opt, ds_local, info, K: int, mres,
                              md=None) -> None:
    """Multi-host per-K output files (write_file_detail,
    write_file.c:203-335, sharded): every process writes ITS row block
    of the per-individual .etaik table as ``.etaik.part<p>.txt`` (names
    and global i indices are process-local knowledge), while process 0
    writes the replicated .out and .pklm tables.  ``cat`` the parts in
    process order for the single-host layout.  With ``md`` the CLUMPP
    .popq/.indivq outputs are written too (write_clumpp_distributed)
    and .out.txt carries the global count.K section."""
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

    count_K = None
    if md is not None:
        count_K = write_clumpp_distributed(opt, ds_local, info, K, mres,
                                           md)

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
        if count_K is not None:
            # the single-host writer's count.K section
            # (write_file.c:248-252)
            fp.write("count.K\n")
            fp.write("".join("%d " % c for c in count_K))
            fp.write("\n\n")
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
