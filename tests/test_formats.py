"""Format coverage: tetraploid multi-allelic golden, R-format, PED,
imputation output, bootstrap-data writer."""

import os

import numpy as np
import pytest

from multiclust_tpu.config import MISSING, Options, OutputFormat
from multiclust_tpu.io.structure import read_structure, read_structure_raw
from multiclust_tpu.io.writers import write_data
from multiclust_tpu.stats.sim import random_model, simulate_admixture_fast

from test_golden import parse_out_file, ref_binary, run_reference  # noqa


def write_structure_file(ds, path, ploidy):
    with open(path, "w") as fh:
        fh.write(" ".join(f"loc{l + 1}" for l in range(ds.L)) + "\n")
        for i in range(ds.I):
            for a in range(ploidy):
                fh.write(f"ind{i} pop0 "
                         + " ".join(map(str, ds.IL[i * ploidy + a])) + "\n")


def test_tetraploid_multiallelic_golden(ref_binary, tmp_path, rng):
    """BASELINE.md config 4: ploidy 4, multi-allelic, admixture with
    projection; K=1 without missing data gives a deterministic global
    optimum to compare.  Missing data is excluded because the reference's
    missing-data path reads uninitialized memory (see PARITY.md
    "Discovered reference defect")."""
    K, ploidy, M = 2, 4, 6
    Q, P = random_model(rng, K, 12, M, I=30)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=ploidy)
    write_structure_file(ds, str(tmp_path / "tet.str"), ploidy)

    run_reference(ref_binary,
                  ["-f", "tet.str", "-a", "-p", "4", "-k", "1", "-n", "1"],
                  cwd=str(tmp_path))
    ref_logL, ref_aic, ref_bic = parse_out_file(
        str(tmp_path / "tet.str.admix.K=1.out.txt"))

    import jax.numpy as jnp
    from multiclust_tpu.init.random import codes_from_counts, initialize
    from multiclust_tpu.model.common import EMConfig, \
        model_data_from_dataset
    from multiclust_tpu.opt.driver import fit
    import jax
    lb = min(1e-8, 0.5 / ds.I / ploidy)
    cfg = EMConfig(admixture=True, eta_lower_bound=lb, p_lower_bound=lb)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, ploidy))
    p0 = initialize(jax.random.PRNGKey(0), md, 1, cfg, codes=codes)
    res = fit(p0, md, cfg)
    assert abs(res.logL - ref_logL) < 1e-3, (res.logL, ref_logL)

    from multiclust_tpu.model.likelihood import aic, bic
    npar = ds.n_parameters(1, True, False)
    assert abs(aic(res.logL, npar) - ref_aic) < 5e-3
    assert abs(bic(res.logL, npar, ds.I) - ref_bic) < 5e-3


def test_tetraploid_em_recovers(rng):
    """Tetraploid admixture K=3 fit improves logL and converges."""
    import jax
    import jax.numpy as jnp
    from multiclust_tpu.init.random import codes_from_counts, initialize
    from multiclust_tpu.model.common import EMConfig, \
        model_data_from_dataset
    from multiclust_tpu.opt.driver import fit
    K, ploidy = 3, 4
    Q, P = random_model(rng, K, 30, 8, I=40)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=ploidy,
                                 missing_rate=0.05)
    md = model_data_from_dataset(ds, dtype=jnp.float64)
    cfg = EMConfig(admixture=True, accel_scheme=1, adjust_step=5)
    codes = jnp.asarray(codes_from_counts(ds.counts, ds.miss, ploidy))
    p0 = initialize(jax.random.PRNGKey(1), md, K, cfg, codes=codes)
    res = fit(p0, md, cfg)
    assert res.converged and not bool(res.state.failed)
    # every individual's counts sum correctly in the fitted masses
    from multiclust_tpu.model.admixture import posterior_allele_mass
    dik = posterior_allele_mass(res.state.params, md)
    np.testing.assert_allclose(np.asarray(dik).sum(axis=1),
                               ploidy * ds.L, rtol=1e-8)


def test_r_format(tmp_path):
    # R-format: header has two extra columns (read_file.c:58-59)
    path = tmp_path / "r.str"
    path.write_text(
        "row id loc1 loc2\n"
        "i1 p 1 2\n"
        "i1 p 1 2\n")
    IL, names, locales, pops = read_structure_raw(str(path), ploidy=2,
                                                  R_format=True)
    assert IL.shape == (2, 2)


def test_ped_output(tmp_path, rng):
    Q, P = random_model(rng, 2, 5, 2, I=4)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=2)
    opt = Options(output_format=OutputFormat.PED, path=str(tmp_path))
    out = write_data(opt, ds, str(tmp_path / "o.ped"))
    lines = open(out).read().strip().splitlines()
    assert len(lines) == ds.I
    first = lines[0].split()
    # name name 0 0 0 -9 then ploidy*L alleles (+1 shifted for PED)
    assert first[2:6] == ["0", "0", "0", "-9"]
    assert len(first) == 6 + 2 * ds.L
    assert all(int(v) >= 1 for v in first[6:])  # plus-one applied


def test_write_data_from_counts_roundtrip(tmp_path, rng):
    """Bootstrap-style write from the count tensor re-reads identically."""
    Q, P = random_model(rng, 2, 8, 3, I=10)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=2, missing_rate=0.2)
    opt = Options(path=str(tmp_path))
    out = write_data(opt, ds, str(tmp_path / "c.str"), use_counts=True)
    ds2 = read_structure(out, Options(ploidy=2))
    np.testing.assert_array_equal(ds2.counts, ds.counts)
    np.testing.assert_array_equal(ds2.miss, ds.miss)


def test_impute_outfile_cli(tmp_path, rng):
    from multiclust_tpu.cli import main
    Q, P = random_model(rng, 2, 6, 2, I=8)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=2, missing_rate=0.3)
    src = tmp_path / "m.str"
    write_structure_file(ds, str(src), 2)
    imputed = tmp_path / "imputed.str"
    rc = main(["-f", str(src), "-k", "2", "-n", "1",
               "--impute", str(imputed), "-d", str(tmp_path)])
    assert rc == 0
    ds2 = read_structure(str(imputed), Options(ploidy=2))
    assert not ds2.missing_data


def test_write_file_detail_bulk_matches_loop(tmp_path, rng):
    """The vectorized/native bulk writers for .etaik/.pklm reproduce the
    original per-value loop byte-for-byte, including jagged loci and the
    missing slot-0 rows (write_file_detail, write_file.c:203-335)."""
    from multiclust_tpu.config import Options
    from multiclust_tpu.io import writers
    from multiclust_tpu.stats.sim import random_model, \
        simulate_admixture_fast

    K = 3
    Q, P = random_model(rng, K, 25, 4, I=30)
    ds = simulate_admixture_fast(rng, Q, P, ploidy=2, missing_rate=0.15)
    eta = rng.dirichlet(np.full(K, 2.0), size=ds.I)
    p = rng.random((K, ds.L, ds.M))
    p = np.where(ds.mask[None], p, 0.0)
    p = p / np.maximum(p.sum(axis=2, keepdims=True), 1e-9)
    count_K = np.array([10, 12, 8])

    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    out_a.mkdir(), out_b.mkdir()
    opt_a = Options(filename="x.str", path=str(out_a), admixture=True)
    opt_b = Options(filename="x.str", path=str(out_b), admixture=True)
    writers.write_file_detail(opt_a, ds, K, -123.4, True, 1.0, 2.0,
                              count_K, eta, p)

    # reference implementation: the original per-value loops
    base = f"{out_b}/x.str.admix.K={K}"
    with open(base + ".etaik.txt", "w") as fp:
        fp.write("i\tk\tetaik\n")
        for i in range(eta.shape[0]):
            for k in range(K):
                fp.write("%d\t%d\t%f\n" % (i, k, eta[i, k]))
        fp.write("\n")
    has_missing = ds.has_missing_slot
    with open(base + ".pklm.txt", "w") as fp:
        fp.write("k\tl\tm\tKLM\n")
        for k in range(K):
            for l in range(ds.L):
                m_start = int(has_missing[l])
                for m in range(ds.n_alleles[l] + m_start):
                    val = 0.0 if m < m_start else p[k, l, m - m_start]
                    fp.write("%d\t%d\t%d\t%f\n" % (k, l, m, val))
        fp.write("\n")

    for suffix in (".etaik.txt", ".pklm.txt"):
        a = (out_a / f"x.str.admix.K={K}{suffix}").read_bytes()
        b = (out_b / f"x.str.admix.K={K}{suffix}").read_bytes()
        assert a == b, f"{suffix} diverged"


def _write_snp_structure(path, rng, I=23, L=17, ploidy=2, missing=0.1,
                         interleaved=False):
    """Position-coded (0/1) biallelic STRUCTURE file with missing."""
    hap = rng.integers(0, 2, size=(I * ploidy, L))
    miss = rng.random((I * ploidy, L)) < missing
    hap = np.where(miss, MISSING, hap)
    with open(path, "w") as fh:
        fh.write(" ".join(f"l{j}" for j in range(L)) + "\n")
        if interleaved:
            for i in range(I):
                row = hap[i * ploidy:(i + 1) * ploidy].T.reshape(-1)
                fh.write(f"i{i} p{i % 3} " + " ".join(map(str, row)) + "\n")
        else:
            for i in range(I):
                for a in range(ploidy):
                    fh.write(f"i{i} p{i % 3} "
                             + " ".join(map(str, hap[i * ploidy + a]))
                             + "\n")
    return hap


@pytest.mark.parametrize("interleaved", [False, True])
@pytest.mark.parametrize("use_native", [True, False])
def test_shard_reader_concat_equals_full(tmp_path, rng, interleaved,
                                         use_native):
    """read_structure_shard over a partition of [0, I) reproduces the
    full single-host read exactly (counts/miss/n_alleles), for both row
    layouts and both reader backends (native streaming range parse +
    Python fallback) - the multi-host ingestion primitive (VERDICT r3
    item 1; replaces read_file.c:38-300's whole-file read)."""
    from multiclust_tpu.io.structure import (read_structure,
                                             read_structure_shard,
                                             scan_structure)

    path = str(tmp_path / "snp.str")
    _write_snp_structure(path, rng, interleaved=interleaved)
    opt = Options(alleles_are_indices=True)
    full = read_structure(path, opt)

    n_rows, header_cols, n0, n1 = scan_structure(path,
                                                 use_native=use_native)
    assert header_cols == full.L
    assert (n_rows == full.I) == interleaved

    cuts = [0, 7, 8, 23]
    parts = []
    for lo, hi in zip(cuts, cuts[1:]):
        ds, I_total = read_structure_shard(path, lo, hi, opt)
        assert I_total == full.I
        parts.append(ds)
    # global allele-count max across shards (runtime/ingest.py's sync)
    M = max(p.M for p in parts)
    counts = np.concatenate(
        [np.pad(p.counts, ((0, 0), (0, 0), (0, M - p.M))) for p in parts])
    np.testing.assert_array_equal(counts, full.counts)
    np.testing.assert_array_equal(
        np.concatenate([p.miss for p in parts]), full.miss)
    np.testing.assert_array_equal(
        np.maximum.reduce([p.n_alleles for p in parts]), full.n_alleles)
    assert sum(([*p.names] for p in parts), []) == full.names


def test_shard_reader_requires_position_codes(tmp_path, rng):
    from multiclust_tpu.io.structure import read_structure_shard
    from multiclust_tpu.messages import MulticlustError

    path = str(tmp_path / "snp.str")
    _write_snp_structure(path, rng)
    with pytest.raises(MulticlustError):
        read_structure_shard(path, 0, 4, Options(alleles_are_indices=False))
