"""Label-coded multi-host ingestion (VERDICT r4 missing 1).

Sharded reads of LABEL-coded panels (microsatellite fragment lengths)
reconcile per-shard allele vocabularies through a cross-process union
(runtime/ingest._global_label_vocab) in the reference's sorted order
(summarize_alleles, read_file.c:443-600).  Single-process equivalence is
certified here (fast); the 2-process byte-parity test lives in
test_distributed.py (slow tier).
"""

import numpy as np
import pytest

from multiclust_tpu.config import Options
from multiclust_tpu.io.structure import codes_from_labels, \
    local_label_summary, read_structure


@pytest.fixture
def microsat_file(tmp_path):
    """Jagged label-coded panel: fragment-length alleles, per-locus
    vocabularies of size 2..4, 5% missing."""
    rng = np.random.default_rng(17)
    I, L = 24, 10
    vocabs = [sorted(rng.choice(np.arange(120, 180, 4),
                                size=rng.integers(2, 5), replace=False))
              for _ in range(L)]
    path = tmp_path / "microsat.str"
    with open(path, "w") as fh:
        fh.write(" ".join(f"loc{j}" for j in range(L)) + "\n")
        for i in range(I):
            for _ in range(2):
                hap = [int(rng.choice(vocabs[j])) for j in range(L)]
                hap = [-9 if rng.random() < 0.05 else v for v in hap]
                fh.write(f"ind{i} pop{i % 2} "
                         + " ".join(map(str, hap)) + "\n")
    return str(path)


def test_local_label_summary_and_codes(microsat_file):
    opt = Options()
    ds_ref = read_structure(microsat_file, opt)  # single-host label path
    from multiclust_tpu.io.structure import read_structure_raw
    IL, _, _, _ = read_structure_raw(microsat_file)
    vocab, sizes = local_label_summary(IL)
    # one-process union == the single-host per-locus vocabularies
    for l in range(len(ds_ref.L_alleles)):
        np.testing.assert_array_equal(vocab[l, :sizes[l]],
                                      ds_ref.L_alleles[l])
    codes = codes_from_labels(IL, vocab, sizes)
    miss = IL == -9
    np.testing.assert_array_equal(codes[miss], -9)
    assert (codes[~miss] >= 0).all()


def test_single_process_label_ingest_matches_reader(microsat_file):
    """load_structure_distributed (1 process, virtual 8-device mesh) on a
    label-coded panel reproduces the single-host reader's dataset."""
    import jax
    import jax.numpy as jnp

    from multiclust_tpu.runtime.ingest import load_structure_distributed
    from multiclust_tpu.runtime.mesh import cached_mesh

    opt = Options()
    ds_ref = read_structure(microsat_file, opt)
    mesh = cached_mesh((8, 1))
    md, info = load_structure_distributed(microsat_file, opt, mesh,
                                          dtype=jnp.float64)
    assert info.I_total == ds_ref.I
    np.testing.assert_array_equal(np.asarray(info.n_alleles),
                                  ds_ref.n_alleles)
    x = np.asarray(md.x)[:ds_ref.I]
    np.testing.assert_array_equal(x, ds_ref.counts)
    np.testing.assert_array_equal(np.asarray(md.miss)[:ds_ref.I],
                                  ds_ref.miss)
    np.testing.assert_array_equal(np.asarray(info.miss_any),
                                  ds_ref.miss.any(axis=0))
    # the global vocabulary matches the single-host L_alleles
    for a, b in zip(info.ds_local.L_alleles, ds_ref.L_alleles):
        np.testing.assert_array_equal(a, b)


def test_single_process_global_mode_imputation(microsat_file):
    """-m/--impute through the distributed loader: the global-mode
    imputation pass (runtime/ingest._impute_global_mode) reproduces the
    single-host reader's imputation exactly - counts, zeroed miss, AND
    the label-space IL the data writers emit."""
    import jax.numpy as jnp

    from multiclust_tpu.runtime.ingest import load_structure_distributed
    from multiclust_tpu.runtime.mesh import cached_mesh

    opt = Options(imputation_method=1)
    ds_ref = read_structure(microsat_file, opt)
    assert not ds_ref.miss.any()
    md, info = load_structure_distributed(
        microsat_file, opt, cached_mesh((8, 1)), dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(md.x)[:ds_ref.I],
                                  ds_ref.counts)
    assert not np.asarray(md.miss).any()
    np.testing.assert_array_equal(info.ds_local.IL, ds_ref.IL)
