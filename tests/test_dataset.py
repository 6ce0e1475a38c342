import numpy as np

from multiclust_tpu.config import MISSING, Options
from multiclust_tpu.io.dataset import from_haplotypes
from multiclust_tpu.io.structure import read_structure, read_structure_raw


def test_from_haplotypes_basic():
    # 2 diploid individuals, 3 loci; allele labels arbitrary ints
    IL = np.array([
        [101, 7, 3],
        [102, 7, 3],     # individual 0
        [101, 9, 3],
        [101, 7, 3],     # individual 1
    ])
    ds = from_haplotypes(IL, ploidy=2)
    assert ds.I == 2 and ds.L == 3 and ds.M == 2
    assert list(ds.n_alleles) == [2, 2, 1]
    # locus 0: alleles [101,102]; ind0 has one of each, ind1 has two 101s
    assert ds.counts[0, 0].tolist() == [1, 1]
    assert ds.counts[1, 0].tolist() == [2, 0]
    assert ds.counts[0, 2].tolist() == [2, 0]
    assert not ds.missing_data


def test_from_haplotypes_missing():
    IL = np.array([
        [101, MISSING],
        [102, 7],
        [MISSING, 7],
        [MISSING, 7],
    ])
    ds = from_haplotypes(IL, ploidy=2)
    assert ds.missing_data
    assert ds.miss[0].tolist() == [0, 1]
    assert ds.miss[1].tolist() == [2, 0]
    assert ds.counts[1, 0].tolist() == [0, 0]
    assert (ds.counts.sum(axis=2) + ds.miss == 2).all()
    assert ds.has_missing_slot.tolist() == [True, True]


def test_imputation_mode():
    IL = np.array([
        [1, 5],
        [1, 5],
        [2, MISSING],
        [1, 5],
    ])
    ds = from_haplotypes(IL, ploidy=2, imputation_method=1)
    assert not ds.missing_data
    # missing at locus 1 imputed with modal allele 5 (lane 1 is padding)
    assert ds.counts[1, 1].tolist() == [2, 0]


def test_alleles_are_indices():
    IL = np.array([
        [0, 2],
        [1, 2],
        [0, 0],
        [0, 1],
    ])
    ds = from_haplotypes(IL, ploidy=2, alleles_are_indices=True)
    assert list(ds.n_alleles) == [2, 3]
    assert ds.L_alleles is None
    assert ds.counts[1, 1].tolist() == [1, 1, 0]


def test_structure_roundtrip_noninterleaved(tmp_path):
    path = tmp_path / "toy.str"
    path.write_text(
        "loc1 loc2 loc3\n"
        "ind1 popA 1 2 3\n"
        "ind1 popA 1 2 4\n"
        "ind2 popB 2 2 3\n"
        "ind2 popB 1 -9 3\n")
    ds = read_structure(str(path), Options(ploidy=2))
    assert ds.I == 2 and ds.L == 3
    assert ds.names == ["ind1", "ind2"]
    assert ds.pops == ["popA", "popB"]
    assert ds.miss[1, 1] == 1
    assert ds.counts[0, 0].tolist() == [2, 0]


def test_structure_interleaved(tmp_path):
    path = tmp_path / "toy.str"
    # one row per individual, ploidy consecutive columns per locus,
    # header names each locus once (D = ploidy * L case)
    path.write_text(
        "loc1 loc2\n"
        "ind1 popA 1 1 2 3\n"
        "ind2 popA 1 2 3 3\n")
    ds = read_structure(str(path), Options(ploidy=2))
    assert ds.I == 2 and ds.L == 2
    assert ds.counts[0, 0].tolist() == [2, 0]   # alleles 1,1
    assert ds.counts[1, 0].tolist() == [1, 1]   # alleles 1,2
    assert ds.counts[0, 1].tolist() == [1, 1]   # alleles 2,3


def test_structure_distance_line_skipped(tmp_path):
    path = tmp_path / "toy.str"
    path.write_text(
        "loc1 loc2\n"
        "-1 10 20\n"
        "ind1 popA 1 2\n"
        "ind1 popA 1 2\n")
    IL, names, locales, pops = read_structure_raw(str(path), ploidy=2)
    assert IL.shape == (2, 2)
    assert names == ["ind1"]


def test_one_plus_and_missing_value(tmp_path):
    path = tmp_path / "toy.str"
    path.write_text(
        "loc1\n"
        "i1 p 1\n"
        "i1 p 2\n"
        "i2 p 0\n"
        "i2 p 1\n")
    # one_plus: alleles are indices+1; missing_value 0 -> becomes -1 after
    # the shift, remapped to MISSING
    IL, *_ = read_structure_raw(str(path), ploidy=2, one_plus=True,
                                missing_value=0)
    assert IL[:, 0].tolist() == [0, 1, MISSING, 0]


def test_n_parameters():
    IL = np.array([[1, 5], [2, 5], [1, 6], [1, 5]])
    ds = from_haplotypes(IL, ploidy=2)
    # n_alleles = [2, 2] -> p params per K: 2; K=3 mixture: 2 + 3*2 = 8
    assert ds.n_parameters(3, admixture=False, eta_constrained=False) == 8
    assert ds.n_parameters(3, admixture=True, eta_constrained=False) == \
        2 * 2 + 3 * 2
