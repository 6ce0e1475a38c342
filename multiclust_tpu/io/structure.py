"""STRUCTURE-format reader.

Replicates the reference parser's behavior (read_file.c:38-300):

* line 1 is a header of locus names; with ``R_format`` the header has two
  extra columns (read_file.c:58-59);
* an optional second line starting with ``-1`` carries inter-marker distances
  and is skipped (read_file.c:70-82);
* layout is autodetected by comparing the names of the first two data rows
  (read_file.c:89-95): equal names mean "ploidy consecutive rows per
  individual" (non-interleaved), different names mean one row per individual
  with ploidy consecutive columns per locus (interleaved);
* each data row leads with two info columns (name, sampling locale); rows
  2..ploidy of a non-interleaved individual repeat them;
* ``one_plus`` shifts alleles (and the missing sentinel) down by one
  (read_file.c:224-225, :263-264); a user-supplied ``missing_value`` is then
  remapped to the canonical MISSING=-9 (change_missing_value,
  read_file.c:411-429).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from multiclust_tpu.config import MISSING, Options
from multiclust_tpu.io.dataset import Dataset, from_haplotypes


class StructureFormatError(ValueError):
    pass


def _try_native_tokenize(path: str):
    """Use the C++ fast reader if built; returns None to fall back."""
    try:
        from multiclust_tpu.io import fastread
        return fastread.read_tokens(path)
    except Exception:
        return None


def read_structure_raw(
    path: str,
    ploidy: int = 2,
    R_format: bool = False,
    one_plus: bool = False,
    missing_value: int = MISSING,
) -> Tuple[np.ndarray, List[str], np.ndarray, List[str]]:
    """Parse a STRUCTURE file into (IL, names, locales, pops).

    ``IL`` is the [I*ploidy, L] haplotype matrix with MISSING sentinels.
    """
    with open(path, "r") as fh:
        lines = [ln.split() for ln in fh if ln.strip()]
    if not lines:
        raise StructureFormatError(f"'{path}' is empty")

    header = lines[0]
    L = len(header)
    if R_format:
        L -= 2  # KLUDGE matching read_file.c:58-59
    body = lines[1:]
    if body and body[0] and body[0][0] == "-1":
        body = body[1:]  # inter-marker distance line
    if len(body) < 1:
        raise StructureFormatError(f"'{path}' has no data rows")

    interleaved = len(body) < 2 or body[0][0] != body[1][0]

    n_info_col = 2
    D = len(body[0]) - n_info_col
    if interleaved:
        if D != L and D != ploidy * L:
            raise StructureFormatError(
                f"number of columns ({L}) in '{path}' is not a multiple of "
                f"ploidy ({ploidy})")
        n_loci = L // ploidy if D == L else L
        I = len(body)
    else:
        if D != L:
            raise StructureFormatError(
                f"number of columns ({L}) in '{path}' does not match number "
                f"of alleles ({D}) given for first individual")
        n_loci = L
        if len(body) % ploidy:
            raise StructureFormatError(
                f"number of lines ({len(body)}) in '{path}' is not a "
                f"multiple of ploidy ({ploidy})")
        I = len(body) // ploidy

    IL = np.empty((I * ploidy, n_loci), dtype=np.int64)
    names: List[str] = []
    pops: List[str] = []
    pop_index = {}
    locales = np.empty(I, dtype=np.int64)

    def locale_id(s: str) -> int:
        if s not in pop_index:
            pop_index[s] = len(pops)
            pops.append(s)
        return pop_index[s]

    if interleaved:
        for i, row in enumerate(body):
            names.append(row[0])
            locales[i] = locale_id(row[1])
            vals = row[n_info_col:]
            if len(vals) != ploidy * n_loci:
                raise StructureFormatError(
                    f"row {i + 1} of '{path}' has {len(vals)} data columns, "
                    f"expected {ploidy * n_loci}")
            # locus-major: ploidy consecutive values per locus
            block = np.array(vals, dtype=np.int64).reshape(n_loci, ploidy)
            for j in range(ploidy):
                IL[i * ploidy + j] = block[:, j]
    else:
        for i in range(I):
            rows = body[i * ploidy:(i + 1) * ploidy]
            names.append(rows[0][0])
            locales[i] = locale_id(rows[0][1])
            for j, row in enumerate(rows):
                vals = row[n_info_col:]
                if len(vals) != n_loci:
                    raise StructureFormatError(
                        f"haplotype {i * ploidy + j + 1} of '{path}' has "
                        f"{len(vals)} data columns, expected {n_loci}")
                IL[i * ploidy + j] = np.array(vals, dtype=np.int64)

    if one_plus:
        IL -= 1
        missing_value -= 1
    if missing_value != MISSING:
        if (IL == MISSING).any():
            raise StructureFormatError(
                f"The default missing value ({MISSING}) is observed in the "
                f"input file, but the user has defined the missing value to "
                f"be {missing_value}.")
        IL[IL == missing_value] = MISSING

    return IL, names, locales, pops


def read_structure(path: str, opt: Optional[Options] = None,
                   **kw) -> Dataset:
    """Read a STRUCTURE file into a :class:`Dataset`."""
    if opt is None:
        opt = Options(**{k: v for k, v in kw.items()
                         if k in Options.__dataclass_fields__})
    IL, names, locales, pops = read_structure_raw(
        path, ploidy=opt.ploidy, R_format=opt.R_format,
        one_plus=opt.one_plus, missing_value=opt.missing_value)
    return from_haplotypes(
        IL, ploidy=opt.ploidy,
        alleles_are_indices=opt.alleles_are_indices,
        imputation_method=opt.imputation_method,
        names=names, locales=locales, pops=pops)
