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

Tokenizing/number parsing uses the native C++ reader (native/, loaded via
io/fastread.py) when available, with a transparent pure-Python fallback.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from multiclust_tpu.config import MISSING, Options
from multiclust_tpu.io.dataset import Dataset, from_haplotypes
from multiclust_tpu.messages import Err, MulticlustError


class StructureFormatError(ValueError, MulticlustError):
    """Invalid STRUCTURE file; carries Err.FILE_FORMAT_ERROR so cli.main
    reports it through the message() taxonomy (message.h:28)."""

    def __init__(self, text: str):
        MulticlustError.__init__(self, Err.FILE_FORMAT_ERROR, text)


def _parse_tokens_python(path: str):
    """Pure-Python fallback matching the native reader's contract."""
    with open(path, "r") as fh:
        lines = [ln.split() for ln in fh if ln.strip()]
    if not lines:
        raise StructureFormatError(f"'{path}' is empty")
    header_cols = len(lines[0])
    body = lines[1:]
    skipped = False
    if body and body[0] and body[0][0] == "-1":
        body = body[1:]
        skipped = True
    if not body:
        raise StructureFormatError(f"'{path}' has no data rows")
    names = [row[0] for row in body]
    locales = [row[1] for row in body]
    widths = {len(row) - 2 for row in body}
    if len(widths) != 1:
        raise StructureFormatError(f"ragged data rows in '{path}'")
    try:
        data = np.array([[int(v) for v in row[2:]] for row in body],
                        dtype=np.int64)
    except ValueError as e:
        raise StructureFormatError(f"non-integer allele in '{path}': {e}")
    return header_cols, names, locales, data, skipped


def _parse_tokens(path: str, use_native: bool = True):
    import os
    if not os.path.isfile(path):
        # fopen failure is FILE_OPEN_ERROR in the taxonomy, distinct from
        # a parse failure (read_file.c:47-49)
        raise MulticlustError(Err.FILE_OPEN_ERROR, path)
    if use_native:
        try:
            from multiclust_tpu.io import fastread
            if fastread.available():
                return fastread.parse_file(path)
        except (RuntimeError, MemoryError):
            pass
        except ValueError as e:
            raise StructureFormatError(f"'{path}': {e}")
    return _parse_tokens_python(path)


def read_structure_raw(
    path: str,
    ploidy: int = 2,
    R_format: bool = False,
    one_plus: bool = False,
    missing_value: int = MISSING,
    use_native: bool = True,
) -> Tuple[np.ndarray, List[str], np.ndarray, List[str]]:
    """Parse a STRUCTURE file into (IL, names, locales, pops).

    ``IL`` is the [I*ploidy, L] haplotype matrix with MISSING sentinels.
    """
    header_cols, row_names, row_locales, data, _ = _parse_tokens(
        path, use_native)
    L = header_cols - 2 if R_format else header_cols  # read_file.c:58-59
    n_rows, D = data.shape

    interleaved = n_rows < 2 or row_names[0] != row_names[1]

    if interleaved:
        if D != L and D != ploidy * L:
            raise StructureFormatError(
                f"number of columns ({L}) in '{path}' is not a multiple of "
                f"ploidy ({ploidy})")
        n_loci = L // ploidy if D == L else L
        if D != ploidy * n_loci:
            raise StructureFormatError(
                f"data columns ({D}) in '{path}' do not cover "
                f"{n_loci} loci x ploidy {ploidy}")
        I = n_rows
        # locus-major: ploidy consecutive values per locus
        IL = data.reshape(I, n_loci, ploidy).transpose(0, 2, 1) \
            .reshape(I * ploidy, n_loci)
        names = list(row_names)
        locale_strs = list(row_locales)
    else:
        if D != L:
            raise StructureFormatError(
                f"number of columns ({L}) in '{path}' does not match number "
                f"of alleles ({D}) given for first individual")
        if n_rows % ploidy:
            raise StructureFormatError(
                f"number of lines ({n_rows}) in '{path}' is not a "
                f"multiple of ploidy ({ploidy})")
        I = n_rows // ploidy
        IL = np.ascontiguousarray(data)
        names = row_names[::ploidy]
        locale_strs = row_locales[::ploidy]

    pops: List[str] = []
    pop_index = {}
    locales = np.empty(I, dtype=np.int64)
    for i, s in enumerate(locale_strs):
        if s not in pop_index:
            pop_index[s] = len(pops)
            pops.append(s)
        locales[i] = pop_index[s]

    if one_plus:
        IL = IL - 1
        missing_value -= 1
    if missing_value != MISSING:
        if (IL == MISSING).any():
            raise StructureFormatError(
                f"The default missing value ({MISSING}) is observed in the "
                f"input file, but the user has defined the missing value to "
                f"be {missing_value}.")
        IL = np.where(IL == missing_value, MISSING, IL)

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
