"""Builtin pore models.

Ships all six builtin 6-mer pore-model tables (ONT-provided data) packed in
builtin.npz by tools/make_builtin_models.py, replacing the reference's
compile-time .inl embedding (Builtin_Model.{hpp,cpp}).  The R7.3 tables are
identical to the reference's src/builtin_models/r73.*.ont.model TSVs; the
R9 tables come from the snapshot's generated initializer lists
(builtin_model_init_lists.inl entries 4-6, extracted by
tools/extract_builtin_inl.py — the r9 *.ont.model TSVs themselves are
gitignored in the reference, but the compiled binary embeds the data, so
--pore r9 works there and must work here).  The extraction is parse-checked
by regenerating the r73 tables from the same .inl bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np

from .. import pore_model
from ..kmer import n_states

_NPZ = os.path.join(os.path.dirname(__file__), "builtin.npz")


def load_builtin_models(pore: str = "r73", K: int = 6) -> dict:
    """Builtin models whose name starts with '<pore>.' (nanocall.cpp:155-177).
    Returns {name: PoreModel}."""
    out = {}
    with np.load(_NPZ, allow_pickle=False) as z:
        names = [str(x) for x in z["names"]]
        strands = z["strands"]
        for name, strand in zip(names, strands):
            if not name.startswith(pore + "."):
                continue
            tbl = z[f"{name}.table"]
            assert tbl.shape == (4, n_states(K))
            out[name] = pore_model.PoreModel(
                level_mean=tbl[0].astype(np.float32),
                level_stdv=tbl[1].astype(np.float32),
                sd_mean=tbl[2].astype(np.float32),
                sd_stdv=tbl[3].astype(np.float32),
                K=K,
                strand=int(strand),
                name=name,
            )
    # sorted like the reference's std::map-keyed Pore_Model_Dict
    return dict(sorted(out.items()))


def builtin_model_names() -> list[str]:
    with np.load(_NPZ, allow_pickle=False) as z:
        return [str(x) for x in z["names"]]
