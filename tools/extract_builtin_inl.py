#!/usr/bin/env python
"""Extract builtin pore-model tables from the reference's compiled-in
initializer lists (src/builtin_models/builtin_model_init_lists.inl).

The reference gitignores the r9 *.ont.model TSVs (fetched at build time),
but the GENERATED .inl data in the snapshot embeds all six models — so the
reference binary supports --pore r9 and the rebuild must too.  This tool
parses the .inl (per Builtin_Model.cpp: 6 brace-lists of 4096*4 floats in
kmer order: level_mean, level_stdv, sd_mean, sd_stdv —
Pore_Model.hpp:219-239 load_from_vector) and writes *.ont.model TSVs, which
tools/make_builtin_models.py then packs into builtin.npz.

The r73 entries double as a parse check: they must match the shipped
r73 *.ont.model TSVs bit-for-bit after float32 round-trip.

Usage: extract_builtin_inl.py <builtin_models_dir> <out_dir>
"""

import os
import re
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from nanocall_tpu import kmer  # noqa: E402


def parse_inl(d):
    names = re.findall(r'"([^"]+)"', open(os.path.join(d, "builtin_model_names.inl")).read())
    strands = [int(x) for x in re.findall(
        r"\d+", open(os.path.join(d, "builtin_model_strands.inl")).read())]
    text = open(os.path.join(d, "builtin_model_init_lists.inl")).read()
    # outermost braces wrap 6 inner brace-lists of floats
    inner = re.findall(r"\{([^{}]*)\}", text)
    tables = []
    for block in inner:
        vals = np.array([float(x) for x in block.replace(",", " ").split()],
                        dtype=np.float32)
        assert vals.size == 4096 * 4, vals.size
        tables.append(vals.reshape(4096, 4))
    assert len(names) == len(strands) == len(tables)
    return names, strands, tables


def main():
    src, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    names, strands, tables = parse_inl(src)
    for name, strand, tbl in zip(names, strands, tables):
        path = os.path.join(out, name)
        with open(path, "w") as fh:
            for i in range(4096):
                ks = kmer.int_to_kmer(i, 6)
                fh.write(f"{ks}\t{tbl[i,0]:.6f}\t{tbl[i,1]:.6f}"
                         f"\t{tbl[i,2]:.6f}\t{tbl[i,3]:.6f}\n")
        print(f"{name}: strand={strand} -> {path}")


if __name__ == "__main__":
    main()
