"""Duplicate-index detection across a BC list.

Parity with reference xlb/helper/check_boundary_overlaps.py:5-25; overlapping
voxel claims between two BCs are a setup bug (last writer would win in the
masker), so raise.
"""

import numpy as np


def check_bc_overlaps(bclist, dim, backend=None, strict=True):
    index_list = [[] for _ in range(dim)]
    for bc in bclist:
        if bc.indices is None:
            continue
        for d in range(dim):
            index_list[d] += list(bc.indices[d])

    if not index_list[0]:
        return

    indices = np.array(index_list).T
    unique, counts = np.unique(indices, axis=0, return_counts=True)
    duplicates = unique[counts > 1]
    if duplicates.size:
        message = f"boundary conditions overlap at voxels {duplicates[:10].tolist()}" + (" ..." if len(duplicates) > 10 else "")
        if strict:
            raise ValueError(message)
        print(f"WARNING: {message}")
