"""Zero-copy Arrow list<float> -> numpy matrix conversion.

Every vector-family stage (ANN, kNN graph, k-means, PCA, SemDeDup,
embedding drift/quantize) receives the embedding column as an Arrow
``list<float>`` batch straight out of the object store.  Round-tripping
it through ``col.to_pylist()`` materializes one Python list per row and
one Python float per element before numpy ever sees the data — a
uniform constant-factor drag on the hottest BLAS stages.  Arrow list
arrays flatten zero-copy instead: the child values buffer is already a
contiguous float array, so the (n, d) matrix is a reshape of a numpy
VIEW over shared plasma memory.

The slow paths (null entries, ragged rows) fall back to the exact
previous semantics, so results are bit-identical either way (pinned by
a parity test).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _emb_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from an embedding column.

    Accepts a ``pa.Array`` / ``pa.ChunkedArray`` of ``list<float*>`` or
    ``fixed_size_list<float*>`` (the native layout), or of
    ``binary`` (packed float32 bytes — vectors that crossed an Acero
    join).  Zero-copy on the hot path: the returned array may be a
    read-only view over Arrow buffers; callers that mutate must copy.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype)
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        # packed form: one frombuffer per row is unavoidable, but the
        # bytes themselves are not copied until the dtype cast
        return np.vstack(
            [np.frombuffer(x, np.float32) for x in col.to_pylist()]
        ).astype(dtype, copy=False)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        if col.null_count == 0:
            vals = np.asarray(col.flatten())
            return vals.reshape(n, d).astype(dtype, copy=False)
        return np.vstack(col.to_pylist()).astype(dtype, copy=False)
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        if col.null_count == 0:
            offs = np.asarray(col.offsets)
            widths = np.diff(offs)
            if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
                # uniform-dim fast path: flatten() respects slicing
                # offsets and is zero-copy for null-free arrays
                vals = np.asarray(col.flatten())
                return vals.reshape(n, int(widths[0])).astype(dtype, copy=False)
        # ragged or nulled: previous exact semantics
        return np.vstack(col.to_pylist()).astype(dtype, copy=False)
    # unknown layout (e.g. already-numpy objects out of pandas blocks)
    return np.vstack(col.to_pylist()).astype(dtype, copy=False)
