"""Ragged → padded conversions for streamline batches.

Streamlines have variable point counts (reference walks them one-by-one in a
Python loop, tract_geom_proc.py:157-187).  The TPU-native layout is a dense
``(S, P, 3)`` tensor plus a length vector — static shapes that XLA can tile
onto the MXU/VPU, with masks making every downstream reduction length-exact
(SURVEY.md §7 "Hard parts" #1).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def pad_streamlines(streamlines: Sequence[np.ndarray],
                    pad_multiple: int = 8,
                    max_points: int | None = None,
                    dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a ragged list of (n_i, 3) arrays into ``(S, P, 3)`` + lengths.

    Pad rows repeat the last valid point (harmless: every consumer masks by
    length, and repeated points keep values in a sane numeric range).
    ``P`` is rounded up to ``pad_multiple`` for TPU tiling friendliness.
    """
    S = len(streamlines)
    if S == 0:
        return (np.zeros((0, pad_multiple, 3), dtype=dtype),
                np.zeros((0,), dtype=np.int32))
    lengths = np.array([len(s) for s in streamlines], dtype=np.int32)
    P = int(max_points) if max_points is not None else int(lengths.max())
    P = round_up(max(P, 2), pad_multiple)
    out = np.empty((S, P, 3), dtype=dtype)
    for i, sl in enumerate(streamlines):
        n = min(len(sl), P)
        out[i, :n] = sl[:n]
        out[i, n:] = sl[n - 1]
        lengths[i] = n
    return out, lengths


def pad_batch(arrays: Sequence[np.ndarray], max_rows: int | None = None,
              pad_multiple: int = 8, dtype=np.float32
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a ragged list of (n_i, D) arrays into ``(B, N, D)`` + counts.

    Used to batch variable-size surface point clouds across lesions.
    Pad rows are zero; consumers mask by count.
    """
    B = len(arrays)
    D = arrays[0].shape[1] if B else 3
    counts = np.array([len(a) for a in arrays], dtype=np.int32)
    N = int(max_rows) if max_rows is not None else int(counts.max() if B else 1)
    N = round_up(max(N, 1), pad_multiple)
    out = np.zeros((B, N, D), dtype=dtype)
    for i, a in enumerate(arrays):
        n = min(len(a), N)
        out[i, :n] = a[:n]
        counts[i] = n
    return out, counts


def unpad(values: np.ndarray, lengths: np.ndarray) -> List[np.ndarray]:
    return [np.asarray(values[i, :n]) for i, n in enumerate(lengths)]
