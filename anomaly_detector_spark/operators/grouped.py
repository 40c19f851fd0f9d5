"""Packed grouped-map execution: amortize per-group Arrow overhead.

``groupBy().applyInPandas`` dispatches one Python kernel call and one
Arrow frame per GROUP. For inputs with many small groups (the
reference's shape: 10^6 devices x bounded per-device series,
/root/reference/main.py:49-53 one process per device), that per-group
overhead dwarfs the kernel work — measured 5-6s for 0.5s of
single-threaded kernel work at 100k rows / 1500 keys, local[32].

``packed_grouped_map`` runs the same per-key kernel over key-clustered
Arrow batches instead: repartition by key (all of a key's rows in one
partition), sort within partitions by (key, *sort_cols), and
``mapInPandas`` with a carry buffer that stitches keys spanning batch
boundaries. Many keys share each Arrow batch; per-key output frames
concatenate into one yield per input batch. Same rows, same schema —
the equivalence is pinned per consumer (tests + the driver oracles).

When groups are LARGE (each key fills Arrow batches by itself) the
grouped form is equally good and its plan is simpler — callers expose
``packed=False`` for that case. ``extract_loads`` keeps its own
hand-specialized packed loop (it avoids even the per-key pandas frame,
working on numpy slices — worth it on the hottest path); this module is
the reusable form for kernels that want a per-key DataFrame.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def packed_grouped_map(
    df: DataFrame,
    key_col: str,
    sort_cols: list[str],
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    packed: bool = True,
) -> DataFrame:
    """Apply ``kernel`` once per distinct ``key_col`` value.

    ``kernel(pdf) -> pdf_out``: receives ALL of one key's rows, sorted
    by ``sort_cols`` (ascending), and must emit the key column itself —
    the exact contract of a ``groupBy().applyInPandas`` kernel, so
    existing kernels drop in unchanged. Empty/None outputs are skipped.

    Keys must be hashable-equal under ``==`` (strings, ints, None);
    float-NaN keys would split (NaN != NaN) — cast them first.
    """
    if not packed:
        return df.groupBy(key_col).applyInPandas(kernel, schema)

    shuffled = df.repartition(F.col(key_col)).sortWithinPartitions(key_col, *sort_cols)

    def fn(batches):
        import numpy as np

        _UNSET = object()
        pend, bufs, outs = _UNSET, [], []

        def flush_key():
            pdf = bufs[0] if len(bufs) == 1 else pd.concat(bufs, ignore_index=True)
            res = kernel(pdf)
            if res is not None and len(res):
                outs.append(res)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf[key_col].to_numpy()
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            bounds = [0, *change.tolist(), len(pdf)]
            for s0, e0 in zip(bounds[:-1], bounds[1:]):
                k = keys[s0]
                same = pend is not _UNSET and (
                    k == pend or (k is None and pend is None)
                )
                if not same and pend is not _UNSET:
                    flush_key()
                    bufs = []
                pend = k
                bufs.append(pdf.iloc[s0:e0])
            # one output frame per input Arrow batch (completed keys only —
            # the pending key's rows are still in bufs, not in outs)
            if outs:
                yield outs[0] if len(outs) == 1 else pd.concat(outs, ignore_index=True)
                outs = []
        if pend is not _UNSET:
            flush_key()
        if outs:
            yield outs[0] if len(outs) == 1 else pd.concat(outs, ignore_index=True)

    return shuffled.mapInPandas(fn, schema)
