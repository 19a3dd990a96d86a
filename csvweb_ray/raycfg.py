"""Ray Data execution-context tuning.

Ray Data's defaults (``min_parallelism = 200``, 200-partition shuffles)
are sized for multi-node clusters; on an N-CPU node they turn every
groupby/sort over a small dataset into hundreds of sub-second tasks whose
scheduling overhead dominates.  ``configure()`` scales those knobs to the
session's CPU count — called by tests, ``bench.py`` and the CLI after
their own ``ray.init``; never calls ``ray.init`` itself (driver contract).

At real cluster scale the defaults are fine; these knobs only matter
when the data is small relative to the partition count, which is exactly
the test/bench regime.
"""

from __future__ import annotations

__all__ = ["configure"]

_PATCHED = False


def _patch_sort_partitioning() -> None:
    """Fix an O(boundaries × rows) hotspot in Ray 2.49's range sort.

    ``TableBlockAccessor._find_partitions_sorted`` calls
    ``find_partition_index`` once per boundary, and THAT converts the
    whole sort column with ``.to_numpy()`` on every call — for a 500k-row
    string block with 31 boundaries that materializes ~15M Python strings
    per SortMap task (measured 16 s/task; the sort itself is 0.5 s).  The
    single-ascending-key case (every sort in this repo's hot path)
    converts once and binary-searches all boundaries; anything else falls
    back to the original implementation.  This runs in EVERY sort task,
    so it is patched process-wide by ``configure()`` (workers import this
    module inside the UDF closures, which call ``configure``'s patch via
    the module import in ``bench``/tests/CLI drivers — and Ray sort tasks
    run the accessor in the worker process where the dataset's lambdas
    were deserialized, importing this module first).
    """
    global _PATCHED
    if _PATCHED:
        return
    import ray

    # coupled to Ray 2.x internals — skip (keeping the slow original) on
    # any other major version rather than patching blind
    if not ray.__version__.startswith("2."):
        _PATCHED = True
        return
    import numpy as np
    from ray.data._internal import table_block

    orig = table_block.TableBlockAccessor._find_partitions_sorted

    def fast(self, boundaries, sort_key):
        columns = sort_key.get_columns()
        descending = sort_key.get_descending()
        nkeys = len(columns)
        simple = (
            nkeys >= 1 and not any(descending)
            and all(isinstance(b, tuple) and len(b) == nkeys
                    and all(v is not None for v in b) for b in boundaries))
        if not simple:
            return orig(self, boundaries, sort_key)
        try:
            cols = []
            for c in columns:
                arr = self._table[c]
                if getattr(arr, "null_count", 0):  # nulls break searchsorted
                    return orig(self, boundaries, sort_key)
                cols.append(arr.to_numpy())
            partitions = []
            last_idx = 0
            if nkeys == 1:
                for boundary in boundaries:
                    idx = int(np.searchsorted(cols[0], boundary[0], side="left"))
                    partitions.append(self._table[last_idx:idx])
                    last_idx = idx
            else:
                # multi-key ascending: binary search with lazy tuple
                # compares — O(B log N) instead of the original's
                # per-boundary whole-column to_numpy (O(B·N))
                n = len(cols[0])
                for boundary in boundaries:
                    lo, hi = last_idx, n
                    while lo < hi:
                        mid = (lo + hi) // 2
                        if tuple(c[mid] for c in cols) < boundary:
                            lo = mid + 1
                        else:
                            hi = mid
                    partitions.append(self._table[last_idx:lo])
                    last_idx = lo
            partitions.append(self._table[last_idx:])
            return partitions
        except Exception:  # noqa: BLE001 - exotic column types → original
            return orig(self, boundaries, sort_key)

    table_block.TableBlockAccessor._find_partitions_sorted = fast
    _PATCHED = True


_SORT_SAMPLE_PATCHED = False


def _patch_sort_boundary_sampling() -> None:
    """Fix reduce-partition skew from Ray 2.49's tiny sort sample.

    ``SortTaskSpec.sample_boundaries`` draws only
    ``num_reducers * 10 / len(blocks)`` rows per block — ~970 total
    samples to place 96 boundaries, a ±30% quantile error that showed up
    as 0.18M–1.93M rows per reduce partition (2.75× mean) on a 68M-triple
    merge, with the fattest partition's post-sort task setting the merge
    critical path.  Sampling is per-key-column-row cheap (the merge sorts
    a single int32), so draw 20× the asked count with a floor of 100 rows
    per block: ~20k samples cuts the boundary error to a couple percent
    for any sort this repo runs."""
    global _SORT_SAMPLE_PATCHED
    if _SORT_SAMPLE_PATCHED:
        return
    import ray

    if not ray.__version__.startswith("2."):
        _SORT_SAMPLE_PATCHED = True
        return
    try:
        from ray.data._internal.planner.exchange import sort_task_spec as sts

        orig = sts._sample_block

        def _sample_more(block, n_samples: int, sort_key):
            return orig(block, max(n_samples * 20, 100), sort_key)

        sts._sample_block = _sample_more
    except Exception:  # noqa: BLE001 - keep the original sampler
        pass
    _SORT_SAMPLE_PATCHED = True


_SAMPLING_PATCHED = False
_SKIP_SAMPLING = __import__("threading").local()


@__import__("contextlib").contextmanager
def skip_parquet_sampling():
    """Scope in which ``read_parquet`` DAG-building skips Ray 2.49's
    eager fragment sampling.

    ``ParquetDatasource.__init__`` calls ``sample_fragments`` at
    DAG-BUILD time — the driver blocks while remote tasks decode sample
    rows of EVERY projected column (2.8 s serialized ahead of all
    parallel work for a 329 MB corpus file with a fat ``content``
    column, re-paid on every ``read_parquet``).  Inside this scope the
    patched ``sample_fragments`` returns one empty-file ``_SampleInfo``
    (encoding ratio → the flag-off default of 5, read batch size → the
    reader default; an empty LIST instead NaNs the batch-size mean) and
    ``decoding_size_estimation`` is off so the ratio estimator
    short-circuits instead of averaging the empty sample.

    SCOPED, not global, on purpose: the default ratio of 5 is right for
    a fat snappy text column but a ~3× UNDER-estimate for slim zstd
    triple shards — a global skip made the merge read split the 8-CPU
    leg's 2.1M-row wave files into 3-4× too-few blocks and the merge ran
    2.8× slower.  Use it only around reads whose projected columns are
    wide enough that the sample decode itself is the cost (the corpus
    ``content`` scan); every slim read keeps Ray's measured ratio."""
    prev_on = getattr(_SKIP_SAMPLING, "on", False)
    _SKIP_SAMPLING.on = True
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev_flag = ctx.decoding_size_estimation
    ctx.decoding_size_estimation = False
    try:
        yield
    finally:
        _SKIP_SAMPLING.on = prev_on
        ctx.decoding_size_estimation = prev_flag


def _patch_parquet_sampling() -> None:
    """Install the ``skip_parquet_sampling`` hook (see its docstring).
    Outside the scope the original sampler runs untouched."""
    global _SAMPLING_PATCHED
    if _SAMPLING_PATCHED:
        return
    import ray

    if not ray.__version__.startswith("2."):
        _SAMPLING_PATCHED = True
        return
    try:
        from ray.data._internal.datasource import parquet_datasource as pds

        if not (hasattr(pds, "sample_fragments")
                and hasattr(pds, "_SampleInfo")):  # internals moved
            _SAMPLING_PATCHED = True
            return
        no_sample = [pds._SampleInfo(actual_bytes_per_row=None,
                                     estimated_bytes_per_row=None)]
        orig = pds.sample_fragments

        def _maybe_sample(*a, **k):
            if getattr(_SKIP_SAMPLING, "on", False):
                return no_sample
            return orig(*a, **k)

        pds.sample_fragments = _maybe_sample
    except Exception:  # noqa: BLE001 - keep the slow original
        pass
    _SAMPLING_PATCHED = True


def configure(num_cpus: int | None = None, quiet: bool = True) -> None:
    import ray
    from ray.data import DataContext

    if num_cpus is None:
        num_cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    par = max(8, 2 * num_cpus)
    ctx = DataContext.get_current()
    ctx.min_parallelism = par
    ctx.read_op_min_num_blocks = par
    ctx.default_hash_shuffle_parallelism = par
    # Ray 2.49's per-operator resource reservation (on by default, ratio
    # 0.5) guarantees every operator in the DAG a CPU share — but this
    # repo's pipelines are BARRIER-shaped (map → range-sort → reduce):
    # only one operator is runnable at a time, so the reservation just
    # caps the live operator at roughly half the cluster (the 68M merge's
    # read+pack stage ran 137 CPU-s over 7.5 s wall = 18 of 32 cores;
    # 6.1 s with reservation off).  Measured end-to-end: headline 13.3 →
    # 10.4/12.1 s and every per-query wall at-or-better (minhash 2.39 →
    # 1.82, simhash 2.64 → 1.75, asof 2.78 → 2.01), replicated in both
    # A/B orders.  Reservation earns its keep on DEEP streaming DAGs
    # where upstream ops can starve downstream ones of memory; with the
    # object store sized to 50% RAM and these shallow DAGs it only
    # donates idle cores.  CSVWEB_OP_RESERVATION=1 restores the default.
    import os as _os

    ctx.op_resource_reservation_enabled = \
        _os.environ.get("CSVWEB_OP_RESERVATION", "0") == "1"
    _patch_sort_partitioning()
    _patch_sort_boundary_sampling()
    _patch_parquet_sampling()
    if quiet:
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
