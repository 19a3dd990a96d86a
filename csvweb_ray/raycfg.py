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
    if quiet:
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
