"""Session-level execution defaults for scripts that OWN a Ray session
(bench.py, jobs/*, tools/*) — the library itself never calls ray.init.
"""
from __future__ import annotations


def configure_data_context(num_cpus: int) -> None:
    """Tune Ray Data for this cluster size:

    - shuffle partition count ~ CPU count (the 200-partition default
      costs ~200 near-empty reduce tasks per groupby at small scale;
      raise proportionally per node on a real cluster);
    - no progress bars (clean JSON stdout for the bench driver).
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.min_parallelism = max(4, num_cpus)
    try:
        ctx.read_op_min_num_blocks = max(4, num_cpus)
    except AttributeError:
        pass
