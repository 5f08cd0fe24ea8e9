"""Per-stage profile for any contract query: run it and print Ray
Data's execution stats (per-operator wall time, UDF share, rows).

    python tools/profile_query.py extract_questions /root/testdata/sf0.01

The stats line to watch: a healthy stage is dominated by UDF compute
('In user code'), not serialization or scheduling; an unexpected
AllToAll operator is a shuffle that was not in the design.
This script owns the Ray session (unlike the library / __ray_entry__).
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from doc_ocr_ray.runtime import configure_data_context
    configure_data_context(num_cpus)

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(REPO, "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries = mod.queries()
    if name not in queries:
        print(f"unknown query {name!r}; choose from:\n  "
              + "\n  ".join(sorted(queries)), file=sys.stderr)
        ray.shutdown()
        return 2

    t0 = time.time()
    result = queries[name](sf_dir)
    if hasattr(result, "materialize"):        # a Dataset: execute it
        result = result.materialize()
        rows = result.count()
        stats = result.stats()
    else:                                     # already a table/frame
        rows = len(result)
        stats = "(driver-side result — no dataset stats)"
    wall = time.time() - t0
    print(stats)
    print(f"\n== {name}: {rows} rows in {wall:.2f}s "
          f"({num_cpus} cpus, {sf_dir})")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
