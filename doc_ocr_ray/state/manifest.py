"""Checkpoint/resume manifest + per-partition lineage.

Ray Data gives task retries but not job-level resume (SURVEY.md
section 4); this manifest supplies it: one record per input shard with
state, row counts and wall time, written atomically after the shard's
output directory is committed (sources/io.py rename).  On restart,
completed shards are skipped — a partially processed corpus is never
recomputed.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class JobManifest:
    def __init__(self, path: str):
        self.path = path
        self.records: Dict[str, Dict[str, Any]] = {}
        if os.path.exists(path):
            with open(path, "r", encoding="utf-8") as f:
                self.records = json.load(f)

    def is_done(self, shard_id: int) -> bool:
        rec = self.records.get(str(shard_id))
        if not (rec and rec.get("state") == "done"):
            return False
        # trust-but-verify: a committed shard whose output directory was
        # deleted out-of-band must NOT be skipped, or the corpus is
        # silently incomplete at read time
        out = rec.get("output")
        if out:
            import os
            if not os.path.exists(out):
                return False
        return True

    def mark_done(self, shard_id: int, *, rows_in: int, rows_out: int,
                  output: str, wall_sec: float,
                  extra: Optional[Dict[str, Any]] = None) -> None:
        self.records[str(shard_id)] = {
            "state": "done",
            "rows_in": rows_in,
            "rows_out": rows_out,
            "output": output,
            "wall_sec": round(wall_sec, 3),
            "completed_at": time.time(),
            **(extra or {}),
        }
        self._flush()

    def _flush(self) -> None:
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self.records, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def summary(self) -> Dict[str, Any]:
        done = [r for r in self.records.values() if r.get("state") == "done"]
        known_in = [r["rows_in"] for r in done if r.get("rows_in", -1) >= 0]
        known_out = [r["rows_out"] for r in done
                     if r.get("rows_out", -1) >= 0]
        out = {
            "shards_done": len(done),
            "rows_in": sum(known_in),
            "rows_out": sum(known_out),
            "wall_sec": round(sum(r.get("wall_sec", 0.0) for r in done), 3),
        }
        if len(known_in) < len(done):
            # some shards couldn't count their input without an extra
            # pass — say so rather than summing a sentinel
            out["rows_in_complete"] = False
        if len(known_out) < len(done):
            out["rows_out_complete"] = False
        return out
