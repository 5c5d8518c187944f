"""Per-stage host timing for the tracking pipeline.

The reference reports only a per-frame chrono median (SURVEY.md §5
"Tracing / profiling"); here every host-side stage of the pipeline is
accumulated into a named bucket so regressions are visible as one
table (VERDICT r2 "next round" #1d).  Overhead is one perf_counter
pair per stage (~100 ns), negligible against the ~ms stages measured.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class StageTimer:
    def __init__(self):
        self.acc: dict[str, float] = defaultdict(float)
        self.cnt: dict[str, int] = defaultdict(int)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] += time.perf_counter() - t0
            self.cnt[name] += 1

    def add(self, name: str, seconds: float):
        self.acc[name] += seconds
        self.cnt[name] += 1

    def reset(self):
        self.acc.clear()
        self.cnt.clear()

    def table(self, n_frames: int | None = None) -> dict[str, dict]:
        """{stage: {total_ms, calls, ms_per_call, ms_per_frame}}."""
        out = {}
        for name in sorted(self.acc, key=lambda k: -self.acc[k]):
            total = self.acc[name]
            calls = self.cnt[name]
            row = {
                "total_ms": round(total * 1e3, 2),
                "calls": calls,
                "ms_per_call": round(total / max(calls, 1) * 1e3, 3),
            }
            if n_frames:
                row["ms_per_frame"] = round(total / n_frames * 1e3, 3)
            out[name] = row
        return out

    def format(self, n_frames: int | None = None) -> str:
        rows = self.table(n_frames)
        hdr = f"{'stage':<28}{'total ms':>10}{'calls':>8}{'ms/call':>10}"
        if n_frames:
            hdr += f"{'ms/frame':>10}"
        lines = [hdr]
        for name, r in rows.items():
            line = f"{name:<28}{r['total_ms']:>10.1f}{r['calls']:>8}{r['ms_per_call']:>10.2f}"
            if n_frames:
                line += f"{r['ms_per_frame']:>10.2f}"
            lines.append(line)
        return "\n".join(lines)
