"""Sweep checkpoint/resume (new subsystem — the reference has none).

Long Monte-Carlo sweeps record each completed Eb/N0 point to a JSON state
file; re-running the same sweep (matching config) skips completed points and
continues where it left off.  A config mismatch starts the state over, so a
stale file can never silently mix runs.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional


class SweepState:
    """Per-point durable state for resumable sweeps."""

    def __init__(self, path: Optional[str], config: Dict, *, writer: bool = True) -> None:
        # Multi-host: every process reads the state (skip decisions must be
        # identical everywhere — the chunks contain collectives), but only the
        # coordinator writes it.  The file must be shared or absent on workers.
        self.path = Path(path) if path else None
        self.writer = writer
        self.config = config
        self.rows: Dict[str, Dict] = {}
        if self.path and self.path.exists():
            try:
                data = json.loads(self.path.read_text())
            except json.JSONDecodeError:
                data = {}
            if data.get("config") == config:
                self.rows = data.get("rows", {})
            # else: different sweep — start fresh

    @staticmethod
    def key(point: float) -> str:
        return f"{float(point):.4f}"

    def get(self, point: float) -> Optional[Dict]:
        return self.rows.get(self.key(point))

    def record(self, point: float, row: Dict) -> None:
        self.rows[self.key(point)] = row
        if self.path and self.writer:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            tmp = self.path.with_suffix(".tmp")
            tmp.write_text(json.dumps({"config": self.config, "rows": self.rows}))
            tmp.replace(self.path)


__all__ = ["SweepState"]
