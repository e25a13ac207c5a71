"""Structured training metrics: JSONL writer + optional wandb mirror.

Capability parity with the reference's observability stack (SURVEY.md §5):
wandb scalars every 10 iters (train.py:497-503,677-678), eval metrics to
`evaluation_results.txt`, and the (created-but-unused) tensorboard writer.
Here the primary sink is an append-only `metrics.jsonl` that any dashboard
can tail; wandb is mirrored when the package + credentials exist (this
image has no egress, so it stays off by default).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, model_path: str, use_wandb: bool = False,
                 wandb_project: Optional[str] = None, config: dict | None = None):
        os.makedirs(model_path, exist_ok=True)
        self.path = os.path.join(model_path, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=wandb_project or "bags_tpu",
                           config=config or {})
            except Exception:
                self._wandb = None

    def log(self, step: int, **scalars) -> None:
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
