"""Tracing / profiling / experiment tracking.

The reference had only a wall-clock Timer + hardcoded-key wandb
(SURVEY.md §5). Here:

  * `StepTimer`: per-step wall clock with rolling rate (train_util.py:32-42
    parity).
  * `Profiler`: jax.profiler integration -- programmatic traces
    (`with profiler.trace(step)`) and an on-demand server for
    TensorBoard/XProf capture.
  * `ExperimentLogger`: wandb when available & configured (never a
    hardcoded API key -- reference train.py:10-15 is consciously not
    replicated), falling back to a local JSONL metrics log that tails
    cleanly.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class StepTimer:
    def __init__(self):
        self.t0 = time.time()
        self.last = self.t0
        self.count = 0

    def tick(self, n: int = 1) -> float:
        self.count += n
        now = time.time()
        dt = now - self.last
        self.last = now
        return dt

    def rate(self) -> float:
        elapsed = time.time() - self.t0
        return self.count / elapsed if elapsed > 0 else 0.0


class Profiler:
    """jax.profiler wrapper: set HUMANNERF_PROFILE_DIR or call start_server."""

    def __init__(self, trace_dir: str | None = None, port: int | None = None):
        self.trace_dir = trace_dir or os.environ.get("HUMANNERF_PROFILE_DIR")
        self._server = None
        if port:
            self.start_server(port)

    def start_server(self, port: int = 9999):
        import jax
        if self._server is None:
            self._server = jax.profiler.start_server(port)
        return self._server

    @contextlib.contextmanager
    def trace(self, name: str = "step"):
        if not self.trace_dir:
            yield
            return
        import jax
        with jax.profiler.trace(os.path.join(self.trace_dir, name)):
            yield

    def annotate(self, name: str):
        import jax
        return jax.profiler.TraceAnnotation(name)


class ExperimentLogger:
    """wandb if importable + WANDB_API_KEY/mode configured, else JSONL."""

    def __init__(self, logdir: str, project: str = "humannerf_tpu",
                 name: str | None = None, enable_wandb: bool = True):
        self.run = None
        self.jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        if enable_wandb:
            try:
                import wandb
                if os.environ.get("WANDB_API_KEY") or \
                        os.environ.get("WANDB_MODE") == "offline":
                    self.run = wandb.init(project=project, name=name,
                                          dir=logdir)
            except Exception:
                self.run = None

    def log(self, metrics: dict, step: int | None = None):
        payload = {k: float(v) for k, v in metrics.items()}
        if step is not None:
            payload["step"] = step
        self.jsonl.write(json.dumps(payload) + "\n")
        self.jsonl.flush()
        if self.run is not None:
            self.run.log(payload, step=step)

    def finish(self):
        self.jsonl.close()
        if self.run is not None:
            self.run.finish()
