"""Logging: stdout tee into logdir/logs.txt (reference core/utils/log_util.py)."""

from __future__ import annotations

import os
import sys
import time


class Logger:
    def __init__(self, logdir: str, filename: str = "logs.txt"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self.f = open(self.path, "a")

    def __call__(self, *args):
        msg = " ".join(str(a) for a in args)
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        line = f"[{stamp}] {msg}"
        print(line)
        self.f.write(line + "\n")
        self.f.flush()

    def print_config(self, cfg):
        self(f"logdir: {cfg.logdir}")
        self(f"experiment: {cfg.category}/{cfg.task}/{cfg.subject}/"
             f"{cfg.experiment}")


class StdoutTee:
    """Mirror stdout into a file (log_util.py:8-41, minus the interactive
    logdir-clearing prompt)."""

    def __init__(self, logdir: str, filename: str = "logs.txt"):
        os.makedirs(logdir, exist_ok=True)
        self.file = open(os.path.join(logdir, filename), "a")
        self.stdout = sys.stdout

    def __enter__(self):
        sys.stdout = self
        return self

    def __exit__(self, *exc):
        sys.stdout = self.stdout
        self.file.close()

    def write(self, data):
        self.stdout.write(data)
        self.file.write(data)

    def flush(self):
        self.stdout.flush()
        self.file.flush()
