"""Fault-injection helpers (importable from restarted Ray workers — a
class defined in a test module can't be reconstructed when an actor
restarts)."""

from __future__ import annotations

import os

import pyarrow as pa


class CrashOnce:
    """Dies (os._exit) on the first batch ever processed across the pool,
    coordinated through a flag file; subsequent attempts pass through."""

    def __init__(self, flag_path: str):
        self.flag_path = flag_path

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not os.path.exists(self.flag_path):
            with open(self.flag_path, "w"):
                pass
            os._exit(1)  # hard-kill the actor process mid-task
        return batch
