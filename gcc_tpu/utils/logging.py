"""File+stream logger (utils/util.py:246-259) plus structured JSONL metrics."""

from __future__ import annotations

import json
import logging
import os
import time


def get_logger(file_path: str, name: str = "gcc-tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s | %(message)s", datefmt="%m/%d %I:%M:%S %p")
    os.makedirs(os.path.dirname(file_path) or ".", exist_ok=True)
    fh = logging.FileHandler(file_path)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    logger.setLevel(logging.INFO)
    return logger


class JsonlWriter:
    """Append-only metrics stream: one JSON object per line."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def write(self, record: dict):
        record = dict(record)
        record.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
