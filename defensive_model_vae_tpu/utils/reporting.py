"""Machine-readable metric reporting.

The reference publishes numbers by printing to stdout and hand-curating a
text file (``results/ModelValidation/JS_divergence.txt``).  The rebuild
writes structured JSON-lines records instead (SURVEY §5 directive).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict


class MetricWriter:
    """Append-only JSONL metric log."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def write(self, name: str, value: Any, **tags):
        record: Dict[str, Any] = {"metric": name, "value": value, **tags}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def write_dict(self, metrics: Dict[str, Any], **tags):
        for k, v in metrics.items():
            self.write(k, v, **tags)

    def read(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
