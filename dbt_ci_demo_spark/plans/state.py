"""State manifest — the engine's equivalent of dbt's committed
``manifest.json`` (SURVEY.md §2.B.7 B35).

The reference commits its compiled manifest back to the repo on merge
(update_project_state.yml:45-51) so the next CI run can diff checksums
(state:modified) and defer unselected refs to production relations. This
module serializes the same facts: per-model checksum, resolved relation
name, and config.
"""

from __future__ import annotations

import json
import os
from typing import Any


class StateManifest:
    def __init__(self, nodes: dict[str, dict[str, Any]] | None = None):
        self.nodes = nodes or {}

    def checksum(self, name: str) -> str | None:
        return self.nodes.get(name, {}).get("checksum")

    def relation(self, name: str) -> str | None:
        return self.nodes.get(name, {}).get("relation")

    def record(self, name: str, checksum: str, relation: str, config: dict) -> None:
        self.nodes[name] = {"checksum": checksum, "relation": relation, "config": config}

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"nodes": self.nodes}, f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "StateManifest":
        if not os.path.exists(path):
            return cls()
        with open(path) as f:
            return cls(json.load(f).get("nodes", {}))
