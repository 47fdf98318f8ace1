"""Model registry — the engine's equivalent of dbt's model files.

A *model* in the reference is a SELECT statement plus a materialization
config, discovered from .sql files and wired into a DAG via ``ref()`` /
``source()`` calls (SURVEY.md §1.1). Here a model is a Python function
``fn(ctx) -> DataFrame`` registered with the :func:`model` decorator;
dependencies are declared explicitly (``refs=`` / ``sources=``), playing
the role of dbt's parse-time Jinja extraction.

Checksums: dbt records ``checksum.sha256`` per node over the file contents
(manifest.json:1) to power ``state:modified`` selection. We hash the
function's source text plus its config — same contract: edit the model
(or its config) and it becomes "modified".
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame


@dataclass
class ModelConfig:
    """Node config (dbt_project.yml cascade → node.config in the manifest).

    Mirrors the reference's observable config surface:
    materialized ∈ {table, view, incremental, snapshot, seed}
    (dbt_project.yml:34-36 default table; materialization macros SURVEY
    §2.C), incremental_strategy ∈ {merge, insert_overwrite, delete+insert}
    (dbt_bigquery_validate_get_incremental_strategy @33792 + generic),
    partition_by/cluster_by (@13262/@14354), on_schema_change (@133295),
    snapshot strategy fields (@112892), hooks (@43255).
    """

    materialized: str = "table"
    unique_key: str | list[str] | None = None
    incremental_strategy: str = "merge"
    merge_update_columns: list[str] | None = None
    partition_by: str | None = None
    cluster_by: list[str] | None = None
    on_schema_change: str = "ignore"
    # snapshot-only
    strategy: str = "timestamp"
    updated_at: str | None = None
    check_cols: list[str] | None = None
    invalidate_hard_deletes: bool = False
    # orchestration
    tags: list[str] = field(default_factory=list)
    pre_hook: list[Callable] = field(default_factory=list)
    post_hook: list[Callable] = field(default_factory=list)
    full_refresh: bool = False

    def to_json(self) -> dict[str, Any]:
        return {
            k: v
            for k, v in self.__dict__.items()
            if k not in ("pre_hook", "post_hook") and not callable(v)
        }


@dataclass
class Model:
    name: str
    fn: Callable[..., DataFrame]
    config: ModelConfig
    refs: list[str] = field(default_factory=list)
    sources: list[str] = field(default_factory=list)

    @property
    def depends_on(self) -> list[str]:
        return list(self.refs)

    def checksum(self) -> str:
        """sha256 over normalized source + captured state + config — the
        state:modified key (manifest node ``checksum.sha256``).

        Captured state (r10 review finding): ``inspect.getsource`` is
        blind to closure cells and default arguments, so two
        factory-built models (``make(threshold)``) had IDENTICAL
        checksums for different thresholds — a behavior change
        state:modified could not see, shipping stale tables in deferred
        CI. The payload therefore includes the repr of every closure
        cell and default (repr of plain config values is deterministic;
        an unreprable cell degrades to its type name, which still
        differs when the TYPE changes and is no worse than before)."""
        try:
            src = inspect.getsource(self.fn)
        except (OSError, TypeError):
            # source unavailable (REPL / -c / builtins): the repr carries a
            # memory address — strip it, or the checksum differs on EVERY
            # process and state:modified always rebuilds (ADVICE r10 class)
            src = re.sub(r" at 0x[0-9a-fA-F]+", "", repr(self.fn))

        def safe_repr(v, depth: int = 0) -> str:
            # Depth guard (ADVICE r11): without it a self-referential or
            # very deeply nested container raises RecursionError at a point
            # that depends on the AMBIENT call-stack depth, so the
            # truncation point — and thus the checksum — could differ
            # between invocation contexts (spurious state:modified). A
            # fixed cap makes the placeholder deterministic everywhere;
            # 50 levels is far beyond any real config value.
            if depth > 50:
                return f"<depth-capped {type(v).__name__}>"
            try:
                # Unordered containers canonicalize BEFORE repr (ADVICE
                # r10): set/frozenset iteration order depends on
                # per-process hash randomization, so a raw repr of a
                # set-valued cell made the checksum differ across runs —
                # state:modified then saw EVERY run as modified. Lists,
                # tuples and dict VALUES recurse so a nested set is
                # canonicalized too (dict iteration order is insertion
                # order — deterministic, part of the code's identity).
                if isinstance(v, (set, frozenset)):
                    tag = "frozenset" if isinstance(v, frozenset) else "set"
                    return (
                        tag
                        + "{"
                        + ", ".join(sorted(safe_repr(x, depth + 1) for x in v))
                        + "}"
                    )
                if isinstance(v, dict):
                    return (
                        "{"
                        + ", ".join(
                            f"{safe_repr(k, depth + 1)}: {safe_repr(w, depth + 1)}"
                            for k, w in v.items()
                        )
                        + "}"
                    )
                if isinstance(v, (list, tuple)):
                    opener, closer = ("[", "]") if isinstance(v, list) else ("(", ")")
                    return (
                        opener
                        + ", ".join(safe_repr(x, depth + 1) for x in v)
                        + closer
                    )
                # strip memory addresses ("<function f at 0x7f..>") so the
                # checksum is stable across processes — an address-bearing
                # repr would read as modified on EVERY run
                return re.sub(r" at 0x[0-9a-fA-F]+", "", repr(v))
            except Exception:
                return f"<unreprable {type(v).__name__}>"

        def cell_value(c):
            try:
                return safe_repr(c.cell_contents)
            except ValueError:  # empty cell
                return "<empty cell>"

        cells = [cell_value(c) for c in (getattr(self.fn, "__closure__", None) or ())]
        defaults = [safe_repr(d) for d in (getattr(self.fn, "__defaults__", None) or ())]
        payload = json.dumps(
            {
                "src": src,
                "cells": cells,
                "defaults": defaults,
                "config": self.config.to_json(),
                "refs": self.refs,
                "sources": self.sources,
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()


_REGISTRY: dict[str, Model] = {}


def model(
    name: str | None = None,
    refs: list[str] | None = None,
    sources: list[str] | None = None,
    registry: dict[str, Model] | None = None,
    **config_kwargs,
):
    """Register a model function. ``fn(ctx) -> DataFrame`` where ``ctx`` is
    a :class:`~dbt_ci_demo_spark.plans.runner.ModelContext` exposing
    ``ref()``, ``source()``, ``is_incremental()``, ``this`` — the same
    resolution surface dbt gives model SQL."""

    def deco(fn):
        m = Model(
            name=name or fn.__name__,
            fn=fn,
            config=ModelConfig(**config_kwargs),
            refs=refs or [],
            sources=sources or [],
        )
        reg = _REGISTRY if registry is None else registry
        prior = reg.get(m.name)
        # dbt errors on duplicate node names; silently replacing meant a
        # copy-pasted name made one model never run, with every ref()
        # resolving to whichever import won (r10 review finding).
        # Re-registering the SAME function stays idempotent (module
        # re-imports, REPL reloads).
        if prior is not None and prior.fn is not fn:
            raise ValueError(
                f"duplicate model name {m.name!r}: already registered by "
                f"{getattr(prior.fn, '__qualname__', prior.fn)!r}"
            )
        reg[m.name] = m
        return fn

    return deco


def registered_models() -> dict[str, Model]:
    return dict(_REGISTRY)


def clear_registry() -> None:
    _REGISTRY.clear()
