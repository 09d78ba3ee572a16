"""Dependency-ordered parallel action executor (T9 + S6).

Reference counterparts: refresh-views walks pg_depend and refreshes
materialized views in dependency order with bounded concurrency
(bin/refresh-views:59-130); the generic engine with cycle detection is
openmaptiles/utils.py:116-194 (run_actions); import-sql runs
parallel/*.sql with xargs -P 5 (bin/import-sql:34-63).

Spark mapping: each action is a Python callable that triggers a Spark
job (materialize a derived table, refresh a generalized band). Actions
with no unmet dependencies run concurrently on a thread pool — Spark's
scheduler interleaves their jobs (FAIR pool at cluster scale).
"""

from __future__ import annotations

import threading
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Callable


@dataclass
class Action:
    name: str
    fn: Callable[[], object]
    depends_on: list[str] = field(default_factory=list)


def check_cycles(actions: list[Action]) -> None:
    """Reject cyclic dependency graphs (utils.py:158-194)."""
    graph = {a.name: list(a.depends_on) for a in actions}
    for a in actions:
        for d in a.depends_on:
            if d not in graph:
                raise ValueError(f"Action {a.name} depends on unknown {d}")
    state: dict[str, int] = {}

    def visit(n, path):
        if state.get(n) == 1:
            raise ValueError(f"Circular dependency: {' -> '.join(path + [n])}")
        if state.get(n) == 2:
            return
        state[n] = 1
        for m in graph[n]:
            visit(m, path + [n])
        state[n] = 2

    for n in graph:
        visit(n, [])


def run_actions(actions: list[Action], max_parallel: int = 5) -> dict[str, object]:
    """Run actions respecting dependencies, <= max_parallel concurrent
    (the reference's MAX_PARALLEL_PSQL=5 default). Returns results by
    name; raises on first failure (pending actions are not started)."""
    check_cycles(actions)
    by_name = {a.name: a for a in actions}
    done: dict[str, object] = {}
    lock = threading.Lock()
    pending = set(by_name)
    running: dict = {}

    def ready():
        with lock:
            return [n for n in pending
                    if all(d in done for d in by_name[n].depends_on)]

    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        while pending or running:
            for n in ready():
                with lock:
                    if n in pending and len(running) < max_parallel:
                        pending.discard(n)
                        running[pool.submit(by_name[n].fn)] = n
            if not running:
                if pending:
                    raise RuntimeError(f"deadlock: {sorted(pending)}")
                break
            finished, _ = wait(running, return_when=FIRST_COMPLETED)
            for fut in finished:
                n = running.pop(fut)
                done[n] = fut.result()  # raises on failure
    return done
