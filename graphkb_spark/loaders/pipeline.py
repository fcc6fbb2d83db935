"""Dependency-ordered loader orchestration (SURVEY §7.8; reference
Snakefile DAG — /root/reference/Snakefile:32-47 rule ``all``, e.g.
load_ncit before all_diseases/all_drugs before load_civic).

The Snakemake rules become a plain topological sort over declared
dependencies; each job is a callable(kb) -> kb. Deterministic order
(lexicographic among ready jobs) so repeated runs build identical
lineages.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field


class DependencyError(ValueError):
    pass


@dataclass
class Job:
    name: str
    fn: Callable
    deps: Sequence[str] = field(default_factory=tuple)


def topo_order(jobs: Mapping[str, Job]) -> list[str]:
    """Deterministic topological order; raises on cycles/unknown deps."""
    for job in jobs.values():
        for d in job.deps:
            if d not in jobs:
                raise DependencyError(f"job {job.name!r} depends on unknown {d!r}")
    order: list[str] = []
    done: set[str] = set()
    remaining = dict(jobs)
    while remaining:
        ready = sorted(
            name for name, j in remaining.items() if all(d in done for d in j.deps)
        )
        if not ready:
            raise DependencyError(f"dependency cycle among: {sorted(remaining)}")
        for name in ready:
            order.append(name)
            done.add(name)
            del remaining[name]
    return order


def run_pipeline(jobs: Mapping[str, Job], state):
    """Run all jobs in dependency order, threading ``state`` (the KB)
    through each; returns (final state, executed order)."""
    order = topo_order(jobs)
    for name in order:
        state = jobs[name].fn(state)
    return state, order
