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


# ---------------------------------------------------------------------------
# The bundled ``all_sources`` preset: the reference's ``rule all`` DAG
# (/root/reference/Snakefile:32-47 targets; per-rule input edges at
# Snakefile:206-475) re-expressed as data. Aggregator rules
# (all_drugs / all_diseases / all_local) are barrier nodes — no work of
# their own, they just gate the statement loaders behind whole families
# (e.g. ncit before all drugs/diseases before civic/cgi).
# ---------------------------------------------------------------------------

#: the six bundled local ontology files (Snakefile ``load_local`` expansions)
LOCAL_SOURCES: tuple[str, ...] = (
    "vocab", "signatures", "chromosomes", "evidenceLevels", "aacr", "asco",
)

#: name -> dependency names; every edge mirrors a Snakefile ``input:``
ALL_SOURCES_DEPS: dict[str, tuple[str, ...]] = {
    **{name: () for name in LOCAL_SOURCES},      # rule load_local
    "sources": (),                               # rule load_sources
    "ncit": ("vocab",),                          # rule load_ncit
    "fda_srs": ("vocab",),                       # rule load_fda_srs
    "ncit_fda": ("ncit",),                       # rule load_ncit_fda
    "refseq": ("vocab",),                        # rule load_refseq
    "ensembl": ("refseq",),                      # rule load_ensembl
    "do": ("ncit",),                             # rule load_do
    "uberon": ("ncit",),                         # rule load_uberon
    "oncotree": ("ncit",),                       # rule load_oncotree
    "approvals": (),                             # rule load_approvals (no inputs)
    "all_drugs": ("ncit", "fda_srs"),            # rule all_drugs (get_drug_inputs)
    "all_diseases": ("do", "ncit", "oncotree"),  # rule all_diseases
    "all_local": LOCAL_SOURCES,                  # rule all_local
    "dgidb": ("all_local",),                     # rule load_dgidb
    "cancerhotspots": (                          # rule load_cancerhotspots
        "vocab", "signatures", "chromosomes", "oncotree", "ensembl",
    ),
    "pmc4232638": ("vocab", "signatures", "chromosomes"),
    "pmc4468049": ("vocab", "signatures", "chromosomes", "all_diseases"),
    "civic": (*LOCAL_SOURCES, "ncit", "do"),     # rule load_civic
    "cgi": (                                     # rule load_cgi
        "vocab", "signatures", "chromosomes", "evidenceLevels",
        "all_diseases", "all_drugs",
    ),
    "docm": ("vocab", "signatures", "chromosomes", "ncit", "do"),
    "moa": ("oncotree", *LOCAL_SOURCES),         # rule load_moa
}

#: barrier rules: ordering-only, fn defaults to identity
AGGREGATOR_RULES = frozenset({"all_drugs", "all_diseases", "all_local"})

#: Snakefile conditional sources (credentials / --config flags) -> the
#: jobs and edges they switch on
OPTIONAL_SOURCES: dict[str, dict[str, tuple[str, ...]]] = {
    # USE_DRUGBANK: load_drugbank after fda_srs, and all_drugs waits on it
    "drugbank": {"drugbank": ("fda_srs",)},
    # USE_COSMIC (Snakefile:46-47)
    "cosmic": {
        "cosmic_resistance": ("vocab", "chromosomes", "all_diseases", "all_drugs"),
        "cosmic_fusions": ("all_diseases",),
    },
    # BACKFILL_TRIALS (Snakefile:44-45)
    "trials": {"clinicaltrialsgov": ("vocab", "all_diseases", "all_drugs")},
}


def all_sources_jobs(
    loaders: Mapping[str, Callable],
    *,
    drugbank: bool = False,
    cosmic: bool = False,
    trials: bool = False,
) -> dict[str, Job]:
    """Bind per-source callables to the reference ``rule all`` DAG.

    ``loaders`` maps source name -> callable(state) -> state; every
    non-aggregator job in the (flag-selected) DAG must be bound —
    a missing binding is an error, mirroring Snakemake's behavior for
    a missing rule. Aggregator rules default to the identity but may
    be overridden (e.g. to checkpoint the KB between families).
    """
    deps = dict(ALL_SOURCES_DEPS)
    if drugbank:
        deps.update(OPTIONAL_SOURCES["drugbank"])
        deps["all_drugs"] = (*deps["all_drugs"], "drugbank")
    if cosmic:
        deps.update(OPTIONAL_SOURCES["cosmic"])
    if trials:
        deps.update(OPTIONAL_SOURCES["trials"])
    jobs: dict[str, Job] = {}
    for name, d in deps.items():
        if name in loaders:
            fn = loaders[name]
        elif name in AGGREGATOR_RULES:
            fn = lambda state: state  # noqa: E731
        else:
            raise DependencyError(f"no loader bound for source {name!r}")
        jobs[name] = Job(name, fn, deps=d)
    return jobs


def run_all_sources(
    loaders: Mapping[str, Callable],
    state,
    *,
    drugbank: bool = False,
    cosmic: bool = False,
    trials: bool = False,
):
    """``rule all``: run every bundled source in dependency order."""
    return run_pipeline(
        all_sources_jobs(loaders, drugbank=drugbank, cosmic=cosmic, trials=trials),
        state,
    )
