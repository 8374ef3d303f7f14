"""User-extension registries — the SURVEY §2.9 plug-in surface.

The reference exposes four registration points: commands
(`CommandFactory::register_command`, src/cmd.hpp:274-300), extract
strategies (`ExtractStrategy` subclasses picked by name,
src/extract/strategy.hpp:71-86 via command_extract.cpp), export formats
(`ExportFormat` + factory table, src/export/export_format.hpp:35-115),
and location-index implementations (`MapFactory`,
src/command_export.cpp:620-621). This module is the engine's analogue:
decorator registries resolved at dispatch time, so a user package can

    from osmium_tool_ray.registry import register_strategy

    @register_strategy("my_strategy")
    def my_strategy(sets, groups_ds, members_ds, mem, kind_of, options,
                    do_relations):
        ...mutate sets.way_ids / sets.extra_node_ids per extract...

and `run_extract(..., strategy="my_strategy")` picks it up — no engine
edits. Built-ins register themselves on import of their home module.

Strategy protocol (pipelines/extract.run_extract): called once after the
node-id PIP pass with the mutable ExtractSets, the groups/members
Datasets, the driver-side relation-member table `mem`, the
group_id->kind map, the options dict, and the resolved do_relations
flag; it marks ways/relations/extra nodes by mutating `sets` in place.

Sink protocol (sources/writers + readers.write_table): `fn(ds, path,
**kwargs)` consuming a Dataset; registered per path suffix, longest
suffix wins, parquet is the default when nothing matches.
"""

from __future__ import annotations

from collections.abc import Callable

_STRATEGIES: dict[str, Callable] = {}
_SINKS: dict[str, Callable] = {}


def register_strategy(name: str):
    """Decorator: register an extract strategy under `name` (latest wins,
    so a user can also override a built-in)."""
    def deco(fn: Callable) -> Callable:
        _STRATEGIES[name] = fn
        return fn
    return deco


def get_strategy(name: str) -> Callable:
    try:
        return _STRATEGIES[name]
    except KeyError:
        raise ValueError(
            f"Unknown strategy '{name}' "
            f"(registered: {sorted(_STRATEGIES)})") from None


def registered_strategies() -> list[str]:
    return sorted(_STRATEGIES)


def register_sink(suffix: str):
    """Decorator: register a Dataset sink for paths ending in `suffix`."""
    def deco(fn: Callable) -> Callable:
        _SINKS[suffix] = fn
        return fn
    return deco


def resolve_sink(path: str, default: Callable | None = None) -> Callable:
    """Longest-suffix match over registered sinks; `default` (or the
    parquet sink) when nothing matches."""
    p = str(path).rstrip("/")
    best = None
    for suffix in _SINKS:
        if p.endswith(suffix) and (best is None or len(suffix) > len(best)):
            best = suffix
    if best is not None:
        return _SINKS[best]
    if default is not None:
        return default
    return _SINKS[".parquet"]
