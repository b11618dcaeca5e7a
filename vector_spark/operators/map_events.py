"""`map_events` — the per-event escape hatch filling Vector's `lua`
transform slot (palette.rs:128, config_panel.rs `lua` form).

This is NOT a Lua interpreter.  Vector embeds Lua for logic its palette
can't express; the Spark-idiomatic equivalent of "arbitrary user code over
the event stream" is a pandas-batch hook run through ``mapInPandas`` —
Arrow-vectorized, executor-side, no per-row Python.  A pipeline TOML using
``type = "lua"`` compiles onto this stage by supplying a Python hook
instead of a Lua ``source``; actual Lua scripts are rejected with a clear
error rather than silently ignored.

Hooks are ``pandas.DataFrame -> pandas.DataFrame`` callables over each
Arrow batch.  Shape-preserving hooks (the common case: rewrite/add-field
logic) default to the input schema; shape-changing hooks pass an output
DDL.  Scale shape: one narrow mapInPandas stage — no shuffle, batch-at-a-
time memory, same profile as the sanctioned extract UDF.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

_HOOK_REGISTRY: dict[str, Callable[[pd.DataFrame], pd.DataFrame]] = {}


def register_map_hook(name: str, fn: Callable[[pd.DataFrame], pd.DataFrame]) -> None:
    """Register a named hook so TOML configs can reference it as `hook = "name"`."""
    _HOOK_REGISTRY[name] = fn


def resolve_hook(spec) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Accept a callable, a registered hook name, or a "module:function" path."""
    if callable(spec):
        return spec
    if isinstance(spec, str):
        if spec in _HOOK_REGISTRY:
            return _HOOK_REGISTRY[spec]
        if ":" in spec and "\n" not in spec:
            mod_name, _, attr = spec.partition(":")
            try:
                fn = getattr(importlib.import_module(mod_name), attr)
            except (ImportError, AttributeError) as e:
                raise ValueError(f"map_events hook {spec!r} not importable: {e}") from e
            if callable(fn):
                return fn
            raise ValueError(f"map_events hook {spec!r} is not callable")
        raise ValueError(
            "map_events/lua stages take a Python hook — a registered hook name "
            "(register_map_hook) or a 'module:function' path.  Lua source is "
            f"not executed; got {spec!r}"
        )
    raise ValueError(f"map_events hook must be callable or str, got {type(spec).__name__}")


def map_events(
    df: DataFrame,
    fn,
    schema=None,
) -> DataFrame:
    """Apply an arbitrary batch hook to every event.

    ``fn``: callable / hook name / "module:function" (see resolve_hook);
    ``schema``: output schema DDL — omit for shape-preserving hooks (output
    columns must match the input schema exactly)."""
    hook = resolve_hook(fn)
    out_schema = schema or df.schema

    def gen(batches) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield hook(pdf)

    return df.mapInPandas(gen, out_schema)
