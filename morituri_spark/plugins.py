"""§2.9: plugin registry — the engine's check_input/execute surface.

Mirrors the reference's plugin architecture (plugins/base_plugin.hpp:17-89,
registry loop comm2osm.cpp:68-81): each converter is a plugin with
``check_input(input_path, output_path)`` (validate, never mutate) and
``execute(spark)`` (run the conversion, write the sink). ``run_plugins``
walks the registry in registration order and executes the FIRST plugin that
accepts the input — exactly the reference's dispatch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import SparkSession


class BasePlugin:
    """Subclass and register. ``name`` identifies the plugin; paths are set
    by plugin_setup (base_plugin.hpp:50-57 semantics: input must exist,
    output optional)."""

    name = "base"

    def __init__(self) -> None:
        self.input_path: str | None = None
        self.output_path: str | None = None

    def plugin_setup(self, input_path: str, output_path: str | None = None) -> None:
        if not os.path.isdir(input_path):
            raise IOError(f"input_path '{input_path}' is not valid.")
        self.input_path = input_path
        self.output_path = output_path

    def check_input(self, input_path: str, output_path: str | None = None) -> bool:
        raise NotImplementedError

    def execute(self, spark: SparkSession) -> dict:
        raise NotImplementedError


_REGISTRY: list[BasePlugin] = []


def register(plugin: BasePlugin) -> BasePlugin:
    _REGISTRY.append(plugin)
    return plugin


def registered() -> list[BasePlugin]:
    return list(_REGISTRY)


def clear_registry() -> None:
    _REGISTRY.clear()


def run_plugins(spark: SparkSession, input_path: str, output_path: str | None = None) -> dict:
    """comm2osm.cpp:75-81: first accepting plugin wins; returns its result.
    Raises if no plugin accepts the input."""
    for plugin in _REGISTRY:
        if plugin.check_input(input_path, output_path):
            return {"plugin": plugin.name, "result": plugin.execute(spark)}
    raise ValueError(f"no registered plugin accepts input {input_path!r}")


# ---------------------------------------------------------------------------
# Built-in plugins
# ---------------------------------------------------------------------------


class DummyPlugin(BasePlugin):
    """The reference ships a dummy plugin that accepts nothing
    (plugins/dummy) — kept for dispatch-order parity in tests."""

    name = "dummy"

    def check_input(self, input_path: str, output_path: str | None = None) -> bool:
        return False

    def execute(self, spark: SparkSession) -> dict:
        raise AssertionError("dummy plugin never executes")


class NavteqPlugin(BasePlugin):
    """The street/admin conversion as a plugin: accepts a directory holding
    the required parquet tables (sources.tables.check_input), converts
    streets (+ admin boundaries when present), writes the OSM sink when an
    output path is given (suffix-dispatched: .osm/.pbf/.opl[.gz|.bz2])."""

    name = "navteq"

    def check_input(self, input_path: str, output_path: str | None = None) -> bool:
        from .sources.tables import check_input as tables_ok

        ok = os.path.isdir(input_path) and tables_ok(input_path)
        if ok:
            self.plugin_setup(input_path, output_path)
        return ok

    def execute(self, spark: SparkSession) -> dict:
        from .io.sink import write_osm
        from .operators.admin import convert_admin_boundaries
        from .operators.streets import convert_streets

        d = self.input_path

        def rd(name):
            return spark.read.parquet(os.path.join(d, f"{name}.parquet"))

        streets = rd("streets")
        out = convert_streets(
            streets,
            rd("zlevels"),
            rd("cdms"),
            rd("cnd_mod"),
            rd("mtd_area"),
            rd("mtd_cntry_ref") if os.path.exists(os.path.join(d, "mtd_cntry_ref.parquet")) else None,
        )
        result: dict = {
            "ways": out["ways"].count(),
            "nodes": out["nodes"].count(),
        }
        if os.path.exists(os.path.join(d, "adminbndy.parquet")):
            admin = convert_admin_boundaries(rd("adminbndy"), rd("mtd_area"))
            result["admin_relations"] = admin["relations"].count()
        if self.output_path:
            nodes = out["nodes"].select("node_id", "lon_i", "lat_i")
            ways = out["ways"].select(
                "way_id", "node_refs", "highway", "name", "layer", "maxspeed", "oneway"
            )
            result["sink"] = write_osm(self.output_path, nodes=nodes, ways=ways)
        return result


def default_registry() -> list[BasePlugin]:
    """Fresh default registration (comm2osm.cpp:72-73 order: dummy first)."""
    clear_registry()
    register(DummyPlugin())
    register(NavteqPlugin())
    return registered()
