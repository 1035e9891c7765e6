"""Geometry YAML loading + standard field line generation.

Compatible with the reference geometry.yml schema (reference
geometry-divB.yml, python/geom_publisher.py:39-102): the YAML mirrors
SSL_GeometryData, standard line markings are generated from the field
dimensions, and `optional_field_lines` / `default_lines` toggles suppress
markings missing on a physical field.
"""
from __future__ import annotations

import math
from pathlib import Path

import yaml
from google.protobuf.json_format import ParseDict

from ..proto import SSL_FieldShapeType, SSL_WrapperPacket


def yaml_load(path: Path, default=None):
    path = Path(path)
    if path.exists():
        with path.open("r") as fh:
            return yaml.safe_load(fh)
    if default is not None:
        return default()
    raise FileNotFoundError(path)


def _enabled(toggles: dict, key: str) -> bool:
    return key not in toggles or bool(toggles[key])


def generate_default_lines(wrapper: SSL_WrapperPacket, config: dict) -> None:
    """Append standard SSL field markings derived from the field dimensions."""
    toggles = config.get("default_lines", config.get("optional_field_lines", {})) or {}
    field_cfg = config["field"]
    thickness = float(field_cfg["line_thickness"])
    half_length = field_cfg["field_length"] / 2
    half_width = field_cfg["field_width"] / 2

    lines = wrapper.geometry.field.field_lines

    def add_line(name, x1, y1, x2, y2):
        line = lines.add()
        line.name = name
        line.p1.x, line.p1.y = x1, y1
        line.p2.x, line.p2.y = x2, y2
        line.thickness = thickness
        line.type = SSL_FieldShapeType.Value(name)

    add_line("TopTouchLine", -half_length, half_width, half_length, half_width)
    add_line("BottomTouchLine", -half_length, -half_width, half_length, -half_width)
    add_line("LeftGoalLine", -half_length, -half_width, -half_length, half_width)
    add_line("RightGoalLine", half_length, -half_width, half_length, half_width)

    if _enabled(toggles, "halfway"):
        add_line("HalfwayLine", 0, -half_width, 0, half_width)
    if _enabled(toggles, "goal2goal"):
        add_line("CenterLine", -half_length, 0, half_length, 0)

    if _enabled(toggles, "penalty"):
        pen_x = half_length - field_cfg["penalty_area_depth"]
        half_pen = field_cfg["penalty_area_width"] / 2
        add_line("LeftPenaltyStretch", -pen_x, -half_pen, -pen_x, half_pen)
        add_line("RightPenaltyStretch", pen_x, -half_pen, pen_x, half_pen)
        add_line("LeftFieldLeftPenaltyStretch", -half_length, -half_pen, -pen_x, -half_pen)
        add_line("LeftFieldRightPenaltyStretch", -half_length, half_pen, -pen_x, half_pen)
        add_line("RightFieldLeftPenaltyStretch", pen_x, half_pen, half_length, half_pen)
        add_line("RightFieldRightPenaltyStretch", pen_x, -half_pen, half_length, -half_pen)

    if _enabled(toggles, "centercircle"):
        arc = wrapper.geometry.field.field_arcs.add()
        arc.name = "CenterCircle"
        arc.type = SSL_FieldShapeType.Value(arc.name)
        arc.center.x = arc.center.y = 0.0
        arc.radius = field_cfg["center_circle_radius"]
        arc.a1 = 0.0
        arc.a2 = 2 * math.pi
        arc.thickness = thickness


def load_geometry(path: Path) -> SSL_WrapperPacket:
    """Load a geometry.yml into an SSL_WrapperPacket with generated lines."""
    config = yaml_load(path)
    wrapper = SSL_WrapperPacket()
    ParseDict(config, wrapper.geometry, ignore_unknown_fields=True)
    generate_default_lines(wrapper, config)
    return wrapper


def geometry_from_dict(config: dict) -> SSL_WrapperPacket:
    wrapper = SSL_WrapperPacket()
    ParseDict(config, wrapper.geometry, ignore_unknown_fields=True)
    generate_default_lines(wrapper, config)
    return wrapper
