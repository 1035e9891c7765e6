"""Generated SSL protobuf bindings.

The .proto sources live in ``<repo>/proto`` (wire-compatible with the public
SSL-Vision protocol; cf. reference proto/ssl_vision_wrapper.proto). They are
compiled with ``protoc -I proto`` so the generated modules use flat imports;
this package puts its own directory on sys.path before loading them and
regenerates the bindings on demand when the sources are newer.
"""
from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_PROTO_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "proto")

_PROTOS = [
    "ssl_vision_detection",
    "ssl_vision_geometry",
    "ssl_vision_wrapper",
    "ssl_gc_common",
    "ssl_gc_geometry",
    "ssl_gc_game_event",
    "ssl_gc_referee_message",
    "ssl_vision_detection_tracked",
    "ssl_vision_wrapper_tracked",
]


def _needs_regen() -> bool:
    for name in _PROTOS:
        src = os.path.join(_PROTO_SRC, name + ".proto")
        out = os.path.join(_HERE, name + "_pb2.py")
        if not os.path.exists(out):
            return os.path.exists(src)
        if os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(out):
            return True
    return False


def _regen() -> None:
    srcs = [os.path.join(_PROTO_SRC, n + ".proto") for n in _PROTOS]
    subprocess.run(
        ["protoc", "-I", _PROTO_SRC, "--python_out", _HERE, *srcs],
        check=True,
    )


if _needs_regen():
    _regen()

if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from ssl_vision_detection_pb2 import (  # noqa: E402
    SSL_DetectionBall,
    SSL_DetectionFrame,
    SSL_DetectionRobot,
)
from ssl_vision_geometry_pb2 import (  # noqa: E402
    SSL_FieldCircularArc,
    SSL_FieldLineSegment,
    SSL_FieldShapeType,
    SSL_GeometryCameraCalibration,
    SSL_GeometryData,
    SSL_GeometryFieldSize,
    Vector2f,
)
from ssl_vision_wrapper_pb2 import (  # noqa: E402
    SSL_SOURCE_VISION_PROCESSOR,
    SSL_Source,
    SSL_WrapperPacket,
)
from ssl_gc_referee_message_pb2 import Referee  # noqa: E402
from ssl_gc_game_event_pb2 import GameEvent  # noqa: E402
from ssl_gc_common_pb2 import RobotId, Team  # noqa: E402
from ssl_vision_detection_tracked_pb2 import (  # noqa: E402
    TrackedBall,
    TrackedFrame,
    TrackedRobot,
)
from ssl_vision_wrapper_tracked_pb2 import TrackerWrapperPacket  # noqa: E402

__all__ = [
    "GameEvent",
    "RobotId",
    "Team",
    "TrackedBall",
    "TrackedFrame",
    "TrackedRobot",
    "TrackerWrapperPacket",
    "SSL_DetectionBall",
    "SSL_DetectionFrame",
    "SSL_DetectionRobot",
    "SSL_FieldCircularArc",
    "SSL_FieldLineSegment",
    "SSL_FieldShapeType",
    "SSL_GeometryCameraCalibration",
    "SSL_GeometryData",
    "SSL_GeometryFieldSize",
    "Vector2f",
    "SSL_SOURCE_VISION_PROCESSOR",
    "SSL_Source",
    "SSL_WrapperPacket",
    "Referee",
]
