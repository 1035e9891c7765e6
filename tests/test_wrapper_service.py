"""Wrapper service tests: bus semantics, calib merging, websocket bridge,
snapshot endpoint."""
import asyncio
import json

import pytest
import yaml

from wrapper_backend.service import (
    GeometryService,
    WatchBus,
    build_app,
)

pytest_plugins = ("aiohttp.pytest_plugin",)


@pytest.fixture
def geometry_yml(tmp_path):
    cfg = {
        "vision_ip": "224.5.23.2",
        "optional_field_lines": {
            "goal2goal": True, "halfway": True,
            "centercircle": True, "penalty": True,
        },
        "field": {
            "field_length": 9000, "field_width": 6000, "goal_width": 1000,
            "goal_depth": 180, "penalty_area_depth": 1000,
            "penalty_area_width": 2000, "boundary_width": 300,
            "center_circle_radius": 500, "line_thickness": 10,
            "ball_radius": 21.5, "max_robot_radius": 90.0,
        },
    }
    path = tmp_path / "geometry.yml"
    path.write_text(yaml.dump(cfg))
    return path


def test_watch_bus_drops_intermediate():
    async def run():
        bus = WatchBus()
        q = bus.subscribe("t")
        bus.publish("t", 1)
        bus.publish("t", 2)
        bus.publish("t", 3)
        assert await q.get() == 3
        bus.unsubscribe("t", q)
        bus.publish("t", 4)  # no subscribers left, no error

    asyncio.run(run())


def test_geometry_merge(geometry_yml):
    from vision_processor_tpu.models.camera import CameraModel
    from vision_processor_tpu.proto import SSL_GeometryData

    async def run():
        bus = WatchBus()
        service = GeometryService(bus, geometry_yml)
        assert len(service.wrapper.geometry.calib) == 0
        assert len(service.wrapper.geometry.field.field_lines) >= 10

        incoming = SSL_GeometryData()
        incoming.field.CopyFrom(service.wrapper.geometry.field)
        incoming.calib.append(CameraModel().to_proto(2))
        service.merge_calibs(incoming)
        assert [c.camera_id for c in service.wrapper.geometry.calib] == [2]

        # same calib again: no duplicate
        service.merge_calibs(incoming)
        assert len(service.wrapper.geometry.calib) == 1

        # updated calib replaces
        model = CameraModel()
        model.focal_length = 1500.0
        incoming2 = SSL_GeometryData()
        incoming2.field.CopyFrom(service.wrapper.geometry.field)
        incoming2.calib.append(model.to_proto(2))
        service.merge_calibs(incoming2)
        assert service.wrapper.geometry.calib[0].focal_length == 1500.0

    asyncio.run(run())


async def test_websocket_topic_stream(aiohttp_client, geometry_yml, tmp_path):
    bus = WatchBus()
    service = GeometryService(bus, geometry_yml)
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    (img_dir / "0.raw.jpg").write_bytes(b"\xff\xd8fakejpeg\xff\xd9")

    client = await aiohttp_client(build_app(bus, img_dir))

    ws = await client.ws_connect("/ws")
    await ws.send_str(json.dumps({"action": "subscribe", "topic": "wrapper_packet.out"}))
    await asyncio.sleep(0.05)  # reader attach
    bus.publish("wrapper_packet.out", service.wrapper.SerializeToString())
    msg = await asyncio.wait_for(ws.receive_json(), timeout=2.0)
    assert msg["topic"] == "wrapper_packet.out"
    assert msg["data"]["geometry"]["field"]["field_length"] == 9000
    await ws.close()

    # unknown topic -> error frame
    ws2 = await client.ws_connect("/ws")
    await ws2.send_str(json.dumps({"action": "subscribe", "topic": "nope"}))
    msg = await asyncio.wait_for(ws2.receive_json(), timeout=2.0)
    assert "error" in msg
    await ws2.close()

    # snapshot endpoints
    resp = await client.get("/snapshots")
    entries = await resp.json()
    assert {"camera": "0", "view": "raw"} in entries
    resp = await client.get("/snapshot/0/raw")
    assert resp.status == 200
    body = await resp.read()
    assert body.startswith(b"\xff\xd8")
    resp = await client.get("/snapshot/0/missing")
    assert resp.status == 404

    # frontend index served at /
    resp = await client.get("/")
    assert resp.status == 200
    body = await resp.text()
    assert "wrapper" in body.lower()


async def test_frontend_modules_and_detection_topic(
    aiohttp_client, geometry_yml, tmp_path
):
    """The overlay frontend's ES modules are served and the detection.in
    topic carries everything the field canvas consumes (robot pose +
    orientation + id, balls, geometry lines)."""
    from vision_processor_tpu.proto import SSL_DetectionFrame

    bus = WatchBus()
    GeometryService(bus, geometry_yml)
    img_dir = tmp_path / "img"
    img_dir.mkdir()
    client = await aiohttp_client(build_app(bus, img_dir))

    # static modules referenced by index.html
    body = await (await client.get("/")).text()
    assert "/static/bus.js" in body and "/static/field.js" in body
    for mod in ("bus.js", "field.js"):
        resp = await client.get(f"/static/{mod}")
        assert resp.status == 200
        text = await resp.text()
        assert "export class" in text

    ws = await client.ws_connect("/ws")
    await ws.send_str(
        json.dumps({"action": "subscribe", "topic": "detection.in"})
    )
    await asyncio.sleep(0.05)

    det = SSL_DetectionFrame()
    det.frame_number = 7
    det.camera_id = 2
    det.t_capture = det.t_sent = 1.0
    bot = det.robots_yellow.add()
    bot.confidence = 0.9
    bot.robot_id = 4
    bot.x, bot.y, bot.orientation = -1000.0, 500.0, 0.7
    bot.pixel_x = bot.pixel_y = 0.0
    ball = det.balls.add()
    ball.confidence = 1.0
    ball.x, ball.y = 100.0, -200.0
    ball.pixel_x = ball.pixel_y = 0.0
    bus.publish("detection.in", det)

    msg = await asyncio.wait_for(ws.receive_json(), timeout=2.0)
    assert msg["topic"] == "detection.in"
    d = msg["data"]
    assert d["camera_id"] == 2 and d["frame_number"] == 7
    assert d["robots_yellow"][0]["robot_id"] == 4
    assert abs(d["robots_yellow"][0]["orientation"] - 0.7) < 1e-6
    assert d["balls"][0]["x"] == 100.0
    await ws.close()
