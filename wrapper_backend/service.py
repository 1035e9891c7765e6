"""Geometry wrapper service: multicast <-> WebSocket bridge + snapshots.

The operator-facing peer of the vision processors on the SSL bus
(role of the reference wrapper_backend package): owns the merged
SSL_WrapperPacket built from geometry.yml, absorbs per-camera calibrations
broadcast by processors, republishes the merged packet at 1 Hz, exposes bus
topics over a JSON WebSocket and the processors' snapshot JPEGs over HTTP.

Internal pub/sub uses watch-channel semantics: every subscriber holds a
size-1 queue and only ever sees the newest value.
"""
from __future__ import annotations

import asyncio
import json
import logging
import socket
import struct
from pathlib import Path
from typing import Any, Callable

from aiohttp import WSMsgType, web
from google.protobuf.json_format import MessageToDict
from google.protobuf.message import DecodeError

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from vision_processor_tpu.net.geometry_io import load_geometry  # noqa: E402
from vision_processor_tpu.proto import (  # noqa: E402
    SSL_GeometryData,
    SSL_SOURCE_VISION_PROCESSOR,
    SSL_WrapperPacket,
)

log = logging.getLogger("wrapper.service")

PUBLISH_INTERVAL_S = 1.0


class WatchBus:
    """Topic pub/sub where slow readers skip to the latest value."""

    def __init__(self) -> None:
        self._queues: dict[str, list[asyncio.Queue]] = {}

    def subscribe(self, topic: str) -> asyncio.Queue:
        q: asyncio.Queue = asyncio.Queue(maxsize=1)
        self._queues.setdefault(topic, []).append(q)
        return q

    def unsubscribe(self, topic: str, q: asyncio.Queue) -> None:
        queues = self._queues.get(topic, [])
        if q in queues:
            queues.remove(q)
        if not queues:
            self._queues.pop(topic, None)

    def publish(self, topic: str, value: Any) -> None:
        for q in self._queues.get(topic, ()):
            if q.full():
                try:
                    q.get_nowait()
                except asyncio.QueueEmpty:
                    pass
            q.put_nowait(value)


class MulticastBridge:
    """UDP multicast <-> bus: demux inbound packets, send wrapper_packet.out."""

    def __init__(self, bus: WatchBus, group: str, port: int) -> None:
        self.bus = bus
        self.group = group
        self.port = port
        self._transport = None
        self._tx_task = None

    async def start(self) -> None:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM, socket.IPPROTO_UDP)
        sock.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_TTL, 32)
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        sock.bind((self.group, self.port))
        sock.setsockopt(
            socket.IPPROTO_IP,
            socket.IP_ADD_MEMBERSHIP,
            struct.pack("4sl", socket.inet_aton(self.group), socket.INADDR_ANY),
        )

        bridge = self

        class Proto(asyncio.DatagramProtocol):
            def datagram_received(self, data: bytes, addr) -> None:
                packet = SSL_WrapperPacket()
                try:
                    packet.ParseFromString(data)
                except DecodeError as exc:
                    log.warning("bad datagram from %s: %s", addr, exc)
                    return
                if packet.HasField("geometry"):
                    bridge.bus.publish("geometry.in", packet.geometry)
                if packet.HasField("detection"):
                    bridge.bus.publish("detection.in", packet.detection)

        loop = asyncio.get_running_loop()
        self._transport, _ = await loop.create_datagram_endpoint(Proto, sock=sock)
        self._tx_task = asyncio.create_task(self._tx_loop(), name="mc-tx")
        log.info("multicast on %s:%d", self.group, self.port)

    async def _tx_loop(self) -> None:
        q = self.bus.subscribe("wrapper_packet.out")
        while True:
            payload: bytes = await q.get()
            self._transport.sendto(payload, (self.group, self.port))

    async def close(self) -> None:
        if self._tx_task:
            self._tx_task.cancel()
            try:
                await self._tx_task
            except asyncio.CancelledError:
                pass
        if self._transport:
            self._transport.close()


class GeometryService:
    """Merged geometry owner: absorb calibs, publish at 1 Hz."""

    def __init__(self, bus: WatchBus, geometry_yml: Path) -> None:
        self.bus = bus
        self.wrapper = load_geometry(geometry_yml)
        self.wrapper.source = SSL_SOURCE_VISION_PROCESSOR
        log.info(
            "geometry loaded with %d calib(s)", len(self.wrapper.geometry.calib)
        )

    async def run(self) -> None:
        await asyncio.gather(self._absorb(), self._publish())

    async def _absorb(self) -> None:
        q = self.bus.subscribe("geometry.in")
        while True:
            incoming: SSL_GeometryData = await q.get()
            self.merge_calibs(incoming)

    async def _publish(self) -> None:
        while True:
            self.bus.publish(
                "wrapper_packet.out", self.wrapper.SerializeToString()
            )
            await asyncio.sleep(PUBLISH_INTERVAL_S)

    def merge_calibs(self, incoming: SSL_GeometryData) -> None:
        existing_by_id = {
            c.camera_id: c for c in self.wrapper.geometry.calib
        }
        for camera in incoming.calib:
            current = existing_by_id.get(camera.camera_id)
            if current is None:
                self.wrapper.geometry.calib.append(camera)
                log.info("added camera %d calibration", camera.camera_id)
            elif current.SerializeToString(
                deterministic=True
            ) != camera.SerializeToString(deterministic=True):
                current.CopyFrom(camera)
                log.info("updated camera %d calibration", camera.camera_id)


def _encode_wrapper(payload: bytes) -> dict:
    packet = SSL_WrapperPacket()
    packet.ParseFromString(payload)
    return MessageToDict(packet, preserving_proto_field_name=True)


def _encode_detection(det) -> dict:
    return MessageToDict(det, preserving_proto_field_name=True)


TOPIC_ENCODERS: dict[str, Callable[[Any], dict]] = {
    "wrapper_packet.out": _encode_wrapper,
    "detection.in": _encode_detection,
}


class WebSocketHub:
    """JSON subscribe/unsubscribe topics over `/ws`.

    Per-client one-slot outbox; a topic's bus reader runs only while at
    least one client subscribes to it.
    """

    def __init__(self, bus: WatchBus) -> None:
        self.bus = bus
        self._readers: dict[str, asyncio.Task] = {}
        self._clients_per_topic: dict[str, set] = {}

    async def handler(self, request: web.Request) -> web.WebSocketResponse:
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        outbox: asyncio.Queue = asyncio.Queue(maxsize=1)
        topics: set[str] = set()

        async def deliver():
            while True:
                frame = await outbox.get()
                if ws.closed:
                    return
                await ws.send_str(frame)

        deliver_task = asyncio.create_task(deliver())
        client = outbox
        try:
            async for msg in ws:
                if msg.type != WSMsgType.TEXT:
                    continue
                try:
                    req = json.loads(msg.data)
                    action = req["action"]
                    topic = req["topic"]
                except (json.JSONDecodeError, KeyError):
                    await ws.send_str(json.dumps({"error": "malformed request"}))
                    continue
                if topic not in TOPIC_ENCODERS:
                    await ws.send_str(
                        json.dumps({"error": "unknown topic", "topic": topic})
                    )
                    continue
                if action == "subscribe":
                    topics.add(topic)
                    self._attach(topic, client)
                elif action == "unsubscribe":
                    topics.discard(topic)
                    self._detach(topic, client)
                else:
                    await ws.send_str(
                        json.dumps({"error": "unknown action", "topic": topic})
                    )
        finally:
            for topic in list(topics):
                self._detach(topic, client)
            deliver_task.cancel()
        return ws

    def _attach(self, topic: str, client) -> None:
        clients = self._clients_per_topic.setdefault(topic, set())
        clients.add(client)
        if topic not in self._readers:
            self._readers[topic] = asyncio.create_task(self._read_loop(topic))

    def _detach(self, topic: str, client) -> None:
        clients = self._clients_per_topic.get(topic, set())
        clients.discard(client)
        if not clients and topic in self._readers:
            self._readers.pop(topic).cancel()
            self._clients_per_topic.pop(topic, None)

    async def _read_loop(self, topic: str) -> None:
        q = self.bus.subscribe(topic)
        encoder = TOPIC_ENCODERS[topic]
        try:
            while True:
                value = await q.get()
                frame = json.dumps({"topic": topic, "data": encoder(value)})
                for outbox in self._clients_per_topic.get(topic, ()):
                    if outbox.full():
                        try:
                            outbox.get_nowait()
                        except asyncio.QueueEmpty:
                            pass
                    outbox.put_nowait(frame)
        finally:
            self.bus.unsubscribe(topic, q)


class SnapshotEndpoint:
    """Serve the processors' `img/<cam>.<view>.jpg` snapshot dumps."""

    def __init__(self, img_dir: Path) -> None:
        self.img_dir = Path(img_dir)

    async def list_snapshots(self, request: web.Request) -> web.Response:
        entries = []
        if self.img_dir.is_dir():
            for path in sorted(self.img_dir.glob("*.jpg")):
                parts = path.stem.split(".")
                if len(parts) == 2:
                    entries.append({"camera": parts[0], "view": parts[1]})
        return web.json_response(entries)

    async def get_snapshot(self, request: web.Request) -> web.Response:
        cam = request.match_info["cam"]
        view = request.match_info["view"]
        if not (cam.isalnum() and view.isalnum()):
            raise web.HTTPBadRequest()
        path = self.img_dir / f"{cam}.{view}.jpg"
        if not path.exists():
            raise web.HTTPNotFound()
        return web.FileResponse(path)


@web.middleware
async def cors_middleware(request: web.Request, handler):
    response = await handler(request)
    response.headers["Access-Control-Allow-Origin"] = "*"
    return response


def build_app(bus: WatchBus, img_dir: Path) -> web.Application:
    hub = WebSocketHub(bus)
    snaps = SnapshotEndpoint(img_dir)
    app = web.Application(middlewares=[cors_middleware])
    app.router.add_get("/ws", hub.handler)
    app.router.add_get("/snapshots", snaps.list_snapshots)
    app.router.add_get("/snapshot/{cam}/{view}", snaps.get_snapshot)
    frontend = Path(__file__).parent.parent / "wrapper-frontend"
    if frontend.is_dir():
        async def index(_request):
            return web.FileResponse(frontend / "index.html")

        app.router.add_get("/", index)
        app.router.add_static("/static", frontend)
    return app


async def amain(
    geometry_yml: Path,
    group: str = "224.5.23.2",
    port: int = 10006,
    http_port: int = 8765,
    img_dir: Path = Path("img"),
) -> None:
    bus = WatchBus()
    mc = MulticastBridge(bus, group, port)
    geometry = GeometryService(bus, geometry_yml)
    await mc.start()

    app = build_app(bus, img_dir)
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "0.0.0.0", http_port)
    await site.start()
    log.info("wrapper service on :%d", http_port)

    try:
        await geometry.run()
    finally:
        await mc.close()
        await runner.cleanup()
