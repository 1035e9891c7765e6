"""Multicast vision-bus helpers for the evaluation harness.

Same role as the reference harness socket (reference python/visionsocket.py):
an SSL_WrapperPacket multicast socket plus a recorder capturing every packet
for benchmark scoring. Protobuf bindings come from the framework package.
"""
from __future__ import annotations

import argparse
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from google.protobuf.json_format import MessageToDict  # noqa: E402

from vision_processor_tpu.net.udp import open_multicast_socket  # noqa: E402
from vision_processor_tpu.proto import SSL_WrapperPacket  # noqa: E402


def parser_vision_network(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument("--vision_ip", default="224.5.23.2",
                        help="Multicast IP address of the vision")
    parser.add_argument("--vision_port", type=int, default=10006,
                        help="Multicast port of the vision")
    return parser


class VisionSocket:
    """Context-managed multicast socket with a receiver thread."""

    def __init__(self, vision_ip="224.5.23.2", vision_port=10006, args=None):
        if args is not None:
            vision_ip = args.vision_ip
            vision_port = args.vision_port
        self.address = (vision_ip, vision_port)
        self.socket = open_multicast_socket(vision_ip, vision_port)
        self.running = False
        self.thread = None

    def consume(self, wrapper: SSL_WrapperPacket) -> None:
        pass

    def send(self, wrapper: SSL_WrapperPacket) -> None:
        self.socket.sendto(wrapper.SerializeToString(), self.address)

    def _receive(self):
        while self.running:
            data = self.socket.recv(65536)
            if not self.running and not data:
                return
            if not data:
                continue
            wrapper = SSL_WrapperPacket()
            try:
                wrapper.ParseFromString(data)
            except Exception:
                continue
            self.consume(wrapper)

    def __enter__(self):
        self.running = True
        self.thread = threading.Thread(target=self._receive, name="vision-recv")
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.running = False
        self.socket.sendto(b"", self.address)
        self.thread.join()


class VisionRecorder(VisionSocket):
    """Captures every wrapper packet seen between __enter__ and __exit__."""

    def __init__(self, vision_ip="224.5.23.2", vision_port=10006, args=None):
        super().__init__(vision_ip, vision_port, args)
        self.packets: list[SSL_WrapperPacket] = []

    def subfield(self, field: str) -> list:
        return [getattr(p, field) for p in self.packets if p.HasField(field)]

    def dict_subfield(self, field: str) -> list[dict]:
        return [
            MessageToDict(m, preserving_proto_field_name=True)
            for m in self.subfield(field)
        ]

    def __enter__(self):
        self.packets.clear()
        return super().__enter__()

    def consume(self, wrapper: SSL_WrapperPacket) -> None:
        self.packets.append(wrapper)
