#!/usr/bin/env python3
"""Follow wrapper-service websocket topics from the command line.

Subscribes to one or more topics on the operator service's ``/ws``
endpoint (wrapper_backend/websocket.py) and streams each message to
stdout, prefixed with the topic and an arrival timestamp so interleaved
topics stay readable.  Reconnects with backoff when the service
restarts, which is the normal operator workflow during bring-up.

Examples::

    python python/ws_tail.py                          # wrapper_packet.out
    python python/ws_tail.py detection.in geometry.in # two topics
    python python/ws_tail.py -1 --compact             # one message, one line

Reference parity: the upstream repo ships a minimal one-topic tailer
(reference python/ws_tail.py); this version covers the same role for the
wrapper service here (multi-topic, reconnect, bounded follow).
"""
from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time

DEFAULT_TOPICS = ("wrapper_packet.out",)


class TopicTail:
    """Stream messages for a set of topics, surviving service restarts."""

    def __init__(self, endpoint: str, topics: tuple[str, ...],
                 compact: bool, limit: int | None):
        self.endpoint = endpoint
        self.topics = topics
        self.compact = compact
        self.remaining = limit
        self._t0 = time.monotonic()

    def _emit(self, payload: bytes | str) -> bool:
        """Print one message; returns False once the limit is exhausted."""
        try:
            body = json.loads(payload)
        except (ValueError, TypeError):
            body = {"raw": repr(payload)}
        topic = body.get("topic", "?") if isinstance(body, dict) else "?"
        stamp = f"+{time.monotonic() - self._t0:8.3f}s"
        if self.compact:
            line = json.dumps(body, separators=(",", ":"))
            print(f"{stamp} [{topic}] {line}")
        else:
            print(f"{stamp} [{topic}]")
            print(json.dumps(body, indent=2))
        sys.stdout.flush()
        if self.remaining is not None:
            self.remaining -= 1
            return self.remaining > 0
        return True

    async def run(self) -> None:
        from websockets.asyncio.client import connect

        backoff = 0.5
        while True:
            try:
                async with connect(self.endpoint) as sock:
                    backoff = 0.5
                    for topic in self.topics:
                        await sock.send(json.dumps(
                            {"action": "subscribe", "topic": topic}))
                    async for message in sock:
                        if not self._emit(message):
                            return
            except (OSError, ConnectionError) as exc:
                print(f"ws_tail: {exc!r}; retrying in {backoff:.1f}s",
                      file=sys.stderr)
                await asyncio.sleep(backoff)
                backoff = min(backoff * 2, 5.0)


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    ap = argparse.ArgumentParser(
        description="Tail wrapper websocket topics.")
    ap.add_argument("topics", nargs="*", default=list(DEFAULT_TOPICS),
                    help="topics to subscribe (default: wrapper_packet.out)")
    ap.add_argument("--host", default="127.0.0.1",
                    help="wrapper service host")
    ap.add_argument("--port", type=int, default=8765,
                    help="wrapper service port")
    ap.add_argument("--url", default=None,
                    help="full ws:// endpoint (overrides --host/--port)")
    ap.add_argument("-n", "--count", type=int, default=None, metavar="N",
                    help="exit after N messages")
    ap.add_argument("-1", dest="one", action="store_true",
                    help="shorthand for --count 1")
    ap.add_argument("--compact", action="store_true",
                    help="one line per message instead of pretty JSON")
    return ap.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    try:
        import websockets  # noqa: F401
    except ImportError:
        print("ws_tail: the `websockets` package is not installed",
              file=sys.stderr)
        return 2
    endpoint = args.url or f"ws://{args.host}:{args.port}"
    limit = 1 if args.one else args.count
    tail = TopicTail(endpoint, tuple(args.topics), args.compact, limit)
    try:
        asyncio.run(tail.run())
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
