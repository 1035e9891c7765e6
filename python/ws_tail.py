#!/usr/bin/env python3
"""Tail a wrapper-service websocket topic.

Usage: python python/ws_tail.py [--url ws://127.0.0.1:8765] [--topic wrapper_packet.out]
"""
from __future__ import annotations

import argparse
import asyncio
import json


async def _main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default="ws://127.0.0.1:8765")
    parser.add_argument("--topic", default="wrapper_packet.out")
    args = parser.parse_args()

    try:
        from websockets.asyncio.client import connect
    except ImportError:
        raise SystemExit("ws_tail requires the `websockets` package")

    async with connect(args.url) as ws:
        await ws.send(json.dumps({"action": "subscribe", "topic": args.topic}))
        async for raw in ws:
            print(json.dumps(json.loads(raw), indent=2))


if __name__ == "__main__":
    asyncio.run(_main())
