"""Run the geometry wrapper service.

Usage: python -m wrapper_backend [--geometry geometry.yml] [--http_port 8765]
"""
from __future__ import annotations

import argparse
import asyncio
import logging
from pathlib import Path

from .service import amain


def main() -> None:
    parser = argparse.ArgumentParser(prog="wrapper_backend")
    parser.add_argument("--geometry", default="geometry.yml", type=Path)
    parser.add_argument("--vision_ip", default="224.5.23.2")
    parser.add_argument("--vision_port", default=10006, type=int)
    parser.add_argument("--http_port", default=8765, type=int)
    parser.add_argument("--img_dir", default="img", type=Path)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    asyncio.run(
        amain(
            args.geometry,
            args.vision_ip,
            args.vision_port,
            args.http_port,
            args.img_dir,
        )
    )


if __name__ == "__main__":
    main()
