#!/usr/bin/env python3
"""Launch low-latency viewers for the per-camera RTP debug streams.

Writes one SDP file per camera and starts mpv (or ffplay as fallback) on it
(reference python/cam_viewer.py). The default payload matches the streamer:
H.264 when ffmpeg is available on the processor side, RTP/JPEG otherwise.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import threading

DIRECTORY = os.path.dirname(os.path.abspath(__file__))


def sdp_text(ip: str, port: int, cam_id: int, codec: str) -> str:
    if codec == "h264":
        media = (
            f"m=video {port} RTP/AVP 96\n"
            "a=rtpmap:96 H264/90000\n"
            "a=fmtp:96 packetization-mode=1"
        )
    else:
        media = f"m=video {port} RTP/AVP 26\na=rtpmap:26 JPEG/90000"
    return (
        "v=0\n"
        f"o=- 0 0 IN IP4 {ip}\n"
        f"s=Cam{cam_id}\n"
        f"c=IN IP4 {ip}\n"
        "t=0 0\n"
        f"{media}\n"
    )


def viewer_loop(path: str):
    player = shutil.which("mpv")
    while True:
        if player:
            subprocess.run(
                [
                    player, path, "--profile=low-latency", "--untimed",
                    "--no-cache-pause", "--no-cache", "--no-osc",
                    "--demuxer-lavf-o=reorder_queue_size=0",
                ]
            )
        else:
            ffplay = shutil.which("ffplay")
            if not ffplay:
                raise SystemExit("neither mpv nor ffplay found")
            subprocess.run(
                [ffplay, "-protocol_whitelist", "file,rtp,udp", "-i", path]
            )


def main():
    parser = argparse.ArgumentParser(prog="cam viewer")
    parser.add_argument("--stream_base_ip", default="224.5.23.100")
    parser.add_argument("--stream_port", type=int, default=10100)
    parser.add_argument("--cameras", type=int, default=1)
    parser.add_argument("--codec", default="jpeg", choices=("jpeg", "h264"))
    args = parser.parse_args()

    for cam_id in range(args.cameras):
        segments = [int(s) for s in args.stream_base_ip.split(".")]
        segments[3] += cam_id
        ip = ".".join(str(s) for s in segments)
        sdp_path = os.path.join(DIRECTORY, f"cam{cam_id}.sdp")
        with open(sdp_path, "w") as fh:
            fh.write(sdp_text(ip, args.stream_port, cam_id, args.codec))
        threading.Thread(
            target=viewer_loop, name=sdp_path, args=(sdp_path,), daemon=False
        ).start()


if __name__ == "__main__":
    main()
