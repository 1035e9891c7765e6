"""Production-scale multichip parity on the virtual 8-device CPU mesh
(VERDICT r3 item 5): bench-resolution cameras (1080p Bayer), the full
production blob budget (max_blobs=2000), rendered scenes with robots and
balls, per-camera tunables differing across the mesh, one camera in
outage — every camera's mesh outputs must match the single-chip path bit
for bit. The check itself lives in __graft_entry__.py
(run_production_parity_check) so the driver's multichip dryrun runs the
identical assertion."""
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

pytestmark = pytest.mark.skipif(
    os.environ.get("VPTPU_SKIP_SLOW") == "1", reason="slow integration"
)


def test_production_mesh_parity_8_devices():
    import jax

    devices = jax.devices()
    assert len(devices) >= 8, "conftest provides 8 virtual CPU devices"

    from __graft_entry__ import run_production_parity_check

    run_production_parity_check(devices[:8])
