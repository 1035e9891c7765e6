"""End-to-end blob machine test: synthetic Bayer scene -> blob list.

Validates the full jitted graph (demosaic, reprojection, ring response, SAT,
circularity, compaction) recovers every pattern blob and the ball of a
rendered scene at the correct field positions.
"""
import numpy as np
import pytest

from vision_processor_tpu.io.synthetic import (
    Scene,
    SceneBall,
    SceneBot,
    render_raw,
)
from vision_processor_tpu.models.pattern import PATTERN_POS
from vision_processor_tpu.models.perspective import Perspective
from vision_processor_tpu.ops.pipeline import BlobMachine, BlobMachineConfig

MAX_BOT_HEIGHT = 150.0


@pytest.fixture(scope="module")
def setup(divb_field, overhead_model):
    geometry = divb_field.geometry
    persp = Perspective(cam_id=0)
    proto = overhead_model.to_proto(0)
    geometry.ClearField("calib")
    geometry.calib.append(proto)
    ok = persp.update_geometry(
        geometry, 1, int(overhead_model.size[0]), int(overhead_model.size[1]),
        MAX_BOT_HEIGHT, 1.0,
    )
    assert ok
    return persp


@pytest.fixture(scope="module")
def scene():
    return Scene(
        bots=[
            SceneBot(3, "yellow", -2800.0, 600.0, 0.7),
            SceneBot(7, "blue", -1500.0, -900.0, -1.9),
        ],
        balls=[SceneBall(-3400.0, -1500.0)],
        noise_sigma=1.5,
    )


def expected_flat_blobs(persp, scene):
    """Ground-truth blob positions on the flat grid (sampled at bot height)."""
    out = []
    model = persp.model
    for bot in scene.bots:
        rot = np.array(
            [
                [np.cos(bot.orientation), -np.sin(bot.orientation)],
                [np.sin(bot.orientation), np.cos(bot.orientation)],
            ]
        )
        for slot in range(5):
            p = np.array([bot.x, bot.y]) + rot @ PATTERN_POS[slot]
            img = model.field2image(np.array([p[0], p[1], bot.height]))
            flat = persp.field2flat(model.image2field(img, MAX_BOT_HEIGHT)[:2])
            out.append(flat)
    for ball in scene.balls:
        img = model.field2image(np.array([ball.x, ball.y, 0.0]))
        flat = persp.field2flat(model.image2field(img, MAX_BOT_HEIGHT)[:2])
        out.append(flat)
    return np.array(out)


def test_blob_machine_recovers_scene(setup, scene, divb_field):
    persp = setup
    raw = render_raw(persp.model, divb_field.geometry.field, scene, "RGGB")

    cfg = BlobMachineConfig.from_perspective(
        persp, "RGGB", raw.shape, max_blobs=64
    )
    machine = BlobMachine(cfg)
    out = machine(raw, persp.model.packed(), MAX_BOT_HEIGHT, 15.0)

    valid = np.asarray(out["valid"])
    pos = np.asarray(out["pos"])[valid]
    assert valid.sum() >= 11, f"found only {valid.sum()} blobs"

    want = expected_flat_blobs(persp, scene)
    # every expected blob must be matched within 2 flat px (~<12 mm)
    for i, wpos in enumerate(want):
        d = np.linalg.norm(pos - wpos, axis=-1).min()
        assert d < 2.0, f"blob {i} at {wpos} missed (closest {d:.2f} px)"


def test_blob_machine_field_positions(setup, scene, divb_field):
    persp = setup
    raw = render_raw(persp.model, divb_field.geometry.field, scene, "RGGB")
    cfg = BlobMachineConfig.from_perspective(persp, "RGGB", raw.shape, max_blobs=64)
    machine = BlobMachine(cfg)
    out = machine(raw, persp.model.packed(), MAX_BOT_HEIGHT, 15.0)
    valid = np.asarray(out["valid"])
    fpos = np.asarray(out["field_pos"])[valid]
    flat = np.asarray(out["pos"])[valid]
    np.testing.assert_allclose(
        fpos, persp.flat2field(flat), rtol=0, atol=0.5
    )


def test_grbg_format(setup, scene, divb_field):
    persp = setup
    raw = render_raw(persp.model, divb_field.geometry.field, scene, "GRBG")
    cfg = BlobMachineConfig.from_perspective(persp, "GRBG", raw.shape, max_blobs=64)
    machine = BlobMachine(cfg)
    out = machine(raw, persp.model.packed(), MAX_BOT_HEIGHT, 15.0)
    valid = np.asarray(out["valid"])
    assert valid.sum() >= 11
