"""Pipeline-independent proof of the medium-profile ball recall floor
(VERDICT r3 item 4): the reference's own ball color-score formula
(reference src/blobs/hypothesis.cpp:83-94), evaluated at the TRUE ball
position straight from the perturbed pixels with the reference-bootstrap
color table, rejects the ~3 px ball in every medium-profile frame — so the
loss-only ball bar in tests/test_perturbation.py is inherent to the
reference's scoring at that blur level, not an implementation gap. The
light and moderate profiles keep a positive margin, which is why they
carry the meaningful (>=0.5) recall gates."""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "python"))

pytestmark = pytest.mark.skipif(
    os.environ.get("VPTPU_SKIP_SLOW") == "1", reason="slow integration"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("balldet")
    subprocess.run(
        [sys.executable, str(REPO / "python" / "make_dataset.py"),
         "--out", str(tmp / "data"), "--cams", "2", "--frames", "6"],
        check=True, cwd=str(REPO / "python"),
        env={**os.environ, "PYTHONPATH": str(REPO)}, capture_output=True,
    )
    return tmp


def _perturbed(tmp, profile):
    out = tmp / f"pert_{profile}"
    if not out.exists():
        subprocess.run(
            [sys.executable, str(REPO / "python" / "perturb.py"),
             "--data", str(tmp / "data"), "--out", str(out),
             "--profile", profile],
            check=True, cwd=str(REPO / "python"),
            env={**os.environ, "PYTHONPATH": str(REPO)}, capture_output=True,
        )
    return out / "synthetic" / "cam0"


def test_medium_ball_is_formula_undetectable(dataset):
    """At medium degradation the reference formula scores the true ball
    position at/below min_confidence in (nearly) every frame — the
    documented floor for the loss-only gate."""
    from ball_detectability import ball_scores_for_scene

    scores, n_above = ball_scores_for_scene(_perturbed(dataset, "medium"))
    assert len(scores) == 6
    assert n_above <= 1, (
        f"medium-profile ball unexpectedly detectable: {scores} — "
        "revisit the loss-only bar in test_perturbation.py"
    )


def test_light_ball_keeps_color_margin(dataset):
    """The light profile keeps a positive orange margin at the true ball
    position in most frames — the >=0.5 recall gate is meaningful."""
    from ball_detectability import ball_scores_for_scene

    scores, n_above = ball_scores_for_scene(_perturbed(dataset, "light"))
    assert len(scores) == 6
    assert n_above >= 3, f"light-profile margin collapsed: {scores}"
