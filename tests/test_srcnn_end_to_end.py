"""Stereo R-CNN full-story test (VERDICT.md missing #3): overfit a tiny
SRCNN on a synthetic planted-car stereo scene until it DETECTS the car,
then PGD-attack the trained model and verify the detection degrades.

This is the framework's working-weights path for Stereo R-CNN (the
reference relies on a published checkpoint; here the same joint
(network, uncert) descent cli.train_detector uses mints weights from
scratch). The heavy lifting runs in tests/srcnn_e2e_driver.py in a
subprocess on the DEFAULT accelerator (~2000 fwd+bwd steps: minutes on a
TPU chip, hours on this host's CPU — skipped when only CPU is available).
"""
import json
import os
import subprocess
import sys

import pytest


def _clean_env():
    """Default-accelerator env: drop only the suite's virtual-mesh
    XLA_FLAGS and APPEND the repo to PYTHONPATH (replacing it would drop
    the accelerator plugin's site dir and silently fall back to CPU)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep
                         + "/root/repo").lstrip(os.pathsep)
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.slow
def test_overfit_detects_planted_car_and_pgd_degrades_it():
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, env=_clean_env(), timeout=300)
    platform = probe.stdout.strip().splitlines()[-1] if probe.stdout else ""
    if probe.returncode != 0 or platform == "cpu":
        pytest.skip("needs an accelerator: ~2000 training steps are minutes"
                    " on a TPU chip but hours on this host's CPU")

    driver = os.path.join(os.path.dirname(__file__), "srcnn_e2e_driver.py")
    r = subprocess.run([sys.executable, driver], capture_output=True,
                       text=True, env=_clean_env(), timeout=3000)
    if r.returncode != 0 and any(tag in r.stderr for tag in (
            "Unable to initialize backend", "DEADLINE_EXCEEDED",
            "UNAVAILABLE", "remote_compile")):
        pytest.skip("accelerator unavailable/busy during the run: "
                    + r.stderr[-300:])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["ok"], out

    # the overfit model found the planted car
    assert out["clean_score"] >= 0.5
    assert out["clean_iou"] > 0.3

    # PGD ascends the 6-term loss within the pixel-space eps ball
    losses = out["attack_losses"]
    assert losses[-1] > losses[0] + 10.0, losses
    assert out["max_delta"] <= 255.0 * 0.3 + 1e-3

    # and the detection degrades on the attacked pair
    assert out["adv_score"] < out["clean_score"] - 0.1, out
