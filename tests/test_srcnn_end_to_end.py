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
import time

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


BUSY_TAGS = ("DEADLINE_EXCEEDED", "UNAVAILABLE", "remote_compile",
             "RESOURCE_EXHAUSTED")


def _probe_accelerator():
    """-> "tpu"/"cpu"/..., "busy" if backend init timed out (a shared chip
    mid-compile blocks jax.devices()), or None if init failed outright."""
    try:
        # 60 s: a healthy tunnel initializes in ~10-20 s; when the shared
        # chip is mid-compile for another process, init blocks — treat as
        # busy quickly instead of stalling the fast tier
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, env=_clean_env(), timeout=60)
    except subprocess.TimeoutExpired:
        return "busy"
    if probe.returncode != 0:
        return None
    return probe.stdout.strip().splitlines()[-1] if probe.stdout else None


def test_accelerator_smoke():
    """Seconds-long jit on the DEFAULT backend — keeps the accelerator path
    minimally exercised in every suite run even when the long e2e below
    skips for contention (VERDICT r2 weak #4)."""
    platform = _probe_accelerator()
    if platform is None:
        pytest.skip("no accelerator: default backend failed to initialize")
    if platform == "busy":
        pytest.skip("accelerator BUSY (backend init timed out; chip shared)")
    code = (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)\n"
        "y = jax.jit(lambda a: (a @ a.T).sum())(x)\n"
        "print('SMOKE', float(y), jax.devices()[0].platform)\n")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, env=_clean_env(),
                           timeout=300)
    except subprocess.TimeoutExpired:
        pytest.skip("accelerator BUSY during smoke (timeout; chip shared)")
    if r.returncode != 0 and any(t in r.stderr for t in BUSY_TAGS):
        pytest.skip("accelerator busy during smoke: " + r.stderr[-200:])
    assert r.returncode == 0, r.stderr[-1000:]
    assert "SMOKE" in r.stdout


@pytest.mark.slow
@pytest.mark.medium
def test_overfit_detects_planted_car_and_pgd_degrades_it():
    platform = _probe_accelerator()
    if platform is None:
        pytest.skip("no accelerator: default backend failed to initialize")
    if platform == "busy":
        pytest.skip("accelerator BUSY (backend init timed out; chip shared)")
    if platform == "cpu":
        pytest.skip("no accelerator attached (cpu-only host): ~2000 "
                    "training steps are minutes on a TPU chip but hours "
                    "on this host's CPU")

    driver = os.path.join(os.path.dirname(__file__), "srcnn_e2e_driver.py")
    r = None
    for attempt in range(3):                      # retry/backoff: the chip
        try:
            r = subprocess.run([sys.executable, driver],
                               capture_output=True, text=True,
                               env=_clean_env(), timeout=3000)
        except subprocess.TimeoutExpired:
            pytest.skip("accelerator BUSY: e2e driver timed out "
                        f"(attempt {attempt + 1}; chip shared)")
        if r.returncode == 0:
            break
        if not any(tag in r.stderr for tag in (
                "Unable to initialize backend",) + BUSY_TAGS):
            break                                 # a real failure: assert it
        if attempt < 2:                           # no backoff after the
            time.sleep(30 * (attempt + 1))        # final attempt
    if r.returncode != 0 and any(tag in r.stderr for tag in (
            "Unable to initialize backend",) + BUSY_TAGS):
        pytest.skip("accelerator BUSY after 3 attempts (distinct from "
                    "no-hardware; see test_accelerator_smoke): "
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
