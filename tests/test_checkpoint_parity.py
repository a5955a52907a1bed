"""Published-checkpoint detection-parity run (the north-star 0.5%-AP
contract, SURVEY.md §6).

Neither KITTI nor the published weights ship in this image, so this module
is the *documented run path*, activated by environment variables:

  KITTI_ROOT=/path/to/KITTI/object/training \\
  SRCNN_CKPT=/path/to/models_stereo/stereo_rcnn_12_6477.pth \\
  SRCNN_REF_AP=<reference AP (Car, moderate, R40, 3D) as a fraction> \\
  DSGN_CKPT=/path/to/DSGN_car_pretrained.tar \\
  DSGN_REF_AP=<reference AP for DSGN, same convention> \\
  python -m pytest tests/test_checkpoint_parity.py -v

Flow: import the published torch checkpoint (utils.torch_import, full tree
— zero unmapped keys asserted), run clean Stereo R-CNN inference + KITTI
export over the val split (cli.predict_and_save), score with the in-repo
R40 evaluator, and assert |AP - reference| <= 0.5% absolute. The same CLI
surface works by hand:

  python -m eval_driving_safety_tpu.cli.predict_and_save --detector srcnn \\
      --data_path $KITTI_ROOT --split_file val.txt \\
      --ckpt $SRCNN_CKPT --result_dir results_clean --eval_ap
"""
import os
import subprocess
import sys

import pytest

KITTI = os.environ.get("KITTI_ROOT")
CKPT = os.environ.get("SRCNN_CKPT")
REF_AP = os.environ.get("SRCNN_REF_AP")
DSGN_CKPT = os.environ.get("DSGN_CKPT")
DSGN_REF_AP = os.environ.get("DSGN_REF_AP")

pytestmark = pytest.mark.skipif(
    not (KITTI and (CKPT or DSGN_CKPT)),
    reason="set KITTI_ROOT and SRCNN_CKPT/DSGN_CKPT to run the parity "
           "contract")
needs_srcnn = pytest.mark.skipif(not CKPT, reason="set SRCNN_CKPT")
needs_dsgn = pytest.mark.skipif(not DSGN_CKPT, reason="set DSGN_CKPT")


@pytest.mark.slow
@needs_srcnn
def test_published_srcnn_checkpoint_imports_fully():
    from eval_driving_safety_tpu.utils.torch_import import (
        import_stereo_rcnn, load_torch_state_dict)
    sd, uncert = load_torch_state_dict(CKPT)
    imported = import_stereo_rcnn(sd)
    assert imported["unmapped"] == [], (
        "published checkpoint keys the converter did not map: "
        f"{imported['unmapped']}")
    assert uncert is not None and uncert.shape == (6,)


@pytest.mark.slow
@needs_srcnn
def test_clean_detection_ap_within_half_percent(tmp_path):
    res = tmp_path / "results"
    cmd = [sys.executable, "-m",
           "eval_driving_safety_tpu.cli.predict_and_save",
           "--detector", "srcnn", "--data_path", KITTI,
           "--ckpt", CKPT, "--result_dir", str(res)]
    split = os.path.join(KITTI, "..", "val.txt")
    if os.path.exists(split):
        cmd += ["--split_file", split]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=14400,
                       env={**os.environ, "PYTHONPATH": "/root/repo"})
    assert r.returncode == 0, r.stderr[-2000:]

    from eval_driving_safety_tpu.evalap.kitti_ap import evaluate_folders
    ap = evaluate_folders(os.path.join(KITTI, "label_2"),
                          str(res / "data"))["ap_3d"]
    assert ap > 0.0
    if REF_AP:
        assert abs(ap - float(REF_AP)) <= 0.005, (
            f"AP {ap:.4f} vs reference {REF_AP} exceeds the 0.5% contract")


@pytest.mark.slow
@needs_dsgn
def test_published_dsgn_checkpoint_imports_fully():
    """The published DSGN .tar (loaded by the reference at
    /root/reference/attack/DSGN/pgd_attack.py:142-145) maps onto the compat
    assembly with zero unmapped keys. If the real checkpoint's layout drifts
    from the spec pinned by tests/test_dsgn_compat.py, this prints exactly
    which keys the converter missed."""
    from eval_driving_safety_tpu.utils.torch_import import (
        import_dsgn, load_torch_state_dict)
    sd, _ = load_torch_state_dict(DSGN_CKPT)
    imported = import_dsgn(sd)
    assert imported["unmapped"] == [], (
        "published DSGN keys the converter did not map: "
        f"{imported['unmapped'][:40]}")


@pytest.mark.slow
@needs_dsgn
def test_dsgn_clean_detection_ap_within_half_percent(tmp_path):
    res = tmp_path / "results_dsgn"
    cmd = [sys.executable, "-m",
           "eval_driving_safety_tpu.cli.predict_and_save",
           "--detector", "dsgn", "--data_path", KITTI,
           "--ckpt", DSGN_CKPT, "--result_dir", str(res)]
    split = os.path.join(KITTI, "..", "val.txt")
    if os.path.exists(split):
        cmd += ["--split_file", split]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=14400,
                       env={**os.environ, "PYTHONPATH": "/root/repo"})
    assert r.returncode == 0, r.stderr[-2000:]

    from eval_driving_safety_tpu.evalap.kitti_ap import evaluate_folders
    ap = evaluate_folders(os.path.join(KITTI, "label_2"),
                          str(res / "data"))["ap_3d"]
    assert ap > 0.0
    if DSGN_REF_AP:
        assert abs(ap - float(DSGN_REF_AP)) <= 0.005, (
            f"AP {ap:.4f} vs reference {DSGN_REF_AP} exceeds the 0.5% "
            "contract")
