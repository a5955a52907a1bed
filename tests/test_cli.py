"""End-to-end CLI pipeline on a synthetic micro-KITTI dataset:
attack -> predict/export -> convert -> plan -> collision -> eval."""
import json
import math
import os
import subprocess
import sys

import numpy as np
import pytest

from eval_driving_safety_tpu.data.kitti import (Calibration, KittiObject,
                                                save_image, write_label)

# PYTHONPATH=/root/repo (not the axon site dir): keeps the package
# importable from any cwd while dropping the TPU-registering sitecustomize
ENV = {**os.environ, "PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu"}


def run_cli(module, *args, cwd=None):
    cmd = [sys.executable, "-m", f"eval_driving_safety_tpu.cli.{module}",
           *args]
    r = subprocess.run(cmd, capture_output=True, text=True, env=ENV,
                       cwd=cwd or "/root/repo", timeout=1200)
    assert r.returncode == 0, f"{module} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.RandomState(0)
    calib = Calibration.default(f_u=200.0, c_u=160.0, c_v=48.0)
    for d in ("image_2", "image_3", "calib", "label_2"):
        os.makedirs(root / d)
    for fid in ("000001", "000002"):
        img = rng.rand(96, 320, 3).astype(np.float32)
        save_image(str(root / "image_2" / f"{fid}.png"), img)
        save_image(str(root / "image_3" / f"{fid}.png"), img)
        with open(root / "calib" / f"{fid}.txt", "w") as f:
            f.write("P2: " + " ".join(str(v) for v in calib.P2.ravel()) + "\n")
            f.write("P3: " + " ".join(str(v) for v in calib.P3.ravel()) + "\n")
        obj = KittiObject(
            type="Car", truncated=0, occluded=0, alpha=0.1,
            bbox=np.array([140.0, 40.0, 180.0, 70.0]),
            dimensions=np.array([1.5, 1.7, 4.0]),
            location=np.array([0.5, 1.6, 12.0]), rotation_y=math.pi / 2)
        write_label(str(root / "label_2" / f"{fid}.txt"), [obj])
    return root


@pytest.mark.slow
def test_pgd_attack_cli_dsgn(kitti_root, tmp_path):
    out = tmp_path / "adv"
    run_cli("pgd_attack", "--detector", "dsgn", "--tiny",
            "--data_path", str(kitti_root), "--iter", "2",
            "--out_prefix", str(out / "dsgn_pgd"), "--debug",
            "--debugnum", "1")
    for k in (0, 1, 2):
        p = out / f"dsgn_pgd_iters_{k}" / "image_2" / "000001.png"
        assert p.exists(), f"missing {p}"
    # attacked image differs from clean, bounded perturbation
    from eval_driving_safety_tpu.data.kitti import load_image
    clean = load_image(str(out / "dsgn_pgd_iters_0/image_2/000001.png"))
    adv = load_image(str(out / "dsgn_pgd_iters_2/image_2/000001.png"))
    delta = np.abs(adv - clean).max()
    assert 0 < delta <= 0.3 + 2 / 255


@pytest.mark.slow
def test_pgd_attack_cli_transfer_modes_identical(kitti_root, tmp_path):
    """--transfer signs (2-bit packed signs + host replay, the default)
    writes BYTE-IDENTICAL sweep PNGs to --transfer full (quantized device
    iterates) — the bit-exactness contract of attack.pgd.replay_pgd at the
    CLI surface."""
    outs = {}
    for mode in ("signs", "full"):
        out = tmp_path / mode
        run_cli("pgd_attack", "--detector", "dsgn", "--tiny",
                "--data_path", str(kitti_root), "--iter", "2",
                "--transfer", mode,
                "--out_prefix", str(out / "dsgn_pgd"), "--debug",
                "--debugnum", "1")
        outs[mode] = out
    for k in (0, 1, 2):
        for sub in ("image_2", "image_3"):
            a = outs["signs"] / f"dsgn_pgd_iters_{k}" / sub / "000001.png"
            b = outs["full"] / f"dsgn_pgd_iters_{k}" / sub / "000001.png"
            from eval_driving_safety_tpu.data.kitti import load_image
            assert np.array_equal(load_image(str(a)), load_image(str(b))), \
                f"iter {k} {sub} differs between transfer modes"


@pytest.mark.slow
def test_predict_cli_dsgn_with_ap(kitti_root, tmp_path):
    res = tmp_path / "results"
    out = run_cli("predict_and_save", "--detector", "dsgn", "--tiny",
                  "--data_path", str(kitti_root),
                  "--result_dir", str(res), "--eval_ap")
    assert (res / "data" / "000001.txt").exists()
    assert "AP (Car" in out


def test_safety_cli_chain(kitti_root, tmp_path):
    scen = tmp_path / "scenarios"
    sol = tmp_path / "solutions"
    run_cli("convert_scenarios", "--input_folder",
            str(kitti_root / "label_2"), "--output_folder", str(scen))
    assert (scen / "000001.xml").exists()
    out = run_cli("plan_motion", "--input_folder", str(scen),
                  "--output_folder", str(sol))
    assert "solved 2/2" in out
    out = run_cli("check_collision", "--check_all",
                  "--scenario_path", str(scen) + "/",
                  "--solution_path", str(sol) + "/", cwd=str(tmp_path))
    assert "collision rate" in out
    assert (tmp_path / "collision.txt").exists()
    out = run_cli("eval", "--scenario_path", str(scen),
                  "--solution_path", str(sol), "--json")
    m = json.loads(out.strip().splitlines()[-1])
    assert m["num_scenarios"] == 2 and m["num_solutions"] == 2
    assert m["success_rate"] == 1.0
    # plot one solution
    png = tmp_path / "plot.png"
    solname = os.listdir(sol)[0]
    run_cli("plot_scenario", "--scenario_path", str(scen / "000001.xml"),
            "--solution_path", str(sol / solname), "--output", str(png))
    assert png.stat().st_size > 1000


def test_gt_convert_cli(kitti_root, tmp_path):
    labeled = tmp_path / "kitti_labeled"
    os.makedirs(labeled / "static_label")
    os.makedirs(labeled / "dynamic_label")
    os.makedirs(labeled / "dynamic_annotation")
    import shutil
    shutil.copy(kitti_root / "label_2" / "000001.txt",
                labeled / "static_label" / "000001.txt")
    shutil.copy(kitti_root / "label_2" / "000002.txt",
                labeled / "dynamic_label" / "000002.txt")
    with open(labeled / "dynamic_annotation" / "000002.txt", "w") as f:
        f.write("1\n")
    out_dir = tmp_path / "gt_scen"
    run_cli("convert_gt_scenarios", "--input_folder", str(labeled) + "/",
            "--output_folder", str(out_dir))
    assert (out_dir / "000001.xml").exists()
    assert (out_dir / "000002.xml").exists()
    from eval_driving_safety_tpu.safety.commonroad_io import read_scenario
    sc = read_scenario(str(out_dir / "000002.xml"))
    assert len(sc.dynamic_obstacles) == 1
    assert len(sc.dynamic_obstacles[0].trajectory.states) == 19


@pytest.mark.slow
def test_pgd_attack_cli_sharded_over_mesh(kitti_root, tmp_path):
    """Batch 2 over 2 forced virtual devices: the CLI shards the batch and
    the SPMD-partitioned attack still writes both frames' outputs."""
    out = tmp_path / "adv8"
    cmd = [sys.executable, "-m", "eval_driving_safety_tpu.cli.pgd_attack",
           "--detector", "dsgn", "--tiny", "--data_path", str(kitti_root),
           "--iter", "1", "--batch", "2", "--out_prefix", str(out / "p")]
    env = {**ENV,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=1200)
    assert r.returncode == 0, r.stderr[-800:]
    assert (out / "p_iters_1" / "image_2" / "000001.png").exists()
    assert (out / "p_iters_1" / "image_2" / "000002.png").exists()


@pytest.mark.slow
@pytest.mark.medium
def test_pgd_attack_cli_srcnn_transfer_modes_identical(kitti_root, tmp_path):
    """SRCNN --transfer signs (exact u8 ingest + sign replay) writes
    byte-identical sweep PNGs to --transfer full (device-quantized
    iterates) — the BGR01 attack-space bit-exactness contract."""
    outs = {}
    for mode in ("signs", "full"):
        out = tmp_path / mode
        run_cli("pgd_attack", "--detector", "srcnn", "--tiny",
                "--data_path", str(kitti_root), "--iter", "2",
                "--transfer", mode, "--out_prefix", str(out / "p"),
                "--debug", "--debugnum", "1")
        outs[mode] = out
    from eval_driving_safety_tpu.data.kitti import load_image
    for k in (0, 1, 2):
        for sub in ("image_2", "image_3"):
            a = outs["signs"] / f"p_iters_{k}" / sub / "000001.png"
            b = outs["full"] / f"p_iters_{k}" / sub / "000001.png"
            assert np.array_equal(load_image(str(a)), load_image(str(b))), \
                f"iter {k} {sub} differs between transfer modes"


@pytest.mark.slow
def test_pgd_attack_cli_srcnn(kitti_root, tmp_path):
    out = tmp_path / "srcnn_adv"
    run_cli("pgd_attack", "--detector", "srcnn", "--tiny",
            "--data_path", str(kitti_root), "--iter", "1",
            "--out_prefix", str(out / "p"), "--debug", "--debugnum", "1")
    from eval_driving_safety_tpu.data.kitti import load_image
    clean = load_image(str(out / "p_iters_0/image_2/000001.png"))
    adv = load_image(str(out / "p_iters_1/image_2/000001.png"))
    # images are written at NETWORK scale (96-height tiny config)
    assert clean.shape[0] == 96
    assert np.abs(adv - clean).max() > 0


@pytest.mark.slow
def test_train_detector_cli_both_detectors(kitti_root, tmp_path):
    """1-epoch tiny training for both detectors: masked optimizer runs,
    checkpoints land, and predict consumes the srcnn checkpoint."""
    dsgn_dir = tmp_path / "ck_dsgn"
    run_cli("train_detector", "--detector", "dsgn", "--tiny",
            "--data_path", str(kitti_root), "--epochs", "1", "--batch", "1",
            "--ckpt_dir", str(dsgn_dir), "--ckpt_every", "1")
    assert (dsgn_dir / "epoch1").exists()

    srcnn_dir = tmp_path / "ck_srcnn"
    out = run_cli("train_detector", "--detector", "srcnn", "--tiny",
                  "--data_path", str(kitti_root), "--epochs", "1",
                  "--batch", "1", "--ckpt_dir", str(srcnn_dir),
                  "--ckpt_every", "1", "--debug", "--debugnum", "1")
    assert (srcnn_dir / "epoch1").exists()
    assert "uncert" in out
    # FrozenBatchNorm statistics must be untouched by the optimizer
    import numpy as np

    from eval_driving_safety_tpu.utils.checkpoint import restore_checkpoint
    ck = restore_checkpoint(str(srcnn_dir / "epoch1"))
    var_leaf = ck["params"]["backbone"]["stem_bn"]["var"]
    np.testing.assert_allclose(np.asarray(var_leaf), 1.0)  # init value

    # the trainer checkpoint feeds predict directly
    res = tmp_path / "res_trained"
    run_cli("predict_and_save", "--detector", "srcnn", "--tiny",
            "--data_path", str(kitti_root), "--result_dir", str(res),
            "--ckpt", str(srcnn_dir / "epoch1"), "--debug", "--debugnum",
            "1")
    assert (res / "data" / "000001.txt").exists()


def test_classify_split_bridge_and_chain(kitti_root, tmp_path):
    """L4 -> L5 bridge (VERDICT.md missing #5): classify_split materializes
    the kitti_labeled folder structure and the converters + planner consume
    it. Without checkpoints every frame is street / every vehicle static."""
    out = tmp_path / "pred_labeled"
    run_cli("classify_split", "--data_path", str(kitti_root),
            "--out_dir", str(out))
    assert sorted(os.listdir(out / "dynamic_label")) == ["000001.txt",
                                                         "000002.txt"]
    assert os.listdir(out / "road_dynamic_label") == []
    codes = (out / "dynamic_annotation" / "000001.txt").read_text().split()
    assert codes == ["0"]                    # the fixture's single Car line
    scen = tmp_path / "scen_bridge"
    sol = tmp_path / "sol_bridge"
    run_cli("convert_gt_scenarios", "--input_folder", str(out) + "/",
            "--output_folder", str(scen))
    assert (scen / "000001.xml").exists()
    out2 = run_cli("plan_motion", "--input_folder", str(scen),
                   "--output_folder", str(sol))
    assert "solved" in out2


@pytest.mark.slow
def test_classify_split_with_checkpoints(kitti_root, tmp_path):
    """Checkpointed classifiers drive the bucket/code decisions: restore,
    full-image road-type inference, per-vehicle crops."""
    import jax
    import jax.numpy as jnp
    from eval_driving_safety_tpu.models.classifiers import (
        DynamicVehicleClassifier, RoadTypeClassifier)
    from eval_driving_safety_tpu.utils.checkpoint import save_checkpoint

    x = jnp.zeros((1, 224, 224, 3))
    save_checkpoint(str(tmp_path / "road_ck"),
                    RoadTypeClassifier().init(jax.random.PRNGKey(0), x))
    save_checkpoint(str(tmp_path / "dyn_ck"),
                    DynamicVehicleClassifier().init(jax.random.PRNGKey(0), x))
    out = tmp_path / "pred_labeled2"
    run_cli("classify_split", "--data_path", str(kitti_root),
            "--out_dir", str(out),
            "--road_ckpt", str(tmp_path / "road_ck"),
            "--dyn_ckpt", str(tmp_path / "dyn_ck"))
    names = (set(os.listdir(out / "dynamic_label"))
             | set(os.listdir(out / "road_dynamic_label")))
    assert names == {"000001.txt", "000002.txt"}
    for sub in ("dynamic", "road_dynamic"):
        for n in os.listdir(out / f"{sub}_label"):
            codes = (out / f"{sub}_annotation" / n).read_text().split()
            assert len(codes) == 1 and codes[0] in ("0", "1")


@pytest.mark.slow
def test_patch_attack_cli_dsgn(kitti_root, tmp_path):
    """Universal-patch training CLI writes the reference-layout npy and the
    patch moves off its zero init (VERDICT.md weak #4)."""
    sd = tmp_path / "patch_dsgn"
    run_cli("patch_attack", "--detector", "dsgn", "--tiny",
            "--data_path", str(kitti_root), "--epochs", "1", "--iters", "1",
            "--save_dir", str(sd))
    p = sd / "epoch1" / "patch.npy"
    assert p.exists()
    arr = np.load(p)
    assert arr.shape[:2] == (1, 3)          # reference (1,3,d,d) layout
    assert arr.shape[2] == arr.shape[3]
    assert np.abs(arr).max() > 0
    from eval_driving_safety_tpu.attack.patch import load_patch
    lp = np.asarray(load_patch(str(p)))
    np.testing.assert_allclose(lp.transpose(2, 0, 1)[None], arr)


@pytest.mark.slow
def test_patch_attack_cli_srcnn(kitti_root, tmp_path):
    sd = tmp_path / "patch_srcnn"
    run_cli("patch_attack", "--detector", "srcnn", "--tiny",
            "--data_path", str(kitti_root), "--epochs", "1", "--iters", "1",
            "--save_dir", str(sd), "--debug", "--debugnum", "1")
    p = sd / "epoch1" / "patch.npy"
    assert p.exists()
    assert np.abs(np.load(p)).max() > 0


@pytest.mark.slow
def test_predict_cli_patch_placement_modes(kitti_root, tmp_path):
    """predict_and_save --patch_npy composites the patch inside the chosen
    column band (the reference's 4 placement modes,
    predict_and_save_patch.py:361-391)."""
    from eval_driving_safety_tpu.attack.patch import save_patch
    d = 15
    patch_path = tmp_path / "patch.npy"
    save_patch(str(patch_path), np.full((d, d, 3), 10.0, np.float32))
    radius = d // 2
    W = 320
    for mode, lo, hi in (("sp_left", 0.2, 0.4), ("sp_right", 0.6, 0.8)):
        res = tmp_path / f"res_{mode}"
        inp = tmp_path / f"inp_{mode}"
        run_cli("predict_and_save", "--detector", "dsgn", "--tiny",
                "--data_path", str(kitti_root), "--result_dir", str(res),
                "--patch_npy", str(patch_path), "--patch_mode", mode,
                "--save_input_dir", str(inp), "--debug", "--debugnum", "1")
        assert (res / "data" / "000001.txt").exists()
        from eval_driving_safety_tpu.data.kitti import load_image
        img = load_image(str(inp / "image_2" / "000001.png"))
        # the 10.0 patch saturates to 1.0; random background stays < 1
        ys, xs = np.where(img.min(axis=2) >= 0.999)
        assert len(xs) >= (d - 2) ** 2 * 0.5, mode
        assert xs.min() >= int(W * lo) - radius - 1, mode
        assert xs.max() <= int(W * hi) + radius + 1, mode


@pytest.mark.slow
def test_predict_cli_srcnn(kitti_root, tmp_path):
    res = tmp_path / "srcnn_results"
    feat = tmp_path / "srcnn_feats"
    run_cli("predict_and_save", "--detector", "srcnn", "--tiny",
            "--data_path", str(kitti_root), "--result_dir", str(res),
            "--save_feat_dir", str(feat), "--debug", "--debugnum", "1")
    # txt exists (may be empty with random weights) in KITTI format
    p = res / "data" / "000001.txt"
    assert p.exists()
    for line in p.read_text().splitlines():
        assert len(line.split()) == 16     # 15 fields + score
    # activation dumps (reference predict hooks, pgd variant :56-68)
    dumped = list((feat / "000001").glob("*.npy"))
    assert len(dumped) > 5


@pytest.mark.slow
def test_pgd_attack_cli_dsgn_compat_ckpt(kitti_root, tmp_path):
    """--ckpt *.tar routes DSGN through the upstream-compat assembly: the
    published-checkpoint attack path the reference runs
    (/root/reference/attack/DSGN/pgd_attack.py:142-145). Uses a synthetic
    upstream-shaped checkpoint (torch replica from test_dsgn_compat)."""
    torch = pytest.importorskip("torch")
    from test_dsgn_compat import TINY, TDSGNUpstream, _randomize_bn

    tm = TDSGNUpstream(TINY, 4).eval()     # tiny cfg has num_voxels_y=4
    _randomize_bn(tm)
    ckpt = tmp_path / "dsgn_upstream.tar"
    torch.save({"state_dict": {f"module.{k}": v
                               for k, v in tm.state_dict().items()}},
               str(ckpt))

    out = tmp_path / "adv"
    stdout = run_cli("pgd_attack", "--detector", "dsgn", "--tiny",
                     "--data_path", str(kitti_root), "--iter", "1",
                     "--ckpt", str(ckpt),
                     "--out_prefix", str(out / "dsgn_pgd"), "--debug",
                     "--debugnum", "1")
    assert "compat assembly" in stdout
    p = out / "dsgn_pgd_iters_1" / "image_2" / "000001.png"
    assert p.exists()
    from eval_driving_safety_tpu.data.kitti import load_image
    clean = load_image(str(out / "dsgn_pgd_iters_0/image_2/000001.png"))
    adv = load_image(str(p))
    # alpha = 1/255 plus up to 1/255 of png-quantization on each side
    assert 0 < np.abs(adv - clean).max() <= 2.0 / 255 + 1e-5


@pytest.mark.slow
def test_predict_cli_dsgn_compat_ckpt(kitti_root, tmp_path):
    """--ckpt *.tar drives predict/export through the compat assembly:
    thresh->decode->KITTI txt + AP hook, matching the reference's
    published-weights inference path (predict_and_save_pgd.py:161-166)."""
    torch = pytest.importorskip("torch")
    from test_dsgn_compat import TINY, TDSGNUpstream, _randomize_bn

    tm = TDSGNUpstream(TINY, 4).eval()
    _randomize_bn(tm)
    ckpt = tmp_path / "dsgn_upstream.tar"
    torch.save({"state_dict": {f"module.{k}": v
                               for k, v in tm.state_dict().items()}},
               str(ckpt))
    res = tmp_path / "results"
    out = run_cli("predict_and_save", "--detector", "dsgn", "--tiny",
                  "--data_path", str(kitti_root), "--ckpt", str(ckpt),
                  "--result_dir", str(res), "--eval_ap",
                  "--debug", "--debugnum", "1")
    assert "compat assembly" in out
    txt = res / "data" / "000001.txt"
    assert txt.exists()
    for line in open(txt).read().strip().splitlines():
        assert len(line.split()) == 16
    assert "AP" in out or "aos" in out
