import numpy as np

from eval_driving_safety_tpu.data import kitti as K


def test_calibration_baseline_and_projection():
    calib = K.Calibration.default()
    np.testing.assert_allclose(calib.baseline, 0.54, atol=1e-6)
    np.testing.assert_allclose(calib.f_u, 721.5377, atol=1e-4)
    # a point on the optical axis at depth z projects near principal point
    pt = np.array([[0.0, 0.0, 10.0]])
    uv = calib.project_rect_to_image(pt)
    w = 10.0 + calib.P2[2, 3]
    np.testing.assert_allclose(
        uv[0, 0], (calib.c_u * 10.0 + calib.P2[0, 3]) / w, atol=1e-3)
    # right-camera projection is shifted left by disparity f*b/z
    uv_r = calib.project_rect_to_image(pt, right=True)
    disp = uv[0, 0] - uv_r[0, 0]
    np.testing.assert_allclose(disp, calib.f_u * 0.54 / w, atol=1e-3)


def test_read_calib(tmp_path):
    p = tmp_path / "000000.txt"
    P2 = "P2: " + " ".join(str(v) for v in
                           [721.5, 0, 609.6, 44.9, 0, 721.5, 172.9, 0.2,
                            0, 0, 1, 0.003])
    P3 = "P3: " + " ".join(str(v) for v in
                           [721.5, 0, 609.6, -339.5, 0, 721.5, 172.9, 0.2,
                            0, 0, 1, 0.003])
    p.write_text(P2 + "\n" + P3 + "\n")
    calib = K.read_calib(str(p))
    np.testing.assert_allclose(calib.baseline, (44.9 + 339.5) / 721.5, atol=1e-5)


def test_label_roundtrip(tmp_path):
    line = ("Car 0.00 0 -1.67 657.39 190.13 700.07 223.39 "
            "1.41 1.58 4.36 3.18 2.27 34.38 -1.58")
    obj = K.KittiObject.from_line(line)
    assert obj.type == "Car"
    np.testing.assert_allclose(obj.location, [3.18, 2.27, 34.38])
    np.testing.assert_allclose(obj.dimensions, [1.41, 1.58, 4.36])
    path = tmp_path / "out.txt"
    K.write_label(str(path), [obj])
    objs = K.read_label(str(path))
    assert len(objs) == 1
    np.testing.assert_allclose(objs[0].bbox, obj.bbox)


def test_detection_writer_contract(tmp_path):
    path = str(tmp_path / "000123.txt")
    K.write_detections(path, [dict(
        type="Car", bbox=np.array([100.0, 150.0, 200.0, 250.0]),
        dimensions=(1.5, 1.6, 3.9), location=(2.0, 1.65, 20.0),
        rotation_y=-1.5, score=0.87654321)])
    text = open(path).read().strip()
    fields = text.split(" ")
    assert fields[0] == "Car"
    assert fields[1] == "-1" and fields[2] == "-1"
    # alpha = -atan2(x, z) + ry
    np.testing.assert_allclose(float(fields[3]),
                               -np.arctan2(2.0, 20.0) - 1.5, atol=1e-4)
    assert len(fields) == 16
    np.testing.assert_allclose(float(fields[15]), 0.87654321, atol=1e-8)
    # parses back as a KITTI object with score
    obj = K.KittiObject.from_line(text)
    assert obj.score is not None


def test_normalization_roundtrip():
    from eval_driving_safety_tpu.config import (IMAGENET_MEAN, IMAGENET_STD,
                                                SRCNN_PIXEL_MEANS_BGR)
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    n = K.normalize_imagenet(img, IMAGENET_MEAN, IMAGENET_STD)
    d = K.denormalize_imagenet(n, IMAGENET_MEAN, IMAGENET_STD)
    np.testing.assert_allclose(d, img, atol=1e-5)
    s = K.rgb01_to_srcnn(img, SRCNN_PIXEL_MEANS_BGR)
    r = K.srcnn_to_rgb01(s, SRCNN_PIXEL_MEANS_BGR)
    np.testing.assert_allclose(r, img, atol=1e-5)


def test_pad_to():
    img = np.ones((10, 20, 3), dtype=np.float32)
    out = K.pad_to(img, 16, 32)
    assert out.shape == (16, 32, 3)
    assert out[:10, :20].min() == 1.0 and out[10:].max() == 0.0
