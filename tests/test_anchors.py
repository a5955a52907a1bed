"""Anchor generation: counts, ordering, area preservation, centering."""
import numpy as np

from eval_driving_safety_tpu.ops.anchors import (base_anchors,
                                                 fpn_feat_shapes,
                                                 pyramid_anchors)


def test_base_anchors_area_and_center():
    b = base_anchors(64.0, (0.5, 1.0, 2.0))
    assert b.shape == (3, 4)
    for row, r in zip(b, (0.5, 1.0, 2.0)):
        w = row[2] - row[0] + 1
        h = row[3] - row[1] + 1
        # area preserved per ratio (rounded), aspect matches ratio
        assert abs(w * h - 64 * 64) / (64 * 64) < 0.06
        assert abs(h / w - r) < 0.1
        # centered at origin
        np.testing.assert_allclose(row[0] + row[2], 0.0, atol=1e-5)
        np.testing.assert_allclose(row[1] + row[3], 0.0, atol=1e-5)


def test_fpn_feat_shapes_ceil():
    assert fpn_feat_shapes(600, 1984, (4, 8, 16, 32, 64)) == (
        (150, 496), (75, 248), (38, 124), (19, 62), (10, 31))


def test_pyramid_anchor_count_and_order():
    shapes = ((2, 3), (1, 2))
    anc = pyramid_anchors(shapes, (4, 8), (16.0, 32.0), (0.5, 1.0, 2.0))
    assert anc.shape == ((2 * 3 + 1 * 2) * 3, 4)
    # flattening is (row, col, anchor): anchors 0..2 share the first cell
    c0 = (anc[0] + anc[0][[2, 3, 0, 1]]) / 2      # center of anchor 0
    c2 = (anc[2] + anc[2][[2, 3, 0, 1]]) / 2
    np.testing.assert_allclose(c0, c2, atol=1e-5)
    # cell centers advance by the stride along the row
    cx0 = (anc[0][0] + anc[0][2]) / 2
    cx3 = (anc[3][0] + anc[3][2]) / 2
    np.testing.assert_allclose(cx3 - cx0, 4.0, atol=1e-5)
