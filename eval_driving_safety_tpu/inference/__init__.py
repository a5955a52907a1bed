"""Prediction/export layer (L3): postprocessors and KITTI-format exporters."""
