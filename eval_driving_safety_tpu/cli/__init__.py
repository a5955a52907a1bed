"""Stage CLIs mirroring the reference's script-per-stage workflow.

Every stage is runnable as `python -m eval_driving_safety_tpu.cli.<stage>`;
on-disk contracts (attacked image dirs, patch npy, KITTI label txts,
CommonRoad XMLs, collision.txt) match the reference so stages interoperate
with its tooling (SURVEY.md §1: the L2->L3->L5->L6 filesystem handoffs).
"""
