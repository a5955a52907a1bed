"""Attack layer (L2): model-agnostic PGD and universal-patch engines."""
from eval_driving_safety_tpu.attack.pgd import pgd_attack, PGDResult  # noqa: F401
from eval_driving_safety_tpu.attack.patch import (  # noqa: F401
    circular_mask,
    composite_patch,
    composite_patch_batch,
    sample_patch_centers,
    patch_update_step,
    init_patch,
    save_patch,
    load_patch,
)
