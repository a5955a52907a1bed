"""Scene-semantics classifiers: road-type and dynamic-vehicle (Flax+optax).

Capability parity:
* road-type ("driving constraint") classifier — frozen ResNet-50 backbone,
  head Linear(2048 -> 1) + Dropout(0.5) + Sigmoid, BCE, Adam 1e-3 with
  MultiStepLR [5,10,15] gamma 0.1, dataset-specific normalization
  (/root/reference/driving_constraint/Model.py:19-27, train.py:30-38,63-67);
* dynamic-vehicle classifier — frozen VGG-16 features, classifier
  25088 -> 4096 -> 1 with Dropout(0.1) + Sigmoid, Adam 1e-6 halved at
  epochs 6 and 10 (/root/reference/dynamic_vehicles/Model.py:19-31,
  train.py:22-23,108-117); crops of side max(w,h)+4 around the bbox center
  (crop_image.py:60-72).

TPU-first: a single jitted train step (value_and_grad over the head only —
the backbone is frozen exactly as in the reference), optax schedules for the
LR ladders, and batched jitted accuracy evaluation.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from eval_driving_safety_tpu.config import DynamicVehicleConfig, RoadTypeConfig
from eval_driving_safety_tpu.models.resnet import resnet50
from eval_driving_safety_tpu.models.vgg import VGG16Features


class RoadTypeClassifier(nn.Module):
    """highway(1) / street(0) on full left images, 224x224."""
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = resnet50()(x)[-1]                    # c5 (B, 7, 7, 2048)
        pooled = feats.mean(axis=(1, 2))             # global average pool
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        logit = nn.Dense(1, name="head")(pooled)[..., 0]
        return logit                                  # pre-sigmoid


class DynamicVehicleClassifier(nn.Module):
    """moving(1) / static(0) on per-vehicle square crops, 224x224."""
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = VGG16Features()(x)                   # (B, 7, 7, 512)
        flat = feats.reshape(feats.shape[0], -1)     # 25088
        h = nn.relu(nn.Dense(4096, name="fc1")(flat))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        logit = nn.Dense(1, name="fc2")(h)[..., 0]
        return logit


def bce_logits(logits, labels01):
    return (jnp.logaddexp(0.0, logits) - logits * labels01).mean()


def make_road_type_schedule(cfg: RoadTypeConfig,
                            steps_per_epoch: int) -> optax.Schedule:
    """MultiStepLR: gamma^k after each milestone epoch (train.py:63-67)."""
    return optax.piecewise_constant_schedule(
        cfg.lr, {m * steps_per_epoch: cfg.lr_gamma for m in cfg.lr_milestones})


def make_dynamic_vehicle_schedule(cfg: DynamicVehicleConfig,
                                  steps_per_epoch: int) -> optax.Schedule:
    """Manual halvings at the configured epochs (train.py:108-117)."""
    return optax.piecewise_constant_schedule(
        cfg.lr, {m * steps_per_epoch: 0.5 for m in cfg.lr_halve_epochs})


def _partition_head(params, head_names: Tuple[str, ...]):
    """optax mask: train only the head modules (backbone frozen)."""
    def mask(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(any(getattr(p, "key", None) == h for p in path)
                                for h in head_names), tree)
    return mask(params)


def make_train_state(model: nn.Module, rng, input_shape, schedule,
                     head_names: Tuple[str, ...]):
    params = model.init(rng, jnp.zeros((1,) + input_shape), train=False)
    tx = optax.multi_transform(
        {True: optax.adam(schedule), False: optax.set_to_zero()},
        _partition_head(params, head_names))
    return params, tx, tx.init(params)


def make_train_step(model: nn.Module, tx) -> Callable:
    @jax.jit
    def step(params, opt_state, images, labels, rng):
        def loss_fn(p):
            logits = model.apply(p, images, train=True,
                                 rngs={"dropout": rng})
            return bce_logits(logits, labels)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss
    return step


def make_eval_step(model: nn.Module) -> Callable:
    @jax.jit
    def step(params, images):
        return jax.nn.sigmoid(model.apply(params, images, train=False))
    return step


def accuracy(model: nn.Module, params, batches) -> float:
    """Fraction correct at threshold 0.5 (the reference's check_accuracy,
    driving_constraint/train.py:74-90)."""
    step = make_eval_step(model)
    correct = total = 0
    for images, labels in batches:
        probs = np.asarray(step(params, jnp.asarray(images)))
        correct += ((probs > 0.5) == (np.asarray(labels) > 0.5)).sum()
        total += len(labels)
    return correct / max(total, 1)


# ---------------------------------------------------------------------------
# Data helpers (host side)
# ---------------------------------------------------------------------------

def crop_vehicle(image: np.ndarray, bbox, margin: int = 4,
                 out_size: int = 224) -> np.ndarray:
    """Square crop centered on the bbox, side max(w, h) + margin, resized
    to out_size (/root/reference/dynamic_vehicles/crop_image.py:60-72)."""
    x1, y1, x2, y2 = bbox
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    side = max(x2 - x1, y2 - y1) + margin
    h, w = image.shape[:2]
    xa = int(round(max(cx - side / 2, 0)))
    ya = int(round(max(cy - side / 2, 0)))
    xb = int(round(min(cx + side / 2, w)))
    yb = int(round(min(cy + side / 2, h)))
    crop = image[ya:yb, xa:xb]
    if crop.size == 0:
        crop = np.zeros((8, 8) + image.shape[2:], image.dtype)
    return np.asarray(jax.image.resize(
        jnp.asarray(crop), (out_size, out_size) + crop.shape[2:], "linear"))


def label_from_filename(name: str) -> int:
    """`..._d.png` -> 1 (dynamic), `..._s.png` -> 0 (static)
    (/root/reference/dynamic_vehicles/create_training_csv.py:11-15)."""
    stem = name.rsplit(".", 1)[0]
    return 1 if stem.endswith("d") else 0


def read_csv_dataset(path: str):
    """CSV rows `filename,label` (the reference's dataset CSVs)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            name, label = line.rsplit(",", 1)
            rows.append((name, int(float(label))))
    return rows
