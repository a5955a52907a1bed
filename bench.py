"""Benchmark: white-box PGD attack throughput on DSGN (the framework's hot
path — full forward + backward through the stereo cost volumes per
iteration, at the reference's full 384x1248 resolution).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference's only recorded end-to-end
number is ~24 h for universal-patch training with debugnum=50, epochs=80,
iters=2/batch on a V100 (/root/reference/attack/DSGN/README.md:14,81)
= 50*80*2 = 8000 attack iterations / 86400 s = 0.0926 attack-iters/s.
Each attack iteration = one fwd+bwd of the full DSGN at 1x3x384x1248, the
same unit this benchmark measures, so vs_baseline = value / 0.0926.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_ITERS_PER_SEC = 8000.0 / (24 * 3600.0)   # V100, see docstring


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from eval_driving_safety_tpu.config import DSGNConfig
    from eval_driving_safety_tpu.models.dsgn import DSGN
    from eval_driving_safety_tpu.models.rpn3d_loss import dsgn_total_loss

    batch = 1
    cfg = DSGNConfig()
    model = DSGN(cfg)
    k = jax.random.PRNGKey(0)
    h, w = cfg.height, cfg.width
    im_l = jax.random.uniform(jax.random.fold_in(k, 1), (batch, h, w, 3))
    im_r = jax.random.uniform(jax.random.fold_in(k, 2), (batch, h, w, 3))
    calib = (jnp.full((batch,), 720.0), jnp.full((batch,), 0.54),
             jnp.full((batch,), w / 2.0), jnp.full((batch,), h / 2.0))
    params = model.init(jax.random.fold_in(k, 3), im_l, im_r, *calib)
    boxes = jnp.zeros((batch, 8, 8)).at[:, 0].set(
        jnp.array([2.0, 1.6, 20.0, 1.5, 1.7, 4.0, 0.3, 1.0]))
    num_boxes = jnp.ones((batch,), jnp.int32)
    depth_gt = jnp.full((batch, h, w), 20.0)

    def loss_fn(p, il, ir):
        out = model.apply(p, il, ir, *calib)
        total, _ = dsgn_total_loss(out, depth_gt, boxes, num_boxes, cfg)
        return total

    @jax.jit
    def pgd_iter_p(p, il, ir):
        loss, (gl, gr) = jax.value_and_grad(
            loss_fn, argnums=(1, 2))(p, il, ir)
        alpha = 1.0 / 255.0
        return (jnp.clip(il + alpha * jnp.sign(gl), 0.0, 1.0),
                jnp.clip(ir + alpha * jnp.sign(gr), 0.0, 1.0), loss)

    def pgd_iter(il, ir):
        return pgd_iter_p(params, il, ir)

    # warmup/compile
    al, ar, loss = pgd_iter(im_l, im_r)
    al.block_until_ready()

    n_iters = args.iters
    if args.profile:
        with jax.profiler.trace(args.profile):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                al, ar, loss = pgd_iter(al, ar)
            al.block_until_ready()
            dt = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        for _ in range(n_iters):
            al, ar, loss = pgd_iter(al, ar)
        al.block_until_ready()
        dt = time.perf_counter() - t0

    iters_per_sec = n_iters * batch / dt
    print(json.dumps({
        "metric": "dsgn_pgd_attack_iters_per_sec",
        "value": round(iters_per_sec, 4),
        "unit": "fwd+bwd iters/s @ 384x1248",
        "vs_baseline": round(iters_per_sec / REFERENCE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
