"""Headline benchmark: differentiable 2DGS render throughput on one chip.

Measures forward+backward through the full tiled rasterization pipeline
(project -> SH -> tile encode -> composite -> image losses -> grads) at a
Replica-like operating point (1200x680, 128k splats), the hot path of GS
training (SURVEY.md §3.3).

Prints ONE JSON line: splats rasterized per second (fwd+bwd).
``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
denominator is a nominal 1e8 splats/s CUDA-class figure (≈1M-splat scene at
100 fps fwd+bwd) so the ratio is comparable across rounds.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gssdf_tpu.gs.model import build_splat_model
    from gssdf_tpu.gs.render import RenderSettings, render_splats
    from gssdf_tpu.sensors.cameras import Camera
    from gssdf_tpu.utils.math import logit

    W, H = 1200, 680
    n = 131072
    cam = Camera(fx=600.0, fy=600.0, cx=W / 2, cy=H / 2, width=W, height=H)

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    anchors = jnp.concatenate(
        [
            jax.random.uniform(k1, (n, 2), minval=-2.0, maxval=2.0),
            jax.random.uniform(k2, (n, 1), minval=1.0, maxval=8.0),
        ],
        -1,
    )
    quats = jax.random.normal(k3, (n, 4))
    model = build_splat_model(
        k4,
        anchors,
        jnp.full((n, 3), np.log(0.01)),
        quats / jnp.linalg.norm(quats, axis=-1, keepdims=True),
        jnp.full((n,), logit(0.7)),
        0,
        n,
    )
    settings = RenderSettings(
        width=W, height=H, tile_cap=256, tile_expand=32, tile_batch=16
    )
    pose = jnp.eye(4, dtype=jnp.float32)
    K = jnp.asarray(cam.K, jnp.float32)
    target = jnp.zeros((H, W, 3))

    def loss_fn(params):
        from gssdf_tpu.gs.model import SplatModel

        m = SplatModel(params=params, anchors=model.anchors, alive=model.alive)
        out = render_splats(m, pose, K, settings, training=True)
        return jnp.mean(jnp.abs(out["color"] - target)) + 0.01 * jnp.mean(
            out["depth"]
        )

    step = jax.jit(jax.grad(loss_fn))
    g = step(model.params)
    jax.block_until_ready(g)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(model.params)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters

    splats_per_s = n / dt
    baseline = 1e8
    print(
        json.dumps(
            {
                "metric": "gs_render_fwd_bwd_splats_per_s",
                "value": round(splats_per_s, 1),
                "unit": "splats/s",
                "vs_baseline": round(splats_per_s / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
