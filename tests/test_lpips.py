"""LPIPS implementation parity: the pure-JAX VGG16-LPIPS (eval/lpips_jax.py)
vs an independent torch mirror of the published LPIPS formula, with identical
random weights.

Pretrained VGG16 weights are unobtainable in this sealed environment (no
torchvision, no lpips package, no cached checkpoints, zero egress), so the
*numbers* can't be produced here — but the implementation can still be proven
correct so that dropping in a real ``weights/lpips_vgg.npz`` yields the
reference metric (reference: eval/image_metrics/metrics.py:25-157 shelling to
the ``lpips`` torch package).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from gssdf_tpu.eval import lpips_jax  # noqa: E402

# VGG16 conv output channels in order (13 convs)
_CH = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_SLICES = lpips_jax._SLICES


def _random_weights(rng):
    w = {}
    cin = 3
    for i, cout in enumerate(_CH):
        w[f"conv{i}_w"] = rng.normal(
            scale=0.2 / np.sqrt(cin * 9), size=(cout, cin, 3, 3)
        ).astype(np.float32)
        w[f"conv{i}_b"] = rng.normal(scale=0.05, size=(cout,)).astype(
            np.float32
        )
        cin = cout
    slice_out = [_CH[s[-1]] for s in _SLICES]
    for i, c in enumerate(slice_out):
        # non-negative, as the lpips package's learned lins are
        w[f"lin{i}_w"] = rng.uniform(0.0, 1.0, size=(c,)).astype(np.float32)
    return w


def _torch_lpips(w, a, b):
    """Independent mirror: ScalingLayer -> VGG16 conv/relu/maxpool slices ->
    channel-unit-normalize -> lin-weighted squared diff -> spatial mean."""
    shift = torch.tensor(lpips_jax._SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(lpips_jax._SCALE).view(1, 3, 1, 1)

    def feats(img):  # [H, W, 3] in [0, 1]
        x = torch.tensor(np.transpose(img, (2, 0, 1))[None]) * 2.0 - 1.0
        x = (x - shift) / scale
        outs = []
        for si, convs in enumerate(_SLICES):
            for ci in convs:
                x = F.relu(
                    F.conv2d(
                        x,
                        torch.tensor(w[f"conv{ci}_w"]),
                        torch.tensor(w[f"conv{ci}_b"]),
                        padding=1,
                    )
                )
            outs.append(x)
            if si < len(_SLICES) - 1:
                x = F.max_pool2d(x, 2, 2)
        return outs

    total = 0.0
    for i, (ya, yb) in enumerate(zip(feats(a), feats(b))):
        na = ya / torch.sqrt((ya * ya).sum(1, keepdim=True) + 1e-10)
        nb = yb / torch.sqrt((yb * yb).sum(1, keepdim=True) + 1e-10)
        lin = torch.tensor(w[f"lin{i}_w"]).view(1, -1, 1, 1)
        total = total + ((na - nb) ** 2 * lin).sum(1).mean()
    return float(total)


def test_lpips_jax_matches_torch_mirror(tmp_path):
    rng = np.random.default_rng(0)
    w = _random_weights(rng)
    npz = tmp_path / "lpips_rand.npz"
    np.savez(npz, **w)

    lpips_jax.load_weights.cache_clear()
    lpips_jax.get_lpips_fn.cache_clear()
    fn = lpips_jax.get_lpips_fn(str(npz))
    assert fn is not None

    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(
        np.float32
    )

    got_ab = float(fn(a, b))
    want_ab = _torch_lpips(w, a, b)
    assert got_ab == pytest.approx(want_ab, rel=2e-4, abs=1e-6)
    # identical images -> exactly zero distance
    assert float(fn(a, a)) == pytest.approx(0.0, abs=1e-7)

    lpips_jax.load_weights.cache_clear()
    lpips_jax.get_lpips_fn.cache_clear()


def test_lpips_schema_validation(tmp_path):
    """A malformed archive is rejected, not half-loaded."""
    bad = tmp_path / "bad.npz"
    np.savez(bad, conv0_w=np.zeros((4, 3, 3, 3), np.float32))
    lpips_jax.load_weights.cache_clear()
    assert lpips_jax.load_weights(str(bad)) is None
    lpips_jax.load_weights.cache_clear()
