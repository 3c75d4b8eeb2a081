import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gssdf_tpu import losses


def test_sdf_loss_matches_torch_bce():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(256, 1)).astype(np.float32) * 0.1
    gt = rng.normal(size=(256, 1)).astype(np.float32) * 0.1
    isig = (1.0 + np.abs(rng.normal(size=(256, 1))) * 100).astype(np.float32)

    ours = losses.sdf_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(isig))

    tp, tg, ti = map(torch.from_numpy, (pred, gt, isig))
    ti = ti.clamp_max(5e2)
    ref = F.binary_cross_entropy_with_logits(
        -tp * ti, torch.sigmoid(-tg * ti).clamp(1e-7, 1 - 1e-7)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_eikonal_zero_for_unit_grads():
    g = jnp.array([[1.0, 0, 0], [0, 1, 0]])
    assert float(losses.eikonal_loss(g)) == 0.0
    g2 = jnp.array([[2.0, 0, 0]])
    np.testing.assert_allclose(float(losses.eikonal_loss(g2)), 1.0)


def test_masked_mean():
    x = jnp.array([1.0, 2.0, 3.0, 100.0])
    m = jnp.array([True, True, True, False])
    np.testing.assert_allclose(float(losses.masked_mean(x, m)), 2.0)


def test_sdf_loss_masked_equals_unmasked_when_full():
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.normal(size=(64, 1)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(64, 1)).astype(np.float32))
    isig = jnp.full((64, 1), 100.0)
    full = losses.sdf_loss(pred, gt, isig)
    masked = losses.sdf_loss_masked(pred, gt, isig, jnp.ones((64,), bool))
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_ssim_matches_torch_reference():
    """Parity vs the exact torch implementation the reference uses
    (loss_utils.cpp:5-131, 3DGS-style)."""
    rng = np.random.default_rng(2)
    a = rng.random((1, 3, 32, 32)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1).astype(np.float32)

    def torch_ssim(img1, img2, window_size=11):
        import math

        def gaussian(ws, sigma):
            g = torch.tensor(
                [
                    math.exp(-((x - ws // 2) ** 2) / (2 * sigma ** 2))
                    for x in range(ws)
                ]
            )
            return g / g.sum()

        ch = img1.size(1)
        w1d = gaussian(window_size, 1.5).unsqueeze(1)
        window = w1d.mm(w1d.t()).unsqueeze(0).unsqueeze(0)
        window = window.expand(ch, 1, window_size, window_size).contiguous()
        mu1 = F.conv2d(img1, window, groups=ch)
        mu2 = F.conv2d(img2, window, groups=ch)
        mu1_sq, mu2_sq, mu1mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, window, groups=ch) - mu1_sq
        s2 = F.conv2d(img2 * img2, window, groups=ch) - mu2_sq
        s12 = F.conv2d(img1 * img2, window, groups=ch) - mu1mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1mu2 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
        )
        return m.mean()

    ref = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    ours = losses.ssim(jnp.asarray(a[0]), jnp.asarray(b[0]))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_dssim_identical_images_zero():
    img = jnp.ones((24, 24, 3)) * 0.5
    np.testing.assert_allclose(float(losses.dssim_loss(img, img)), 0.0, atol=1e-6)


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20.0, rtol=1e-4)
