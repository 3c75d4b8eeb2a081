"""Image eval harness: PSNR / SSIM / LPIPS over renders vs gt directories.

Reference analog: eval/image_metrics/{metrics.py:25-157, metrics_single.py}:
3DGS-style evaluation over ``renders/`` and ``gt/`` dirs, per-view and
aggregate jsons (render_eval.json, render_eval_per_view.json, appended
evaluation_results.json / all_evaluation_results.json).

LPIPS: the full VGG16 metric is implemented in JAX (lpips_jax.py) and
loads pretrained weights from ``GSSDF_LPIPS_WEIGHTS`` / weights/lpips_vgg.npz
(the lpips torch package is used instead when installed). With neither —
this sealed environment has no egress and ships no VGG weights — eval jsons
carry ``LPIPS: null`` plus an explicit ``LPIPS_note``.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..losses import psnr as _psnr_jnp
from ..ops.ssim import ssim as _ssim_jnp

_lpips_model = None
_lpips_checked = False


def _get_lpips():
    global _lpips_model, _lpips_checked
    if _lpips_checked:
        return _lpips_model
    _lpips_checked = True
    try:  # pragma: no cover - depends on environment
        import lpips as lpips_pkg

        _lpips_model = lpips_pkg.LPIPS(net="vgg")
    except Exception:
        _lpips_model = None
    return _lpips_model


def image_psnr(render: np.ndarray, gt: np.ndarray) -> float:
    import jax.numpy as jnp

    return float(_psnr_jnp(jnp.asarray(render), jnp.asarray(gt)))


def image_ssim(render: np.ndarray, gt: np.ndarray) -> float:
    import jax.numpy as jnp

    return float(_ssim_jnp(jnp.asarray(render), jnp.asarray(gt)))


def image_lpips(render: np.ndarray, gt: np.ndarray) -> Optional[float]:
    model = _get_lpips()
    if model is None:
        from .lpips_jax import get_lpips_fn

        fn = get_lpips_fn()
        if fn is None:
            return None
        import jax.numpy as jnp

        return float(fn(jnp.asarray(render), jnp.asarray(gt)))
    import torch  # pragma: no cover

    def t(x):
        return (
            torch.from_numpy(np.asarray(x, np.float32))
            .permute(2, 0, 1)[None]
            * 2.0
            - 1.0
        )

    with torch.no_grad():
        return float(model(t(render), t(gt)))


def _load_image(path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_ANYCOLOR)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.asarray(img, np.float32) / 255.0


def evaluate_dirs(scene_dir, write_json: bool = True) -> Dict[str, float]:
    """Evaluate <scene_dir>/renders vs <scene_dir>/gt (metrics.py:40-130)."""
    scene_dir = Path(scene_dir)
    renders_dir = scene_dir / "renders"
    gt_dir = scene_dir / "gt"
    names = sorted(os.listdir(renders_dir))
    if not names:
        raise FileNotFoundError(f"no renders in {renders_dir}")

    psnrs, ssims, lpipss = [], [], []
    per_view: Dict[str, Dict[str, float]] = {"PSNR": {}, "SSIM": {}, "LPIPS": {}}
    for name in names:
        r = _load_image(renders_dir / name)
        g = _load_image(gt_dir / name)
        p = image_psnr(r, g)
        s = image_ssim(r, g)
        l = image_lpips(r, g)
        psnrs.append(p)
        ssims.append(s)
        per_view["PSNR"][name] = p
        per_view["SSIM"][name] = s
        if l is not None:
            lpipss.append(l)
            per_view["LPIPS"][name] = l

    i_max = int(np.argmax(psnrs))
    i_min = int(np.argmin(psnrs))
    summary = {
        "SSIM": float(np.mean(ssims)),
        "PSNR": float(np.mean(psnrs)),
        "LPIPS": float(np.mean(lpipss)) if lpipss else None,
        **(
            {}
            if lpipss
            else {
                "LPIPS_note": "unavailable: no lpips package and no "
                "VGG-LPIPS weights (GSSDF_LPIPS_WEIGHTS)"
            }
        ),
        f"Max PSNR {names[i_max]}:": float(psnrs[i_max]),
        f"Min PSNR {names[i_min]}:": float(psnrs[i_min]),
    }

    if write_json:
        # The reference evaluates every scene dir in ONE invocation and
        # accumulates full_dict across them (metrics.py:42-127); we are
        # called once per split, so merge into any existing json — else
        # the eval split would overwrite the train split's summary.
        ev_path = scene_dir.parent / "render_eval.json"
        try:
            full = json.loads(ev_path.read_text()) if ev_path.exists() else {}
        except Exception:
            full = {}
        # drop stale entries from a prior root/resume location: keys are
        # absolute split dirs, and consumers bucket by Path(k).name, so a
        # stale 'train'/'eval' from an older path would shadow this run's
        parent = str(scene_dir.parent)
        full = {k: v for k, v in full.items() if str(Path(k).parent) == parent}
        full[str(scene_dir)] = summary
        with open(ev_path, "w") as f:
            json.dump(full, f, indent=True)
        # per-view: reference layout at gs_log level (last writer wins,
        # metrics.py:129-130) plus a per-split copy so both splits keep
        # their per-view numbers.
        with open(scene_dir.parent / "render_eval_per_view.json", "w") as f:
            json.dump(per_view, f, indent=True)
        with open(scene_dir / "render_eval_per_view.json", "w") as f:
            json.dump(per_view, f, indent=True)
        with open(
            scene_dir.parent.parent / "evaluation_results.json", "a"
        ) as f:
            json.dump(
                {
                    str(scene_dir): {
                        k: (round(v, 3) if isinstance(v, float) else v)
                        for k, v in summary.items()
                    }
                },
                f,
                indent=True,
            )
            f.write("\n")
    return summary


def evaluate_single(render_path, gt_path) -> float:
    """Single-image PSNR (metrics_single.py analog)."""
    return image_psnr(_load_image(render_path), _load_image(gt_path))
