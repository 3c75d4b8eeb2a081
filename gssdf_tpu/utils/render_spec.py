"""render_camera_spec_v1 text format.

Reference analog: include/utils/sensor_utils/render_camera_spec.hpp:13-108:
header line ``render_camera_spec_v1``, then rows ``width height fx fy cx cy``
— either exactly one (broadcast to every frame) or one per frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List


@dataclass
class RenderCameraSpec:
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float


def load_render_camera_spec(path) -> List[RenderCameraSpec]:
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    if not lines or lines[0] != "render_camera_spec_v1":
        raise ValueError(
            f"{path}: expected 'render_camera_spec_v1' header, got "
            f"{lines[0] if lines else '<empty>'}"
        )
    out = []
    for ln in lines[1:]:
        v = ln.split()
        if len(v) != 6:
            raise ValueError(f"{path}: expected 6 columns, got {ln!r}")
        out.append(
            RenderCameraSpec(
                width=int(v[0]), height=int(v[1]),
                fx=float(v[2]), fy=float(v[3]),
                cx=float(v[4]), cy=float(v[5]),
            )
        )
    if not out:
        raise ValueError(f"{path}: no camera rows")
    return out


def resolve_render_camera(specs: List[RenderCameraSpec], frame: int, n_frames: int):
    """Broadcast-1-or-per-frame semantics (render_camera_spec.hpp:84-108)."""
    if len(specs) == 1:
        return specs[0]
    if len(specs) != n_frames:
        raise ValueError(
            f"camera spec rows ({len(specs)}) != frames ({n_frames})"
        )
    return specs[frame]
