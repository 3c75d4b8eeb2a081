"""Reference-budget validation on a synthetic Replica-format scene.

The sealed bench environment ships no Replica data, so this drives the FULL
pipeline at the reference training budget (config/replica/replica.yaml:6-7 =
5k SDF + 30k GS iters, batch_pt_num 32768, full 1200x680 resolution) on a
procedurally ray-traced room scene (floor + wall + two spheres + box) with
analytic ground-truth geometry, and records per-stage wall clock, PSNR/SSIM
and chamfer-vs-GT into RESULTS_r02.md.

Usage:  python scripts/validate_synth.py [--sdf-iters N] [--gs-iters N]
        [--frames N] [--out results.md]
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

W, H = 1200, 680
FX = FY = 600.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5

# scene primitives (world: x right, y down, z forward; camera near origin)
SPHERES = [((-0.9, 0.4, 2.2), 0.45), ((0.8, 0.55, 2.6), 0.35)]
BOX = ((-0.25, 0.1, 2.9), (0.35, 0.8, 0.3))   # center, half-extents
WALL_Z = 3.6
FLOOR_Y = 0.9


def _ray_depth(o, d):
    """Per-ray nearest-hit depth over the analytic scene. o [3], d [N, 3]."""
    t_best = np.full(d.shape[0], WALL_Z * 4, np.float64)
    hit_id = np.full(d.shape[0], -1, np.int32)

    def take(t, cond, idx):
        sel = cond & (t > 0.05) & (t < t_best)
        t_best[sel] = t[sel]
        hit_id[sel] = idx

    # wall z = WALL_Z
    tz = (WALL_Z - o[2]) / np.where(np.abs(d[:, 2]) > 1e-9, d[:, 2], 1e-9)
    take(tz, d[:, 2] > 0, 0)
    # floor y = FLOOR_Y
    ty = (FLOOR_Y - o[1]) / np.where(np.abs(d[:, 1]) > 1e-9, d[:, 1], 1e-9)
    take(ty, d[:, 1] > 0, 1)
    # spheres
    for si, (c, r) in enumerate(SPHERES):
        oc = o - np.asarray(c)
        b = d @ oc
        disc = b * b - (oc @ oc - r * r)
        ok = disc > 0
        t = -b - np.sqrt(np.where(ok, disc, 0.0))
        take(t, ok, 2 + si)
    # axis-aligned box (slab test)
    c, he = np.asarray(BOX[0]), np.asarray(BOX[1])
    d_safe = np.where(np.abs(d) > 1e-9, d, 1e-9)
    t1 = (c - he - o) / d_safe
    t2 = (c + he - o) / d_safe
    tn = np.minimum(t1, t2).max(axis=1)
    tf = np.maximum(t1, t2).min(axis=1)
    take(tn, tn < tf, 4)
    return t_best, hit_id


def _color(pts, hit_id):
    """View-consistent procedural texture per surface."""
    col = np.zeros((len(pts), 3))
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    m = hit_id == 0   # wall: checker
    ch = ((np.floor(x * 2.5) + np.floor(y * 2.5)) % 2).astype(bool)
    col[m & ch] = (0.85, 0.72, 0.25)
    col[m & ~ch] = (0.18, 0.35, 0.78)
    m = hit_id == 1   # floor: stripes
    st = (np.floor(x * 4) % 2).astype(bool)
    col[m & st] = (0.55, 0.28, 0.18)
    col[m & ~st] = (0.75, 0.68, 0.62)
    for si in range(2):  # spheres: solid with a gradient
        m = hit_id == 2 + si
        base = np.array([(0.82, 0.2, 0.25), (0.2, 0.7, 0.35)][si])
        col[m] = base[None] * (0.6 + 0.4 * np.clip(-(y[m] - 0.55) * 2, 0, 1))[:, None]
    m = hit_id == 4   # box: dots
    dd = ((np.floor(x * 8) + np.floor(y * 8) + np.floor(z * 8)) % 2).astype(bool)
    col[m & dd] = (0.9, 0.85, 0.8)
    col[m & ~dd] = (0.3, 0.3, 0.32)
    return col


def make_dataset(root: Path, n_frames: int):
    import cv2

    results = root / "results"
    results.mkdir(parents=True)
    ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
    dirs_cam = np.stack(
        [(xs - CX) / FX, (ys - CY) / FY, np.ones_like(xs)], -1
    ).reshape(-1, 3)

    rng = np.random.RandomState(3)
    with open(root / "traj.txt", "w") as f:
        for i in range(n_frames):
            ang = 0.25 * np.sin(2 * np.pi * i / n_frames)
            pose = np.eye(4)
            cya, sya = np.cos(ang), np.sin(ang)
            pose[:3, :3] = np.array(
                [[cya, 0, sya], [0, 1, 0], [-sya, 0, cya]]
            )
            pose[0, 3] = 0.5 * np.sin(2 * np.pi * i / n_frames)
            pose[1, 3] = 0.15 * rng.randn() * 0.3
            pose[2, 3] = 0.2 * np.cos(2 * np.pi * i / n_frames)
            f.write(" ".join(map(str, pose.reshape(-1))) + "\n")

            d_world = dirs_cam @ pose[:3, :3].T
            nrm = np.linalg.norm(d_world, axis=1, keepdims=True)
            t, hid = _ray_depth(pose[:3, 3], d_world / nrm)
            # Replica depths are Z-depth
            zdepth = (t[:, None] * (d_world / nrm))[:, 2] + 0.0
            pts = pose[:3, 3][None] + (d_world / nrm) * t[:, None]
            col = _color(pts, hid)
            img = (np.clip(col, 0, 1) * 255).astype(np.uint8).reshape(H, W, 3)
            cv2.imwrite(
                str(results / f"frame{i:06d}.jpg"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 97],
            )
            miss = hid.reshape(H, W) < 0
            zimg = zdepth.reshape(H, W).copy()
            zimg[miss] = 0.0
            cv2.imwrite(
                str(results / f"depth{i:06d}.png"),
                (zimg * 6553.5).astype(np.uint16),
            )
    print(f"dataset: {n_frames} frames at {root}")


def gt_surface_points(n: int = 2_000_000) -> np.ndarray:
    """Uniform samples of the analytic surfaces (chamfer ground truth),
    restricted to the region the cameras actually observe."""
    rng = np.random.RandomState(11)
    pts = []
    # wall (visible extent)
    n1 = n // 3
    pts.append(np.stack([
        rng.uniform(-2.4, 2.4, n1), rng.uniform(-1.3, FLOOR_Y, n1),
        np.full(n1, WALL_Z)], -1))
    # floor
    n2 = n // 3
    pts.append(np.stack([
        rng.uniform(-2.0, 2.0, n2), np.full(n2, FLOOR_Y),
        rng.uniform(1.2, WALL_Z, n2)], -1))
    # spheres + box
    n3 = n - n1 - n2
    for c, r in SPHERES:
        v = rng.randn(n3 // 3, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts.append(np.asarray(c)[None] + r * v)
    c, he = np.asarray(BOX[0]), np.asarray(BOX[1])
    m = n3 - 2 * (n3 // 3)
    face = rng.randint(0, 6, m)
    u = rng.uniform(-1, 1, (m, 3))
    for a in range(3):
        sel = face // 2 == a
        u[sel, a] = np.where(face[sel] % 2 == 0, -1.0, 1.0)
    pts.append(c[None] + he[None] * u)
    return np.concatenate(pts).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sdf-iters", type=int, default=None)
    ap.add_argument("--gs-iters", type=int, default=None)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--out", default="RESULTS_r03.md")
    ap.add_argument("--root", default="/tmp/synth_scene")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny point/splat budgets + low res (CI shakeout "
                    "of the full script incl. the RESULTS writer)")
    ap.add_argument("--resume", default=None, metavar="RUN_DIR",
                    help="continue an interrupted validation run from its "
                    "run dir (model/gs_resume.npz)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs while the TPU "
                    "tunnel is down; env JAX_PLATFORMS is ignored by the "
                    "site config — see CLAUDE.md)")
    ap.add_argument("--no-reset", action="store_true",
                    help="DIAGNOSTIC: disable periodic opacity resets "
                    "(reset_alpha_every huge). Controlled comparison vs "
                    "--fix-window alone isolates whether reset recovery "
                    "under cap truncation drives the collapse "
                    "(DIAGNOSIS_r04 addendum)")
    ap.add_argument("--gate-splits", action="store_true",
                    help="count the scale2d screen-size split against the "
                    "renderer-aware grow gate too (round-5 evidence: "
                    "41-43k ungated splits/refine held drop_frac ~0.6 "
                    "under a closed gate)")
    ap.add_argument("--cap-max", type=int, default=0,
                    help="enable the tile-cap capacity rung (DIAGNOSIS_r04 "
                    "repair item 2): tile lists double up to this bound "
                    "when the renderer-aware grow gate stays closed for "
                    "escalate_patience consecutive refines (e.g. 1024)")
    ap.add_argument("--fix-window", action="store_true",
                    help="window-honesty variant (RESULTS_r04 diagnosis): "
                    "refine_scale2d_stop_iter = gs_iters/2 splits splats "
                    "whose screen radius outgrows the train bbox window "
                    "(needle/floater pathology at reference density), and "
                    "tile_expand_small 16 so the small-bucket window covers "
                    "the split survivors' true bboxes")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.sdf_iters is None:
        args.sdf_iters = 60 if args.smoke else 5000
    if args.gs_iters is None:
        args.gs_iters = 10 if args.smoke else 30000

    root = Path(args.root)
    shutil.rmtree(root, ignore_errors=True)
    make_dataset(root, args.frames)

    cfg_dir = root / "cfg"
    cfg_dir.mkdir()
    if args.smoke:
        scale = """
max_pt_num: 20000
ds_pt_num: 4000
batch_pt_num: 4096
res_scale: 0.1
leaf_sizes: 0.1
gs_capacity: 16384
tile_cap: 128
export_resolution: 0.1
"""
    else:
        scale = """
max_pt_num: 2000000
ds_pt_num: 400000
batch_pt_num: 32768
res_scale: 1.0
leaf_sizes: 0.05
tile_cap: 512
gs_sdf_budget: 32768
export_resolution: 0.02
resume_interval: 1000
"""
    if args.fix_window:
        scale += f"""
refine_scale2d_stop_iter: {args.gs_iters // 2}
refine_scale2d_phase2: 1
tile_expand_small: 16
grow_drop_frac_max: 0.3
"""
    if args.cap_max:
        scale += f"""
tile_cap_max: {args.cap_max}
"""
    if args.gate_splits:
        scale += """
gate_scale2d: 1
"""
    if args.no_reset:
        scale += """
reset_alpha_every: 1000000
"""
    (cfg_dir / "run.yaml").write_text(f"""
dataset_type: 0
sdf_iter_step: {args.sdf_iters}
gs_iter_step: {args.gs_iters}
map:
  map_size: 10
sh_degree: 0
sky_init: 0
mesh_init: 1
cull_mesh: 0
export_interval: 2000
export_mesh: 1
vis_attribute: 1
preload: 1
{scale}""")

    from gssdf_tpu.config import load_config
    from gssdf_tpu.train.pipeline import Pipeline
    from gssdf_tpu.utils.compile_cache import enable_compilation_cache
    from gssdf_tpu.utils.llog import LLOG

    enable_compilation_cache()
    if args.resume:
        cfg = load_config(cfg_dir / "run.yaml", root, make_run_dir=False)
        cfg.output_path = str(Path(args.resume))
        cfg.model_path = str(Path(args.resume) / "model")
    else:
        cfg = load_config(cfg_dir / "run.yaml", root, make_run_dir=True)
    print("run dir:", cfg.output_path)
    pipe = Pipeline(cfg)

    t0 = time.time()
    if args.resume:
        # outage recovery: Pipeline.resume_train owns the whole flow
        # (deterministic data-side rebuild, checkpoint + mid-GS snapshot
        # restore, completion marker) incl. final exports; timings of
        # resumed stages are partial by nature
        t_occ = t_sdf = t_init = time.time()
        pipe.resume_train()
        t_gs = t_end = time.time()
    else:
        pipe.build_occ_map()
        t_occ = time.time()
        pipe.nsdf_train()
        t_sdf = time.time()
        pipe.export_checkpoint()
        pipe.init_gs()
        t_init = time.time()
        pipe.gs_train()
        t_gs = time.time()
        pipe.end()
        t_end = time.time()

    # chamfer vs analytic GT — reuse end()'s exported mesh when present
    # (a reference-resolution extraction costs ~1 h of chip; re-extracting
    # it for the metrics doubled the export phase)
    from gssdf_tpu.eval.mesh_metrics import eval_mesh

    mesh_dir = Path(cfg.output_path) / "mesh"
    # match end()'s export-resolution mesh exactly; a lexicographic [-1]
    # can pick a coarser mid-run keyboard export ('0.1' > '0.02')
    plys = (
        sorted(mesh_dir.glob("*.ply"), key=lambda p: p.stat().st_mtime)
        if mesh_dir.exists() else []
    )
    exact = mesh_dir / f"mesh_{cfg.export_resolution}.ply"
    if exact.exists():
        plys = [exact]
    if plys:
        from gssdf_tpu.utils.ply import read_ply

        d = read_ply(plys[-1])
        verts = np.stack(
            [d["vertex.x"], d["vertex.y"], d["vertex.z"]], 1
        ).astype(np.float32)
        faces = d["face"]
    else:
        verts, faces, _ = pipe.save_mesh(cfg.export_resolution, save=False)
    metrics = eval_mesh(verts, faces, gt_surface_points())
    ev = json.load(open(Path(cfg.output_path) / "gs_log" / "render_eval.json"))
    # keys are the split scene dirs (.../gs_log/train, .../gs_log/eval)
    by_split = {}
    for k, v in ev.items():
        by_split[Path(k).name] = v
    summary = by_split.get("train", list(ev.values())[0])
    eval_summary = by_split.get("eval")

    lines = [
        f"# {Path(args.out).stem} — reference-budget synthetic-room validation",
        "",
        "Scene: procedurally ray-traced room (wall/floor/2 spheres/box),"
        f" {args.frames} frames at {W}x{H}; analytic GT surfaces for chamfer.",
        f"Budget: {args.sdf_iters} SDF + {args.gs_iters} GS iters,"
        f" batch_pt_num {cfg.batch_pt_num}, leaf {cfg.leaf_size},"
        f" res_scale {cfg.res_scale}"
        + (" (SMOKE scale)" if args.smoke else "")
        + ", reference schedule"
        " (config/replica/replica.yaml:6-7, config/base.yaml:8-23).",
        "Hardware: "
        + {
            "tpu": "one v5e chip (axon)",
            "axon": "one v5e chip (axon)",
        }.get(
            __import__("jax").default_backend(),
            f"{__import__('jax').default_backend()} backend "
            "(NOT a chip measurement)",
        )
        + ".",
        "",
        "| stage | wall clock |",
        "|---|---|",
        f"| occupancy/build | {t_occ - t0:.0f} s |",
        f"| SDF phase ({args.sdf_iters} iters) | {t_sdf - t_occ:.0f} s |",
        f"| GS init | {t_init - t_sdf:.0f} s |",
        f"| joint GS phase ({args.gs_iters} iters) | {t_gs - t_init:.0f} s |",
        f"| exports/eval | {t_end - t_gs:.0f} s |",
        f"| TOTAL | {t_end - t0:.0f} s |",
        "",
        "| metric | value |",
        "|---|---|",
        f"| train PSNR | {summary['PSNR']:.2f} dB |",
        f"| train SSIM | {summary['SSIM']:.4f} |",
    ] + (
        [
            f"| eval PSNR | {eval_summary['PSNR']:.2f} dB |",
            f"| eval SSIM | {eval_summary['SSIM']:.4f} |",
        ]
        if eval_summary
        else []
    ) + [
        f"| {k} | {v:.3f} |" for k, v in metrics.items()
    ] + [
        "",
        f"Splats: {int(np.asarray(pipe.gs_state.alive).sum())} alive.",
        f"Run dir: {cfg.output_path}",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
