"""CLI entry: train | view | render.

Reference analog: ``src/neural_mapping_node.cpp:16-139``:
  train  <config.yaml> <dataset_path>   — full batch_train
  view   <run_dir>                      — load checkpoint, keyboard commands
  render <run_dir> <pose_file> [--fps N] [--camera-spec file]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def cmd_train(args):
    from .config import load_config
    from .train.pipeline import Pipeline
    from .utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    resume_dir = getattr(args, "resume", None)
    cfg = load_config(args.config, args.data, make_run_dir=not resume_dir)
    if resume_dir:
        from pathlib import Path

        cfg.output_path = str(Path(resume_dir))
        cfg.model_path = str(Path(resume_dir) / "model")
    if cfg.debug:
        # k_debug anomaly-mode analog (neural_mapping.cpp:310-312): trap
        # NaNs at the op that produced them instead of downstream
        import jax

        jax.config.update("jax_debug_nans", True)
    if args.iters is not None:
        cfg.sdf_iter_step = args.iters
    if args.gs_iters is not None:
        cfg.gs_iter_step = args.gs_iters
    if getattr(args, "mesh", None) is not None:
        cfg.mesh_shape = {"data": args.mesh}
    print(f"run dir: {cfg.output_path}")
    pipe = Pipeline(cfg)
    if resume_dir:
        pipe.resume_train()
    else:
        pipe.batch_train()


def _load_run(run_dir: str, with_data: bool = False):
    from .config import load_config
    from .train.pipeline import Pipeline

    run = Path(run_dir)
    cfg_dir = run / "model" / "config"
    cfgs = sorted(cfg_dir.glob("*.yaml")) if cfg_dir.exists() else []
    if not cfgs:
        raise FileNotFoundError(f"no config under {cfg_dir}")
    cfg = load_config(cfgs[0])
    cfg.output_path = str(run)
    cfg.model_path = str(run / "model")
    has_data = with_data and cfg.dataset_path and Path(cfg.dataset_path).exists()
    pipe = Pipeline(cfg, with_data=bool(has_data))
    pipe.load_checkpoint(run / "model")
    return pipe


def cmd_view(args):
    """Keyboard loop (keyboard_loop, neural_mapping.cpp:1482-1684):
      m [res]      save mesh at resolution
      r            render train/eval paths + image eval
      e            eval mesh vs gt (needs gt_mesh) + render eval
      o            export checkpoint
      i [idx]      export a test image + PSNR
      u <poses>    render a custom pose file (type-0 4x4)
      q            quit
    """
    pipe = _load_run(args.run_dir, with_data=True)
    print(cmd_view.__doc__)
    for line in sys.stdin:
        tok = line.split()
        if not tok:
            continue
        c = tok[0]
        try:
            if c == "q":
                break
            elif c == "m":
                res = float(tok[1]) if len(tok) > 1 else pipe.cfg.export_resolution
                pipe.save_mesh(res)
            elif c == "o":
                pipe.export_checkpoint()
                print("checkpoint exported")
            elif c == "i":
                idx = int(tok[1]) if len(tok) > 1 else pipe.cfg.test_idx
                p = pipe.export_test_image(idx)
                print(f"test image PSNR: {p:.2f}")
            elif c == "r":
                from .eval.image_metrics import evaluate_dirs

                for split in ("train", "eval"):
                    base = pipe.render_path(split)
                    if base is not None:
                        print(split, evaluate_dirs(base))
            elif c == "e":
                verts, faces, _ = pipe.save_mesh(pipe.cfg.export_resolution)
                gt = getattr(pipe.loader.parser, "gt_mesh_path", None)
                if gt and Path(gt).exists():
                    from .eval.mesh_metrics import eval_mesh
                    from .utils.ply import read_ply_xyz

                    m = eval_mesh(verts, faces, read_ply_xyz(gt))
                    for k, v in m.items():
                        print(f"  {k}: {v:.3f}")
                else:
                    print("no gt mesh available")
            elif c == "u" and len(tok) > 1:
                from .data.poses import load_poses

                pf = load_poses(tok[1], pose_type=0)
                out = Path(pipe.cfg.output_path) / "gs_log" / "path" / "color"
                out.mkdir(parents=True, exist_ok=True)
                for k, pose in enumerate(pf.poses):
                    res = pipe.render_image(pose)
                    import cv2

                    cv2.imwrite(
                        str(out / f"{k:05d}.png"),
                        cv2.cvtColor(
                            (np.clip(res["color"], 0, 1) * 255).astype(np.uint8),
                            cv2.COLOR_RGB2BGR,
                        ),
                    )
                print(f"rendered {len(pf.poses)} frames -> {out}")
            else:
                print(f"unknown command {c!r}")
        except Exception as e:
            print(f"command {c!r} failed: {e}")


def cmd_render(args):
    """Headless novel-view rendering along a pose file
    (render mode, neural_mapping.cpp:1108-1200)."""
    import jax.numpy as jnp

    from .data.poses import load_poses
    from .gs.render import RenderSettings, render_splats
    from .sensors.cameras import Camera
    from .train.gs import splat_model
    from .utils.render_spec import load_render_camera_spec

    pipe = _load_run(args.run_dir)
    pf = load_poses(args.pose_file, pose_type=0)
    poses = pf.poses
    if args.interpolate > 1:
        # smooth fly-through: slerp-upsample the keyframe poses
        # (eval/inter_poses.py analog)
        from .eval.tools import interpolate_poses

        poses = interpolate_poses(
            np.asarray(poses), len(poses) * args.interpolate
        )
    cam = None
    specs = None
    if args.camera_spec:
        specs = load_render_camera_spec(args.camera_spec)
    out_dir = Path(args.out or (Path(args.run_dir) / "gs_log" / "path"))
    (out_dir / "color").mkdir(parents=True, exist_ok=True)
    (out_dir / "depth").mkdir(parents=True, exist_ok=True)

    import cv2

    for i, pose in enumerate(poses):
        if specs is not None:
            # per-frame specs pair with the ORIGINAL keyframes; map frame i
            # back through the slerp parameterization (interpolate_poses
            # samples t = linspace(0, n_key-1, n_key*interp)) and pick the
            # NEAREST keyframe's intrinsics
            if len(specs) > 1 and len(poses) > 1:
                t = i * (len(specs) - 1) / (len(poses) - 1)
                k = int(round(t))
            else:
                k = 0
            s = specs[min(k, len(specs) - 1)]
            cam = Camera(s.fx, s.fy, s.cx, s.cy, s.width, s.height)
        elif cam is None:
            raise SystemExit("render mode needs --camera-spec")
        settings = RenderSettings(
            width=cam.width, height=cam.height,
            near=pipe.cfg.near, far=pipe.cfg.far,
            sh_degree=pipe.cfg.sh_degree,
            tile_cap=pipe.cfg.eval_tile_cap,
            tile_expand=pipe.cfg.eval_tile_expand,
            tile_expand_small=pipe.cfg.eval_tile_expand_small,
        )
        out = render_splats(
            splat_model(pipe.gs_state), jnp.asarray(pose),
            jnp.asarray(cam.K), settings, training=False,
        )
        color = (np.clip(np.asarray(out["color"]), 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(
            str(out_dir / "color" / f"{i:05d}.png"),
            cv2.cvtColor(color, cv2.COLOR_RGB2BGR),
        )
        depth = np.asarray(out["depth"])[..., 0]
        dmax = max(float(depth.max()), 1e-6)
        d8 = (np.clip(depth / dmax, 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(
            str(out_dir / "depth" / f"{i:05d}.png"),
            cv2.applyColorMap(d8, cv2.COLORMAP_TURBO),
        )
    from .eval.tools import write_video

    for src, name in (("color", "render_color.mp4"),
                      ("depth", "render_depth.mp4")):
        try:
            write_video(out_dir / src, out_dir / name, fps=args.fps)
        except Exception as e:  # pragma: no cover - codec-dependent
            print(f"video {name} failed: {e}")
    print(f"rendered {len(poses)} frames -> {out_dir}")


def cmd_convert_bag(args):
    from .config import load_config
    from .data.bag_convert import FASTLIVO_TOPICS, R3LIVE_TOPICS, convert_bag
    from .data.loader import camera_from_config

    cfg = load_config(args.config)
    cam = camera_from_config(cfg)
    if cam is None:
        raise SystemExit("config must define camera intrinsics")
    convert_bag(
        args.bag,
        args.out or Path(args.bag).with_suffix(""),
        cam,
        T_C_L=np.asarray(cfg.T_C_L) if cfg.T_C_L is not None else np.eye(4),
        T_B_L=np.asarray(cfg.T_B_L) if cfg.T_B_L is not None else np.eye(4),
        topics=R3LIVE_TOPICS if args.r3live else FASTLIVO_TOPICS,
        psnr_threshold=args.psnr_threshold,
        blur_threshold=args.blur_threshold,
    )


def cmd_export_colmap(args):
    from .config import load_config
    from .data.colmap_export import export_colmap
    from .data.loader import DataLoader

    cfg = load_config(args.config, args.data)
    dl = DataLoader(cfg)
    export_colmap(
        dl.parser, bin=not args.txt, llff=args.llff,
        nerfstudio=args.nerfstudio,
    )


def main(argv=None):
    # crash tracer (reference vendors backward-cpp, neural_mapping_node.cpp:8-14)
    import faulthandler

    faulthandler.enable()
    p = argparse.ArgumentParser(prog="gssdf_tpu")
    sub = p.add_subparsers(dest="mode", required=True)

    pt = sub.add_parser("train")
    pt.add_argument("config")
    pt.add_argument("data")
    pt.add_argument("--iters", type=int, default=None,
                    help="override sdf_iter_step")
    pt.add_argument("--gs-iters", type=int, default=None,
                    help="override gs_iter_step")
    pt.add_argument("--mesh", type=int, default=None,
                    help="data-parallel devices (0 = all local devices)")
    pt.add_argument("--resume", default=None, metavar="RUN_DIR",
                    help="continue an interrupted run from its run dir "
                         "(mid-GS-phase via model/gs_resume.npz)")
    pt.set_defaults(fn=cmd_train)

    pv = sub.add_parser("view")
    pv.add_argument("run_dir")
    pv.set_defaults(fn=cmd_view)

    pr = sub.add_parser("render")
    pr.add_argument("run_dir")
    pr.add_argument("pose_file")
    pr.add_argument("--camera-spec", default=None)
    pr.add_argument("--interpolate", type=int, default=1,
                    help="slerp-upsample the pose file by this factor")
    pr.add_argument("--fps", type=int, default=30)
    pr.add_argument("--out", default=None)
    pr.set_defaults(fn=cmd_render)

    pb = sub.add_parser("convert-bag")
    pb.add_argument("bag")
    pb.add_argument("config")
    pb.add_argument("--out", default=None)
    pb.add_argument("--r3live", action="store_true")
    pb.add_argument("--psnr-threshold", type=float, default=0.0,
                    help="skip frames with PSNR vs last export above this")
    pb.add_argument("--blur-threshold", type=float, default=0.0,
                    help="replace frames with Laplacian variance below this")
    pb.set_defaults(fn=cmd_convert_bag)

    pe = sub.add_parser("export-colmap")
    pe.add_argument("config")
    pe.add_argument("data")
    pe.add_argument("--txt", action="store_true")
    pe.add_argument("--llff", action="store_true")
    pe.add_argument("--nerfstudio", action="store_true")
    pe.set_defaults(fn=cmd_export_colmap)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
