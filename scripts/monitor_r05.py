"""One-glance health dump of a running gated validation run.

Reads gs_log.txt + gs_log/mid/metrics.json + refine_log.txt (if present)
and prints the round-5 acceptance signals (DIAGNOSIS_r04 repair plan):
mid PSNR at each export, alive/drop_frac/clamp_frac trajectory, and the
grow-gate / capacity-rung event history.

Usage: python scripts/monitor_r05.py <run_dir>
"""
import json
import sys
from pathlib import Path

run = Path(sys.argv[1])

mid = run / "gs_log" / "mid" / "metrics.json"
if mid.exists():
    m = json.loads(mid.read_text())
    rows = sorted(
        ((int(k.split("_")[0]), v) for k, v in m.items()),
        key=lambda kv: kv[0],
    )
    print("iter   PSNR    SSIM")
    for it, v in rows:
        print(f"{it:>6} {v['PSNR']:7.2f} {v['SSIM']:7.3f}")
else:
    print("no mid metrics yet")

log = run / "gs_log.txt"
if log.exists():
    lines = log.read_text().strip().splitlines()
    hdr = lines[0].split()
    idx = {c: i for i, c in enumerate(hdr)}
    print("\nlast telemetry rows (gs_num / drop_frac / clamp_frac / psnr):")
    step = max(1, (len(lines) - 1) // 12)
    for ln in lines[1::step] + [lines[-1]]:
        f = ln.split()
        try:
            print(
                f"  gs_num {float(f[idx['gs_num']]):>9.0f}"
                f"  drop {float(f[idx['drop_frac']]):.3f}"
                f"  clamp {float(f[idx['clamp_frac']]):.3f}"
                + (f"  psnr {float(f[idx['psnr']]):.2f}"
                   if "psnr" in idx and idx["psnr"] < len(f) else "")
            )
        except (ValueError, IndexError):
            pass

rl = run / "refine_log.txt"
if rl.exists():
    evs = [json.loads(x) for x in rl.read_text().strip().splitlines()]
    gated = [e for e in evs if e.get("grow_gated")]
    rungs = [e for e in evs if "tile_cap" in e]
    rebuckets = [e for e in evs if "rebucket" in e or "shrink" in e]
    print(f"\nrefine events: {len(evs)} total, {len(gated)} gated, "
          f"rungs={[(e['iter'], e['tile_cap']) for e in rungs]}, "
          f"rebucket/shrink={[(e['iter'],
                               e.get('rebucket', e.get('shrink')))
                              for e in rebuckets]}")
    if gated:
        print(f"gated iters: {[e['iter'] for e in gated][:20]} ...")
