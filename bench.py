"""Benchmark: book-1 final scene (bouncing spheres) on the real chip.

BASELINE.json metric: Mrays/sec/chip + sec/frame at 1200x800 @ 500 spp.
The reference publishes no numbers (BASELINE.md); the driver-set north star
is >= 100 Mrays/s/chip on TPU v5e.  ``vs_baseline`` is measured Mrays/s
divided by that target.

Prints ONE JSON line on stdout.  Wall-clock-bounded: renders fixed-shape
sample chunks (one compiled program) and reports the steady-state ray
throughput plus the extrapolated full-frame time.
"""

from __future__ import annotations

import json
import sys
import time

NX, NY, SPP_FULL = 1200, 800, 500
SPP_CHUNK = 500  # one compiled program; deep queue keeps pool occupancy high
TARGET_MRAYS = 100.0
TIME_BUDGET_S = 180.0


def main() -> None:
    from art_tpu.models import build_scene
    from art_tpu.render.renderer import RenderConfig, render_scene

    scene = build_scene("bouncing_spheres", NX, NY)
    cfg = RenderConfig(nx=NX, ny=NY, spp=SPP_CHUNK)

    print("bench: warm-up compile...", file=sys.stderr)
    render_scene(scene, cfg)  # compile + first run

    spp_done = 0
    total_rays = 0.0
    total_secs = 0.0
    start = time.perf_counter()
    while spp_done < SPP_FULL and (time.perf_counter() - start) < TIME_BUDGET_S:
        _, stats = render_scene(scene, cfg)
        spp_done += stats["spp"]
        total_rays += stats["rays"]
        total_secs += stats["seconds"]
        print(
            f"bench: spp={spp_done} rate={stats['mrays_per_sec']:.2f} Mrays/s",
            file=sys.stderr,
        )

    mrays = total_rays / total_secs / 1e6 if total_secs > 0 else 0.0
    sec_per_frame = total_secs * (SPP_FULL / max(spp_done, 1))

    result = {
        "metric": "Mrays_per_sec_per_chip(bouncing_spheres 1200x800)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "sec_per_frame_500spp": round(sec_per_frame, 2),
        "spp_measured": spp_done,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
