"""Capture a device profile of the production render loop and summarize it.

One compile per scene (vs one per ablation variant), then a single traced
render gives per-op timings: pallas custom-calls, gathers, dots, and the
fused elementwise glue all show up as separate XLA ops.

    python scripts/trace_profile.py [scene] [spp]

Writes the raw trace under /tmp/jax_trace_<scene>/ and prints the top ops
by self-time if the xplane parser is available (falls back to listing the
trace files otherwise).
"""

import os as _os, sys as _sys
# importable from any cwd without PYTHONPATH: repo root hosts art_tpu/
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import os
import sys

from art_tpu.models import build_scene
from art_tpu.render.renderer import RenderConfig, render_scene

import jax

scene_name = sys.argv[1] if len(sys.argv) > 1 else "final_scene"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 30
nx, ny = 1200, 800

scene = build_scene(scene_name, nx, ny)
cfg = RenderConfig(nx=nx, ny=ny, spp=spp)
render_scene(scene, cfg, verbose=True)  # compile + warm

trace_dir = f"/tmp/jax_trace_{scene_name}"
with jax.profiler.trace(trace_dir):
    fb, stats = render_scene(scene, cfg, verbose=True)
print(f"rate={stats['mrays_per_sec']:.2f} Mrays/s")

files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("trace files:", files)

try:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for f in files:
        data, _ = rtd.xspace_to_tool_data([f], "hlo_op_profile", {})
        print(data[:4000])
except Exception as e:  # noqa: BLE001
    print(f"xplane parser unavailable ({e!r}); inspect manually")
