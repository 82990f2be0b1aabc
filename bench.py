"""Benchmark: per-scene throughput sweep on the real chip.

Headline metric (BASELINE.json): Mrays/sec/chip + sec/frame at 1200x800
@ 500 spp on the book-1 final scene (bouncing spheres).  The reference
publishes no numbers (BASELINE.md); the driver-set north star is >= 100
Mrays/s/chip on TPU v5e.  ``vs_baseline`` is measured Mrays/s divided by
that target.

Also measures cornell_smoke (quads + media) and final_scene (boxes +
media + every texture) at reduced spp so a regression in the non-sphere
kernels shows up in BENCH_r*.json (VERDICT r1 weakness #4).

Prints ONE JSON line on stdout.  Wall-clock-bounded: renders fixed-shape
sample chunks (one compiled program per scene) and reports steady-state
ray throughput plus the extrapolated full-frame time.
"""

from __future__ import annotations

import os

# Persistent compile cache: remote TPU compiles are minutes-long and the
# serialized executables reload across processes (docs/PERF_NOTES.md).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import json
import sys
import time

NX, NY, SPP_FULL = 1200, 800, 500
SPP_CHUNK = 500  # one compiled program; deep queue keeps pool occupancy high
TARGET_MRAYS = 100.0
TIME_BUDGET_S = 150.0

# secondary scenes: (nx, ny, spp per measured chunk, time budget).
# Chunk spp >= 400 matters: the windowed framebuffer flush and pool
# occupancy both improve with queue depth, and the official configs for
# these scenes run 1000-10000 spp — shallow chunks understate production
# throughput (spp=100 chunks measured ~25% low on final_scene).
SWEEP = [
    ("cornell_smoke", 600, 600, 400, 60.0),
    ("final_scene", 800, 800, 500, 90.0),
    # Short-path megakernel scene (ops/sp_kernel.py): quads takes the SP
    # path at defaults, so a regression in that kernel or its builder
    # gate moves a driver-captured artifact (VERDICT r3 Weak #5).
    ("quads", 1200, 600, 500, 45.0),
    # The two remaining below-bar scenes (VERDICT r4 item 7): earth is
    # image-fetch-bound, original_scene exercises cluster + image fetch
    # + noodle turbulence together.  Time-budgeted like the rest so the
    # driver bench regression-tracks them every round.
    ("earth", 1200, 600, 500, 45.0),
    # spp=500 matches the cached A/B-queue program (plan_batches keys
    # the compiled shape on spp — a novel spp would recompile for min).
    ("original_scene", 800, 800, 500, 75.0),
]


def measure(name, nx, ny, spp, budget_s):
    from art_tpu.models import build_scene
    from art_tpu.render.renderer import RenderConfig, render_scene

    scene = build_scene(name, nx, ny)
    cfg = RenderConfig(nx=nx, ny=ny, spp=spp)
    print(f"bench[{name}]: warm-up compile...", file=sys.stderr)
    render_scene(scene, cfg)  # compile + first run
    total_rays = 0.0
    total_secs = 0.0
    spp_done = 0
    start = time.perf_counter()
    while (time.perf_counter() - start) < budget_s:
        _, stats = render_scene(scene, cfg)
        total_rays += stats["rays"]
        total_secs += stats["seconds"]
        spp_done += stats["spp"]
        print(
            f"bench[{name}]: spp={spp_done} rate={stats['mrays_per_sec']:.2f} Mrays/s",
            file=sys.stderr,
        )
        if spp_done >= SPP_FULL:
            break
    mrays = total_rays / total_secs / 1e6 if total_secs > 0 else 0.0
    return mrays, total_secs, spp_done


def _acquire_tpu_slot(max_wait_s: float = 1800.0):
    """Cooperative exclusivity with this repo's background TPU runners.

    Every background TPU job here serializes through /tmp/tpu.lock
    (scripts/run_ab_static.sh): the axon sitecustomize probes the tunnel
    at import in EVERY process, so a second concurrent python breaks a
    running TPU job with FAILED_PRECONDITION.  Wait up to max_wait_s for
    the lock, then proceed regardless (never deadlock the driver on a
    wedged background job).

    Priority protocol (round-2 verdict Weak #1 — the driver bench must
    always win): raise the /tmp/tpu.yield sentinel first.  Every runner
    in scripts/run_*.sh checks the sentinel between flocked runs and
    sleeps while it exists, so bench acquires the lock as soon as the
    in-flight run (not the whole queue) finishes.  The sentinel is
    removed at process exit."""
    import atexit
    import fcntl

    try:
        with open("/tmp/tpu.yield", "w") as s:
            s.write(f"bench.py pid={os.getpid()}\n")

        def _clear_yield():
            try:
                os.unlink("/tmp/tpu.yield")
            except OSError:
                pass

        atexit.register(_clear_yield)
    except OSError:
        pass
    try:
        fh = open("/tmp/tpu.lock", "w")
    except OSError:
        return None
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        try:
            fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return fh  # held until process exit
        except OSError:
            print("bench: waiting for /tmp/tpu.lock...", file=sys.stderr)
            time.sleep(30.0)
    print("bench: lock wait expired; proceeding", file=sys.stderr)
    return fh


def _wait_for_tunnel(max_wait_s: float = 1200.0) -> bool:
    """The axon TPU tunnel has multi-hour outages (a down-tunnel probe
    HANGS rather than erroring).  Probe in a disposable subprocess with a
    timeout and give the tunnel a bounded chance to come back before the
    measurement starts; after the deadline, proceed and let the real run
    surface the failure."""
    import subprocess

    deadline = time.time() + max_wait_s
    while True:
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=300.0,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        if time.time() >= deadline:
            print("bench: backend probe still failing; proceeding", file=sys.stderr)
            return False
        print("bench: backend probe failed; retrying...", file=sys.stderr)
        time.sleep(60.0)


def main() -> None:
    _lock = _acquire_tpu_slot()
    _wait_for_tunnel()
    mrays, secs, spp_done = measure(
        "bouncing_spheres", NX, NY, SPP_CHUNK, TIME_BUDGET_S
    )
    sec_per_frame = secs * (SPP_FULL / max(spp_done, 1))

    per_scene = {"bouncing_spheres": round(mrays, 3)}
    for name, nx, ny, spp, budget in SWEEP:
        try:
            m, _, _ = measure(name, nx, ny, spp, budget)
            per_scene[name] = round(m, 3)
        except Exception as e:  # a sweep failure must not kill the headline
            print(f"bench[{name}]: FAILED {e!r}", file=sys.stderr)
            per_scene[name] = None

    result = {
        "metric": "Mrays_per_sec_per_chip(bouncing_spheres 1200x800)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "sec_per_frame_500spp": round(sec_per_frame, 2),
        "spp_measured": spp_done,
        "per_scene_mrays": per_scene,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
