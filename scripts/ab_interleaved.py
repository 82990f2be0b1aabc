"""Interleaved A/B/A/B throughput harness — the required decision protocol.

Round 4 proved this shared chip drifts up to ~25% on byte-equal
executables within 31 minutes (docs/logs/queue_r4h.log: the same quads
program read 204.70 and 248.36 five minutes apart; commit 2088c61
withdrew a "regression" on that basis).  Single-shot A/Bs are therefore
not evidence.  This harness is the fix (VERDICT r4 next-round item 1):

  * runs every arm ALTERNATELY (A B A B ...) >= ``--reps`` times each in
    one session, so chip drift hits all arms equally;
  * each measurement is its own python process (env flags are read at
    import; the compile cache makes re-warm cheap) under the standard
    flock + bench-yield discipline (scripts/tpu_slot.sh semantics);
  * reports per-arm MEDIANS + spread and an overlap verdict.  A default
    may only be flipped when the medians separate beyond both arms'
    spread (verdict "SEPARATED").

Usage (parent never imports jax — safe to launch while deciding):

    python scripts/ab_interleaved.py quads 1200 600 500 \
        --arm dense: --arm elide:ART_TPU_SP_ELIDE=1 --reps 4 --inner 2

Arms are ``label:ENV=V,ENV=V`` (empty env = current defaults).

The reference has no measurement apparatus at all beyond one clock()
print (main.cu:699-712); on a time-shared accelerator the *methodology*
is part of the framework.
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
LOCK = "/tmp/tpu.lock"
YIELD = "/tmp/tpu.yield"
STALE_S = 2700  # matches tpu_slot.sh


def yield_wait():
    """Block while the driver bench holds the yield sentinel (stale-guarded)."""
    while os.path.exists(YIELD):
        now = time.time()
        try:
            mt = os.stat(YIELD).st_mtime
        except OSError:
            break
        if now - mt > STALE_S:
            try:
                os.unlink(YIELD)
            except OSError:
                pass
            break
        time.sleep(15)


def child(args):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache")
    )
    from art_tpu.models import build_scene
    from art_tpu.render.renderer import RenderConfig, render_scene

    scene = build_scene(args.scene, args.nx, args.ny)
    cfg = RenderConfig(nx=args.nx, ny=args.ny, spp=args.spp)
    render_scene(scene, cfg)  # compile / cache-load + chip warm
    rates, titers = [], []
    for _ in range(args.inner):
        _, st = render_scene(scene, cfg)
        rates.append(st["mrays_per_sec"])
        titers.append(st["seconds"] / max(st["iterations"], 1) * 1e3)
    print(json.dumps({"mrays": rates, "t_iter_ms": titers}), flush=True)


def parse_arm(spec):
    label, _, envs = spec.partition(":")
    env = {}
    if envs:
        for kv in envs.split(","):
            k, _, v = kv.partition("=")
            env[k] = v
    return label, env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("nx", type=int)
    ap.add_argument("ny", type=int)
    ap.add_argument("spp", type=int)
    ap.add_argument("--arm", action="append", required=False, default=[],
                    help="label:ENV=V,ENV=V (repeat; empty env = defaults)")
    ap.add_argument("--reps", type=int, default=4,
                    help="interleaved visits per arm (>=4 for a decision)")
    ap.add_argument("--inner", type=int, default=2,
                    help="timed renders per visit (median-of taken later)")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-visit child timeout (s)")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        child(args)
        return

    arms = [parse_arm(s) for s in (args.arm or ["control:"])]
    results = {label: [] for label, _ in arms}
    timeline = []
    t0 = time.time()
    print(
        f"[ab] {args.scene} {args.nx}x{args.ny}@{args.spp}  "
        f"arms={[a for a, _ in arms]}  reps={args.reps} inner={args.inner}",
        flush=True,
    )
    for rep in range(args.reps):
        for label, env in arms:
            yield_wait()
            e = dict(os.environ)
            e.update(env)
            cmd = [
                "flock", LOCK, "timeout", str(args.timeout),
                sys.executable, os.path.abspath(__file__),
                args.scene, str(args.nx), str(args.ny), str(args.spp),
                "--inner", str(args.inner), "--child",
            ]
            p = subprocess.run(cmd, env=e, capture_output=True, text=True)
            line = (p.stdout.strip().splitlines() or [""])[-1]
            try:
                payload = json.loads(line)
            except json.JSONDecodeError:
                print(
                    f"[ab] rep{rep} {label}: FAILED rc={p.returncode}\n"
                    f"{p.stderr[-2000:]}",
                    flush=True,
                )
                continue
            rate = statistics.median(payload["mrays"])
            results[label].append(rate)
            timeline.append((time.time() - t0, label, rate))
            print(
                f"[ab] +{time.time() - t0:7.1f}s rep{rep} {label:>12s}: "
                f"{rate:8.2f} Mrays/s  (inner {['%.1f' % r for r in payload['mrays']]})",
                flush=True,
            )

    print("[ab] ---- summary ----", flush=True)
    stats = {}
    for label, _ in arms:
        r = sorted(results[label])
        if not r:
            print(f"[ab] {label}: NO DATA", flush=True)
            continue
        med = statistics.median(r)
        stats[label] = (med, r[0], r[-1])
        print(
            f"[ab] {label:>12s}: median {med:8.2f}  min {r[0]:8.2f}  "
            f"max {r[-1]:8.2f}  n={len(r)}",
            flush=True,
        )
    if len(stats) == 2:
        (la, (ma, loa, hia)), (lb, (mb, lob, hib)) = stats.items()
        # Arms separate when their observed ranges don't overlap.
        separated = loa > hib or lob > hia
        faster = la if ma >= mb else lb
        print(
            f"[ab] VERDICT: {faster} faster by "
            f"{abs(ma - mb) / min(ma, mb) * 100:.1f}% "
            f"({'SEPARATED — decision valid' if separated else 'OVERLAP — no decision'})",
            flush=True,
        )


if __name__ == "__main__":
    main()
