#!/usr/bin/env python
"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline: shaded-rasterization throughput in Mpix/s over the reference's
12-scene benchmark suite (rasterizer.rs:1781-1884: 512x512, Fill, shader 5
CMRefl, envmap Grace, tick 0; best-of-N timing). `vs_baseline` is the speedup
of the suite total vs the reference CPU's stored 27,286 us total
(BASELINE.md).

Tunnel robustness (VERDICT r3 weak #1): the axon remote-TPU tunnel can die
mid-run, hanging the in-flight dispatch forever — round 3 lost its entire
bench to that. This harness therefore:
  * persists every completed metric to BENCH_PARTIAL.jsonl the moment it
    lands (fsync'd), and resumes from it on re-runs at the same commit;
  * orders the work so headline metrics land first (SWAR GoL, block-BH,
    two raster scenes) before the long tail of the suite;
  * runs a watchdog that, if any single step exceeds its budget, prints
    the summary of whatever is complete and force-exits — a tunnel window
    shorter than the suite still produces real numbers (with a
    ``partial``/``stale`` marker instead of silence).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
PARTIAL = ROOT / "BENCH_PARTIAL.jsonl"

# NOTE: do NOT enable the persistent XLA compile cache here. Measured on
# the axon (remote-TPU tunnel) platform: cache WRITES succeed but the
# first cache HIT hangs the process indefinitely (deserialization never
# completes), while the same config works on CPU (tests/conftest.py).
# The 12-scene suite therefore pays ~7 min of cold compiles per process.


def _git_sha() -> str:
    try:
        out = subprocess.run(["git", "-C", str(ROOT), "rev-parse",
                              "--short", "HEAD"],
                             capture_output=True, text=True, timeout=10)
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _engine_hash() -> str:
    """Content hash of everything a bench number depends on.

    Keying reuse on the git sha voided a completed capture whenever a
    DOCS-ONLY commit landed after it — and a tunnel flap at the re-run
    then erased real measurements (round 3's failure mode). Hash the
    engine package + this harness instead: results are keyed to the code
    that produced them, and prose commits cannot invalidate them.
    """
    import hashlib

    h = hashlib.sha256()
    files = sorted((ROOT / "rustexp_tpu").rglob("*"))
    for p in files + [ROOT / "bench.py"]:
        if p.is_file() and "__pycache__" not in p.parts:
            h.update(str(p.relative_to(ROOT)).encode())
            h.update(p.read_bytes())
    return h.hexdigest()[:12]


class Recorder:
    """Append-only metric store surviving a mid-run tunnel death."""

    def __init__(self):
        self.sha = _engine_hash()
        self.git_sha = _git_sha()
        self.results: dict[str, dict] = {}
        self.reused: list[str] = []
        # Fallback records from DIFFERENT engine versions: only ever
        # surfaced when the backend is unreachable, explicitly marked.
        # The newest record per name wins (the file is append-only), and
        # each fallback payload keeps the engine hash it was measured at
        # so the emitted attribution covers exactly the surfaced records.
        self.fallback: dict[str, dict] = {}
        self.fallback_shas: dict[str, str] = {}
        # Backend each record was measured on (legacy records predate the
        # field; every one of those was a TPU capture, backend name "tpu").
        # A CPU smoke run of this harness writes records under the SAME
        # content hash — without the tag a later TPU run would silently
        # reuse CPU numbers.
        self.backend: str | None = None
        self.result_backends: dict[str, str] = {}
        if PARTIAL.exists():
            for line in PARTIAL.read_text().splitlines():
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if not rec.get("name"):
                    continue
                # Legacy records (pre-round-4) were keyed by git sha;
                # accept the current git sha as an alternate match so a
                # byte-identical tree doesn't demote its own captures.
                if rec.get("sha") in (self.sha, self.git_sha):
                    if rec["name"] not in self.results:
                        self.reused.append(rec["name"])
                    self.results[rec["name"]] = rec["payload"]
                    self.result_backends[rec["name"]] = rec.get(
                        "backend", "tpu")
                else:
                    # Fallbacks are only ever surfaced as prior TPU
                    # captures — never let a CPU smoke run stand in.
                    if rec.get("backend", "tpu") != "tpu":
                        continue
                    self.fallback[rec["name"]] = rec["payload"]
                    self.fallback_shas[rec["name"]] = str(rec.get("sha"))

    def set_backend(self, backend: str) -> None:
        """Pin the live backend; drop reused records measured elsewhere."""
        self.backend = backend
        for name in [n for n, b in self.result_backends.items()
                     if b != backend]:
            del self.results[name]
            del self.result_backends[name]
            if name in self.reused:
                self.reused.remove(name)

    def done(self, name: str) -> bool:
        return name in self.results

    def record(self, name: str, payload: dict) -> None:
        self.results[name] = payload
        if name in self.reused:
            self.reused.remove(name)
        with PARTIAL.open("a") as f:
            f.write(json.dumps({"name": name, "payload": payload,
                                "sha": self.sha, "backend": self.backend,
                                "t": time.time()}) + "\n")
            f.flush()
            os.fsync(f.fileno())
        print(f"# recorded {name}: {payload}", file=sys.stderr, flush=True)


class Watchdog:
    """Emit the partial summary and hard-exit if a step wedges.

    A dead tunnel hangs the dispatch inside the PJRT client — no Python
    exception ever surfaces, so only an out-of-band thread can salvage
    the already-recorded metrics.
    """

    def __init__(self, emit, budget_s: float = 900.0):
        self._deadline = time.monotonic() + budget_s
        self._emit = emit
        self._lock = threading.Lock()
        threading.Thread(target=self._run, daemon=True).start()

    def beat(self, budget_s: float) -> None:
        with self._lock:
            self._deadline = time.monotonic() + budget_s

    def _run(self) -> None:
        while True:
            time.sleep(5)
            with self._lock:
                late = time.monotonic() > self._deadline
            if late:
                print("# watchdog: step budget exceeded (tunnel death "
                      "mid-dispatch?) — emitting partial results",
                      file=sys.stderr, flush=True)
                try:
                    self._emit(partial=True)
                finally:
                    os._exit(0)


def compose_summary(rec: Recorder, partial: bool = False) -> dict:
    """One JSON line from whatever metrics are complete."""
    from rustexp_tpu.app.benchmark import SCENES, W, H

    r = rec.results
    scenes = {name: r[f"scene:{name}"] for name, *_ in SCENES
              if f"scene:{name}" in r}
    out: dict = {}
    if scenes:
        total_us = sum(v["us"] for v in scenes.values())
        ref_total = sum(v["ref_us"] for v in scenes.values())
        complete = len(scenes) == len(SCENES)
        out = {
            "metric": ("raster_suite_Mpix_per_s" if complete
                       else "raster_suite_partial_Mpix_per_s"),
            "value": round(len(scenes) * W * H / total_us, 1),
            "unit": "Mpix/s",
            "vs_baseline": round(ref_total / total_us, 3),
            "suite_total_us": round(total_us),
            "scenes_done": len(scenes),
            "scene_us": {k: round(v["us"], 1) for k, v in scenes.items()},
            # In-session best-to-worst spread per scene (VERDICT r4
            # weak #4): the noise floor travels with the numbers.
            "scene_spread_pct": {k: v.get("spread_pct")
                                 for k, v in scenes.items()
                                 if v.get("spread_pct") is not None},
        }
    elif "gol_256" in r:
        out = {"metric": "gol_cell_updates_per_s",
               "value": r["gol_256"]["value"], "unit": "cells/s",
               "vs_baseline": None}
    elif "sine" in r:
        out = dict(r["sine"])
    else:
        out = {"metric": "backend_unavailable", "value": 0, "unit": "error",
               "vs_baseline": None,
               "error": "jax backend init hung/failed (TPU tunnel down?) — "
                        "no measurement taken; see BENCH history for real "
                        "numbers from this tree"}
    if "gol_256" in r:
        out["gol_cell_updates_per_s"] = r["gol_256"]["value"]
        out["gol_gens_per_s"] = r["gol_256"]["gens_per_s"]
        if r["gol_256"].get("spread_pct") is not None:
            out["gol_spread_pct"] = r["gol_256"]["spread_pct"]
        if r["gol_256"].get("note"):
            out["gol_256_note"] = r["gol_256"]["note"]
    if "gol_2048" in r:
        out["gol_2048_cell_updates_per_s"] = r["gol_2048"]["value"]
        if r["gol_2048"].get("spread_pct") is not None:
            out["gol_2048_spread_pct"] = r["gol_2048"]["spread_pct"]
    if "nbody_bh" in r:
        out["nbody_bh_steps_per_s_131k"] = r["nbody_bh"]["value"]
        if r["nbody_bh"].get("spread_pct") is not None:
            out["nbody_bh_spread_pct"] = r["nbody_bh"]["spread_pct"]
    if "nbody_brute" in r:
        out["nbody_brute_steps_per_s_131k"] = r["nbody_brute"]["value"]
    moving = {name: r[f"moving:{name}"] for name, *_ in SCENES
              if f"moving:{name}" in r}
    if moving:
        mv_total = sum(v["value"] for v in moving.values())
        ref_total = sum(ref for name, _m, _p, ref in SCENES if name in moving)
        out["moving_suite_total_us"] = round(mv_total)
        out["moving_scenes_done"] = len(moving)
        out["moving_vs_baseline"] = round(ref_total / mv_total, 3)
        out["moving_scene_us"] = {k: round(v["value"], 1)
                                  for k, v in moving.items()}
        out["moving_scene_spread_pct"] = {
            k: v.get("spread_pct") for k, v in moving.items()
            if v.get("spread_pct") is not None}
        if "KillerooP" in moving:
            out["raster_moving_camera_us_KillerooP"] = \
                moving["KillerooP"]["value"]
    if partial:
        out["partial"] = True
    if rec.reused:
        out["stale"] = True
        out["reused_from_partial"] = sorted(rec.reused)
    out["sha"] = rec.git_sha
    out["engine_hash"] = rec.sha
    return out


def bench_sine() -> dict:
    import jax
    import jax.numpy as jnp
    from rustexp_tpu.sims.sine import sine_frame

    w = h = 512
    wi = jnp.arange(w, dtype=jnp.float32)
    hi = jnp.arange(h, dtype=jnp.float32)
    run = lambda: jax.block_until_ready(sine_frame(wi, hi, 0.5))
    for _ in range(2):
        run()
    best = float("inf")
    for _ in range(20):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return {"metric": "sine_fill_Mpix_per_s",
            "value": round(w * h / best / 1e6, 1),
            "unit": "Mpix/s", "vs_baseline": None}


def main():
    rec = Recorder()

    def emit(partial: bool = False):
        print(json.dumps(compose_summary(rec, partial=partial)), flush=True)

    wd = Watchdog(emit, budget_s=900.0)

    # Probe in a subprocess with a hard timeout — the axon backend hangs
    # forever inside device init when the tunnel relay is down. Importing
    # rustexp_tpu here is safe: the package is import-time device-free.
    # The tunnel FLAPS (observed: relay dies and is restarted minutes to
    # hours later), so retry within a bounded window before giving up.
    from rustexp_tpu.core.platform import probe_backend

    wd.beat(1000.0)
    deadline = time.monotonic() + 600
    backend = probe_backend(timeout_s=150)
    while backend is None and time.monotonic() < deadline:
        print("# backend probe failed; retrying (tunnel flap?)",
              file=sys.stderr, flush=True)
        time.sleep(60)
        backend = probe_backend(timeout_s=150)
    if backend is None:
        if not rec.results and rec.fallback:
            # Dead tunnel, nothing measured for THIS engine version:
            # surface the newest prior capture instead of silence,
            # loudly marked as from a different engine hash.
            surfaced_shas = sorted(set(rec.fallback_shas.values()))
            print("# backend dead; emitting newest prior capture per "
                  f"metric (engine hash(es) {surfaced_shas}, "
                  f"current {rec.sha})", file=sys.stderr, flush=True)
            rec.results.update(rec.fallback)
            rec.reused = sorted(rec.fallback)
            out = compose_summary(rec, partial=True)
            out["stale_engine"] = True
            # Per-result attribution: exactly the hashes of the payloads
            # surfaced above (not the union of every hash ever seen).
            out["measured_at"] = surfaced_shas
            out["measured_at_by_metric"] = dict(sorted(
                rec.fallback_shas.items()))
            print(json.dumps(out), flush=True)
            sys.exit(1)
        emit()
        sys.exit(1)
    print(f"# backend: {backend}", file=sys.stderr, flush=True)
    rec.set_backend(backend)
    from rustexp_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    from rustexp_tpu.app import benchmark as bm

    # Headline metrics first (VERDICT r3 next-1): SWAR GoL + block-BH +
    # two raster scenes land inside the first few minutes of a live
    # tunnel; the long tail of the suite follows.
    headline_scenes = ("KillerooP", "CornellBoxV")
    steps: list[tuple[str, float, object]] = [
        ("gol_256", 600, lambda: bm.bench_gol()),
        ("nbody_bh", 600, lambda: bm.bench_nbody(backend="bh")),
    ]
    scene_by_name = {name: (name, mesh_idx, per_pixel, ref_us)
                     for name, mesh_idx, per_pixel, ref_us in bm.SCENES}

    def scene_step(name):
        _, mesh_idx, per_pixel, ref_us = scene_by_name[name]

        def run():
            st = bm.bench_scene(mesh_idx, per_pixel, runs=20,
                                return_stats=True)
            return {"us": st["best"] * 1e6, "ref_us": ref_us,
                    "speedup": round(ref_us / (st["best"] * 1e6), 3),
                    "us_median": round(st["median"] * 1e6, 1),
                    "spread_pct": st["spread_pct"],
                    "n_runs": st["n_runs"]}
        return run

    for name in headline_scenes:
        steps.append((f"scene:{name}", 900, scene_step(name)))
    steps += [
        # k=65536 gens/dispatch: at k=16384 the ~20 ms dispatch/tunnel
        # overhead still eats ~34% of the measurement (1.15e12 vs the
        # sustained 1.81e12; re-verified 2026-08-18 on chip).
        ("gol_2048", 600, lambda: bm.bench_gol(n=2048,
                                               generations_per_dispatch=65536)),
        ("nbody_brute", 600, lambda: bm.bench_nbody(backend="pallas",
                                                    steps_per_dispatch=32)),
    ]
    for name, *_ in bm.SCENES:
        if name not in headline_scenes:
            steps.append((f"scene:{name}", 900, scene_step(name)))
    # Full moving-camera suite (VERDICT r3 next-3): per-frame in-graph
    # queue rebuild for every scene — the honest interactive number.
    # KillerooP first (round-2/3 continuity), then the rest.
    def moving_step(name):
        _, mesh_idx, per_pixel, ref_us = scene_by_name[name]
        return lambda: bm.bench_scene_moving(mesh_idx, per_pixel,
                                             runs=4, k=128)

    moving_order = ["KillerooP"] + [n for n, *_ in bm.SCENES
                                    if n != "KillerooP"]
    for name in moving_order:
        steps.append((f"moving:{name}", 900, moving_step(name)))
    # NOT in the suite: bench_scene_moving_amortized (temporal-coherence
    # structure reuse, bit-exact per frame). Measured r4 verdict: wins
    # only on large-triangle scenes (CubeP 1842 -> 1623 us) and loses
    # badly where triangles are small (KillerooP 2659 -> 8570 — dilation
    # multiplies the pair count); per-frame in-graph rebuild remains the
    # production moving path. See BASELINE.md round-4 notes.

    for name, budget, fn in steps:
        if rec.done(name):
            # Resume: a previous process at this commit already measured
            # it — skip straight to the incomplete metrics so a second
            # tunnel window isn't spent re-earning the first window's
            # numbers (the summary carries a ``stale`` marker).
            print(f"# reusing {name} from BENCH_PARTIAL (same sha)",
                  file=sys.stderr, flush=True)
            continue
        wd.beat(budget)
        try:
            rec.record(name, fn())
        except Exception as e:
            print(f"# {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    wd.beat(300)

    if not rec.results:
        try:
            rec.record("sine", bench_sine())
        except Exception as e:
            print(f"# sine fallback failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    emit()


if __name__ == "__main__":
    main()
