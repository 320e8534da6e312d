#!/usr/bin/env python
"""Headline benchmark: DDIM sampling throughput (samples/sec/chip).

Config matches the reference's north-star path (BASELINE.json): the
production PointUNetLarge denoiser (dim=256), 2048-point clouds, 1000
DDIM steps (diffusion.py:261-289), run as one compiled lax.scan with
HBM-resident latents.

Prints ONE JSON line:
  {"metric": "samples/sec/chip (2048-pt DDPM, 1000-step DDIM)",
   "value": <tpu samples/sec/chip>, "unit": "samples/sec/chip",
   "vs_baseline": <speedup vs the CPU reference-equivalent path>}

vs_baseline divides the TPU number by the *reference implementation's* CPU
throughput: a plain-torch UNetPointNetLarge driven by the reference's
Python DDIM loop (benchmarks/torch_reference.py; reference
diffusion.py:261-289 + networks.py:724-838), measured on this host. This
framework's own sampler on CPU is also measured and recorded as a secondary
figure. Both are measured once over a few steps, extrapolated linearly in
steps (the loop/scan body dominates and is step-invariant), and cached with
provenance in cpu_baseline.json. Target from BASELINE.json: >=10x.
"""

import json
import os
import platform
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_SAMPLES = 16
NUM_POINTS = 2048
NUM_STEPS = 1000
CPU_STEPS = 4  # extrapolated to NUM_STEPS
TORCH_BASELINE_STEPS = 20  # measured steps for the torch CPU denominator
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpu_baseline.json")

# Outage resilience (the axon TPU tunnel is known-flaky: BENCH_r03 was lost
# to a transient UNAVAILABLE window). The TPU measurement runs in a
# subprocess behind a cheap backend probe; on failure the probe+measure
# cycle retries with backoff. All knobs are env-overridable so tests can
# simulate failure cheaply.
BENCH_ATTEMPTS = max(1, int(os.environ.get("SHAPEGEN_BENCH_ATTEMPTS", "4")))
BENCH_BACKOFF = [
    float(s)
    for s in os.environ.get("SHAPEGEN_BENCH_BACKOFF_SECONDS", "30,60,120").split(",")
    if s.strip()
] or [30.0]
PROBE_TIMEOUT = float(os.environ.get("SHAPEGEN_BENCH_PROBE_TIMEOUT", "300"))
WORKER_TIMEOUT = float(os.environ.get("SHAPEGEN_BENCH_WORKER_TIMEOUT", "3600"))
# Killing a TPU client can jam the remote grant for minutes (CLAUDE.md);
# after a timeout-kill, wait at least this long before touching the tunnel
# again so retries don't burn against a self-inflicted jam.
JAM_COOLDOWN = float(os.environ.get("SHAPEGEN_BENCH_JAM_COOLDOWN", "180"))


def _build():
    import jax
    import jax.numpy as jnp

    from shapegen_tpu import models
    from shapegen_tpu.core import samplers

    model = models.PointUNetLarge(dim=256, time_dim=256)
    x0 = jnp.zeros((1, NUM_POINTS, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)), train=False)

    def denoise(x, t):
        return model.apply(variables, x, t, train=False)

    def make_sampler(num_steps):
        def run(key):
            return samplers.ddim_sample(
                key, denoise, (NUM_SAMPLES, NUM_POINTS, 3), num_steps=num_steps
            )

        return jax.jit(run)

    return jax, make_sampler


def measure(num_steps, repeats=2):
    import numpy as np

    jax, make_sampler = _build()
    run = make_sampler(num_steps)
    key = jax.random.PRNGKey(24)

    def sync(out):
        # Force completion via a data fetch: on the axon tunnel,
        # block_until_ready can return before remote execution finishes;
        # fetching a scalar slice is a reliable barrier (costs <1 ms).
        np.asarray(jax.device_get(out[0, 0]))

    sync(run(key))  # compile
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        sync(run(jax.random.fold_in(key, i)))
        best = min(best, time.perf_counter() - t0)
    return best


def _run_json(cmd, env=None):
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if out.returncode != 0 or not out.stdout.strip():
        # Surface the failure on stderr (stdout must stay one JSON line).
        print(out.stderr, file=sys.stderr)
        raise RuntimeError(f"baseline subprocess failed: {cmd}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _measure_torch_reference():
    """The reference path: plain-torch model + Python DDIM loop."""
    return _run_json(
        [sys.executable, os.path.join("benchmarks", "torch_reference.py"),
         "--measure-steps", str(TORCH_BASELINE_STEPS)]
    )


def _measure_framework_cpu():
    """This framework's own lax.scan sampler on the CPU backend (secondary
    figure — shows the JAX-vs-torch CPU gap separately from the TPU gain)."""
    # PALLAS_AXON_POOL_IPS must be cleared: the image's sitecustomize
    # otherwise forces the axon TPU platform over JAX_PLATFORMS.
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    code = (
        "import bench, json; t = bench.measure(bench.CPU_STEPS, repeats=1); "
        "full = t * bench.NUM_STEPS / bench.CPU_STEPS; "
        "print(json.dumps({'framework_cpu_samples_per_sec':"
        " bench.NUM_SAMPLES / full,"
        " 'framework_cpu_measured_steps': bench.CPU_STEPS}))"
    )
    return _run_json([sys.executable, "-c", code], env=env)


def _host_provenance():
    """Cache key: a measurement is only valid on the host/stack it was made
    on. Uses importlib.metadata (no torch import in the TPU process)."""
    from importlib.metadata import version

    return {
        "torch_version": version("torch"),
        "platform": platform.platform(),
        "cpu_count": os.cpu_count(),
    }


def cpu_baseline():
    """Cached CPU baselines, keyed on (torch version, platform, cpu_count);
    auto-(re)measures on provenance mismatch, missing cache, or a
    measurement shorter than TORCH_BASELINE_STEPS steps."""
    want = _host_provenance()
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            data = json.load(f)
        prov = data.get("provenance", {})
        if (
            "torch_cpu_samples_per_sec" in data
            and prov.get("measured_steps", 0) >= TORCH_BASELINE_STEPS
            and all(prov.get(k) == v for k, v in want.items())
        ):
            return data
    data = _measure_torch_reference()
    data.update(_measure_framework_cpu())
    with open(CACHE, "w") as f:
        json.dump(data, f, indent=1)
    return data


class _KilledClient(RuntimeError):
    """A TPU-client subprocess was killed on timeout; the remote grant may
    be jammed for minutes, so retries must cool down first."""


def _subprocess_line(args, timeout):
    """Run [python, *args] in this directory; return its last stdout line.

    Raises RuntimeError (with the stderr tail folded in) on nonzero exit,
    empty stdout, or timeout — the caller's retry loop handles it.
    """
    try:
        out = subprocess.run(
            [sys.executable] + args,
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        # The kill may have jammed the remote grant — tell the retry loop.
        raise _KilledClient(f"timed out after {timeout:.0f}s: {args}")
    if out.returncode != 0 or not out.stdout.strip():
        tail = (out.stderr or "").strip().splitlines()[-3:]
        raise RuntimeError(f"rc={out.returncode}: {' | '.join(tail) or 'no output'}")
    return out.stdout.strip().splitlines()[-1]


def _probe_backend():
    """Cheap liveness check: one tiny op through the device, fresh process.

    Fails in seconds when the tunnel is down (vs minutes wasted on the full
    model build), and a fresh process sidesteps JAX's caching of a failed
    backend initialization.
    """
    code = (
        "import jax, numpy as np; "
        "print(float(np.asarray(jax.device_get(jax.numpy.ones(()) + 1))))"
    )
    _subprocess_line(["-c", code], PROBE_TIMEOUT)


def _measure_tpu_once():
    """Full measurement in a subprocess -> samples/sec. A crash, hang, or
    backend error is contained there; the parent never imports jax."""
    line = _subprocess_line(["bench.py", "--tpu-worker"], WORKER_TIMEOUT)
    return json.loads(line)["tpu_samples_per_sec"]


def measure_tpu_with_retry():
    """Probe-then-measure with bounded backoff across tunnel outages."""
    errors = []
    t_start = time.time()
    killed_last = False
    for attempt in range(BENCH_ATTEMPTS):
        if attempt:
            wait = BENCH_BACKOFF[min(attempt - 1, len(BENCH_BACKOFF) - 1)]
            if killed_last:
                wait = max(wait, JAM_COOLDOWN)
            time.sleep(wait)
        try:
            _probe_backend()
            return _measure_tpu_once()
        except Exception as e:  # noqa: BLE001 — retry loop boundary
            killed_last = isinstance(e, _KilledClient)
            errors.append(str(e)[:200])
            print(f"bench attempt {attempt + 1}/{BENCH_ATTEMPTS} failed: {e}",
                  file=sys.stderr)
    waited = time.time() - t_start
    raise RuntimeError(
        f"TPU backend unavailable after {BENCH_ATTEMPTS} attempts over "
        f"{waited / 60:.1f} min; last error: {errors[-1]}"
    )


def main():
    """Always prints exactly ONE JSON line on stdout (driver contract):
    value is the measured throughput, or null with an `error` field when
    the backend stayed unavailable through the retry window."""
    result = {
        "metric": "samples/sec/chip (2048-pt DDPM, 1000-step DDIM)",
        "value": None,
        "unit": "samples/sec/chip",
        "vs_baseline": None,
    }
    try:
        tpu_sps = measure_tpu_with_retry()
        result["value"] = round(tpu_sps, 4)
        try:
            vs = tpu_sps / cpu_baseline()["torch_cpu_samples_per_sec"]
            result["vs_baseline"] = round(vs, 2)
        except Exception as e:  # noqa: BLE001 — baseline is best-effort
            print(f"cpu baseline unavailable: {e}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — the one JSON line must survive
        result["error"] = str(e)[:400]
    print(json.dumps(result))


if __name__ == "__main__":
    if "--tpu-worker" in sys.argv:
        t = measure(NUM_STEPS)
        print(json.dumps({"tpu_samples_per_sec": NUM_SAMPLES / t}))
    else:
        main()
