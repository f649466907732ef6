"""Headline benchmark: k-mers sketched per second per chip.

Measures the fused device pipeline (2-bit canonical encode -> WangHash ->
HLL register scatter-max) on device-resident tiles — the hot loop that
dominates `dashing sketch` (reference src/sketch_and_cmp.h:484-528).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N}

vs_baseline compares against a single-thread numpy host implementation of
the identical pipeline (the reference binary is not buildable here: its
bonsai submodule is absent from the mount and the environment has no
network; SURVEY.md sec 0/6).  The denominator is PINNED in BASELINE.json
("pinned_numpy_baseline_kmers_per_sec"): re-measuring it per run on this
shared single-core host swung the ratio 137-252 across driver rounds with
the device rate flat (VERDICT r4 weak #6).  A fresh in-process measurement
is still taken and reported as "host_baseline_measured" for drift
monitoring, but the headline ratio uses the pinned constant.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


K = 31
P = 14
ROWS = 256
CONTENT = 8192             # matches the pipeline tile geometry
ITERS = 30


def device_rate() -> float:
    import functools
    import jax
    if os.environ.get("DASHING_TPU_PLATFORM"):
        # same opt-out as the CLI: the axon PJRT plugin is registered by
        # sitecustomize before this code runs, so env JAX_PLATFORMS is
        # too late — the config update is the only reliable override
        jax.config.update("jax_platforms", os.environ["DASHING_TPU_PLATFORM"])
    # the CLI's persistent compile cache (same resolution as cli/main.py):
    # without it every supervised child re-pays 60-160 s of TPU compiles
    # inside its 900 s timeout
    cache_dir = os.environ.get(
        "DASHING_TPU_CACHE_DIR",
        os.path.join(os.environ.get("XDG_CACHE_HOME",
                                    os.path.join(os.path.expanduser("~"),
                                                 ".cache")),
                     "dashing_tpu_xla"))
    if cache_dir:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass
    import jax.numpy as jnp
    from dashing_tpu.ops.encode import encode_tile
    from dashing_tpu.ops.hll_update import (_ROW, adaptive_cap,
                                            update_registers_filtered,
                                            update_from_idx_rank)
    from dashing_tpu.hashes import wang_hash

    positions = tuple(range(K))
    plat = jax.devices()[0].platform.lower()
    use_pallas = plat in ("tpu", "axon")

    # chunk i -> survivor capacity, mirroring production's per-chunk choice
    # (ops/hll_update.adaptive_cap); the schedule is static at trace time
    # and selected in-jit by lax.switch, so the whole stream stays ONE
    # dispatch (per-segment dispatches cost ~8 ms tunnel RTT each).
    per_chunk = ROWS * CONTENT
    caps = sorted({adaptive_cap(_ROW, 1 << P, i * per_chunk)
                   for i in range(ITERS)})
    cap_idx = np.array([caps.index(adaptive_cap(_ROW, 1 << P, i * per_chunk))
                        for i in range(ITERS)], np.int32)

    @jax.jit
    def run(chunks, regs, cap_idx):
        def update(cap, chunk, regs):
            if use_pallas:
                from dashing_tpu.ops.pallas_encode import (
                    encode_hash_keys, keys_to_update_inputs)
                keys = encode_hash_keys(chunk, k=K, p=P)
                idx, rank = keys_to_update_inputs(keys)
                return update_from_idx_rank(regs, idx, rank, cap=cap)
            km, valid = encode_tile(chunk, k=K, w=K, positions=positions,
                                    span=K, canon=True)
            h = wang_hash(km)
            return update_registers_filtered(regs, h, valid, P, cap=cap)

        def body(i, regs):
            branches = [functools.partial(update, cap) for cap in caps]
            return jax.lax.switch(cap_idx[i], branches, chunks[i], regs)
        return jax.lax.fori_loop(0, chunks.shape[0], body, regs)

    rng = np.random.default_rng(0)
    C = CONTENT + K - 1
    chunks = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                    size=(ITERS, ROWS, C)))
    regs = jnp.zeros(1 << P, jnp.int32)
    ci = jnp.asarray(cap_idx)
    _ = jax.device_get(run(chunks, regs, ci))     # compile + warm
    kmers = ROWS * CONTENT * ITERS
    best = 0.0
    for _rep in range(3):
        t0 = time.perf_counter()
        out = run(chunks, regs, ci)
        _ = jax.device_get(out)                   # forces real completion
        best = max(best, kmers / (time.perf_counter() - t0))
    return best


def host_baseline_rate() -> float:
    """Single-thread numpy version of the same pipeline (measured, then
    treated as the per-core CPU baseline).  Best of 3: single-shot host
    timings vary ~5x with machine load."""
    from dashing_tpu.hashes import wang_hash_np

    rng = np.random.default_rng(0)
    n = 1 << 20
    seq = rng.integers(0, 4, n + K - 1, dtype=np.uint64)
    best = 0.0
    for _rep in range(3):
        t0 = time.perf_counter()
        # shift-or encode (fwd + rc + canonical), hash, bucket/rank, scatter
        fwd = np.zeros(n, np.uint64)
        rc = np.zeros(n, np.uint64)
        for t in range(K):
            fwd = (fwd << np.uint64(2)) | seq[t:t + n]
            rc |= (np.uint64(3) - seq[t:t + n]) << np.uint64(2 * t)
        km = np.minimum(fwd, rc)
        h = wang_hash_np(km)
        idx = (h >> np.uint64(64 - P)).astype(np.int64)
        rest = (h << np.uint64(P)) | np.uint64(1 << (P - 1))
        cnt = np.zeros(n, np.int64)
        y = rest.copy()
        for sh in (32, 16, 8, 4, 2, 1):
            zt = (y >> np.uint64(64 - sh)) == 0
            cnt += np.where(zt, sh, 0)
            y = np.where(zt, y << np.uint64(sh), y)
        regs = np.zeros(1 << P, np.uint8)
        np.maximum.at(regs, idx, (cnt + 1).astype(np.uint8))
        dt = time.perf_counter() - t0
        best = max(best, n / dt)
    return best


def pinned_baseline() -> float:
    """The pinned single-thread numpy denominator (BASELINE.json); falls
    back to a fresh measurement only if the pin is absent."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    try:
        with open(path) as f:
            v = json.load(f).get("pinned_numpy_baseline_kmers_per_sec")
        if v:
            return float(v)
    except Exception:
        pass
    return host_baseline_rate()


def main():
    dev = device_rate()
    base = pinned_baseline()
    try:
        measured = host_baseline_rate()
    except Exception:
        measured = 0.0
    print(json.dumps({
        "metric": "kmers_sketched_per_sec_per_chip",
        "value": round(dev, 1),
        "unit": "kmers/s",
        "vs_baseline": round(dev / base, 3),
        "baseline_pinned": base,
        "host_baseline_measured": round(measured, 1),
    }))


def _supervised() -> int:
    """The tunnel to the TPU has measured multi-minute stalls and raises
    transient FAILED_PRECONDITION errors (BENCH_NOTES.md); a hung backend
    call cannot be interrupted in-process, so the measurement runs in a
    child with a hard timeout and bounded retries — the same
    fail-loud-after-N policy as the CLI's _sketch_with_retry."""
    env = dict(os.environ, DASHING_TPU_BENCH_INNER="1")
    last = ""
    for attempt in range(4):
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=900)
        except subprocess.TimeoutExpired:
            print(f"bench attempt {attempt + 1}: timed out (tunnel stall?), "
                  "retrying", file=sys.stderr)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return 0
        last = (r.stderr or "")[-2000:]
        if attempt < 3:   # no sleep/'retrying' after the final attempt
            print(f"bench attempt {attempt + 1}: exit {r.returncode}, "
                  "retrying", file=sys.stderr)
            time.sleep(min(60 * (attempt + 1), 180))
        else:
            print(f"bench attempt {attempt + 1}: exit {r.returncode}",
                  file=sys.stderr)
    print(f"bench: all attempts failed; last stderr:\n{last}",
          file=sys.stderr)
    return 1


if __name__ == "__main__":
    if os.environ.get("DASHING_TPU_BENCH_INNER"):
        main()
    else:
        sys.exit(_supervised())
