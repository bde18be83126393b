"""Process-level runtime setup shared by all CLI entry points."""

from __future__ import annotations

import os
import sys
import time

import jax


def check_tpu_tunnel(window_s: float | None = None) -> None:
    """Fail BOUNDED-fast when this dev environment's TPU relay is dead.

    The axon client retries a refused connection forever, turning a dead
    tunnel into an infinite hang in backend init; a single instant probe,
    however, turns a transient relay restart into a zeroed benchmark
    capture (BENCH_r03) — so poll with backoff for up to ~5 minutes
    (BENCH_TUNNEL_WAIT_S overrides) before exiting 3. Probes only when
    the loopback-relay marker is present, so other TPU setups (and
    CPU-forced runs, see setup_runtime) are untouched."""
    import socket

    if os.environ.get("AXON_LOOPBACK_RELAY") != "1":
        return
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return  # CPU-forced run needs no relay (setup_runtime honors it)
    if window_s is None:
        window_s = float(os.environ.get("BENCH_TUNNEL_WAIT_S", "300"))
    deadline = time.monotonic() + window_s
    delay, last_err = 2.0, None
    while True:
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=5):
                return
        except OSError as e:
            last_err = e
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"TPU tunnel unreachable for {window_s:.0f}s "
                  f"(127.0.0.1:8082: {last_err}); refusing to hang in "
                  "backend init", file=sys.stderr)
            raise SystemExit(3)
        print(f"TPU tunnel down (127.0.0.1:8082: {last_err}); retrying for "
              f"another {remaining:.0f}s", file=sys.stderr)
        time.sleep(min(delay, remaining))
        delay = min(delay * 1.6, 30.0)


def setup_runtime(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compile cache (and future runtime knobs).

    A cold FCN-8s train-step compile costs minutes on a tunneled TPU; with
    the persistent cache a re-invocation of any script reuses it.

    Also (round 4): honor an EXPLICIT ``JAX_PLATFORMS=cpu`` env var before
    any backend init — the axon sitecustomize force-overrides the env var
    in-process (tests/conftest.py pattern, __graft_entry__ pattern) — and
    otherwise guard against a dead TPU relay, so no CLI entry point can
    hang forever in backend init."""
    try:
        configured = (jax.config.jax_platforms or "").strip().lower()
    except Exception:
        configured = ""
    if (os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"
            or configured == "cpu"):
        # either the env var (driver dryrun) or an in-process
        # jax.config.update("jax_platforms", "cpu") (tests/conftest.py) —
        # both mean: no TPU backend will be touched, skip the relay probe
        jax.config.update("jax_platforms", "cpu")
    else:
        check_tpu_tunnel()
    cache_dir = cache_dir or os.environ.get(
        "SEG_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/seg_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
