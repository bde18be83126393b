"""Multi-process launch integration (parallel/launch.py).

Real ``jax.distributed`` over localhost: two OS processes, one CPU device
each, gloo collectives between them — the closest no-hardware stand-in for
a 2-host TPU pod slice (SURVEY.md §4 distributed-test strategy; §5
"distributed comm backend"). Everything the pod path exercises differently
from the in-process 8-fake-device mesh is covered here: process-group
bootstrap, ``make_array_from_process_local_data`` batch assembly, and
cross-process psum'd gradients.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

import jax

from semanticsegmentation_tensorflow_tpu.data import synthetic_batch
from semanticsegmentation_tensorflow_tpu.models import build_model
from semanticsegmentation_tensorflow_tpu.parallel import (
    make_mesh, replicate, shard_batch,
)
from semanticsegmentation_tensorflow_tpu.train import (
    create_train_state, make_train_step,
)
from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    """Env for a 1-CPU-device subprocess: undo the parent conftest's
    8-fake-device forcing, and force the CPU platform the supported way
    (setup_runtime honors JAX_PLATFORMS=cpu; the worker script overrides
    the config for the sitecustomize case)."""
    env = dict(os.environ)
    env["JAX_NUM_CPU_DEVICES"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    return env


def _spawn(cmd_per_pid, timeout=300):
    procs = [subprocess.Popen(cmd, env=_worker_env(), cwd=REPO,
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True)
             for cmd in cmd_per_pid]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{out}"
    return outs


def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    outfiles = [str(tmp_path / f"out{i}.json") for i in range(2)]
    worker = os.path.join(REPO, "tests", "_launch_worker.py")
    _spawn([[sys.executable, worker, str(port), str(i), "2", outfiles[i]]
            for i in range(2)])

    results = [json.load(open(f)) for f in outfiles]
    # both processes saw the same (global, psum'd) loss
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)

    # ...and it matches the identical computation in ONE process on an
    # in-process 2-device mesh (same seed, same batch, same steps)
    model = build_model("unet", num_classes=2, base_features=8)
    state = create_train_state(model, jax.random.key(0), (4, 32, 32, 3),
                               make_optimizer("adam", 1e-3))
    mesh = make_mesh(jax.devices()[:2])
    state = replicate(state, mesh)
    step = make_train_step(num_classes=2, mesh=mesh)
    batch = shard_batch(
        {k: jax.numpy.asarray(v)
         for k, v in synthetic_batch(4, 32, 32, seed=0).items()}, mesh)
    ref = []
    for _ in range(2):
        state, metrics = step(state, batch)
        ref.append(float(metrics["loss"]))
    np.testing.assert_allclose(results[0]["losses"], ref, rtol=1e-5)


def test_train_cli_distributed(tmp_path):
    """scripts/train.py --distributed end-to-end: 2 processes, synthetic
    KITTI, shared checkpoint dir (orbax multihost write), primary-only
    logging."""
    port = _free_port()
    ckpt = str(tmp_path / "ckpt")
    cmds = []
    for i in range(2):
        cmds.append([
            sys.executable, os.path.join(REPO, "scripts", "train.py"),
            "--model", "unet", "--model-kw", "base_features=8",
            "--synthetic", "--image-size", "32", "64",
            "--batch-size", "2", "--epochs", "1", "--seed", "0",
            "--checkpoint-dir", ckpt,
            "--distributed", "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", "2", "--process-id", str(i),
        ])
    outs = _spawn(cmds, timeout=420)
    assert "distributed: process 0/2, 1 local of 2 global devices" in outs[0]
    assert "distributed: process 1/2" in outs[1]
    assert "final:" in outs[0]
    # logging is primary-only: process 1 runs the same loop but writes no
    # step lines and no JSONL
    assert "step " not in outs[1].split("final:")[0].split("devices")[-1], \
        outs[1]
    logs = os.path.join(ckpt, "logs")
    assert os.path.isdir(logs)


def test_two_process_zero1_matches_replicated(tmp_path):
    """Pod-style ZeRO-1 (VERDICT r4 #9): optimizer moments sharded ACROSS
    OS processes via make_array_from_callback, update numerically identical
    to the replicated-state update."""
    port = _free_port()
    outfiles = [str(tmp_path / f"out{i}.json") for i in range(2)]
    worker = os.path.join(REPO, "tests", "_launch_worker.py")
    _spawn([[sys.executable, worker, str(port), str(i), "2", outfiles[i],
             "zero1"] for i in range(2)])

    results = [json.load(open(f)) for f in outfiles]
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)

    # ZeRO-1 is an exact refactor of the replicated Adam update: the same
    # 2 steps on an in-process replicated 2-device mesh give the same losses
    model = build_model("unet", num_classes=2, base_features=8)
    state = create_train_state(model, jax.random.key(0), (4, 32, 32, 3),
                               make_optimizer("adam", 1e-3))
    mesh = make_mesh(jax.devices()[:2])
    state = replicate(state, mesh)
    step = make_train_step(num_classes=2, mesh=mesh)
    batch = shard_batch(
        {k: jax.numpy.asarray(v)
         for k, v in synthetic_batch(4, 32, 32, seed=0).items()}, mesh)
    ref = []
    for _ in range(2):
        state, metrics = step(state, batch)
        ref.append(float(metrics["loss"]))
    np.testing.assert_allclose(results[0]["losses"], ref, rtol=1e-5)
