"""Subprocess body for tests/test_launch.py — one process of a 2-process
gloo-backed CPU group (the no-hardware stand-in for one host of a TPU pod).

Not a pytest module (leading underscore): invoked as
``python tests/_launch_worker.py <port> <process_id> <num_processes> <out>``.
"""

import json
import os
import sys

os.environ.setdefault("JAX_NUM_CPU_DEVICES", "1")

import jax  # noqa: E402

# this environment's sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter start (see tests/conftest.py) — override the config directly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    port, pid, nproc, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "plain"

    from semanticsegmentation_tensorflow_tpu.parallel import (
        barrier, initialize_distributed, is_primary, make_mesh, replicate,
        shard_batch, shard_state_zero1,
    )

    proc, n = initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert (proc, n) == (pid, nproc), (proc, n)
    # idempotent: a second call must not re-initialize
    assert initialize_distributed() == (pid, nproc)
    assert is_primary() == (pid == 0)
    assert len(jax.devices()) == nproc * len(jax.local_devices())

    from semanticsegmentation_tensorflow_tpu.data import synthetic_batch
    from semanticsegmentation_tensorflow_tpu.models import build_model
    from semanticsegmentation_tensorflow_tpu.train import (
        create_train_state, make_train_step,
    )
    from semanticsegmentation_tensorflow_tpu.train.state import make_optimizer

    model = build_model("unet", num_classes=2, base_features=8)
    state = create_train_state(model, jax.random.key(0), (4, 32, 32, 3),
                               make_optimizer("adam", 1e-3))
    mesh = make_mesh()  # global: spans both processes
    assert mesh.size == nproc
    if mode == "zero1":
        # pod-style ZeRO-1: moments sharded ACROSS processes — each process
        # addresses only its slice of the global opt state
        state = shard_state_zero1(state, mesh)
        # the moments must actually be sharded across processes: sharded
        # leaves address only 1/nproc of their elements locally
        sharded = [
            x for x in jax.tree.leaves(state.opt_state)
            if isinstance(x, jax.Array)
            and sum(s.data.size for s in x.addressable_shards) * nproc
            == x.size]
        assert sharded, "no opt leaf is zero1-sharded across processes"
        step = make_train_step(num_classes=2, mesh=mesh, shard_opt=True,
                               state=state)
    else:
        state = replicate(state, mesh)
        step = make_train_step(num_classes=2, mesh=mesh)

    full = synthetic_batch(4, 32, 32, seed=0)
    per = 4 // nproc
    local = {k: v[pid * per:(pid + 1) * per] for k, v in full.items()}
    batch = shard_batch(local, mesh)  # multi-process global-array assembly

    losses = []
    for _ in range(2):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))

    with open(out_path, "w") as f:
        json.dump({"process": pid, "losses": losses}, f)
    barrier("test_launch_done")


if __name__ == "__main__":
    main()
