"""Subprocess worker for the real multi-process test (tests/test_multiprocess.py).

Runs the production CLI `train --mesh` under jax.distributed with N processes
x 4 virtual CPU devices each, exercising host_shard + stream_batches'
jax.make_array_from_process_local_data branch (data/loader.py) — the path
SURVEY.md §2.4 promises for per-host sharded input on a pod.

Invoked as: python mp_worker.py <pid> <nproc> <port> <root> <out>
(the parent sets JAX_PLATFORMS=cpu and XLA_FLAGS device-count before spawn).
"""
import os
import sys


def main() -> None:
    pid, nproc, port, root, out = sys.argv[1:6]
    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=int(nproc),
                               process_id=int(pid))

    from tpu_breath import cli
    cli.main(["train", "--root", root, "--out-root", out,
              "--archs", "cnn8", "--epochs", "2", "--batch-size", "8",
              "--seed", "0", "--f32", "--mesh", "8"])

    # sanity printed for the parent's log
    import jax
    print(f"[mp_worker {pid}] process_count={jax.process_count()} "
          f"devices={jax.device_count()}", flush=True)
    assert jax.process_count() == int(nproc)


if __name__ == "__main__":
    main()
