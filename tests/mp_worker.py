"""Subprocess worker for the real multi-process test (tests/test_multiprocess.py).

Runs the production CLI `train --mesh` under jax.distributed with N processes
x 4 virtual CPU devices each, exercising host_shard + stream_batches'
jax.make_array_from_process_local_data branch (data/loader.py) — the path
SURVEY.md §2.4 promises for per-host sharded input on a pod.

Invoked as: python mp_worker.py <pid> <nproc> <port> <root> <out> [cmd]
(the parent sets JAX_PLATFORMS=cpu and XLA_FLAGS device-count before spawn).
cmd defaults to "train"; "precompute" drives `precompute --mesh` instead,
exercising _extract_sharded's process-local placement + allgather branch.
"""
import os
import sys


def main() -> None:
    pid, nproc, port, root, out = sys.argv[1:6]
    cmd = sys.argv[6] if len(sys.argv) > 6 else "train"
    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=int(nproc),
                               process_id=int(pid))

    from tpu_breath import cli
    if cmd == "precompute":
        cli.main(["precompute", "--root", root, "--out-root", out,
                  "--mesh", "8", "--chunk", "2"])
    else:
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
