"""Multi-host (pod) training launcher.

TPU-native equivalent of the reference's cloud launcher
(/root/reference/tools/train_on_openi.py:25-162): that script pip-installs
and downloads data on rank 0 behind a filesystem file-barrier, symlinks the
dataset, launches training, and uploads outputs on exit. Here:

- rank/world discovery comes from the environment (TPU pod metadata is
  auto-detected by ``jax.distributed.initialize()``; on GPU/CPU clusters set
  COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID),
- dataset preparation runs on process 0 only, behind the same kind of
  file barrier (shared filesystem),
- training is ``tools/train.py`` with ``distribute: true`` — per-process
  data sharding, pmean gradient sync and rank-0-gated eval/checkpointing are
  already built into the train loop.

Run ONE copy of this script per host (e.g. via
``gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...``); see
docs/multihost.md.
"""
import argparse
import logging
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common.log import setup_default_logging  # noqa: E402

_BARRIER = ".mindpose_data_ready"


def _env_int(name):
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def prepare_data_rank0(prepare_cmd: str, workdir: str, rank: int,
                       timeout_s: int = 3600) -> None:
    """Run the data-preparation command on rank 0; other ranks wait on a
    file barrier (parity: ref train_on_openi.py:25-44 Msg/wait loop).

    The barrier stores a hash of ``prepare_cmd`` so a stale barrier from a
    previous launch only satisfies waiters when it corresponds to the same
    (successfully completed) preparation; a changed command makes ranks>0
    wait for rank 0 to re-run it and rewrite the barrier.
    """
    import hashlib

    barrier = os.path.join(workdir, _BARRIER)
    stamp = hashlib.sha256(prepare_cmd.encode()).hexdigest()

    def _barrier_ok():
        try:
            with open(barrier) as f:
                return f.read().strip() == stamp
        except OSError:
            return False

    if rank == 0:
        if _barrier_ok():
            logging.info("[rank 0] data already prepared (barrier matches)")
            return
        if os.path.exists(barrier):
            os.remove(barrier)  # stale barrier from a different prepare-cmd
        logging.info("[rank 0] preparing data: %s", prepare_cmd)
        subprocess.run(prepare_cmd, shell=True, check=True)
        with open(barrier, "w") as f:
            f.write(stamp)
        return
    logging.info("[rank %d] waiting for rank 0 data preparation...", rank)
    t0 = time.time()
    while not _barrier_ok():
        if time.time() - t0 > timeout_s:
            raise TimeoutError("data preparation barrier timed out")
        time.sleep(5)


def main() -> None:
    setup_default_logging()
    parser = argparse.ArgumentParser(
        description="mindpose_tpu pod launcher (one copy per host)"
    )
    parser.add_argument("--config", required=True)
    parser.add_argument(
        "--prepare-cmd", default="",
        help="shell command run once on rank 0 before training "
             "(dataset download/extraction), guarded by a file barrier",
    )
    parser.add_argument(
        "--workdir", default=".",
        help="shared filesystem directory for the barrier file",
    )
    parser.add_argument("train_args", nargs=argparse.REMAINDER,
                        help="extra args forwarded to tools/train.py")
    args = parser.parse_args()

    # Rank discovery: TPU pods expose it via metadata (jax.distributed
    # auto-detects); explicit env wins for other clusters / local testing.
    rank = _env_int("PROCESS_ID")
    world = _env_int("NUM_PROCESSES")
    coord = os.environ.get("COORDINATOR_ADDRESS")
    if rank is None:
        # best effort for TPU pods before jax initializes. NOTE: `or 0`
        # would silently make EVERY host rank 0 when the var is absent —
        # refuse to guess in an explicit multi-process launch.
        rank = _env_int("TPU_WORKER_ID")
    if rank is None:
        if world and world > 1:
            parser.error(
                "cannot determine this host's rank: set PROCESS_ID (or "
                "TPU_WORKER_ID). With NUM_PROCESSES > 1 a guessed rank 0 "
                "on every host would run --prepare-cmd concurrently and "
                "give jax.distributed duplicate process ids."
            )
        rank = 0

    if args.prepare_cmd:
        prepare_data_rank0(args.prepare_cmd, args.workdir, rank)

    train_cmd = [
        sys.executable,
        os.path.join(os.path.dirname(__file__), "train.py"),
        "--config", args.config,
    ]
    extra = list(args.train_args)
    if extra and extra[0] == "--":
        extra = extra[1:]
    train_cmd += extra

    env = dict(os.environ)
    # tools/train.py reads these through init_distributed when
    # distribute: true and explicit process info is present
    if coord and world:
        env.update(
            MINDPOSE_COORDINATOR=coord,
            MINDPOSE_NUM_PROCESSES=str(world),
            MINDPOSE_PROCESS_ID=str(rank),
        )
    logging.info("[rank %s] exec: %s", rank, " ".join(train_cmd))
    os.execve(sys.executable, train_cmd, env)


if __name__ == "__main__":
    main()
