"""Spawn N local trainer processes wired for multi-host data parallelism.

One-host convenience launcher for the ``--dist-*`` surface
(parallel/distributed.py): picks a free coordinator port, launches N copies
of the given trainer command with ``--dist-coordinator/--dist-num-processes/
--dist-process-id`` appended, streams rank 0's output through, prefixes the
other ranks' lines with ``[rank k]``, and exits non-zero if any rank does.
On a real multi-host TPU pod each host runs its own process (one per host)
with the same flags pointed at host 0 — this launcher is for single-host
multi-process runs (tests, CPU experiments, one process per local chip
group).

Usage:
    python tools/launch_distributed.py -n 2 -- \
        python train_human.py <trainer args...>
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uda_poseestimation_tpu.parallel.distributed import free_port as _free_port


def launch(num_processes: int, command: list[str], port: int | None = None,
           stream=sys.stdout) -> int:
    """Run ``command`` as ranks 0..N-1; returns the first non-zero exit code
    (0 if all ranks succeeded)."""
    if not command:
        raise ValueError("empty command")
    port = port or _free_port()
    dist = ["--dist-coordinator", f"localhost:{port}",
            "--dist-num-processes", str(num_processes)]
    procs = []
    try:
        for pid in range(num_processes):
            procs.append(subprocess.Popen(
                command + dist + ["--dist-process-id", str(pid)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    except Exception:
        # a partial launch must not leave earlier ranks blocked at the
        # coordinator rendezvous waiting for ranks that never started
        for p in procs:
            p.kill()
        raise

    def pump(pid, proc):
        prefix = "" if pid == 0 else f"[rank {pid}] "
        for line in proc.stdout:
            stream.write(prefix + line)
            stream.flush()

    threads = [threading.Thread(target=pump, args=(pid, p), daemon=True)
               for pid, p in enumerate(procs)]
    for t in threads:
        t.start()
    try:
        # monitor all ranks: when one fails, terminate the survivors
        # promptly (they would otherwise block until a collective timeout)
        import time
        rcs = [None] * num_processes
        while any(rc is None for rc in rcs):
            for pid, p in enumerate(procs):
                if rcs[pid] is None:
                    rcs[pid] = p.poll()
            if any(rc not in (None, 0) for rc in rcs) \
                    and any(rc is None for rc in rcs):
                for p in procs:
                    if p.poll() is None:
                        p.terminate()
            time.sleep(0.2)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for t in threads:
        t.join(timeout=10)
    # prefer a real exit code over the negative-signal codes of ranks we
    # terminated ourselves after the first failure
    return next((rc for rc in rcs if rc and rc > 0),
                next((rc for rc in rcs if rc), 0))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Launch N local processes of a --dist-*-capable trainer")
    parser.add_argument("-n", "--num-processes", type=int, required=True)
    parser.add_argument("--port", type=int, default=None,
                        help="coordinator port (default: pick a free one)")
    parser.add_argument("command", nargs=argparse.REMAINDER,
                        help="trainer command (prefix with --)")
    args = parser.parse_args(argv)
    command = args.command
    if command and command[0] == "--":
        command = command[1:]
    if not command:
        parser.error("no trainer command given (end flags with --)")
    return launch(args.num_processes, command, port=args.port)


if __name__ == "__main__":
    sys.exit(main())
