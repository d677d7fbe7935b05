"""Run a command after another process exits — the reference's poor-man's
job queue (``src/book.sh:3-12`` polls /proc/<PID> then launches job.sh).

Usage: python tools/queue_after.py <pid> -- <command...>
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def main() -> None:
    argv = sys.argv[1:]
    if len(argv) < 3 or argv[1] != "--":
        print(__doc__)
        raise SystemExit(2)
    pid = int(argv[0])
    cmd = argv[2:]
    while os.path.exists(f"/proc/{pid}"):
        print(f"process {pid} is still running")
        time.sleep(10)
    print("launching:", " ".join(cmd))
    raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
