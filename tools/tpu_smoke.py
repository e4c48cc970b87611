"""Run the hardware test lane (`pytest -m tpu`) on the real chip.

The main suite pins the CPU backend (tests/conftest.py); this runner
lifts the pin (LDPC_TPU_TESTS=1) so the Pallas kernels and fused cascades
are validated against their XLA counterparts on actual TPU hardware.
bench.py invokes this every bench round and reports the outcome, so a
real-TPU-only lowering regression fails the round log, not just a future
debugging session.

Usage: python tools/tpu_smoke.py          # prints PASS/FAIL, exit code
"""

import os
import subprocess
import sys


def run(extra_args=()):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, LDPC_TPU_TESTS="1")
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest",
            os.path.join(root, "tests"),
            "-m", "tpu", "-q", "--no-header", "-p", "no:cacheprovider",
            *extra_args,
        ],
        cwd=root,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    return proc


def main():
    proc = run(sys.argv[1:])
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    print(tail)
    print("TPU smoke:", "PASS" if proc.returncode == 0 else "FAIL")
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
