# Full on-device suite at round-12b HEAD: the interior-aliasing change
# (parallel/sharded_step band assembly) and the combined batch x spatial
# mode landed since c07 — every test_tpu.py case must stay green on the
# real chip.
import os
import subprocess
import sys

env = dict(os.environ, TPUFLUID_DEVICE="tpu")
r = subprocess.run(
    [sys.executable, "-m", "pytest", "tests/test_tpu.py", "-q"],
    env=env, capture_output=True, text=True, timeout=5400)
print(r.stdout[-6000:])
print(r.stderr[-2000:])
assert r.returncode == 0, f"device pytest rc={r.returncode}"
assert " passed" in r.stdout and "failed" not in r.stdout
