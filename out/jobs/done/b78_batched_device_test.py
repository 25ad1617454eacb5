# Retry of b77 with the FULL environment (b77 passed a minimal env and the
# subprocess could not see the axon tunnel -> the device test self-skipped).
import os
import subprocess
import sys

env = dict(os.environ, TPUFLUID_DEVICE="tpu")
r = subprocess.run(
    [sys.executable, "-m", "pytest", "tests/test_tpu.py", "-q", "-k",
     "batched"],
    env=env, capture_output=True, text=True, timeout=3600)
print(r.stdout[-4000:])
print(r.stderr[-2000:])
assert r.returncode == 0, f"device pytest rc={r.returncode}"
assert "1 passed" in r.stdout, "batched device test did not run"
