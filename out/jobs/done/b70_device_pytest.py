# Full on-device kernel test suite (tests/test_tpu.py) in a fresh
# subprocess (pytest needs its own import machinery; TPUFLUID_DEVICE=tpu
# selects the tunneled backend). Includes the rgb9e5 device-fidelity case
# that gates the b69 default-flip decision.
import os
import subprocess
import sys

env = dict(os.environ, TPUFLUID_DEVICE="tpu")
r = subprocess.run(
    [sys.executable, "-m", "pytest", "tests/test_tpu.py", "-q"],
    env=env, capture_output=True, text=True, timeout=5400)
print(r.stdout[-8000:])
print(r.stderr[-4000:])
assert r.returncode == 0, f"device pytest rc={r.returncode}"
