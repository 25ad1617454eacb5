# Run the new batched-serving device test (and the rest of test_tpu.py
# stays covered by b70's full run) in a subprocess, as the worker protocol
# requires for pytest.
import subprocess
import sys

r = subprocess.run(
    [sys.executable, "-m", "pytest", "tests/test_tpu.py", "-q", "-k",
     "batched"],
    capture_output=True, text=True, env={"TPUFLUID_DEVICE": "tpu",
                                         "PATH": "/usr/local/bin:/usr/bin:/bin",
                                         "HOME": "/root"})
print(r.stdout[-3000:])
print(r.stderr[-2000:])
assert r.returncode == 0, f"pytest rc={r.returncode}"
