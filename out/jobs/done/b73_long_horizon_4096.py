# BASELINE config #4 long-horizon stability artifact (VERDICT r2 #4):
# 5000 steps at 4096^2 bfloat16, splat input for the first 500 steps then
# free decay, diagnostics every 50 steps -> out/long_horizon_4096/
# {metrics.jsonl, summary.json}. Claims checked in the summary: nonfinite
# == 0 throughout, max component speed <= 1000, backtrace inside the halo
# contract, bounded-uptick energy decay post-input, div_rms bounded.
from tools.long_horizon import main

summary = main(["--res", "4096", "--dtype", "bfloat16", "--steps", "5000",
                "--splat-steps", "500", "--chunk", "50",
                "--out", "out/long_horizon_4096"])
assert summary["ok"], summary
