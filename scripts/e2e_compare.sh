#!/usr/bin/env bash
# End-to-end wall-clock comparison: multiclust-tpu vs the reference binary
# on a BASELINE.md config-2-style dataset (admixture K=4, 500x5000 SNPs,
# SQUAREM-1, 10 Rand-EM candidates, 4 initializations).
#
# Usage: scripts/e2e_compare.sh [workdir] [--missing]
#   --missing adds 2% missing data; note the reference's missing-data
#   results are corrupted by UB (PARITY.md), so logL is only comparable
#   on clean data.
set -euo pipefail
WORK=${1:-/tmp/e2e_compare}
MISSING=${2:-}
mkdir -p "$WORK"
REPO=$(cd "$(dirname "$0")/.." && pwd)

# build the reference
if [ ! -x "$WORK/refbuild/multiclust" ]; then
  mkdir -p "$WORK/refbuild"
  cp /root/reference/*.c /root/reference/*.h /root/reference/makefile "$WORK/refbuild/"
  make -C "$WORK/refbuild" >/dev/null
fi

# simulate the dataset
python - "$WORK" "$MISSING" <<'PY'
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, "/root/repo")
from multiclust_tpu.stats.sim import random_model, simulate_admixture_fast
work, missing = sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else ""
rng = np.random.default_rng(42)
Q, P = random_model(rng, 4, 5000, 2, I=500, concentration=1.0)
ds = simulate_admixture_fast(rng, Q, P, ploidy=2,
                             missing_rate=0.02 if missing else 0.0)
with open(f"{work}/cfg2.str", "w") as fh:
    fh.write(" ".join(f"l{i}" for i in range(ds.L)) + "\n")
    for i in range(ds.I):
        for a in range(2):
            fh.write(f"i{i} p0 " + " ".join(map(str, ds.IL[i*2+a])) + "\n")
print("dataset:", ds.I, "x", ds.L)
PY

FLAGS="-a -k 4 -n 4 -m 10 -s 1"
echo "== reference =="
( cd "$WORK" && time timeout 7200 ./refbuild/multiclust -f cfg2.str $FLAGS ) || echo "reference did not finish"
echo "== multiclust-tpu (TPU if available, else --platform cpu) =="
( cd "$WORK" && time timeout 7200 python -m multiclust_tpu.cli -f cfg2.str $FLAGS -d "$WORK" -o ours )
