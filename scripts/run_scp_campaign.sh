#!/bin/bash
# Idempotent SCP anharmonic-quantum campaign chain (exp_xcheck_scp.py).
# Each stage is skipped when its output .npz already exists, so the
# chain can be re-launched after an interrupted session and resumes
# where it stopped.  Order: cheap continuum (quotable) evals first,
# then the ~135-min/ea comb-tier exact evals (bench gate first).
#
#   nohup bash scripts/run_scp_campaign.sh >> /tmp/scp_campaign.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
S=scripts/exp_xcheck_scp.py

run() { # run <output-file> <args...>
    local out=$1; shift
    if [ -e "scripts/$out" ]; then
        echo "== skip (cached): $out"
    else
        echo "== $(date +%H:%M:%S) python $S $*"
        python "$S" "$@" || echo "!! stage failed: $*"
    fi
}

run flagship_confine.npz                 confine
# npairs=128: the tier-2^10 exact caches and the PERF.md probe-spread
# numbers were produced from the 128-pair dD (seed 5); keep the probe
# set identical so regenerated dD files stay consistent with them.
run flagship_scp_dD.npz                  probes --npairs 128
run flagship_scp_dD_cl.npz               probes --classical --npairs 128
# Verify the regenerated dD reproduces the committed 2^10-tier eval
# bit-for-bit (same seed/npairs => same probes => same kappa).
if [ ! -e scripts/SCP_DD_VERIFIED ]; then
    cp scripts/flagship_exact_scp_eff_nmd1024.npz /tmp/eff1024_committed.npz
    rm scripts/flagship_exact_scp_eff_nmd1024.npz
    python $S exact --which eff --nmd 10
    python - <<'EOF' && touch scripts/SCP_DD_VERIFIED
import numpy as np
a = float(np.load('/tmp/eff1024_committed.npz')['j_nat'])
b = float(np.load('scripts/flagship_exact_scp_eff_nmd1024.npz')['j_nat'])
print(f'dD verify: committed {a!r} regen {b!r} rel {abs(a-b)/abs(a):.2e}')
assert abs(a - b) / abs(a) < 1e-9, 'regenerated dD INCONSISTENT with committed 2^10 caches'
EOF
fi

run flagship_negf_scp_eff.npz            negf --which eff
run flagship_negf_scp_effA.npz           negf --which effA
run flagship_negf_scp_effB.npz           negf --which effB
run flagship_negf_scp_conf.npz           negf --which conf
run flagship_negf_scp_eff_cl.npz         negf --which eff --classical
python $S report
touch /tmp/CONTINUUM_DONE
run flagship_exact_conf_nmd16384.npz     exact --which conf --nmd 14
touch /tmp/CONF14_DONE
run flagship_exact_scp_eff_nmd16384.npz  exact --which eff --nmd 14
python $S report
touch /tmp/EFF14_DONE
run flagship_exact_scp_effA_nmd16384.npz exact --which effA --nmd 14
run flagship_exact_scp_effB_nmd16384.npz exact --which effB --nmd 14
python $S report
touch /tmp/ALL14_DONE
echo "== $(date +%H:%M:%S) campaign chain complete"
