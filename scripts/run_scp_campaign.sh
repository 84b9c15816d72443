#!/bin/bash
# SCP anharmonic-quantum campaign chain (exp_xcheck_scp.py), hardened
# after the round-4 chain "completed" with all 11 stages dead on
# ModuleNotFoundError and deleted a committed artifact on the way
# (VERDICT r4 missing #4, weak #2/#3):
#
#   - preflight selftest (imports + required caches) before any stage
#   - a failed or output-less stage ABORTS the chain with a FAIL marker
#   - verify-by-regeneration writes to a temp path; the committed
#     baseline is never moved or deleted
#   - done-markers only after their stages verifiably produced outputs
#   - stages are idempotent (skipped when the output .npz exists), so
#     the chain resumes after an interrupted session
#
# Stage order: cheap probe/verify stages, then the continuum Landauer
# evals (the quotable representation), then the ~135-min/ea comb-tier
# exact evals with the bench j0 gate (conf@2^14) first.
#
#   nohup bash scripts/run_scp_campaign.sh >> /tmp/scp_campaign_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
S=scripts/exp_xcheck_scp.py
FAIL=/tmp/scp_campaign_FAILED
rm -f "$FAIL"

die() { echo "!! CAMPAIGN ABORT: $*"; touch "$FAIL"; exit 1; }

if ! python "$S" selftest; then
    die "preflight selftest failed (env/imports/caches)"
fi

run() { # run <output-file> <timeout-s> <args...>
    local out=$1 tmo=$2; shift 2
    if [ -e "scripts/$out" ]; then
        echo "== skip (cached): $out"
        return 0
    fi
    echo "== $(date +%H:%M:%S) python $S $* (timeout ${tmo}s)"
    timeout "$tmo" python "$S" "$@" || die "stage failed (rc=$?): $*"
    [ -e "scripts/$out" ] || die "stage produced no output: scripts/$out ($*)"
}

# npairs=128: the tier-2^10 exact caches and the PERF.md probe-spread
# numbers were produced from the 128-pair dD (seed 5); keep the probe
# set identical so regenerated dD files stay consistent with them.
run flagship_confine.npz   7200 confine
run flagship_scp_dD.npz    7200 probes --npairs 128
run flagship_scp_dD_cl.npz 7200 probes --classical --npairs 128

# Verify the regenerated dD reproduces the committed 2^10-tier eval
# bit-for-bit (same seed/npairs => same probes => same kappa). The
# regeneration goes to /tmp; the committed baseline is read-only here.
BASE=scripts/flagship_exact_scp_eff_nmd1024.npz
if [ ! -e scripts/SCP_DD_VERIFIED ]; then
    [ -e "$BASE" ] || die "committed 2^10 baseline missing: $BASE"
    timeout 7200 python "$S" exact --which eff --nmd 10 \
        --out /tmp/eff1024_regen.npz || die "dD verify regeneration failed"
    python - <<'EOF' || die "regenerated dD INCONSISTENT with committed 2^10 cache"
import numpy as np
a = float(np.load('scripts/flagship_exact_scp_eff_nmd1024.npz')['j_nat'])
b = float(np.load('/tmp/eff1024_regen.npz')['j_nat'])
print(f'dD verify: committed {a!r} regen {b!r} rel {abs(a-b)/abs(a):.2e}')
assert abs(a - b) / abs(a) < 1e-9
EOF
    touch scripts/SCP_DD_VERIFIED
fi

run flagship_negf_scp_eff.npz     7200 negf --which eff
run flagship_negf_scp_effA.npz    7200 negf --which effA
run flagship_negf_scp_effB.npz    7200 negf --which effB
run flagship_negf_scp_conf.npz    7200 negf --which conf
run flagship_negf_scp_eff_cl.npz  7200 negf --which eff --classical
python "$S" report || die "report failed after continuum stages"
[ -e scripts/flagship_scp_summary.npz ] || die "report wrote no summary"
touch /tmp/scp5_CONTINUUM_DONE

run flagship_exact_scp_conf_nmd16384.npz 14400 exact --which conf --nmd 14
touch /tmp/scp5_CONF14_DONE
run flagship_exact_scp_eff_nmd16384.npz 14400 exact --which eff --nmd 14
python "$S" report || die "report failed after eff@2^14"
touch /tmp/scp5_EFF14_DONE

run flagship_exact_scp_effA_nmd16384.npz 14400 exact --which effA --nmd 14
run flagship_exact_scp_effB_nmd16384.npz 14400 exact --which effB --nmd 14
python "$S" report || die "report failed after effA/effB@2^14"
touch /tmp/scp5_ALL14_DONE
echo "== $(date +%H:%M:%S) campaign chain complete"
