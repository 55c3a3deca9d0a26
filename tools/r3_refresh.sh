#!/bin/bash
# Round-3 artifact refresh: run after TPU connectivity returns.
# Chains every pending on-chip measurement with hard timeouts so a
# wedged relay cannot hang the chain; each stage logs to /tmp and keeps
# going on failure (later stages still produce artifacts).
#
#   bash tools/r3_refresh.sh [stage...]   # default: all stages in order
#   (plan16 — the any-size factor-tree race — is on-demand only)
set -u
PY=python
command -v python >/dev/null && python -c "import numpy" 2>/dev/null || PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "/tmp/r3_$name.log" 2>&1
  local rc=$?
  tail -5 "/tmp/r3_$name.log"
  echo "=== $name done rc=$rc ==="
}

probe() {
  # 300s: backend init through a congested relay can exceed 120s
  timeout 300 "$PY" -c "import jax, jax.numpy as jnp; x=jnp.ones((8,128)); float(jnp.sum(x*x))" \
    || { echo "TPU unreachable — aborting"; exit 1; }
}

stages=${*:-smoke dconv blockstep2048 sweep512 sweep2048 serving fftwin zlprobe turbo gauss bench}

for s in $stages; do
  probe
  case $s in
    smoke)        run smoke 1800 "$PY" tools/tpu_smoke.py ;;
    dconv)        run dconv 2400 "$PY" tools/autotune_dconv.py ;;
    blockstep2048) run bs2048 5400 "$PY" tools/autotune_blockstep.py \
                     --only 2048:16,2048:17,2048:18,2048:19,2048:20 ;;
    sweep512)     run sweep512 5400 "$PY" -m opencl_fft_tpu.bench.sweep \
                     --row 512 --repeats 3 --merge bench_results/sweep.json \
                     --out bench_results/sweep ;;
    sweep2048)    run sweep2048 5400 "$PY" -m opencl_fft_tpu.bench.sweep \
                     --row 2048 --repeats 3 --merge bench_results/sweep.json \
                     --out bench_results/sweep ;;
    serving)      run serving 5400 "$PY" tools/serving_scaling.py ;;
    fftwin)       run fftwin 3600 "$PY" tools/fft_windows.py ;;
    bench)        run bench 5400 "$PY" bench.py ;;
    plan16)       run plan16 3600 "$PY" tools/fft_plan16.py --logn 16 ;;
    zlprobe)      run zlprobe 3600 "$PY" tools/zl_probe.py ;;
    turbo)        run turbo 3600 "$PY" tools/fft_turbo_ab.py ;;
    gauss)        run gauss 3600 "$PY" tools/fft_gauss_ab.py ;;
    *)            echo "unknown stage $s" ;;
  esac
done
echo "ALL STAGES DONE $(date)"
