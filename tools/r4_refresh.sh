#!/bin/bash
# Round-4 artifact refresh: the full pending-measurement chain.
# Probe-guarded per stage with hard timeouts so a wedged relay cannot
# hang the chain; each stage logs to /tmp and the chain keeps going on
# failure (later stages still produce artifacts).
#
#   bash tools/r4_refresh.sh [stage...]   # default: all stages in order
#
# Stage notes:
#   vmemprobe   new macflow-family rows + --verify of every recorded
#               PASS edge (fails loudly if the envelope shrank)
#   sweep*      per-row re-measure, merged into bench_results/sweep.json
#               (all four rows re-route through the r4 decomposed engine
#               where no resident kernel fits)
#   readme      regenerate README's perf block from the artifacts, then
#               --check (byte-identical guard)
set -u
PY=python
command -v python >/dev/null && python -c "import numpy" 2>/dev/null || PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "/tmp/r4_$name.log" 2>&1
  local rc=$?
  tail -5 "/tmp/r4_$name.log"
  echo "=== $name done rc=$rc ==="
}

probe() {
  # 300s: backend init through a congested relay can exceed 120s
  timeout 300 "$PY" -c "import jax, jax.numpy as jnp; x=jnp.ones((8,128)); float(jnp.sum(x*x))" \
    || { echo "TPU unreachable — aborting"; exit 1; }
}

stages=${*:-smoke macflow vmemprobe sweep512 sweep2048 sweep8192 sweep32768 serving bench readme}

for s in $stages; do
  probe
  case $s in
    smoke)        run smoke 1800 "$PY" tools/tpu_smoke.py ;;
    macflow)      run macflow 3600 "$PY" tools/macflow_smoke.py --check ;;
    vmemprobe)    run vmemprobe 3600 "$PY" tools/vmem_probe.py \
                     --families macflow_lti,macflow_tv --skip-done \
                  && run vmemverify 3600 "$PY" tools/vmem_probe.py --verify ;;
    sweep512)     run sweep512 5400 "$PY" -m opencl_fft_tpu.bench.sweep \
                     --row 512 --repeats 3 --merge bench_results/sweep.json \
                     --out bench_results/sweep ;;
    sweep2048)    run sweep2048 5400 "$PY" -m opencl_fft_tpu.bench.sweep \
                     --row 2048 --repeats 3 --merge bench_results/sweep.json \
                     --out bench_results/sweep ;;
    sweep8192)    run sweep8192 5400 "$PY" -m opencl_fft_tpu.bench.sweep \
                     --row 8192 --repeats 3 --merge bench_results/sweep.json \
                     --out bench_results/sweep ;;
    sweep32768)   run sweep32768 7200 "$PY" -m opencl_fft_tpu.bench.sweep \
                     --row 32768 --repeats 3 --merge bench_results/sweep.json \
                     --out bench_results/sweep ;;
    serving)      run serving 5400 "$PY" tools/serving_scaling.py ;;
    bench)        run bench 5400 "$PY" bench.py ;;
    readme)       run readme 300 "$PY" tools/readme_perf.py \
                  && run readmechk 300 "$PY" tools/readme_perf.py --check ;;
    *)            echo "unknown stage $s" ;;
  esac
done
echo "ALL STAGES DONE $(date)"
