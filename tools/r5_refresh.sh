#!/bin/bash
# Round-5 artifact refresh: the full pending-measurement chain.
# Probe-guarded per stage with hard timeouts so a wedged relay cannot
# hang the chain; each stage logs to /tmp and the chain keeps going on
# failure (later stages still produce artifacts).
#
#   bash tools/r5_refresh.sh [stage...]   # default: all stages in order
#
# Stage notes:
#   slrace      sublane-DFT kernel race vs mm at 2^10..2^13 (VERDICT #2)
#   gauss16     per-level Gauss race on the 2^16 balanced tree (#9)
#   tvab        interleaved TV-vs-LTI A/B at the headline config (#1)
#   servdiag    sentinel-normalized serving-spread diagnosis (#5)
#   sweep*      per-row re-measure, merged into bench_results/sweep.json
#               (history is fingerprint-stamped now: stale windows from
#               pre-r5 programs are auto-discarded)
#   cpuoracle   CPU-backend comparison arm (single core, must NOT
#               overlap any timed TPU stage) (#8)
#   bench       full bench.py (multi-window medians for every metric)
#   readme      regenerate README's perf block, then --check
set -u
PY=python
command -v python >/dev/null && python -c "import numpy" 2>/dev/null || PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "/tmp/r5_$name.log" 2>&1
  local rc=$?
  tail -5 "/tmp/r5_$name.log"
  echo "=== $name done rc=$rc ==="
}

probe() {
  # 300s: backend init through a congested relay can exceed 120s
  timeout 300 "$PY" -c "import jax, jax.numpy as jnp; x=jnp.ones((8,128)); float(jnp.sum(x*x))" \
    || { echo "TPU unreachable — aborting"; exit 1; }
}

stages=${*:-smoke slrace gauss16 tvab servdiag sweep512 sweep2048 sweep8192 sweep32768 bench cpuoracle table readme}

for s in $stages; do
  [ "$s" = cpuoracle ] || probe
  case $s in
    smoke)        run smoke 2700 "$PY" -u tools/tpu_smoke.py ;;
    slrace)       run slrace 5400 "$PY" -u tools/vmemfft_ab.py \
                     --sizes 10,11,12,13 --rounds 4 ;;
    gauss16)      run gauss16 3600 "$PY" -u tools/fft_plan16.py --logn 16 \
                     --only cur,cur_g,cur_gl,cur_gr,cur_t,cur_tg ;;
    tvab)         run tvab 3600 "$PY" -u tools/tv_ab.py --pairs 4 ;;
    servdiag)     run servdiag 3600 "$PY" -u tools/serving_diag.py ;;
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
    bench)        run bench 7200 "$PY" bench.py ;;
    cpuoracle)    run cpuoracle 14400 "$PY" -u -c "
from opencl_fft_tpu.bench.sweep import measure_cpu_oracle
measure_cpu_oracle([512, 2048, 8192, 32768],
                   [1 << k for k in range(16, 23)],
                   'bench_results/sweep_cpu.json', tv=True,
                   timeout_s=1800)" ;;
    table)        run table 900 "$PY" -m opencl_fft_tpu.bench.sweep \
                     --repeats 0 --merge bench_results/sweep.json \
                     --out bench_results/sweep ;;
    readme)       run readme 300 "$PY" tools/readme_perf.py \
                  && run readmechk 300 "$PY" tools/readme_perf.py --check ;;
    *)            echo "unknown stage $s" ;;
  esac
done
echo "ALL STAGES DONE $(date)"