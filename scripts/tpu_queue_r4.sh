#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 items 1/2/4/5/6).
#
# Design fixes over the round-3 watcher that burned its queue on a
# tunnel flap:
#   - the probe is a REAL jitted matmul (scripts/tpu_probe_real.py),
#     not backend init: init can succeed while compiles are UNAVAILABLE;
#   - every stage re-probes right before running;
#   - every stage's output is VALIDATED (bench JSON must parse and not
#     carry an "error" key; scripts must exit 0) and failed stages are
#     retried on later passes instead of being marked done.
#
# State: /tmp/r4_stages/<name>.ok marks a verified-complete stage.
# Log:   /tmp/r4_queue.log
cd /root/repo || exit 1
LOG=/tmp/r4_queue.log
STATE=/tmp/r4_stages
mkdir -p "$STATE"
log() { echo "== $* $(date +%H:%M:%S)" >> "$LOG"; }

# Round-5: the tunnel's client-admit latency varies from seconds to
# minutes between identical probes — patient timeouts stop misreading a
# slow-admit window as an outage.
export UNETSULC_PROBE_TIMEOUT=900
probe() { timeout 600 python scripts/tpu_probe_real.py >> "$LOG" 2>&1; }

wait_for_tpu() {
  # ~12h of probes, 90s apart (each failed probe costs <=300s).
  # Exiting (not returning) on exhaustion: once we give up, no later
  # stage should start its own 12h wait.
  for i in $(seq 1 200); do
    log "probe $i"
    if probe; then log "TPU UP"; return 0; fi
    sleep 90
  done
  log "GAVE UP waiting for TPU"; exit 1
}

bench_ok() {  # $1 = json file: parses, has a metric, no "error" key
  python - "$1" <<'EOF'
import json, sys
try:
    lines = [l for l in open(sys.argv[1]) if l.strip().startswith("{")]
    objs = [json.loads(l) for l in lines]
    assert objs and all("error" not in o for o in objs)
    assert any(o.get("value", 0) > 0 for o in objs)
except Exception as e:
    sys.exit(1)
EOF
}

run_bench_stage() {  # name, outfile, timeout, env assignments..., then -- args
  local name=$1 out=$2 tmo=$3; shift 3
  [ -e "$STATE/$name.ok" ] && return 0
  wait_for_tpu || return 1
  log "stage $name start"
  if env "$@" timeout "$tmo" python bench.py ${ARGS} > "$out" 2>"${out%.json}.err" \
     && bench_ok "$out"; then
    touch "$STATE/$name.ok"; log "stage $name OK: $(cat "$out" | tr -d '\n')"
  else
    log "stage $name FAILED (will retry): $(tail -c 300 "${out%.json}.err" | tr '\n' ' ')"
  fi
}

run_script_stage() {  # name, logfile, timeout, command...
  # Optional: VERIFY=<grep pattern> must appear in the log for success.
  local name=$1 out=$2 tmo=$3; shift 3
  [ -e "$STATE/$name.ok" ] && return 0
  wait_for_tpu || return 1
  log "stage $name start"
  if timeout "$tmo" "$@" > "$out" 2>&1 \
     && { [ -z "$VERIFY" ] || grep -q "$VERIFY" "$out"; }; then
    touch "$STATE/$name.ok"; log "stage $name OK"
  else
    log "stage $name FAILED (will retry): $(tail -c 300 "$out" | tr '\n' ' ')"
  fi
}

for pass in 1 2 3; do
  log "pass $pass"
  # fast, decision-critical stages first: the kfold9 A/B + MXU probe +
  # step profile decide the round-5 optimization lever, and the latency
  # breakdown decides whether the sweep bottleneck moved to the host
  ARGS="" run_bench_stage bench_main   /tmp/bench_r4_main.json   2400 UNUSED=
  ARGS="" run_bench_stage bench_kfold9 /tmp/bench_r4_kfold9.json 2400 UNETSULC_KFOLD9=1
  VERIFY="roofline" run_script_stage mxu  /tmp/r4_mxu.log  3000 \
    python scripts/mxu_probe.py
  VERIFY="" run_script_stage prof /tmp/r4_prof.txt 3000 \
    python scripts/prof_step.py
  ARGS="--latency" run_bench_stage bench_lat /tmp/bench_r4_lat.json 2400 UNUSED=
  # BASELINE.json transfer configs on the final kernel set (VERDICT r3 #6)
  ARGS="--freeze final_conv" run_bench_stage bench_fc /tmp/bench_r4_fc.json 2400 UNUSED=
  ARGS="--freeze decoders" run_bench_stage bench_dec /tmp/bench_r4_dec.json 2400 UNUSED=
  ARGS="--batch 2" run_bench_stage bench_b2 /tmp/bench_r4_b2.json 2400 UNUSED=
  VERIFY="RATIO sp2/single" run_script_stage sp_memory /tmp/r4_sp_memory.log \
    3000 python scripts/sp_memory_tpu.py
  # long accuracy runs last: paired Pallas/XLA at the reference's ~100
  # epoch scale (r3 data: 20 epochs x 3 folds = 410s wall, so ~35 min/arm)
  VERIFY="mean val acc" run_script_stage flagship_p100 /tmp/flagship_p100.log \
    14000 env EPOCHS=100 TAG=_p100 python scripts/flagship_e2e.py
  VERIFY="mean val acc" run_script_stage flagship_x100 /tmp/flagship_x100.log \
    14000 env NOPALLAS=1 EPOCHS=100 TAG=_x100 python scripts/flagship_e2e.py
  VERIFY="mean val acc" run_script_stage transfer100 /tmp/transfer100.log \
    14000 env TAG=_p100 python scripts/transfer40.py
  if ls "$STATE" | grep -c '\.ok$' | grep -q '^12$'; then
    log "ALL DONE"; exit 0
  fi
done
log "EXHAUSTED PASSES ($(ls "$STATE" | grep -c '\.ok$')/12 ok)"
