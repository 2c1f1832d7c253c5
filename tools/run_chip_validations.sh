#!/usr/bin/env bash
# Queued chip work for the next session with a LIVE TPU tunnel, in priority
# order (see TODO.md).  Each step is independently budgeted; the script
# stops early if the tunnel dies mid-run (every tool asserts the backend).
#
# Pre-flight: the tunnel is alive iff port 8083 accepts (the remote-compile
# hop) AND `python3 -u /root/.tpu_init.py` is in the process table.
set -u
cd "$(dirname "$0")/.."

tunnel_alive() {
  timeout 5 bash -c 'exec 3<>/dev/tcp/localhost/8083' 2>/dev/null
}

# --wait [SECONDS]: poll for the tunnel (default 6h) and proceed the moment
# it returns — lets a dead-tunnel session queue this in the background.
if [ "${1:-}" = "--wait" ]; then
  budget="${2:-21600}"
  waited=0
  until tunnel_alive; do
    if [ "$waited" -ge "$budget" ]; then
      echo "ABORT: tunnel never returned within ${budget}s of --wait"
      exit 1
    fi
    sleep 60
    waited=$((waited + 60))
  done
  echo "tunnel returned after ${waited}s — starting chip validations"
  # settle: the relay can take a moment to bring up all forwarded ports
  sleep 30
fi

if ! tunnel_alive; then
  echo "ABORT: TPU tunnel dead (port 8083 refused) — see verify skill notes"
  exit 1
fi

echo "=== 1/3 flagship train-step bench (compile + step per remat mode) ==="
# the round-3 open item: 32L s_tea=2048 bs=4 int8; ~25-50 min/mode through
# the tunnel (the r2 nested-remat compile was ~28 min)
timeout 7200 python tools/bench_train_step_tpu.py --flagship --budget 3000

echo "=== 2/3 masked-KL Mosaic-lowering validation (first REAL run) ==="
# the tool compared pallas-vs-pallas until the late-binding fix; this is
# the first execution that actually validates the kernel on hardware
timeout 1200 python tools/validate_kl_tpu.py

echo "=== 3/4 eval-shape spot-bench (measure the decode-loop gain) ==="
# the restructured loops dropped 1 of 5 decode forwards at max_new=5;
# r3-banked baseline: 9.14 questions/s/chip
timeout 900 python bench.py --run 32:int8:bs1:eval

echo "=== 4/4 bs=64 serving-gap sweep (optional; data for the next push) ==="
# banked: 1446.9 tok/s = 70.1% of the corrected ceiling.  Hypotheses for the
# remaining 30%: per-step lm_head cost, XLA-vs-Pallas int8 matmul at M=64,
# cache-read layout.  This brackets them at the serving shape.
BRK_BS=64 BRK_KV=int8 timeout 1500 python tools/bench_decode_breakdown.py \
  stream matmul attn full
LICV_INT8_PALLAS=1 BRK_BS=64 BRK_KV=int8 timeout 900 \
  python tools/bench_decode_breakdown.py matmul

echo "=== 5/5 prefill/vision MFU bench (optional; first MXU-MFU numbers) ==="
# compute-bound phase accounting: ViT-H encode + bind+prefill at the eval
# prompt length and the 32-shot teacher length (flash at 2048 may pay a
# long first compile through the tunnel; the compile cache keeps it once)
timeout 2400 python tools/bench_prefill_tpu.py 1:64 1:2048 8:2048

echo "ALL CHIP VALIDATIONS DONE — record results in STATUS.md/PARITY.md"
