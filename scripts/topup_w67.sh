#!/bin/bash
# Round-5: two additional wide-64000h windows (w6, w7) at --rounds 6
# (tighter medians than the 5-round form, still under the 3600 s
# per-measurement cap at local[4]); per-window OWN rates append to
# BENCH/window_rates.jsonl via roundscale_topup.py.
cd /root/repo
for w in 6 7; do
  for attempt in 1 2 3; do
    echo "=== window w$w attempt $attempt $(date) ===" >> BENCH/topup_w67.log
    if python scripts/roundscale_topup.py 64000 --passes 1 --rounds 6 \
         >> BENCH/topup_w67.log 2>&1; then
      echo "=== window w$w OK $(date) ===" >> BENCH/topup_w67.log
      break
    fi
    echo "=== window w$w attempt $attempt FAILED $(date) ===" >> BENCH/topup_w67.log
    sleep 30
  done
done
echo "=== all done $(date) ===" >> BENCH/topup_w67.log
