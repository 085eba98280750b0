#!/bin/bash
# Two more wide-64000h scaling windows (VERDICT r4 order #3), with retry:
# each invocation appends ONE merged window record to roundscale_history.jsonl.
cd /root/repo
for w in 4 5; do
  for attempt in 1 2 3; do
    echo "=== window w$w attempt $attempt $(date) ===" >> BENCH/topup_w45.log
    if python scripts/roundscale_topup.py 64000 --passes 1 --rounds 5 \
         >> BENCH/topup_w45.log 2>&1; then
      echo "=== window w$w OK $(date) ===" >> BENCH/topup_w45.log
      break
    fi
    echo "=== window w$w attempt $attempt FAILED $(date) ===" >> BENCH/topup_w45.log
    sleep 30
  done
done
echo "=== all done $(date) ===" >> BENCH/topup_w45.log
