#!/bin/bash
# Round-5: two wide-64000h windows (w8, w9) AFTER the pages-cache
# partition fix (data-sized cache layout, identical across cluster
# sizes — see BENCH/CRAWL_BISECT.md round-5 section). --rounds 6,
# local[16] leg first (fail-fast), rows labelled 'cache-fix'.
cd /root/repo
for w in 8 9; do
  for attempt in 1 2 3; do
    echo "=== window w$w attempt $attempt $(date) ===" >> BENCH/topup_w89.log
    if python scripts/roundscale_topup.py 64000 --passes 1 --rounds 6 \
         --note cache-fix >> BENCH/topup_w89.log 2>&1; then
      echo "=== window w$w OK $(date) ===" >> BENCH/topup_w89.log
      break
    fi
    echo "=== window w$w attempt $attempt FAILED $(date) ===" >> BENCH/topup_w89.log
    sleep 30
  done
done
echo "=== all done $(date) ===" >> BENCH/topup_w89.log
