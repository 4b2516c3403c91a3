#!/bin/bash
# Leak-tolerant supervisor for the round-5 long run (PERF.md round 5).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export PYTHONPATH=/root/repo:/root/.axon_site
while true; do
  python -m rusty_sr_tpu.cli train runs/r5_long/model.rsr data/train \
    -v data/val --trunk packed --batch 32 --steps_per_dispatch 10 \
    --max_steps 100000 --ckpt_every 2000 --val_every 200 \
    --ckpt_dir runs/r5_long/ckpt --resume runs/r5_long/ckpt \
    --metrics runs/r5_long/metrics.jsonl --max_rss_gb 60 \
    >> runs/r5_long/train.log 2>&1 &
  echo $! > /tmp/r5_train.pid
  wait $!
  rc=$?
  echo "[supervisor] leg exited rc=$rc at $(date -u +%H:%M:%S)" >> runs/r5_long/train.log
  if [ $rc -eq 0 ]; then echo "[supervisor] run complete" >> runs/r5_long/train.log; break; fi
  if [ $rc -ne 75 ] && [ $rc -ne 137 ]; then sleep 10; fi
done
