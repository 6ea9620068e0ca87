"""Serving-tier benchmark: HTTP caption server at COCO shapes.

The decode-kernel numbers (bench_suite.py) measure the device path
alone; a production user sees the whole serving stack — HTTP parse,
dynamic micro-batching, bucket padding, device dispatch, scatter-back.
This harness measures that stack in one process against a real
CaptionServer (random weights — latency is shape-, not value-,
dependent):

  * sequential single-feature requests  -> request latency p50/p95
  * concurrent 1-row clients            -> co-batching throughput
  * batch-64 requests                   -> bulk HTTP captions/s vs the
                                           direct Captioner.caption call

Usage:  python benchmarks/bench_server.py [--requests 200] [--threads 32]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from image_captioning_through_rl_tpu.api import Captioner
from image_captioning_through_rl_tpu.client import CaptionClient
from image_captioning_through_rl_tpu.config import NetConfig
from image_captioning_through_rl_tpu.models import a2c
from image_captioning_through_rl_tpu.server import CaptionServer
from image_captioning_through_rl_tpu.utils.io import enable_persistent_compile_cache

VOCAB, FEAT, HID, T = 1004, 512, 512, 17


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--threads", type=int, default=32)
    ap.add_argument("--per_thread", type=int, default=25)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    args = ap.parse_args()

    enable_persistent_compile_cache()
    cfg = NetConfig(vocab_size=VOCAB, input_dim=FEAT, wordvec_dim=HID,
                    hidden_dim=HID, max_seq_len=T)
    params = a2c.init(jax.random.PRNGKey(0), cfg)
    idx_to_word = {i: f"w{i}" for i in range(VOCAB)}
    cap = Captioner(params, cfg, idx_to_word)
    srv = CaptionServer(cap, port=0, max_batch=64,
                        max_wait_ms=args.max_wait_ms)
    srv.start()
    http = CaptionClient(f"http://{srv.host}:{srv.port}")
    t0 = time.perf_counter()
    srv.warmup(FEAT)
    print(f"warmup (all buckets compiled): {time.perf_counter()-t0:.1f}s",
          flush=True)
    rng = np.random.default_rng(0)

    try:
        # --- 1) sequential single-row latency ---
        lat = []
        feats = rng.standard_normal((args.requests, FEAT)).astype(np.float32)
        for i in range(args.requests):
            t0 = time.perf_counter()
            out = http.caption(feats[i], binary=False)
            lat.append(time.perf_counter() - t0)
            assert len(out) == 1
        lat = np.sort(np.array(lat)) * 1e3
        print(f"\nsequential 1-row x{args.requests}: "
              f"p50 {lat[len(lat)//2]:.1f} ms  "
              f"p95 {lat[int(len(lat)*0.95)]:.1f} ms  "
              f"min {lat[0]:.1f} ms", flush=True)

        # --- 2) concurrent 1-row clients (co-batching) ---
        disp_before = srv.stats["batches"]
        done, errs = [], []

        def client(tid):
            f = rng.standard_normal(FEAT).astype(np.float32)
            for _ in range(args.per_thread):
                t0 = time.perf_counter()
                try:
                    http.caption(f, binary=False)
                    done.append(time.perf_counter() - t0)
                except Exception as e:  # count, don't crash the bench
                    errs.append(repr(e))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.threads)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        n = len(done)
        q = np.sort(np.array(done)) * 1e3
        print(f"concurrent {args.threads}x{args.per_thread} 1-row: "
              f"{n / wall:,.0f} req/s  p50 {q[n//2]:.1f} ms  "
              f"p99 {q[int(n*0.99)]:.1f} ms  errors {len(errs)}", flush=True)
        disp = srv.stats["batches"] - disp_before
        print(f"  device dispatches: {disp} "
              f"({n / max(disp, 1):.1f} rows/dispatch co-batched)", flush=True)

        # --- 3) bulk batch-64 over HTTP vs direct call ---
        big = rng.standard_normal((64, FEAT)).astype(np.float32)
        for _ in range(3):
            http.caption(big, binary=False)  # warm path
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            http.caption(big, binary=False)
        http_s = (time.perf_counter() - t0) / iters
        # binary (octet-stream) variant of the same batch
        for _ in range(3):
            http.caption(big)
        t0 = time.perf_counter()
        for _ in range(iters):
            http.caption(big)
        bin_s = (time.perf_counter() - t0) / iters
        cap.caption(big)
        t0 = time.perf_counter()
        for _ in range(iters):
            cap.caption(big)
        direct_s = (time.perf_counter() - t0) / iters
        print(f"batch-64: JSON {64/http_s:,.0f} cap/s "
              f"({http_s*1e3:.1f} ms/req)  binary {64/bin_s:,.0f} cap/s "
              f"({bin_s*1e3:.1f} ms)  direct {64/direct_s:,.0f} cap/s "
              f"({direct_s*1e3:.1f} ms) -> stack overhead "
              f"JSON {(http_s-direct_s)*1e3:.1f} / binary "
              f"{(bin_s-direct_s)*1e3:.1f} ms", flush=True)
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
